"""BCA measurements JSON → the three Excel DataFrames.

Behavior parity with `body_organ_analysis/compute/bca_metrics.py:8-117`:
the workbook's aggregated table walks 30 body-region row groups (whole
scan, cavities, vertebra levels C1–L5) with and without extremities, and
the two per-slice tables carry one row per axial slice. Row/column
labels must match the reference workbook schema; the table construction
here builds the records directly instead of reshaping DataFrames.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

import pandas as pd

from boa_tpu.utils.misc import convert_name

#: display names of the aggregation groups, in workbook row order
BODY_REGIONS = [
    "Whole Scan", "Abdominal Cavity", "Thoracic Cavity", "Ventral Cavity",
    "Mediastinum", "Pericardium",
    "L5", "L4", "L3", "L2", "L1",
    "T12", "T11", "T10", "T9", "T8", "T7", "T6", "T5", "T4", "T3", "T2", "T1",
    "C7", "C6", "C5", "C4", "C3", "C2", "C1",
]


def change_aggregated_name(name: str) -> str:
    """Display name → bca-measurements.json aggregation key."""
    return name.lower().replace(" ", "_").replace("-", "_")


def _tissue_label(tissue: str) -> str:
    """JSON tissue key → workbook column (acronyms uppercased)."""
    return tissue.capitalize() if tissue in ("bone", "muscle") else tissue.upper()


def _stat_label(stat: str) -> str:
    """JSON stat key → workbook row label with its unit suffix."""
    unit = "_HU" if "hu" in stat else "_mL"
    return stat.split("_")[0].capitalize() + unit


def _group_rows(body_part: str, table: dict[str, dict[str, Any]]
                ) -> list[dict[str, Any]]:
    """Rows of one aggregation group: one per stat, tissue values as
    columns (JSON stores {tissue: {stat: value}})."""
    tissues = list(table)
    stats = list(table[tissues[0]]) if tissues else []
    rows = []
    for stat in stats:
        row: dict[str, Any] = {"BodyPart": body_part, "Present": True,
                               "AggregationType": _stat_label(stat)}
        for tissue in tissues:
            row[_tissue_label(tissue)] = table[tissue].get(stat)
        rows.append(row)
    return rows


def _slice_table(slice_records: list[dict[str, Any]]) -> pd.DataFrame:
    df = pd.DataFrame(slice_records)
    df.insert(0, "SliceNumber", range(1, len(df) + 1))
    return df.rename(columns={c: _tissue_label(c)
                              for c in df.columns if c != "SliceNumber"})


def compute_bca_metrics(output_path: Path
                        ) -> tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame]:
    with (Path(output_path) / "bca-measurements.json").open() as of:
        measurements = json.load(of)

    aggregated = measurements["aggregated"]
    rows: list[dict[str, Any]] = []
    for display_name in BODY_REGIONS:
        key = change_aggregated_name(display_name)
        part_name = convert_name(key)
        if key not in aggregated:
            rows.append({"BodyPart": part_name, "Present": False})
            rows.append({"BodyPart": f"{part_name}_NoExtremities",
                         "Present": False})
            continue
        rows += _group_rows(part_name, aggregated[key]["measurements"])
        rows += _group_rows(f"{part_name}_NoExtremities",
                            aggregated[key]["measurements_no_extremities"])

    # pin the leading column order even if the first group is absent
    aggregation_df = pd.DataFrame(rows)
    lead = ["BodyPart", "Present", "AggregationType"]
    aggregation_df = aggregation_df[
        [c for c in lead if c in aggregation_df.columns]
        + [c for c in aggregation_df.columns if c not in lead]]

    return (aggregation_df,
            _slice_table(measurements["slices"]),
            _slice_table(measurements["slices_no_extremities"]))
