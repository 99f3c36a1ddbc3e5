"""BCA measurements JSON → the three Excel DataFrames.

Parity: `body_organ_analysis/compute/bca_metrics.py:8-117` — 30 body-region
row groups (whole scan, cavities, vertebra levels C1–L5), aggregated
measurements with/without extremities, plus the two per-slice tables.
"""

from __future__ import annotations

import json
from pathlib import Path

import pandas as pd

from boa_tpu.utils.misc import convert_name

BODY_REGIONS = [
    "Whole Scan", "Abdominal Cavity", "Thoracic Cavity", "Ventral Cavity",
    "Mediastinum", "Pericardium",
    "L5", "L4", "L3", "L2", "L1",
    "T12", "T11", "T10", "T9", "T8", "T7", "T6", "T5", "T4", "T3", "T2", "T1",
    "C7", "C6", "C5", "C4", "C3", "C2", "C1",
]


def change_aggregated_name(name: str) -> str:
    return name.lower().replace(" ", "_").replace("-", "_")


def compute_bca_metrics(output_path: Path
                        ) -> tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame]:
    with (Path(output_path) / "bca-measurements.json").open() as of:
        json_measurements = json.load(of)

    example_vals = json_measurements["aggregated"]["whole_scan"]["measurements"]
    index_rows = list(example_vals["bone"].keys())
    index_cols = list(example_vals.keys())
    rename_index = {
        ind: ind.split("_")[0].capitalize() + ("_mL" if "hu" not in ind else "_HU")
        for ind in index_rows
    }
    rename_cols = {
        col: (col.upper() if col not in ["bone", "muscle"] else col.capitalize())
        for col in index_cols
    }
    rename_cols["index"] = "AggregationType"

    aggregation_df = pd.DataFrame(columns=["BodyPart", "Present",
                                           "AggregationType"])
    dfs = [aggregation_df]
    for name in BODY_REGIONS:
        aggregated_name = change_aggregated_name(name)
        if aggregated_name not in json_measurements["aggregated"]:
            dfs.append(pd.DataFrame([
                {"BodyPart": convert_name(aggregated_name), "Present": False},
                {"BodyPart": f"{convert_name(aggregated_name)}_NoExtremities",
                 "Present": False},
            ]))
            continue
        for measurement in ["measurements", "measurements_no_extremities"]:
            current_df = (
                pd.DataFrame.from_dict(
                    json_measurements["aggregated"][aggregated_name][measurement])
                .rename(index=rename_index)
                .reset_index()
                .rename(columns=rename_cols)
            )
            current_df["Present"] = True
            measurement_part = convert_name(measurement.replace("measurements", ""))
            current_df["BodyPart"] = convert_name(aggregated_name) + (
                "_" + measurement_part if len(measurement_part) > 0 else "")
            dfs.append(current_df)
    aggregation_df = pd.concat(dfs)

    slices_df = pd.DataFrame(json_measurements["slices"])
    slices_no_limbs_df = pd.DataFrame(json_measurements["slices_no_extremities"])
    rename_cols["index"] = "SliceNumber"
    for df in [slices_df, slices_no_limbs_df]:
        df.index = df.index + 1
        df.reset_index(inplace=True)
        df.rename(columns=rename_cols, inplace=True)
    return aggregation_df, slices_df, slices_no_limbs_df
