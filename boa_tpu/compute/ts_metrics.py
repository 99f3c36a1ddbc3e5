"""TotalSegmentator measurements → Excel row records.

Parity: `body_organ_analysis/compute/ts_metrics.py:32-171` — reads
`total-measurements.json`, derives the L3-slice body major/minor axes
(convex hull + contour intersection), and produces the info rows +
regions-statistics + cnr-adjusted DataFrames for the workbook.
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Any

import numpy as np
import pandas as pd
from scipy import spatial

from boa_tpu.compute.geometry import find_axes
from boa_tpu.io import nifti
from boa_tpu.tasks import class_maps
from boa_tpu.utils.misc import (ADDITIONAL_MODELS_OUTPUT_NAME, convert_name,
                                create_mask)

logger = logging.getLogger(__name__)


def _reverse_total_map() -> dict[str, int]:
    return {v: k for k, v in class_maps.get_class_map("total").items()}


def major_minor_axis(l3_mask: np.ndarray, body_mask: np.ndarray,
                     img_spacing, plot_axes: Path | None = None
                     ) -> tuple[float | None, float | None]:
    """Axes of the middle L3 axial slice, in mm (`ts_metrics.py:32-61`).

    Masks are in (X, Y, Z) index order (the reference operates on sitk's
    (z, y, x) arrays; we slice axis 2 instead of axis 0 accordingly).
    """
    if np.sum(l3_mask) == 0 or np.sum(body_mask) == 0:
        return None, None
    slices = np.where(l3_mask.any(axis=(0, 1)))[0]
    middle_slice = body_mask[:, :, int(np.median(slices))]
    if np.sum(middle_slice) == 0:
        return None, None
    major_p1, major_p2, minor_p1, minor_p2 = find_axes(middle_slice)
    if any(pt is None for pt in (major_p1, major_p2, minor_p1, minor_p2)):
        return None, None
    if plot_axes is not None:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        _, ax = plt.subplots(1, 1)
        ax.imshow(middle_slice, cmap="gray")
        ax.plot((major_p1.x, major_p2.x), (major_p1.y, major_p2.y), "-g",
                linewidth=2.5)
        ax.plot((minor_p1.x, minor_p2.x), (minor_p1.y, minor_p2.y), "-b",
                linewidth=2.5)
        plt.axis("off")
        plt.savefig(Path(plot_axes) / "major_minor_axis.png", dpi=200,
                    bbox_inches="tight")
        plt.close()
    avg_spacing = float(np.mean(img_spacing))
    return (
        spatial.distance.euclidean(major_p1.to_list(), major_p2.to_list())
        * avg_spacing,
        spatial.distance.euclidean(minor_p1.to_list(), minor_p2.to_list())
        * avg_spacing,
    )


def get_cnr_for_region(measurements: dict[str, Any], region: str) -> Any:
    if measurements["segmentations"]["total"][region]["present"]:
        return measurements["segmentations"]["total"][region]["cnr"]
    return None


def _excel_key(key: str) -> str:
    new_key = convert_name(key)
    if "Hu" in new_key:
        new_key = new_key.replace("Hu", "HU")
    elif new_key == "Cnr":
        new_key = "CNR"
    return new_key


def compute_segmentator_metrics(
    ct_path: Path,
    segmentation_folder: Path,
    store_axes: bool = False,
) -> tuple[list[dict[str, Any]], pd.DataFrame, pd.DataFrame]:
    """(info rows, regions-statistics df, cnr-adjusted df) —
    `ts_metrics.py:70-171`."""
    segmentation_folder = Path(segmentation_folder)
    with (segmentation_folder / "total-measurements.json").open() as of:
        json_measurements = json.load(of)

    autochthon_std = json_measurements["info"]["autochthon_std"]
    cnr_aorta = get_cnr_for_region(json_measurements, "aorta")
    cnr_vci = get_cnr_for_region(json_measurements, "inferior_vena_cava")
    cnr_pv = get_cnr_for_region(json_measurements,
                                "portal_vein_and_splenic_vein")

    ct_img = nifti.load(Path(ct_path))
    major_axis = minor_axis = mean_axis = None
    total_path = segmentation_folder / "total.nii.gz"
    body_parts_path = segmentation_folder / "body_parts.nii.gz"
    if total_path.exists() and body_parts_path.exists():
        region_data = np.asarray(nifti.load(total_path).data)
        body_data = np.asarray(nifti.load(body_parts_path).data)
        rev = _reverse_total_map()
        major_axis, minor_axis = major_minor_axis(
            l3_mask=create_mask(region_data, rev["vertebrae_L3"]),
            body_mask=create_mask(body_data, 1),
            img_spacing=np.asarray(ct_img.zooms[:2]),
            plot_axes=segmentation_folder if store_axes else None,
        )
    if major_axis is not None and minor_axis is not None:
        major_axis /= 10
        minor_axis /= 10
        mean_axis = (major_axis + minor_axis) / 2

    records: list[dict[str, Any]] = []
    for model_name in json_measurements["segmentations"]:
        for region, vals in json_measurements["segmentations"][model_name].items():
            base = {"ModelName": convert_name(model_name),
                    "BodyRegion": convert_name(region)}
            for key, val in vals.items():
                base[_excel_key(key)] = val
            records.append(base)

    cnr_records = []
    if json_measurements.get("cnr_adjusted"):
        for region in ("aorta", "pulmonary_artery", "autochthon",
                       "autochthon_left", "autochthon_right"):
            if region not in json_measurements["cnr_adjusted"]:
                continue
            base = {"BodyRegion": convert_name(region)}
            for key, val in json_measurements["cnr_adjusted"][region].items():
                base[_excel_key(key)] = val
            cnr_records.append(base)

    for model_name, filename in ADDITIONAL_MODELS_OUTPUT_NAME.items():
        if not (segmentation_folder / f"{filename}.nii.gz").exists():
            records.append({"ModelName": convert_name(model_name),
                            "Present": False})
            continue

    additional_info = []
    for name, value in [
        ("Noise", autochthon_std),
        ("CNRAorta", cnr_aorta),
        ("CNRVCI", cnr_vci),
        ("CNRPortalSplenicVein", cnr_pv),
        ("MaxAxisL3_cm", major_axis),
        ("MinAxisL3_cm", minor_axis),
        ("MeanAxisL3_cm", mean_axis),
    ]:
        if value is not None:
            additional_info.append({"name": name, "value": value})
    return (
        additional_info,
        pd.DataFrame(records).sort_values(by=["ModelName", "BodyRegion"]),
        pd.DataFrame(cnr_records),
    )
