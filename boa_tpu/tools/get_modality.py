"""CT vs MR modality prediction from image-level intensity features.

Parity: `totalsegmentator/bin/totalseg_get_modality.py:24-60` — 4 features
(mean, std, min, max of raw intensities) → 5-fold XGBoost ensemble. The
reference's trained fold files
(`resources/modality_classifiers_2025_02_24.json.*`) are vendored as data
and scored with the pure-numpy tree walker (`boa_tpu/compute/xgb.py`), so
this tool reproduces the reference classifier's outputs exactly. A
sklearn ensemble can override via `BOA_MODALITY_MODEL`; an HU-range
heuristic remains as last-resort fallback (CT keeps calibrated HU: air
≈ −1000 present; MR intensities are non-negative and scanner-scaled).
"""

from __future__ import annotations

import json
import os
import pickle
from functools import lru_cache
from pathlib import Path

import numpy as np

_VENDORED_FOLDS = (Path(__file__).resolve().parents[1] / "resources" /
                   "modality_classifiers_2025_02_24.json")


def get_features(data: np.ndarray) -> list[float]:
    return [float(np.mean(data)), float(np.std(data)),
            float(np.min(data)), float(np.max(data))]


@lru_cache(maxsize=1)
def _vendored_ensemble():
    if not Path(f"{_VENDORED_FOLDS}.0").exists():
        return None
    from boa_tpu.compute.xgb import load_fold_files

    return load_fold_files(_VENDORED_FOLDS)


def get_modality(data: np.ndarray,
                 model_file: str | Path | None = None) -> dict:
    features = get_features(np.asarray(data))
    model_file = model_file or os.environ.get("BOA_MODALITY_MODEL")
    if model_file and not Path(model_file).exists():
        # a typo'd model path must not silently degrade to the heuristic
        raise FileNotFoundError(f"BOA_MODALITY_MODEL={model_file} not found")
    vendored = _vendored_ensemble() if not model_file else None
    if model_file and Path(model_file).exists():
        with open(model_file, "rb") as f:
            clfs = pickle.load(f)
        preds = [float(c.predict(np.asarray(features)[None])[0])
                 for c in (clfs.values() if isinstance(clfs, dict) else clfs)]
        prob = float(np.mean(preds))
        modality = "mr" if prob > 0.5 else "ct"
        probability = prob if modality == "mr" else 1 - prob
    elif vendored is not None:
        # reference ensemble semantics (`totalseg_get_modality.py:49-60`):
        # mean of fold *labels*, < 0.5 → ct
        labels = [float(fold.predict_label([features])[0])
                  for fold in vendored]
        mean_label = float(np.mean(labels))
        modality = "ct" if mean_label < 0.5 else "mr"
        probability = 1 - mean_label if modality == "ct" else mean_label
    else:
        mn, mx = features[2], features[3]
        is_ct = mn < -200  # calibrated air HU present
        modality = "ct" if is_ct else "mr"
        probability = 0.99 if (mn < -500 or mn >= 0) else 0.7
    return {"modality": modality, "probability": round(probability, 4),
            "features": features}


# ROI-median features of the min-max-normalized image, in the exact
# reference order (`totalseg_get_modality.py:76-81`)
ROI_ORGANS = (
    "brain", "esophagus", "colon", "spinal_cord",
    "scapula_left", "scapula_right",
    "femur_left", "femur_right", "hip_left", "hip_right",
    "gluteus_maximus_left", "gluteus_maximus_right",
    "autochthon_left", "autochthon_right",
    "iliopsoas_left", "iliopsoas_right")

_NORMALIZED_FOLDS = (
    Path(__file__).resolve().parents[1] / "resources" /
    "modality_classifiers_normalized_2025_02_24.json")


@lru_cache(maxsize=1)
def _normalized_ensemble():
    if not Path(f"{_NORMALIZED_FOLDS}.0").exists():
        return None
    from boa_tpu.compute.xgb import load_fold_files

    return load_fold_files(_NORMALIZED_FOLDS)


def get_modality_from_rois(img, fake_predict=None) -> dict:
    """Modality from normalized ROI-median intensities.

    Parity: `totalseg_get_modality.py:67-111` — for images whose
    intensities are no longer calibrated HU (normalized exports), run the
    fast `total_mr` model with median statistics over the min-max-
    normalized volume, take the 16 reference organs' intensities as
    features, and score the vendored
    `modality_classifiers_normalized_2025_02_24.json` 5-fold ensemble.

    `img` is a NiftiImage or a path; `fake_predict` is the test hook
    threaded into the pipeline.
    """
    from boa_tpu.python_api import totalsegmentator

    folds = _normalized_ensemble()
    if folds is None:
        raise FileNotFoundError(
            f"vendored normalized modality folds missing: {_NORMALIZED_FOLDS}.*")
    _, stats = totalsegmentator(
        img, None, ml=True, fast=True, statistics=True, task="total_mr",
        roi_subset=None, statistics_exclude_masks_at_border=False,
        quiet=True, stats_aggregation="median",
        statistics_normalized_intensities=True, skip_saving=True,
        fake_predict=fake_predict)
    features = [float(stats[o]["intensity"]) for o in ROI_ORGANS]
    labels = [float(fold.predict_label([features])[0]) for fold in folds]
    mean_label = float(np.mean(labels))
    modality = "ct" if mean_label < 0.5 else "mr"
    probability = 1 - mean_label if modality == "ct" else mean_label
    return {"modality": modality, "probability": round(probability, 4),
            "features": features}


def main(argv=None) -> None:
    import argparse

    from boa_tpu.io import nifti

    ap = argparse.ArgumentParser("totalseg_get_modality")
    ap.add_argument("-i", "--input", type=Path, required=True)
    ap.add_argument("-o", "--output", type=Path, default=None)
    ap.add_argument("-n", dest="normalized_intensities", action="store_true",
                    help="use normalized ROI intensities (for images that "
                    "no longer contain original HU values)", default=False)
    args = ap.parse_args(argv)
    img = nifti.load(args.input)
    if args.normalized_intensities:
        res = get_modality_from_rois(img)
    else:
        res = get_modality(np.asarray(img.data))
    print(json.dumps(res, indent=2))
    if args.output:
        args.output.write_text(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
