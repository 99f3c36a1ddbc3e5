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


def main(argv=None) -> None:
    import argparse

    from boa_tpu.io import nifti

    ap = argparse.ArgumentParser("totalseg_get_modality")
    ap.add_argument("-i", "--input", type=Path, required=True)
    ap.add_argument("-o", "--output", type=Path, default=None)
    args = ap.parse_args(argv)
    img = nifti.load(args.input)
    res = get_modality(np.asarray(img.data))
    print(json.dumps(res, indent=2))
    if args.output:
        args.output.write_text(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
