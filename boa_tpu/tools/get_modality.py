"""CT vs MR modality prediction from image-level intensity features.

Parity: `totalsegmentator/bin/totalseg_get_modality.py:24-60` — 4 features
(mean, std, min, max of raw intensities) → classifier ensemble. The
reference's XGBoost fold files are not vendored; a sklearn ensemble loads
from `BOA_MODALITY_MODEL`, with an HU-range heuristic fallback (CT images
keep calibrated HU: air ≈ −1000 present, wide symmetric range; MR
intensities are non-negative and scanner-scaled).
"""

from __future__ import annotations

import json
import os
import pickle
from pathlib import Path

import numpy as np


def get_features(data: np.ndarray) -> list[float]:
    return [float(np.mean(data)), float(np.std(data)),
            float(np.min(data)), float(np.max(data))]


def get_modality(data: np.ndarray,
                 model_file: str | Path | None = None) -> dict:
    features = get_features(np.asarray(data))
    model_file = model_file or os.environ.get("BOA_MODALITY_MODEL")
    if model_file and Path(model_file).exists():
        with open(model_file, "rb") as f:
            clfs = pickle.load(f)
        preds = [float(c.predict(np.asarray(features)[None])[0])
                 for c in (clfs.values() if isinstance(clfs, dict) else clfs)]
        prob = float(np.mean(preds))
        modality = "mr" if prob > 0.5 else "ct"
        probability = prob if modality == "mr" else 1 - prob
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
