"""CT contrast-phase from organ HU statistics (pi-time regression).

Parity: `totalsegmentator/bin/totalseg_get_phase.py:23-120` — per-organ
median HU features from a fast `total` run (+ head/neck vessels when brain
volume > 100 ml) → regressor ensemble predicting contrast pi-time →
`pi_time_to_phase` mapping (exact table). The reference's trained fold
pickle (`resources/contrast_phase_classifiers_2024_07_19.pkl`) is
vendored as data and scored through the pure-numpy XGBoost tree walker
(`boa_tpu/compute/xgb.py`), so pi-time predictions match the reference.
`BOA_PHASE_MODEL` overrides with any sklearn-style ensemble; a
physiological aorta/portal/vein heuristic remains as last resort.
"""

from __future__ import annotations

import json
import logging
import pickle
from pathlib import Path
from typing import Any

import numpy as np

logger = logging.getLogger(__name__)

PHASE_ORGANS = [
    "liver", "pancreas", "urinary_bladder", "gallbladder",
    "heart", "aorta", "inferior_vena_cava",
    "portal_vein_and_splenic_vein",
    "iliac_vena_left", "iliac_vena_right",
    "iliac_artery_left", "iliac_artery_right",
    "pulmonary_vein", "brain", "colon", "small_bowel",
]
PHASE_ORGANS_HN = [
    "internal_carotid_artery_right", "internal_carotid_artery_left",
    "internal_jugular_vein_right", "internal_jugular_vein_left",
]


def pi_time_to_phase(pi_time: float) -> tuple[str, float]:
    """Exact mapping of `totalseg_get_phase.py:23-55`."""
    if pi_time < 5:
        return "native", 1.0
    elif pi_time < 10:
        return "native", 0.7
    elif pi_time < 20:
        return "arterial_early", 0.7
    elif pi_time < 30:
        return "arterial_early", 1.0
    elif pi_time < 50:
        return "arterial_late", 1.0
    elif pi_time < 60:
        return "arterial_late", 0.7
    elif pi_time < 70:
        return "portal_venous", 1.0
    elif pi_time < 90:
        return "portal_venous", 1.0
    elif pi_time < 100:
        return "portal_venous", 0.7
    else:
        return "portal_venous", 0.3


def _heuristic_pi_time(features: dict[str, float]) -> float:
    """Estimate pi-time from aorta vs portal enhancement when no trained
    regressor is installed."""
    aorta = features.get("aorta", 0.0)
    portal = features.get("portal_vein_and_splenic_vein", 0.0)
    vci = features.get("inferior_vena_cava", 0.0)
    if aorta < 120:
        return 2.0
    if aorta - portal > 80:
        return 20.0  # arterial_early
    if aorta - portal > 30:
        return 40.0  # arterial_late
    if portal > 120 or vci > 110:
        return 75.0  # portal_venous
    return 100.0


def features_from_stats(stats: dict[str, Any],
                        stats_hn: dict[str, Any] | None = None
                        ) -> dict[str, float]:
    feats = {}
    for organ in PHASE_ORGANS:
        feats[organ] = float(stats.get(organ, {}).get("intensity", 0.0) or 0.0)
    hn = stats_hn or {}
    for organ in PHASE_ORGANS_HN:
        feats[organ] = float(hn.get(organ, {}).get("intensity", 0.0) or 0.0)
    return feats


_VENDORED_PHASE_PKL = (Path(__file__).resolve().parents[1] / "resources" /
                       "contrast_phase_classifiers_2024_07_19.pkl")


def _load_phase_ensemble(model_file: str | Path) -> list:
    """Fold regressors from a pickle: the reference's XGBoost pickle is
    decoded without xgboost via the UBJSON tree scorer; any other pickle
    is used through its sklearn-style .predict."""
    try:
        from boa_tpu.compute.xgb import load_pickled_ensembles

        return list(load_pickled_ensembles(model_file).values())
    except Exception:
        with open(model_file, "rb") as f:
            clfs = pickle.load(f)
        return list(clfs.values() if isinstance(clfs, dict) else clfs)


def get_ct_contrast_phase(stats: dict[str, Any],
                          stats_hn: dict[str, Any] | None = None,
                          model_file: str | Path | None = None) -> dict:
    """stats: `get_basic_statistics` output of a `total` run (median HU)."""
    feats = features_from_stats(stats, stats_hn)
    vec = np.array([feats[o] for o in PHASE_ORGANS + PHASE_ORGANS_HN])
    import os

    model_file = model_file or os.environ.get("BOA_PHASE_MODEL")
    if model_file == "heuristic":  # explicit opt-out of any trained model
        model_file = None
    elif model_file and not Path(model_file).exists():
        # a typo'd model path must not silently degrade to the heuristic
        raise FileNotFoundError(f"BOA_PHASE_MODEL={model_file} not found")
    elif not model_file and _VENDORED_PHASE_PKL.exists():
        model_file = _VENDORED_PHASE_PKL
    if model_file and Path(model_file).exists():
        folds = _load_phase_ensemble(model_file)
        preds = np.array([float(np.asarray(clf.predict(vec[None]))[0])
                          for clf in folds])
        pi_time = round(float(preds.mean()), 2)
        pi_time_std = round(float(preds.std()), 4)
        pi_min, pi_max = (round(float(preds.min()), 2),
                          round(float(preds.max()), 2))
    else:
        pi_time = _heuristic_pi_time(feats)
        pi_time_std = 0.0
        pi_min = pi_max = pi_time
    phase, prob = pi_time_to_phase(pi_time)
    return {"pi_time": pi_time, "pi_time_std": pi_time_std,
            "phase": phase, "probability": prob,
            "pi_time_min": pi_min, "pi_time_max": pi_max}


def main(argv=None) -> None:
    import argparse

    from boa_tpu.io import nifti
    from boa_tpu.inference.pipeline import predict_image
    from boa_tpu.weights.store import ModelStore

    ap = argparse.ArgumentParser("totalseg_get_phase")
    ap.add_argument("-i", "--input", type=Path, required=True)
    ap.add_argument("-o", "--output", type=Path, default=None)
    ap.add_argument("-m", "--model-file", type=Path, default=None)
    args = ap.parse_args(argv)

    img = nifti.load(args.input)
    store = ModelStore()
    # reference feature semantics (`totalseg_get_phase.py:57-120`): median
    # HU, border masks included
    res = predict_image(img, "total", store, fast=True, statistics=True,
                        stats_aggregation="median",
                        stats_exclude_border=False)
    stats_hn = None
    if res.stats.get("brain", {}).get("volume", 0) > 100:
        # head present: the carotid/jugular features come from the
        # headneck_bones_vessels model (`:82-93`); without it they are 0
        res_hn = predict_image(img, "headneck_bones_vessels", store,
                               statistics=True, stats_aggregation="median",
                               stats_exclude_border=False)
        stats_hn = res_hn.stats
    out = get_ct_contrast_phase(res.stats, stats_hn,
                                model_file=args.model_file)
    print(json.dumps(out, indent=2))
    if args.output:
        args.output.write_text(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
