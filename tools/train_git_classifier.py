"""Train the vendored GIT-contrast stand-in classifier.

The reference's info sheet carries a GIT-contrast prediction from the
`boa-contrast` pip package's trained sklearn ensemble
(`body_organ_analysis/commands.py:216-241`); that artifact is not vendored
in the reference repo, so exact parity is impossible. This script fits a
functional stand-in on SYNTHETIC PHANTOM feature vectors — per-organ HU
statistics sampled from physiological enhancement models with and without
oral (GIT) contrast, across IV phases, with random organ dropout — using
the in-repo GBM fitter (`boa_tpu/compute/gbm.py`), and vendors the result
as 5 JSON fold files readable by the pure-numpy scorer
(`boa_tpu/compute/xgb.py`).

Run: python tools/train_git_classifier.py  (writes boa_tpu/resources/
git_contrast_classifiers_boa_tpu.json.{0..4}; deterministic seeds)
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from boa_tpu.compute.contrast import FEATURE_ORGANS, FEATURE_STATS  # noqa: E402
from boa_tpu.compute.gbm import fit_gbtree, save_model_doc  # noqa: E402

OUT_STEM = (Path(__file__).resolve().parents[1] / "boa_tpu" / "resources" /
            "git_contrast_classifiers_boa_tpu.json")

BOWEL = ("stomach", "duodenum", "small_bowel", "colon")

# unenhanced (median HU, spread) per organ — physiological soft-tissue bands
BASE_HU = {
    "aorta": (45, 8), "inferior_vena_cava": (42, 8),
    "portal_vein_and_splenic_vein": (42, 8), "heart": (40, 8),
    "pulmonary_vein": (40, 10), "liver": (55, 8), "spleen": (48, 7),
    "pancreas": (42, 8), "kidney_left": (33, 6), "kidney_right": (33, 6),
    "urinary_bladder": (10, 10), "stomach": (20, 15), "duodenum": (15, 15),
    "small_bowel": (10, 15), "colon": (-20, 25),
}

# IV-phase enhancement added on top (median shift, spread)
IV_PHASES = {
    "native": {},
    "arterial": {"aorta": (250, 60), "heart": (120, 40),
                 "pulmonary_vein": (150, 50), "kidney_left": (80, 30),
                 "kidney_right": (80, 30), "pancreas": (40, 15),
                 "spleen": (60, 25), "liver": (15, 10),
                 "portal_vein_and_splenic_vein": (40, 25),
                 "inferior_vena_cava": (20, 15)},
    "portal_venous": {"aorta": (90, 25), "heart": (80, 25),
                      "pulmonary_vein": (80, 25),
                      "portal_vein_and_splenic_vein": (110, 25),
                      "inferior_vena_cava": (80, 25), "liver": (55, 15),
                      "spleen": (70, 20), "pancreas": (45, 15),
                      "kidney_left": (100, 30), "kidney_right": (100, 30),
                      "urinary_bladder": (30, 40)},
}


def sample_study(rng: np.random.RandomState) -> tuple[np.ndarray, int]:
    """One phantom feature row (FEATURE_ORGANS x FEATURE_STATS) + GIT label."""
    phase = rng.choice(list(IV_PHASES))
    git = int(rng.uniform() < 0.5)
    row = []
    # oral contrast fills a random contiguous stretch of the GI tract
    # (transit state): stomach-first or colon-remnant patterns
    if git:
        n_filled = rng.randint(1, len(BOWEL) + 1)
        start = rng.randint(0, len(BOWEL) - n_filled + 1)
        filled = set(BOWEL[start:start + n_filled])
    else:
        filled = set()
    for organ in FEATURE_ORGANS:
        if rng.uniform() < 0.06:  # organ outside the field of view
            row.extend([np.nan] * len(FEATURE_STATS))
            continue
        med, spread = BASE_HU[organ]
        shift = IV_PHASES[phase].get(organ)
        if shift is not None:
            med = med + rng.normal(shift[0], shift[1] * 0.4)
        med = med + rng.normal(0, spread)
        std = abs(rng.normal(25, 10)) + 5
        if organ in filled:
            # oral contrast: lumen pushed high and heterogeneous (mixture
            # of contrast, gas and wall keeps the median lower than q75)
            boost = rng.uniform(80, 450)
            frac = rng.uniform(0.3, 0.9)  # lumen fraction in the mask
            med = med + boost * frac
            std = std + boost * 0.45
        q25 = med - std * 0.9 + rng.normal(0, 5)
        q75 = med + std * 0.9 + rng.normal(0, 5)
        mean = med + rng.normal(0, 4)
        row.extend({"mean": mean, "std": std, "median": med,
                    "q25": q25, "q75": q75}[s] for s in FEATURE_STATS)
    return np.array(row, np.float32), git


def main(n_samples: int = 4000, n_folds: int = 5) -> None:
    names = [f"{o}_{s}" for o in FEATURE_ORGANS for s in FEATURE_STATS]
    rng = np.random.RandomState(20260819)
    rows, labels = [], []
    for _ in range(n_samples):
        r, g = sample_study(rng)
        rows.append(r)
        labels.append(g)
    x = np.stack(rows)
    y = np.asarray(labels)
    # held-out sanity set
    xt, yt = x[-500:], y[-500:]
    x, y = x[:-500], y[:-500]
    accs = []
    for fold in range(n_folds):
        frng = np.random.RandomState(1000 + fold)
        keep = frng.uniform(size=len(y)) < 0.8
        doc = fit_gbtree(x[keep], y[keep], n_rounds=60, max_depth=3,
                         learning_rate=0.3, feature_names=names,
                         seed=fold)
        save_model_doc(doc, f"{OUT_STEM}.{fold}")
        from boa_tpu.compute.xgb import TreeEnsemble

        ens = TreeEnsemble.from_model_doc(doc)
        acc = float(((ens.predict(xt) > 0.5) == yt).mean())
        accs.append(acc)
        print(f"fold {fold}: held-out acc {acc:.3f} -> {OUT_STEM}.{fold}")
    assert min(accs) > 0.9, f"stand-in classifier too weak: {accs}"


if __name__ == "__main__":
    main()
