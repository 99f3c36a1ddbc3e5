"""GBM fitter + trained GIT-contrast stand-in.

Parity target: `body_organ_analysis/commands.py:216-241` — the info
sheet's GIT column comes from a trained model artifact; the heuristic is a
documented fallback only.
"""

import numpy as np
import pytest

from boa_tpu.compute.gbm import fit_gbtree, save_model_doc
from boa_tpu.compute.xgb import TreeEnsemble


def test_fit_gbtree_learns_and_roundtrips(tmp_path):
    # local fixed seed: the session-scoped `rng` fixture's state depends on
    # which tests ran before, and the 0.95 accuracy bound is tight enough
    # that an unlucky draw flakes the assertion (seen in full-suite runs)
    rng = np.random.default_rng(7)
    x = rng.normal(0, 1, (500, 6)).astype(np.float32)
    y = ((x[:, 0] + 0.5 * x[:, 2]) > 0).astype(int)
    doc = fit_gbtree(x, y, n_rounds=30, max_depth=3)
    ens = TreeEnsemble.from_model_doc(doc)
    xt = rng.normal(0, 1, (300, 6)).astype(np.float32)
    yt = ((xt[:, 0] + 0.5 * xt[:, 2]) > 0).astype(int)
    assert ((ens.predict(xt) > 0.5) == yt).mean() > 0.95
    # the JSON artifact round-trips through the file loader byte-exactly
    save_model_doc(doc, tmp_path / "m.json.0")
    from boa_tpu.compute.xgb import load_fold_files

    ens2 = load_fold_files(tmp_path / "m.json")[0]
    np.testing.assert_allclose(ens2.predict(xt), ens.predict(xt))


def test_fit_gbtree_learns_missing_value_direction(rng):
    """When missingness itself carries the label, the learned default
    directions route NaN to the right leaf."""
    n = 600
    x = rng.normal(0, 1, (n, 2)).astype(np.float32)
    y = (rng.uniform(size=n) < 0.5).astype(int)
    x[y == 1, 0] = np.nan  # feature 0 missing iff positive
    doc = fit_gbtree(x, y, n_rounds=10, max_depth=2)
    ens = TreeEnsemble.from_model_doc(doc)
    p_nan = float(ens.predict(np.array([[np.nan, 0.0]]))[0])
    p_val = float(ens.predict(np.array([[0.0, 0.0]]))[0])
    assert p_nan > 0.9 and p_val < 0.1


def _phantom_feats(git: bool) -> dict:
    from boa_tpu.compute.contrast import FEATURE_ORGANS, FEATURE_STATS

    feats = {}
    for organ in FEATURE_ORGANS:
        med = {"colon": -20.0, "small_bowel": 10.0, "stomach": 20.0,
               "duodenum": 15.0}.get(organ, 45.0)
        std = 25.0
        if git and organ in ("stomach", "duodenum", "small_bowel", "colon"):
            med += 250.0
            std += 110.0
        vals = {"mean": med, "std": std, "median": med,
                "q25": med - std, "q75": med + std}
        for s in FEATURE_STATS:
            feats[f"{organ}_{s}"] = vals[s]
    return feats


def test_git_prediction_uses_vendored_model(monkeypatch):
    from boa_tpu.compute import contrast

    monkeypatch.delenv("BOA_GIT_MODEL", raising=False)
    folds = contrast._git_ensemble()
    assert folds is not None and len(folds) == 5

    pos, p_pos = contrast._git_from_features(_phantom_feats(git=True))
    neg, p_neg = contrast._git_from_features(_phantom_feats(git=False))
    assert pos == 1 and neg == 0
    assert p_pos > 0.8 and p_neg < 0.2


def test_git_heuristic_optout_and_byo(monkeypatch, tmp_path):
    from boa_tpu.compute import contrast

    monkeypatch.setenv("BOA_GIT_MODEL", "heuristic")
    assert contrast._git_ensemble() is None
    # the heuristic still decides sensibly
    idx, prob = contrast._git_from_features(_phantom_feats(git=True))
    assert idx == 1
    # a typo'd BYO stem fails loudly instead of degrading silently
    monkeypatch.setenv("BOA_GIT_MODEL", str(tmp_path / "nope"))
    with pytest.raises(FileNotFoundError, match="BOA_GIT_MODEL"):
        contrast._git_ensemble()
    # a real BYO stem is honored
    import json

    x = np.zeros((40, 75), np.float32)
    y = np.zeros(40, int)
    x[20:, 0] = 5.0
    y[20:] = 1
    doc = fit_gbtree(x, y, n_rounds=5, max_depth=1)
    (tmp_path / "byo.json.0").write_text(json.dumps(doc))
    monkeypatch.setenv("BOA_GIT_MODEL", str(tmp_path / "byo.json"))
    assert len(contrast._git_ensemble()) == 1


def test_predict_git_column_comes_from_model(tmp_path, monkeypatch, rng):
    """contrast.predict end-to-end (voxel-pass path): the GIT output is
    the fold-ensemble probability, not the bowel-q75 sigmoid."""
    from boa_tpu.compute import contrast
    from boa_tpu.io import nifti
    from boa_tpu.tasks import class_maps

    monkeypatch.delenv("BOA_GIT_MODEL", raising=False)
    labels = {name: lb for lb, name in
              class_maps.get_class_map("total").items()}
    shape = (40, 40, 40)
    ct = rng.normal(40, 10, shape).astype(np.float32)
    seg = np.zeros(shape, np.uint8)
    # paint a few organs incl. contrast-filled bowel
    def paint(name, sl, hu, spread):
        lb = labels[name]
        seg[sl] = lb
        ct[sl] = rng.normal(hu, spread, ct[sl].shape)

    paint("aorta", np.s_[2:6, 2:6, :], 45, 8)
    paint("liver", np.s_[10:20, 10:20, 5:20], 55, 8)
    paint("colon", np.s_[25:35, 25:35, 5:30], 260, 120)
    paint("stomach", np.s_[8:14, 25:33, 8:20], 280, 120)
    nifti.save(nifti.NiftiImage(data=ct, affine=np.eye(4)),
               tmp_path / "image.nii.gz")
    nifti.save(nifti.NiftiImage(data=seg, affine=np.eye(4)),
               tmp_path / "total.nii.gz")
    out = contrast.predict(tmp_path / "image.nii.gz", tmp_path)
    assert out["git_ensemble_predicted_class"] is True
    assert out["git_ensemble_prediction"] > 0.5


def test_vendored_git_folds_heldout_protocol_sweep():
    """VERDICT r3 #8: evaluate the VENDORED stand-in folds on a held-out
    synthetic protocol sweep (fresh seed, disjoint from training) and
    publish per-protocol accuracy + the confusion matrix. The numbers
    below are also recorded in PARITY.md."""
    import importlib.util
    from pathlib import Path

    from boa_tpu.compute.xgb import load_fold_files

    folds_path = Path("boa_tpu/resources/git_contrast_classifiers_boa_tpu.json")
    if not folds_path.with_suffix(".json.0").exists():
        pytest.skip("vendored GIT folds missing")
    spec = importlib.util.spec_from_file_location(
        "train_git", Path("tools/train_git_classifier.py"))
    tg = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tg)

    folds = load_fold_files(folds_path)

    def score(x):
        return float(np.mean([f.predict(x[None])[0] for f in folds])) > 0.5

    rng = np.random.RandomState(777)  # != training seed 20260819
    confusion = np.zeros((2, 2), int)
    per_phase = {}
    for phase in tg.IV_PHASES:
        hits = tot = 0
        for _ in range(120):
            # force this phase by rejection (sample_study draws uniformly)
            while True:
                state = rng.get_state()
                row, git = tg.sample_study(rng)
                rng.set_state(state)
                drawn = rng.choice(list(tg.IV_PHASES))
                tg_row, git = tg.sample_study(rng) if drawn == phase else (None, None)
                if tg_row is not None:
                    row = tg_row
                    break
            pred = int(score(row))
            confusion[git, pred] += 1
            hits += int(pred == git)
            tot += 1
        per_phase[phase] = hits / tot
    overall = confusion.trace() / confusion.sum()
    print(f"GIT stand-in held-out sweep: overall={overall:.3f} "
          f"per-phase={per_phase} confusion={confusion.tolist()}")
    assert overall >= 0.90, (overall, per_phase, confusion.tolist())
    for phase, acc in per_phase.items():
        assert acc >= 0.80, (phase, acc, confusion.tolist())


def test_info_sheet_carries_standin_marker(monkeypatch, tmp_path):
    """The Excel info sheet must say LOUDLY that the GIT prediction comes
    from the synthetic stand-in (never silently clinical-looking)."""
    from boa_tpu import commands
    from boa_tpu.compute import contrast

    monkeypatch.setattr(
        contrast, "predict",
        lambda **kw: {"phase_ensemble_predicted_class": "native",
                      "phase_ensemble_prediction": 0,
                      "git_ensemble_predicted_class": False,
                      "git_ensemble_prediction": 0.1,
                      "git_classifier_is_standin": True,
                      "features": {}})
    info, stats = [], {}
    commands._predict_contrast(tmp_path / "ct.nii.gz", tmp_path, info, stats)
    names = {r["name"]: r["value"] for r in info}
    assert "PredictedContrastInGITNote" in names
    assert "NOT clinically validated" in names["PredictedContrastInGITNote"]
