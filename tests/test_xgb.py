"""UBJSON decoder + XGBoost tree-walk scorer tests.

The scorer is validated three ways: UBJSON round-trip on hand-built
documents, decode of the vendored reference artifacts, and margin
consistency of the tree walk against a hand-evaluated toy tree.
"""

import struct

import numpy as np
import pytest

from boa_tpu.compute.xgb import (TreeEnsemble, load_fold_files,
                                 load_pickled_ensembles)
from boa_tpu.io import ubjson

RES = __import__("pathlib").Path("boa_tpu/resources")


# ------------------------------------------------------------- ubjson
def _key(s: str) -> bytes:
    return b"L" + struct.pack(">q", len(s)) + s.encode()


def _s(s: str) -> bytes:
    return b"S" + _key(s)


def test_ubjson_scalars_and_containers():
    doc = (b"{" + _key("a") + b"L" + struct.pack(">q", 42)
           + _key("b") + _s("hi")
           + _key("c") + b"[" + b"T" + b"F" + b"Z" + b"d"
           + struct.pack(">f", 1.5) + b"]"
           + _key("n") + b"D" + struct.pack(">d", -2.25)
           + b"}")
    out = ubjson.loads(doc)
    assert out == {"a": 42, "b": "hi", "c": [True, False, None, 1.5],
                   "n": -2.25}


def test_ubjson_typed_array():
    payload = np.array([1.5, -2.0, 3.25], ">f4").tobytes()
    doc = b"[$d#L" + struct.pack(">q", 3) + payload
    arr = ubjson.loads(doc)
    np.testing.assert_array_equal(arr, [1.5, -2.0, 3.25])


def test_ubjson_counted_object():
    doc = (b"{#i" + struct.pack(">b", 2)
           + _key("x") + b"i" + struct.pack(">b", 7)
           + _key("y") + b"i" + struct.pack(">b", -3))
    assert ubjson.loads(doc) == {"x": 7, "y": -3}


# ------------------------------------------------------------- tree walk
def _toy_tree():
    # node0: f0 < 1.0 ? leaf(-0.4) : leaf(0.6); missing goes right
    return {
        "split_indices": np.array([0, 0, 0], np.int32),
        "split_conditions": np.array([1.0, -0.4, 0.6], np.float32),
        "left_children": np.array([1, -1, -1], np.int32),
        "right_children": np.array([2, -1, -1], np.int32),
        "default_left": np.array([0, 0, 0], np.uint8),
        "categories": np.empty(0, np.int32),
    }


def test_tree_walk_margin_and_sigmoid():
    ens = TreeEnsemble([_toy_tree()], "binary:logistic", 0.5, 1)
    m = ens.predict_margin(np.array([[0.0], [2.0], [np.nan]]))
    np.testing.assert_allclose(m, [-0.4, 0.6, 0.6], atol=1e-6)
    p = ens.predict(np.array([[0.0]]))
    np.testing.assert_allclose(p, 1 / (1 + np.exp(0.4)), rtol=1e-6)
    assert ens.predict_label(np.array([[2.0]]))[0] == 1


def test_tree_walk_regression_base_score():
    ens = TreeEnsemble([_toy_tree()], "reg:squarederror", 10.0, 1)
    np.testing.assert_allclose(ens.predict(np.array([[0.0]])), [9.6])


# ------------------------------------------------------------- artifacts
@pytest.mark.skipif(not (RES / "modality_classifiers_2025_02_24.json.0").exists(),
                    reason="vendored artifacts missing")
def test_vendored_modality_folds_decode():
    folds = load_fold_files(RES / "modality_classifiers_2025_02_24.json")
    assert len(folds) == 5
    for f in folds:
        assert f.num_features == 4
        assert len(f._left) == 100  # 100 boosting rounds per fold
    # folds must disagree on nothing for extreme inputs
    ct = [[-400.0, 500.0, -1000.0, 2000.0]]
    assert all(f.predict_label(ct)[0] == 0 for f in folds)


@pytest.mark.skipif(not (RES / "contrast_phase_classifiers_2024_07_19.pkl").exists(),
                    reason="vendored artifacts missing")
def test_vendored_phase_pickle_decodes_without_xgboost():
    models = load_pickled_ensembles(
        RES / "contrast_phase_classifiers_2024_07_19.pkl")
    assert len(models) == 5
    for m in models.values():
        assert m.objective == "reg:squarederror"
        assert m.num_features == 20
    # monotonicity sanity: stronger aortic enhancement → later pi-time
    lo = np.full((1, 20), 40.0)
    hi = lo.copy()
    hi[0, 5] = 300.0  # aorta feature index
    mean_lo = np.mean([m.predict(lo)[0] for m in models.values()])
    mean_hi = np.mean([m.predict(hi)[0] for m in models.values()])
    assert mean_hi > mean_lo


# ------------------------------------------------- spec fixtures (hand-built)
def _leaf_pair(feature, cond, left_leaf, right_leaf, default_left):
    """One depth-1 tree: f[feature] < cond ? left_leaf : right_leaf."""
    return {
        "split_indices": np.array([feature, 0, 0], np.int32),
        "split_conditions": np.array([cond, left_leaf, right_leaf],
                                     np.float32),
        "left_children": np.array([1, -1, -1], np.int32),
        "right_children": np.array([2, -1, -1], np.int32),
        "default_left": np.array([1 if default_left else 0, 0, 0], np.uint8),
        "categories": np.empty(0, np.int32),
    }


def _model_doc(trees, objective, base_score, num_feature, num_class=0,
               tree_info=None):
    """Hand-built xgboost JSON model document (the UBJSON layout)."""
    def tree_json(t):
        return {k: (v.tolist() if hasattr(v, "tolist") else v)
                for k, v in t.items()}

    return {"learner": {
        "gradient_booster": {"name": "gbtree", "model": {
            "trees": [tree_json(t) for t in trees],
            "tree_info": tree_info if tree_info is not None
            else [0] * len(trees)}},
        "learner_model_param": {"base_score": str(base_score),
                                "num_feature": str(num_feature),
                                "num_class": str(num_class)},
        "objective": {"name": objective},
        "feature_names": [],
    }}


def test_missing_value_default_directions():
    """NaN follows the tree's stored default branch — a scorer that sends
    missing values to a fixed side fails one of the two trees."""
    t_left = _leaf_pair(0, 1.0, left_leaf=-1.0, right_leaf=+1.0,
                        default_left=True)
    t_right = _leaf_pair(0, 1.0, left_leaf=-10.0, right_leaf=+10.0,
                         default_left=False)
    ens = TreeEnsemble([t_left, t_right], "reg:squarederror", 0.0, 1)
    # NaN: tree1 -> left leaf (-1), tree2 -> right leaf (+10)
    np.testing.assert_allclose(
        ens.predict(np.array([[np.nan]])), [9.0], atol=1e-7)
    # non-missing sanity: both trees agree on direction
    np.testing.assert_allclose(
        ens.predict(np.array([[0.0], [5.0]])), [-11.0, 11.0], atol=1e-7)


def test_split_boundary_ties_go_right():
    """value == split_condition takes the RIGHT child (xgboost uses
    strictly-less for the left branch)."""
    ens = TreeEnsemble([_leaf_pair(0, 1.0, -1.0, +1.0, True)],
                       "reg:squarederror", 0.0, 1)
    below = float(np.nextafter(np.float32(1.0), np.float32(-np.inf)))
    np.testing.assert_allclose(  # features score in float32
        ens.predict(np.array([[1.0], [below]])),
        [+1.0, -1.0], atol=1e-7)


def test_base_score_is_probability_for_logistic():
    """binary:logistic stores base_score in probability space: with no
    informative trees the prediction equals base_score exactly (the margin
    is its logit)."""
    zero_tree = _leaf_pair(0, 0.5, 0.0, 0.0, True)
    ens = TreeEnsemble([zero_tree], "binary:logistic", 0.25, 1)
    np.testing.assert_allclose(ens.predict(np.array([[3.0]])), [0.25],
                               rtol=1e-7)
    # and in margin space: log(0.25/0.75)
    np.testing.assert_allclose(ens.predict_margin(np.array([[3.0]])),
                               [np.log(0.25 / 0.75)], rtol=1e-7)
    # regression keeps base_score in identity space
    ens_r = TreeEnsemble([zero_tree], "reg:squarederror", 0.25, 1)
    np.testing.assert_allclose(ens_r.predict(np.array([[3.0]])), [0.25],
                               rtol=1e-7)


def test_multiclass_softprob_aggregation():
    """multi:softprob: trees interleave per class (tree_info), per-class
    margins = base_score + class trees, softmax link, argmax labels —
    checked against pen-and-paper softmax."""
    # 3 classes x 2 rounds; class k's trees contribute +k and +0.1*k
    trees, info = [], []
    for rnd in range(2):
        for k in range(3):
            w = (1.0 if rnd == 0 else 0.1) * k
            trees.append(_leaf_pair(0, 100.0, w, w, True))
            info.append(k)
    doc = _model_doc(trees, "multi:softprob", 0.5, 1, num_class=3,
                     tree_info=info)
    ens = TreeEnsemble.from_model_doc(doc)
    probs = ens.predict(np.array([[0.0]]))
    margins = np.array([0.5, 0.5 + 1.1, 0.5 + 2.2])
    expect = np.exp(margins - margins.max())
    expect /= expect.sum()
    np.testing.assert_allclose(probs[0], expect, rtol=1e-7)
    assert ens.predict_label(np.array([[0.0]]))[0] == 2
    # missing tree_info on a multiclass doc must be loud
    bad = _model_doc(trees, "multi:softprob", 0.5, 1, num_class=3)
    bad["learner"]["gradient_booster"]["model"].pop("tree_info")
    with pytest.raises(ValueError, match="tree_info"):
        TreeEnsemble.from_model_doc(bad)


# --------------------------------------------- pickle-vs-UBJSON cross-check
def _craft_xgb_pickle(path, blobs: dict):
    """Pickle that mimics xgboost sklearn wrappers ({fold: XGBRegressor
    with ._Booster.handle = raw model bytes}) WITHOUT xgboost installed:
    fake modules exist only while pickling; loading goes through the
    stub unpickler."""
    import pickle
    import sys
    import types

    mod = types.ModuleType("xgboost")
    core = types.ModuleType("xgboost.core")

    class Booster:
        pass

    class XGBRegressor:
        pass

    Booster.__module__ = "xgboost.core"
    Booster.__qualname__ = "Booster"
    XGBRegressor.__module__ = "xgboost"
    XGBRegressor.__qualname__ = "XGBRegressor"
    core.Booster = Booster
    mod.XGBRegressor = XGBRegressor
    mod.core = core
    sys.modules["xgboost"] = mod
    sys.modules["xgboost.core"] = core
    try:
        d = {}
        for key, blob in blobs.items():
            b = Booster()
            b.handle = blob
            est = XGBRegressor()
            est._Booster = b
            d[key] = est
        path.write_bytes(pickle.dumps(d))
    finally:
        del sys.modules["xgboost"]
        del sys.modules["xgboost.core"]
    assert "xgboost" not in sys.modules


@pytest.mark.skipif(not (RES / "modality_classifiers_2025_02_24.json.0").exists(),
                    reason="vendored artifacts missing")
def test_pickle_vs_ubjson_paths_agree_on_vendored_folds(tmp_path, rng):
    """The same 5 vendored modality fold models scored through BOTH
    ingestion paths (fold files vs pickled-wrapper recovery) agree."""
    blobs = {f: (RES / f"modality_classifiers_2025_02_24.json.{f}"
                 ).read_bytes() for f in range(5)}
    pkl = tmp_path / "wrapped.pkl"
    _craft_xgb_pickle(pkl, blobs)

    via_files = load_fold_files(RES / "modality_classifiers_2025_02_24.json")
    via_pickle = load_pickled_ensembles(pkl)
    x = rng.normal(0, 500, (16, 4)).astype(np.float32)
    x[3, 1] = np.nan  # exercise default directions too
    for f in range(5):
        np.testing.assert_allclose(via_files[f].predict(x),
                                   via_pickle[f].predict(x), atol=1e-6)
        np.testing.assert_array_equal(via_files[f].predict_label(x),
                                      via_pickle[f].predict_label(x))


def test_crafted_pickle_json_blob_roundtrip(tmp_path):
    """A hand-built JSON model document survives the pickled-wrapper path
    byte-exactly (load_auto JSON branch)."""
    import json

    doc = _model_doc([_leaf_pair(0, 1.0, -0.5, 0.5, False)],
                     "binary:logistic", 0.5, 1)
    pkl = tmp_path / "toy.pkl"
    _craft_xgb_pickle(pkl, {0: json.dumps(doc).encode()})
    ens = load_pickled_ensembles(pkl)[0]
    np.testing.assert_allclose(ens.predict(np.array([[2.0], [np.nan]])),
                               [1 / (1 + np.exp(-0.5))] * 2, rtol=1e-7)


# ------------------------------------------------------- phase-band oracle
@pytest.mark.skipif(not (RES / "contrast_phase_classifiers_2024_07_19.pkl").exists(),
                    reason="vendored artifacts missing")
def test_phase_bands_on_crafted_organ_vectors():
    """Crafted organ-HU vectors land in the physiologically-correct
    pi-time bands of `pi_time_to_phase` (totalseg_get_phase.py:23-55)."""
    from boa_tpu.tools.get_phase import (PHASE_ORGANS, PHASE_ORGANS_HN,
                                         pi_time_to_phase)

    models = list(load_pickled_ensembles(
        RES / "contrast_phase_classifiers_2024_07_19.pkl").values())
    organs = PHASE_ORGANS + PHASE_ORGANS_HN

    def vec(**kw):
        base = {o: 40.0 for o in organs}
        base.update(brain=35.0, colon=30.0, small_bowel=30.0)
        base.update(kw)
        return np.array([[base[o] for o in organs]])

    def mean_pi(v):
        return float(np.mean([m.predict(v)[0] for m in models]))

    native = vec()
    arterial = vec(aorta=350.0, heart=200.0, iliac_artery_left=320.0,
                   iliac_artery_right=320.0,
                   internal_carotid_artery_right=300.0,
                   internal_carotid_artery_left=300.0,
                   portal_vein_and_splenic_vein=60.0,
                   inferior_vena_cava=60.0, liver=60.0)
    venous = vec(aorta=140.0, heart=130.0,
                 portal_vein_and_splenic_vein=160.0,
                 inferior_vena_cava=130.0, liver=110.0,
                 iliac_vena_left=130.0, iliac_vena_right=130.0,
                 internal_jugular_vein_right=140.0,
                 internal_jugular_vein_left=140.0)
    assert pi_time_to_phase(mean_pi(native))[0] == "native"
    assert pi_time_to_phase(mean_pi(arterial))[0].startswith("arterial")
    assert pi_time_to_phase(mean_pi(venous))[0] == "portal_venous"
    assert mean_pi(native) < mean_pi(arterial) < mean_pi(venous)


@pytest.mark.skipif(
    not (RES / "modality_classifiers_normalized_2025_02_24.json.0").exists(),
    reason="vendored artifacts missing")
def test_vendored_normalized_modality_folds_decode():
    folds = load_fold_files(RES / "modality_classifiers_normalized_2025_02_24.json")
    assert len(folds) == 5
    for f in folds:
        assert f.num_features == 16  # the 16 ROI-median features


def test_get_modality_from_rois_pipeline():
    """Plumbing test of the normalized-intensity modality path
    (`totalseg_get_modality.py:67-111`): fake total_mr labels on a small
    volume -> 16 normalized ROI medians in reference order -> 5-fold vote."""
    import numpy as np

    from boa_tpu.io.nifti import NiftiImage
    from boa_tpu.tasks import class_maps
    from boa_tpu.tools.get_modality import ROI_ORGANS, get_modality_from_rois

    cm = class_maps.get_class_map("total_mr")
    inv = {v: k for k, v in cm.items()}
    organ_labels = [k for k, v in cm.items() if v in ROI_ORGANS]

    rng = np.random.default_rng(3)
    vol = rng.integers(0, 800, (40, 40, 32)).astype(np.int16)

    def fake(data, spacing, task_id):
        seg = np.zeros(data.shape, np.uint8)
        flat = seg.reshape(-1)
        # one 64-voxel block per organ so every ROI has a median
        for i, lb in enumerate(sorted(organ_labels)):
            flat[i * 64:(i + 1) * 64] = lb
        return seg

    fake.wants_volume = False
    img = NiftiImage(data=vol, affine=np.diag([1.5, 1.5, 3.0, 1.0]))
    res = get_modality_from_rois(img, fake_predict=fake)
    assert res["modality"] in ("ct", "mr")
    assert 0.5 <= res["probability"] <= 1.0
    assert len(res["features"]) == 16
    # normalized medians live in [0, 1]
    assert all(0.0 <= f <= 1.0 for f in res["features"])
    # feature order follows ROI_ORGANS, and labels were all present
    assert set(cm[lb] for lb in organ_labels) == set(ROI_ORGANS)
    assert inv["brain"] in organ_labels
