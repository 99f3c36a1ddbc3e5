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
