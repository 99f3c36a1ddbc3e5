"""Training data pipeline: case store, oversampling loader, device
augmentation, end-to-end run_training smoke."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from boa_tpu.train.augment import augment_batch, mirror, spatial_transform
from boa_tpu.train.dataloader import DataLoader, oversample_flags
from boa_tpu.train.dataset import CaseStore, sample_class_locations


@pytest.fixture()
def store(tmp_path, rng):
    st = CaseStore(tmp_path / "cases")
    for i in range(3):
        shape = (20 + i, 18, 16)
        data = rng.normal(size=shape).astype(np.float32)
        seg = np.zeros(shape, np.int8)
        seg[5:9, 5:9, 5:9] = 1
        seg[12:15, 10:13, 8:12] = 2
        st.save_case(f"case_{i}", data, seg)
    return st


def test_case_store_roundtrip(store):
    assert store.case_ids() == ["case_0", "case_1", "case_2"]
    c = store.load_case("case_0")
    assert c.data.shape == (1, 20, 18, 16)
    assert set(c.class_locations) == {1, 2}
    assert (c.class_locations[1] >= 0).all()
    # every stored location actually is that class
    locs = c.class_locations[2]
    vals = np.asarray(c.seg)[locs[:, 0], locs[:, 1], locs[:, 2]]
    assert (vals == 2).all()


def test_class_locations_cap(rng):
    seg = np.ones((40, 40, 40), np.int8)
    # min_percent_coverage: 1% of 64000 voxels (640) beats the 500 cap
    # (reference target = max(min(cap, n), ceil(n * 0.01)))
    locs = sample_class_locations(seg, [1], max_per_class=500)
    assert len(locs[1]) == 640
    # small classes still honor the flat cap
    seg2 = np.zeros((40, 40, 40), np.int8)
    seg2[:20, :20, :2] = 1  # 800 voxels; 1% = 8 < 500
    locs2 = sample_class_locations(seg2, [1], max_per_class=500)
    assert len(locs2[1]) == 500


def test_oversample_flags():
    # round rule: batch 2 p=0.33 -> exactly 1 forced-fg (reference comment
    # "an oversample of 0.33 with a batch size of 2 will be rounded to 0.5")
    assert oversample_flags(2, 0.33) == [False, True]
    assert oversample_flags(3, 0.33) == [False, False, True]
    assert sum(oversample_flags(9, 0.33)) == 3


def test_dataloader_batches(store):
    dl = DataLoader(store, (12, 12, 12), batch_size=4, seed=1)
    x, y = dl.next_batch()
    assert x.shape == (4, 12, 12, 12, 1) and x.dtype == np.float32
    assert y.shape == (4, 12, 12, 12) and y.dtype == np.int32
    # forced-fg samples must contain foreground
    flags = dl.oversample
    for i, f in enumerate(flags):
        if f:
            assert (y[i] > 0).any()


def test_dataloader_patch_larger_than_case(store):
    dl = DataLoader(store, (32, 32, 32), batch_size=2, seed=0)
    x, y = dl.next_batch()
    assert x.shape == (2, 32, 32, 32, 1)
    # oob seg is padded with -1 internally (reference semantics) but the
    # batch remaps it to background like RemoveLabelTransform(-1, 0) —
    # a -1 target would gather the LAST class's CE log-prob
    assert (y >= 0).all()
    dp, sp, pp = dl._sample_patch(dl._case(dl.case_ids[0]), False)
    assert (sp == -1).any()
    assert pp is None  # prev-seg patch only exists in cascade mode


def test_augment_shapes_and_determinism(store):
    dl = DataLoader(store, (12, 12, 12), batch_size=2, seed=3)
    x, y = dl.next_batch()
    key = jax.random.PRNGKey(0)
    x1, y1 = augment_batch(key, jnp.asarray(x), jnp.asarray(y))
    x2, y2 = augment_batch(key, jnp.asarray(x), jnp.asarray(y))
    assert x1.shape == x.shape and y1.shape == y.shape
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    assert np.isfinite(np.asarray(x1)).all()
    # labels stay labels
    assert set(np.unique(np.asarray(y1))) <= {-1, 0, 1, 2}


def test_spatial_transform_identity_prob0(rng):
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 8, 1)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 3, size=(1, 8, 8, 8)))
    key = jax.random.PRNGKey(0)
    xo, yo = spatial_transform(key, x, y, p_rotation=0.0, p_scaling=0.0)
    np.testing.assert_allclose(np.asarray(xo), np.asarray(x), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(yo), np.asarray(y))


def test_mirror_transform(rng):
    x = jnp.asarray(rng.normal(size=(2, 6, 6, 6, 1)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 2, size=(2, 6, 6, 6)))
    xo, yo = mirror(jax.random.PRNGKey(1), x, y, axes=(0,), p=1.0)
    np.testing.assert_allclose(np.asarray(xo),
                               np.asarray(jnp.flip(x, 1)), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(yo), np.asarray(jnp.flip(y, 1)))


def test_run_training_smoke(store, tmp_path):
    from boa_tpu.train.run_training import run_training

    last = run_training(store.root, tmp_path / "train_out",
                        patch=(8, 8, 8), batch_size=2, epochs=2, iters=3,
                        augment=True, seed=0)
    assert last["epoch"] == 1
    assert np.isfinite(last["loss"])
    assert (tmp_path / "train_out" / "checkpoint_final.pkl").exists()
    assert (tmp_path / "train_out" / "training_log.json").exists()
    # resume continues from epoch 2
    last2 = run_training(store.root, tmp_path / "train_out",
                         patch=(8, 8, 8), batch_size=2, epochs=3, iters=3,
                         resume=True, augment=False, seed=0)
    assert last2["epoch"] == 2


def test_generate_splits_kfold_semantics():
    """splits are deterministic, disjoint, covering, and match sklearn
    KFold(shuffle=True, random_state=12345) over sorted keys
    (nnUNetTrainer.do_split)."""
    from boa_tpu.train.dataset import generate_splits

    ids = [f"case_{i:02d}" for i in range(11)]
    s1 = generate_splits(ids)
    s2 = generate_splits(list(reversed(ids)))  # input order must not matter
    assert s1 == s2
    assert len(s1) == 5
    all_val = [c for sp in s1 for c in sp["val"]]
    assert sorted(all_val) == sorted(ids)          # each case in exactly
    assert len(set(all_val)) == len(ids)           # one val fold
    for sp in s1:
        assert sorted(sp["train"] + sp["val"]) == sorted(ids)
        assert not set(sp["train"]) & set(sp["val"])
    # first 11 % 5 = 1 fold gets the extra case (KFold fold sizing)
    assert [len(sp["val"]) for sp in s1] == [3, 2, 2, 2, 2]
    try:
        from sklearn.model_selection import KFold
    except ImportError:
        return
    keys = np.sort(np.asarray(ids))
    for sp, (tr, te) in zip(s1, KFold(n_splits=5, shuffle=True,
                                      random_state=12345).split(keys)):
        assert sp["val"] == [str(k) for k in keys[te]]
        assert sp["train"] == [str(k) for k in keys[tr]]


def test_fold_training_and_validation(store, tmp_path):
    """fold-restricted training + the final validation pass
    (nnUNetTrainer.perform_actual_validation): per-case segs + summary."""
    import json

    from boa_tpu.train.run_training import run_training

    out = tmp_path / "fold_out"
    last = run_training(store.root, out, patch=(8, 8, 8), batch_size=2,
                        epochs=1, iters=2, augment=False, seed=0,
                        fold=0, validate=True)
    splits = json.loads((store.root / "splits_final.json").read_text())
    val_ids = splits[0]["val"]
    assert val_ids  # the split was created and persisted
    for cid in val_ids:
        assert (out / "validation" / f"{cid}.nii.gz").exists()
    summary = json.loads((out / "validation" / "summary.json").read_text())
    assert set(summary["metric_per_case"]) == set(val_ids)
    assert "foreground_mean" in summary
    assert last["validation"]["metric_per_case"]


def test_pretrained_weight_transfer(store, tmp_path):
    """--pretrained_weights copies encoder/decoder, keeps fresh seg heads,
    and rejects incompatible architectures
    (nnunetv2/run/load_pretrained_weights.py:7-62)."""
    import pickle

    import jax

    from boa_tpu.train.run_training import (build_trainer,
                                            load_pretrained_weights,
                                            run_training)

    src_out = tmp_path / "src"
    run_training(store.root, src_out, patch=(8, 8, 8), batch_size=2,
                 epochs=1, iters=2, augment=False, seed=0)
    ckpt = src_out / "checkpoint_final.pkl"
    with open(ckpt, "rb") as f:
        src_params = pickle.load(f)["params"]

    # new model with MORE classes: encoder/decoder transfer, heads differ
    trainer, _, _ = build_trainer(tmp_path / "dst", (8, 8, 8),
                               num_classes=5, epochs=1, iters=1)
    fresh_heads = jax.tree.map(np.asarray, trainer.state.params["seg_heads"])
    loaded = load_pretrained_weights(trainer.state.params, ckpt)
    for a, b in zip(jax.tree.leaves(loaded["encoder"]),
                    jax.tree.leaves(src_params["encoder"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(loaded["seg_heads"]),
                    jax.tree.leaves(fresh_heads)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # incompatible width -> loud failure
    bad, _, _ = build_trainer(tmp_path / "bad", (8, 8, 8),
                           num_classes=3, features=(6, 12, 24), epochs=1,
                           iters=1)
    with pytest.raises(ValueError, match="not compatible|incompatible"):
        load_pretrained_weights(bad.state.params, ckpt)
