"""Cascade execution end-to-end: lowres training -> predicted_next_stage ->
cascade-fullres training with one-hot prev-stage inputs -> chained
prediction.

Parity targets: `nnUNetTrainer.py:137,646-652,802-829` (cascade trainer),
`predict_from_raw_data.py:168-205,249-252` (folder_with_segs_from_prev_stage),
`nnUNetTrainer.py:1251-1337` (predicted_next_stage export).
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from boa_tpu.train.dataset import CaseStore


def _make_case(rng, shape=(24, 24, 24)):
    vol = rng.normal(60.0, 30.0, shape).astype(np.float32)
    seg = np.zeros(shape, np.int8)
    seg[6:14, 6:14, 6:14] = 1
    seg[15:21, 15:21, 15:21] = 2
    vol[seg == 1] += 90.0
    vol[seg == 2] -= 110.0
    return vol, seg


@pytest.fixture()
def stores(tmp_path, rng):
    """(fullres store, lowres store) over the same 2 cases; the lowres
    grid is a 2x downsample of the fullres one."""
    full = CaseStore(tmp_path / "cases")
    low = CaseStore(tmp_path / "cases_3d_lowres")
    for i in range(2):
        vol, seg = _make_case(rng)
        full.save_case(f"c{i}", vol, seg)
        low.save_case(f"c{i}", vol[::2, ::2, ::2], seg[::2, ::2, ::2])
    return full, low


def test_cascade_training_chain(stores, tmp_path):
    """lowres train -> predict_next_stage -> cascade train consumes the
    one-hot prev channels (input_channels grows by n_fg) and trains."""
    from boa_tpu.train.cascade import predict_next_stage
    from boa_tpu.train.run_training import build_trainer, run_training
    from boa_tpu.train.dataloader import DataLoader

    full, low = stores

    # tiny lowres model, trained a step (weights only need to exist)
    trainer, _, _ = build_trainer(tmp_path / "low_out", (8, 8, 8),
                                  num_classes=3, features=(4, 8),
                                  epochs=1, iters=2)
    loader = DataLoader(low, (8, 8, 8), batch_size=2, seed=0)
    trainer.train_epoch(iter(loader), n_iters=2)

    done = predict_next_stage(trainer.state.params, trainer.cfg.arch,
                              low, full, (8, 8, 8))
    assert done == ["c0", "c1"]
    assert full.has_prev_segs()
    c = full.load_case("c0")
    assert c.prev_seg is not None and c.prev_seg.shape == c.seg.shape

    # cascade DataLoader carries the prev patch; refuses without prev segs
    with pytest.raises(ValueError, match="previous-stage"):
        DataLoader(low, (8, 8, 8), batch_size=2, cascade=True)
    casc_loader = DataLoader(full, (8, 8, 8), batch_size=2, cascade=True,
                             seed=0)
    x, y, prev = casc_loader.next_batch()
    assert x.shape == (2, 8, 8, 8, 1) and prev.shape == (2, 8, 8, 8)

    # cascade train step end-to-end (augmented: one-hot + binary noise)
    last = run_training(full.root, tmp_path / "casc_out", patch=(8, 8, 8),
                        batch_size=2, epochs=1, iters=2, augment=True,
                        seed=0, cascade=True)
    assert np.isfinite(last["loss"])
    import pickle

    blob = pickle.loads((tmp_path / "casc_out"
                         / "checkpoint_final.pkl").read_bytes())
    # some encoder conv kernel consumed 1 data + 2 one-hot input channels
    shapes = {tuple(x.shape) for x in jax.tree.leaves(blob["params"])}
    assert any(s[-2] == 3 for s in shapes if len(s) == 5), \
        f"no conv kernel with 3 input channels found in {sorted(shapes)[:5]}"


def test_cascade_augment_consumes_prev(rng):
    """augment_batch_cascade appends len(fg) one-hot channels warped with
    the labels; different prev segs produce different network inputs."""
    from boa_tpu.train.augment import augment_batch_cascade

    x = jnp.asarray(rng.normal(size=(2, 8, 8, 8, 1)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 3, (2, 8, 8, 8)).astype(np.int32))
    prev = jnp.asarray(rng.integers(0, 3, (2, 8, 8, 8)).astype(np.int32))
    key = jax.random.PRNGKey(0)
    xa, ya = augment_batch_cascade(key, x, y, prev, (1, 2))
    assert xa.shape == (2, 8, 8, 8, 3)
    assert ya.shape == (2, 8, 8, 8) and ya.dtype == jnp.int32
    xb, _ = augment_batch_cascade(key, x, y, jnp.zeros_like(prev), (1, 2))
    assert not np.array_equal(np.asarray(xa), np.asarray(xb))
    # all-background prev -> all-zero one-hot channels
    assert np.all(np.asarray(xb)[..., 1:] == 0)


def test_cascade_component_dropout(rng):
    from boa_tpu.train.dataloader import cascade_component_dropout

    prev = np.zeros((12, 12, 12), np.int32)
    prev[1:3, 1:3, 1:3] = 1     # small component (dropable)
    prev[8:11, 8:11, 8:11] = 1  # second component
    prev[5:7, 5:7, 5:7] = 2
    out = cascade_component_dropout(prev, np.random.RandomState(0), p=1.0)
    # with p=1 every label loses exactly one component (both fit <=15%)
    assert (out == 1).sum() < (prev == 1).sum()
    assert (out == 2).sum() == 0
    # a component covering >15% of the patch is never dropped
    big = np.zeros((8, 8, 8), np.int32)
    big[:6, :6, :6] = 1
    out2 = cascade_component_dropout(big, np.random.RandomState(0), p=1.0)
    np.testing.assert_array_equal(out2, big)


def _cascade_plans(tmp_path):
    """plans/dataset dicts with 3d_fullres + 3d_lowres + 3d_cascade_fullres."""
    from boa_tpu.plans.plans import synthetic_plans

    mp = synthetic_plans(num_classes=3, patch_size=(8, 8, 8),
                         spacing=(2.0, 2.0, 2.0), features=(4, 8))
    plans = mp.plans
    low = dict(plans["configurations"]["3d_fullres"])
    low["spacing"] = [4.0, 4.0, 4.0]
    low["next_stage"] = "3d_cascade_fullres"
    plans["configurations"]["3d_lowres"] = low
    plans["configurations"]["3d_cascade_fullres"] = {
        "inherits_from": "3d_fullres",
        "previous_stage": "3d_lowres",
    }
    return plans, mp.dataset


def test_plans_cascade_properties(tmp_path):
    from boa_tpu.plans.plans import ModelPlans

    plans, dataset = _cascade_plans(tmp_path)
    casc = ModelPlans(plans=plans, dataset=dataset,
                      configuration_name="3d_cascade_fullres")
    assert casc.previous_stage == "3d_lowres"
    assert casc.foreground_labels == [1, 2]
    assert casc.num_input_channels == 3  # 1 CT + 2 one-hot
    low = ModelPlans(plans=plans, dataset=dataset,
                     configuration_name="3d_lowres")
    assert low.previous_stage is None
    assert low.next_stage_names == ["3d_cascade_fullres"]
    assert low.num_input_channels == 1


def test_predictor_cascade_input(tmp_path, rng):
    """Predictor: cascade config demands prev_seg_xyz, appends one-hot
    channels after resample, and the prev seg influences the output."""
    from boa_tpu.inference.predictor import Predictor
    from boa_tpu.inference.sliding_window import stack_fold_params
    from boa_tpu.models.unet import init_unet
    from boa_tpu.plans.plans import ModelPlans

    plans, dataset = _cascade_plans(tmp_path)
    casc = ModelPlans(plans=plans, dataset=dataset,
                      configuration_name="3d_cascade_fullres")
    cfg = casc.arch_config()
    assert cfg.input_channels == 3
    params = init_unet(jax.random.PRNGKey(0), cfg)
    pred = Predictor(plans=casc,
                     stacked_params=stack_fold_params([params]))

    vol, seg = _make_case(rng, (20, 20, 20))
    with pytest.raises(ValueError, match="cascade"):
        pred.predict(vol, (2.0, 2.0, 2.0))
    with pytest.raises(ValueError, match="shape"):
        pred.predict(vol, (2.0, 2.0, 2.0),
                     prev_seg_xyz=np.zeros((4, 4, 4), np.uint8))

    seg_a = pred.predict(vol, (2.0, 2.0, 2.0), prev_seg_xyz=seg)
    assert seg_a.shape == vol.shape
    # the one-hot inputs are consumed: a different prev seg changes logits
    seg_b = pred.predict(vol, (2.0, 2.0, 2.0),
                         prev_seg_xyz=np.zeros_like(seg))
    assert not np.array_equal(seg_a, seg_b)

    # spacing mismatch exercises the nearest-resample of the prev seg
    seg_c = pred.predict(vol, (3.0, 3.0, 3.0), prev_seg_xyz=seg)
    assert seg_c.shape == vol.shape


def test_predict_folder_cascade_autochain(tmp_path, rng):
    """predict_folder on 3d_cascade_fullres chains 3d_lowres automatically
    (sibling model folder), and the cascade seg shape-matches but differs
    from the direct 3d_fullres prediction."""
    from boa_tpu.engine.predict import predict_folder
    from boa_tpu.inference.sliding_window import stack_fold_params
    from boa_tpu.io import nifti
    from boa_tpu.models.unet import init_unet
    from boa_tpu.plans.plans import ModelPlans
    from boa_tpu.weights import convert as cv

    plans, dataset = _cascade_plans(tmp_path)

    def write_model(config, key):
        mp = ModelPlans(plans=plans, dataset=dataset,
                        configuration_name=config)
        mdir = tmp_path / f"nnUNetTrainer__nnUNetPlans__{config}"
        (mdir / "fold_0").mkdir(parents=True)
        (mdir / "plans.json").write_text(json.dumps(plans))
        (mdir / "dataset.json").write_text(json.dumps(dataset))
        params = init_unet(jax.random.PRNGKey(key), mp.arch_config())
        cv.save_params_npz(params, mdir / "fold_0" / "checkpoint_final.npz")
        return mdir

    lowres_dir = write_model("3d_lowres", 1)
    cascade_dir = write_model("3d_cascade_fullres", 2)
    fullres_dir = write_model("3d_fullres", 3)
    del lowres_dir

    in_dir = tmp_path / "imgs"
    in_dir.mkdir()
    vol, _ = _make_case(rng, (20, 20, 20))
    nifti.save(nifti.NiftiImage(data=vol,
                                affine=np.diag([2.0, 2.0, 2.0, 1.0])),
               in_dir / "case0.nii.gz")

    out_casc = tmp_path / "out_cascade"
    written = predict_folder(in_dir, out_casc, model_dir=cascade_dir,
                             configuration="3d_cascade_fullres", folds=[0])
    assert len(written) == 1
    prev_dir = out_casc / "segs_from_prev_stage_3d_lowres"
    assert (prev_dir / "case0.nii.gz").exists(), \
        "auto-chain must write the lowres stage first"
    seg_casc = np.asarray(nifti.load(written[0]).data)
    assert seg_casc.shape == vol.shape

    out_full = tmp_path / "out_fullres"
    direct = predict_folder(in_dir, out_full, model_dir=fullres_dir,
                            configuration="3d_fullres", folds=[0])
    seg_direct = np.asarray(nifti.load(direct[0]).data)
    assert seg_direct.shape == seg_casc.shape
    assert np.any(seg_direct != seg_casc)
