"""Numerical parity: JAX U-Net + checkpoint converter vs torch oracle.

This is the kernel-level parity tier SURVEY.md §4 calls for (Dice >= 0.999
requires logits parity first).
"""

import numpy as np
import pytest
import torch

from boa_tpu.models.unet import ArchConfig, count_params, init_unet, unet_forward
from boa_tpu.weights.convert import (
    convert_state_dict,
    load_params_npz,
    save_params_npz,
)

from tests.torch_mirror import TorchUNet

PLAIN_CFG = ArchConfig(
    n_stages=4,
    features_per_stage=(8, 16, 32, 64),
    kernel_sizes=((3, 3, 3),) * 4,
    strides=((1, 1, 1), (2, 2, 2), (2, 2, 2), (2, 2, 2)),
    n_conv_per_stage=(2, 2, 2, 2),
    n_conv_per_stage_decoder=(2, 2, 2),
    num_classes=5,
    input_channels=1,
)

RES_CFG = ArchConfig(
    n_stages=3,
    features_per_stage=(8, 16, 32),
    kernel_sizes=((3, 3, 3),) * 3,
    strides=((1, 1, 1), (2, 2, 2), (2, 2, 2)),
    n_conv_per_stage=(2, 2, 2),
    n_conv_per_stage_decoder=(2, 2),
    num_classes=3,
    input_channels=1,
    residual_encoder=True,
    n_blocks_per_stage=(1, 2, 2),
)


def _run_pair(cfg, aniso=False):
    torch.manual_seed(0)
    net = TorchUNet(cfg).eval()
    state = {k: v for k, v in net.state_dict().items()}
    params = convert_state_dict(state, cfg)

    shape = (1, 16, 16, 8) if aniso else (1, 16, 16, 16)
    x = np.random.default_rng(1).normal(size=shape).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x)[None]).numpy()[0]  # (C, X, Y, Z)

    xj = np.transpose(x, (1, 2, 3, 0))[None]  # (1, X, Y, Z, C)
    out = np.asarray(unet_forward(params, xj, cfg))[0]
    out = np.transpose(out, (3, 0, 1, 2))
    return ref, out, params


def test_plain_conv_unet_matches_torch():
    ref, out, _ = _run_pair(PLAIN_CFG)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_residual_encoder_unet_matches_torch():
    ref, out, _ = _run_pair(RES_CFG)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_anisotropic_strides():
    cfg = ArchConfig(
        n_stages=3,
        features_per_stage=(8, 16, 32),
        kernel_sizes=((3, 3, 1), (3, 3, 3), (3, 3, 3)),
        strides=((1, 1, 1), (2, 2, 1), (2, 2, 2)),
        n_conv_per_stage=(2, 2, 2),
        n_conv_per_stage_decoder=(2, 2),
        num_classes=4,
    )
    ref, out, _ = _run_pair(cfg, aniso=True)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_deep_supervision_heads():
    cfg = ArchConfig(**{**PLAIN_CFG.__dict__, "deep_supervision": True})
    torch.manual_seed(0)
    net = TorchUNet(cfg, deep_supervision=True).eval()
    params = convert_state_dict(net.state_dict(), cfg)
    x = np.random.default_rng(2).normal(size=(1, 16, 16, 16)).astype(np.float32)
    with torch.no_grad():
        refs = [r.numpy()[0] for r in net(torch.from_numpy(x)[None])]
    xj = np.transpose(x, (1, 2, 3, 0))[None]
    outs = unet_forward(params, xj, cfg, all_heads=True)
    assert len(outs) == len(refs) == cfg.n_stages - 1
    for r, o in zip(refs, outs):
        o = np.transpose(np.asarray(o)[0], (3, 0, 1, 2))
        np.testing.assert_allclose(o, r, rtol=1e-4, atol=1e-4)


def test_params_npz_roundtrip(tmp_path):
    _, _, params = _run_pair(PLAIN_CFG)
    p = tmp_path / "w.npz"
    save_params_npz(params, p)
    back = load_params_npz(p, PLAIN_CFG)
    import jax

    leaves1 = jax.tree.leaves(params)
    leaves2 = jax.tree.leaves(back)
    assert len(leaves1) == len(leaves2)
    x = np.random.default_rng(3).normal(size=(1, 16, 16, 16, 1)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(unet_forward(back, x, PLAIN_CFG)),
        np.asarray(unet_forward(params, x, PLAIN_CFG)),
        rtol=1e-6, atol=1e-6,
    )


def test_init_shapes_match_converted():
    import jax

    torch.manual_seed(0)
    net = TorchUNet(PLAIN_CFG)
    converted = convert_state_dict(net.state_dict(), PLAIN_CFG)
    initialized = init_unet(jax.random.key(0), PLAIN_CFG)
    s1 = [a.shape for a in jax.tree.leaves(jax.tree.map(np.asarray, converted))]
    s2 = [a.shape for a in jax.tree.leaves(jax.tree.map(np.asarray, initialized))]
    assert sorted(map(tuple, s1)) == sorted(map(tuple, s2))
    assert count_params(converted) == count_params(initialized)


def test_anisotropic_kernels_z_major():
    """kz=1 kernels ((1,3,3) early stages of high-res head/neck models)
    through the z-major conv decomposition."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from boa_tpu.models.unet import ArchConfig, init_unet, unet_forward

    cfg = ArchConfig(
        n_stages=3, features_per_stage=(4, 8, 16),
        kernel_sizes=((1, 3, 3), (3, 3, 3), (3, 3, 3)),
        strides=((1, 1, 1), (2, 2, 1), (2, 2, 2)),
        n_conv_per_stage=(2, 2, 2), n_conv_per_stage_decoder=(2, 2),
        num_classes=3, input_channels=1)
    params = init_unet(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, 16, 16, 12, 1)).astype(np.float32))
    out = unet_forward(params, x, cfg)
    assert out.shape == (1, 16, 16, 12, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_real_format_checkpoint_roundtrip(tmp_path):
    """A COMPLETE real-format model folder (plans.json + dataset.json +
    fold checkpoints incl. optimizer state, init args, DDP prefixes, and
    the duplicate decoder.encoder / all_modules key sets) imports through
    the store and reproduces the torch forward (VERDICT r1 weak #4:
    converter hardening against the real checkpoint layout,
    `predict_from_raw_data.py:83-120`)."""
    import json

    from boa_tpu.plans.plans import ModelPlans
    from boa_tpu.weights.convert import convert_checkpoint
    from tests.torch_mirror import full_checkpoint, real_format_plans

    torch.manual_seed(3)
    net = TorchUNet(PLAIN_CFG).eval()
    sd = net.state_dict()
    # the mirror now replicates the real duplicate key sets
    assert any(k.startswith("decoder.encoder.") for k in sd)
    assert any(".all_modules." in k for k in sd)

    mdir = tmp_path / "Dataset990_mirror" / \
        "nnUNetTrainer__nnUNetPlans__3d_fullres"
    (mdir / "fold_0").mkdir(parents=True)
    (mdir / "fold_1").mkdir()
    plans_doc = real_format_plans(PLAIN_CFG)
    (mdir / "plans.json").write_text(json.dumps(plans_doc))
    (mdir / "dataset.json").write_text(json.dumps({
        "channel_names": {"0": "CT"},
        "labels": {"background": 0, "a": 1, "b": 2, "c": 3, "d": 4},
        "numTraining": 10, "file_ending": ".nii.gz"}))
    torch.save(full_checkpoint(net), mdir / "fold_0" / "checkpoint_final.pth")
    torch.save(full_checkpoint(net, ddp_prefix=True),
               mdir / "fold_1" / "checkpoint_final.pth")

    plans = ModelPlans.from_model_folder(mdir)
    assert plans.patch_size == [64, 64, 64]
    assert plans.num_segmentation_heads == 5
    cfg = plans.arch_config()
    assert cfg.n_stages == PLAIN_CFG.n_stages
    assert tuple(cfg.features_per_stage) == PLAIN_CFG.features_per_stage

    # strict conversion consumes every non-alias key, both folds
    p0 = convert_checkpoint(mdir / "fold_0" / "checkpoint_final.pth", cfg)
    p1 = convert_checkpoint(mdir / "fold_1" / "checkpoint_final.pth", cfg)
    np.testing.assert_array_equal(p0["encoder"][0][0]["w"],
                                  p1["encoder"][0][0]["w"])

    x = np.random.default_rng(5).normal(size=(1, 16, 16, 16)).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x)[None]).numpy()[0]
    xj = np.transpose(x, (1, 2, 3, 0))[None]
    out = np.asarray(unet_forward(p0, xj, cfg))[0]
    out = np.transpose(out, (3, 0, 1, 2))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_strict_conversion_rejects_unknown_keys():
    from boa_tpu.weights.convert import convert_state_dict

    torch.manual_seed(0)
    net = TorchUNet(PLAIN_CFG).eval()
    state = dict(net.state_dict())
    state["encoder.mystery_block.weight"] = torch.zeros(3)
    with pytest.raises(ValueError, match="not consumed"):
        convert_state_dict(state, PLAIN_CFG, strict=True)
    # lenient mode still converts
    convert_state_dict(state, PLAIN_CFG, strict=False)
