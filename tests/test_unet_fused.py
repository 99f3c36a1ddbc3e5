"""Fused Pallas forward path vs the XLA unet_forward (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from boa_tpu.models.unet import ArchConfig, init_unet, unet_forward
from boa_tpu.models.unet_fused import pack_unet_params, unet_forward_fused


def _cfg(feats=(8, 16, 32), n_cls=4):
    n = len(feats)
    return ArchConfig(
        n_stages=n, features_per_stage=tuple(feats),
        kernel_sizes=((3, 3, 3),) * n,
        strides=((1, 1, 1),) + ((2, 2, 2),) * (n - 1),
        n_conv_per_stage=(2,) * n, n_conv_per_stage_decoder=(2,) * (n - 1),
        num_classes=n_cls, input_channels=1)


def test_fused_matches_xla_forward(rng):
    cfg = _cfg()
    params = init_unet(jax.random.PRNGKey(0), cfg)
    packed = pack_unet_params(params, cfg)
    x = jnp.asarray(rng.normal(size=(16, 16, 16, 1)).astype(np.float32))

    ref = np.asarray(unet_forward(
        jax.tree.map(lambda a: a.astype(jnp.float32), params),
        x[None].astype(jnp.float32), cfg)[0])
    got = np.asarray(unet_forward_fused(
        jax.tree.map(lambda a: a.astype(jnp.float32)
                     if a.dtype in (jnp.float32,) else a, packed),
        x, cfg, interpret=True))
    assert got.shape == ref.shape
    scale = np.abs(ref).max() + 1e-6
    # bf16 matmuls inside the kernel vs f32 XLA: few-percent tolerance
    assert np.abs(got - ref).max() / scale < 0.05
    agree = (got.argmax(-1) == ref.argmax(-1)).mean()
    assert agree > 0.98


def test_pack_unet_params_adds_leaves():
    cfg = _cfg(feats=(4, 8))
    params = init_unet(jax.random.PRNGKey(1), cfg)
    packed = pack_unet_params(params, cfg)
    # stride-1 encoder blocks packed; stride-2 first-blocks of deeper stages not
    assert "w_packed" in packed["encoder"][0][0]
    assert "w_packed" in packed["encoder"][0][1]
    assert "w_packed" not in packed["encoder"][1][0]  # stride-2 downsample
    assert "w_packed" in packed["encoder"][1][1]
    assert "w_packed" in packed["decoder"][0]["convs"][0]
    # original untouched
    assert "w_packed" not in params["encoder"][0][0]
