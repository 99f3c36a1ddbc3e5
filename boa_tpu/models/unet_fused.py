"""Fused-forward PlainConvUNet using the Pallas conv+IN+LReLU kernel.

Opt-in alternative to `unet_forward` (call directly with packed params
from `pack_unet_params`): stride-1
3×3×3 conv blocks run through `ops.pallas_conv.conv3d_in_act` with
cross-layer chaining — each conv consumes the previous layer's RAW output
plus its instance-norm statistics (emitted for free by the kernel), so
normalized activations are never materialized in HBM. Stride-2 downsample
convs, transpose convs, concats and the 1³ seg head stay on XLA, with the
pending normalization materialized once at each such boundary.

Semantics match `unet_forward` (torch Conv3d 'same' + InstanceNorm3d +
LeakyReLU) to bf16 tolerance — see tests/test_unet_fused.py.

Measured on v5e (128³ patch, flagship 6-stage total model, scan-amortized):
fused 70.0 ms/fwd vs 60.4 ms for the old Conv3D path — and the shipped
z-major 2D-decomposed XLA path (`unet_forward`) now runs the same forward
in 35.0 ms, so this kernel path is strictly a research artifact: it keeps
the fused-IN/free-statistics machinery exercised and parity-tested, but
the default forward is faster. Levers if ever revisited: stride-2 support,
a two-input concat-free decoder conv, and adopting the z-major batched-2D
matmul structure inside the kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from boa_tpu.models.unet import (ArchConfig, _conv, _lrelu, _same_pad,
                                 _transpconv, conv_block_apply, instance_norm)
from boa_tpu.ops import pallas_conv as pc


def pack_unet_params(params: dict, cfg: ArchConfig) -> dict:
    """Add `w_packed` leaves for every kernel-eligible conv block (host-side,
    once at model load). Returns a new pytree; original is untouched."""
    import copy

    out = copy.deepcopy(jax.tree.map(np.asarray, params))

    def _pack_block(block, cin, cout):
        p, cin_p, cout_p = pc.plan_packing(cin, cout)
        block["w_packed"] = pc.pack_weights(
            np.asarray(block["w"], np.float32), p, cin_p, cout_p
        ).astype(np.float32)
        return block

    feats = cfg.features_per_stage
    c_in = cfg.input_channels
    for s, stage in enumerate(out["encoder"]):
        if cfg.kernel_sizes[s] != (3, 3, 3):
            c_in = feats[s]
            continue
        for b, block in enumerate(stage):
            stride = cfg.strides[s] if b == 0 else (1, 1, 1)
            cin = c_in if b == 0 else feats[s]
            if tuple(stride) == (1, 1, 1):
                _pack_block(block, cin, feats[s])
        c_in = feats[s]
    for i, stage in enumerate(out["decoder"]):
        s = cfg.n_stages - 1 - i
        if cfg.kernel_sizes[s - 1] != (3, 3, 3):
            continue
        for b, block in enumerate(stage["convs"]):
            cin = 2 * feats[s - 1] if b == 0 else feats[s - 1]
            _pack_block(block, cin, feats[s - 1])
    return jax.tree.map(jnp.asarray, out)


def _materialize(x_raw: jax.Array, norm: pc.NormAct | None,
                 slope: float) -> jax.Array:
    """Apply a pending IN+LReLU (the XLA-side boundary materialization)."""
    if norm is None:
        return x_raw
    xf = x_raw.astype(jnp.float32)
    xn = (xf - norm.mean) * (norm.inv_std * norm.gamma) + norm.beta
    return _lrelu(xn, slope).astype(x_raw.dtype)


def _block_fused(block: dict, x_raw: jax.Array, norm: pc.NormAct | None,
                 cfg: ArchConfig, cout: int, interpret: bool):
    """One conv block through the kernel; returns (y_raw, y_norm)."""
    cin = x_raw.shape[-1]
    na = norm if norm is not None else pc.identity_normact(cin)
    y, sums = pc.conv3d_in_act(
        x_raw, na, None, block.get("b"),
        slope=cfg.nonlin_slope if norm is not None else 1.0,
        out_dtype=x_raw.dtype, interpret=interpret,
        w_packed=block["w_packed"], cin=cin, cout=cout)
    count = int(np.prod(x_raw.shape[:3]))
    mean, inv = pc.stats_from_sums(sums, count, cfg.norm_eps)
    gamma = block.get("norm_scale", jnp.ones((cout,)))
    beta = block.get("norm_bias", jnp.zeros((cout,)))
    return y, pc.NormAct(mean, inv, gamma.astype(jnp.float32),
                         beta.astype(jnp.float32), cfg.nonlin_slope)


def unet_forward_fused(params: dict, x: jax.Array, cfg: ArchConfig,
                       interpret: bool = False) -> jax.Array:
    """x: (X, Y, Z, C) single sample → logits (X, Y, Z, num_classes)."""
    assert not cfg.residual_encoder, "fused path covers PlainConvUNet"
    feats = cfg.features_per_stage
    x_raw, norm = x, None
    skips: list[tuple[jax.Array, pc.NormAct | None]] = []
    for s, stage in enumerate(params["encoder"]):
        for b, block in enumerate(stage):
            stride = cfg.strides[s] if b == 0 else (1, 1, 1)
            eligible = (tuple(stride) == (1, 1, 1)
                        and cfg.kernel_sizes[s] == (3, 3, 3)
                        and "w_packed" in block)
            if eligible:
                x_raw, norm = _block_fused(block, x_raw, norm, cfg,
                                           feats[s], interpret)
            else:  # stride-2 / odd-kernel: XLA conv on materialized input
                xm = _materialize(x_raw, norm, cfg.nonlin_slope)
                x_raw = conv_block_apply(block, xm[None], stride,
                                         cfg.kernel_sizes[s], cfg)[0]
                norm = None
        skips.append((x_raw, norm))

    y_raw, ynorm = skips[-1]
    for i, stage in enumerate(params["decoder"]):
        s = cfg.n_stages - 1 - i
        ym = _materialize(y_raw, ynorm, cfg.nonlin_slope)
        up = _transpconv(ym[None], stage["transp"]["w"],
                         stage["transp"].get("b"), cfg.strides[s])[0]
        skip_raw, skip_norm = skips[s - 1]
        skipm = _materialize(skip_raw, skip_norm, cfg.nonlin_slope)
        y_raw, ynorm = jnp.concatenate([up, skipm], axis=-1), None
        for b, block in enumerate(stage["convs"]):
            if cfg.kernel_sizes[s - 1] == (3, 3, 3) and "w_packed" in block:
                y_raw, ynorm = _block_fused(block, y_raw, ynorm, cfg,
                                            feats[s - 1], interpret)
            else:
                ym2 = _materialize(y_raw, ynorm, cfg.nonlin_slope)
                y_raw = conv_block_apply(block, ym2[None], (1, 1, 1),
                                         cfg.kernel_sizes[s - 1], cfg)[0]
                ynorm = None

    final = _materialize(y_raw, ynorm, cfg.nonlin_slope)
    head = params["seg_heads"][len(params["decoder"]) - 1]
    return _conv(final[None], head["w"], head.get("b"), (1, 1, 1),
                 [(0, 0)] * 3)[0]
