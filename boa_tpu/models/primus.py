"""Primus: pure-transformer 3D segmentation (ViT encoder + voxel head).

Parity: the Primus trainers the reference ships for training
(`nnunetv2/training/nnUNetTrainer/primus/primus_trainers.py:18-260`,
architecture from the external `dynamic_network_architectures.architectures
.primus`): patch-embed tokenization of the volume, a ViT trunk, and a
deconvolution head back to voxel resolution; trained with AdamW (lr 3e-4,
wd 5e-2, betas (0.9, 0.98)) under a linear-warmup → poly schedule and no
deep supervision.

TPU notes: tokens are (N, T, D) with D a lane multiple; attention runs as
batched MXU matmuls in bf16 with fp32 softmax; the patch embed / head are
stride-8 conv / transpose-conv pairs, which XLA maps to dense matmuls.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from boa_tpu.models.unet import _DN


@dataclass(frozen=True)
class PrimusConfig:
    embed_dim: int
    depth: int
    num_heads: int
    patch_size: tuple[int, int, int]
    num_classes: int
    input_channels: int = 1
    mlp_ratio: float = 4.0
    eps: float = 1e-6

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads


# the published Primus family (S/B/M/L)
PRIMUS_VARIANTS = {
    "S": dict(embed_dim=396, depth=12, num_heads=6),
    "B": dict(embed_dim=792, depth=12, num_heads=12),
    "M": dict(embed_dim=864, depth=16, num_heads=12),
    "L": dict(embed_dim=1056, depth=24, num_heads=16),
}


def primus_config(variant: str, num_classes: int,
                  patch_size: tuple[int, int, int] = (8, 8, 8),
                  input_channels: int = 1) -> PrimusConfig:
    v = PRIMUS_VARIANTS[variant]
    return PrimusConfig(patch_size=patch_size, num_classes=num_classes,
                        input_channels=input_channels, **v)


def init_primus(key: jax.Array, cfg: PrimusConfig,
                grid: tuple[int, int, int]) -> dict:
    """grid: token grid (volume shape // patch size) for the pos embedding."""
    keys = jax.random.split(key, 4 + cfg.depth)
    d = cfg.embed_dim
    px, py, pz = cfg.patch_size
    p_vox = px * py * pz

    def dense(k, fan_in, shape):
        return jax.random.normal(k, shape) * (fan_in ** -0.5)

    params = {
        "embed_w": dense(keys[0], p_vox * cfg.input_channels,
                         (px, py, pz, cfg.input_channels, d)),
        "embed_b": jnp.zeros((d,)),
        "pos": jax.random.normal(keys[1], (*grid, d)) * 0.02,
        "blocks": [],
        "out_norm_scale": jnp.ones((d,)),
        "out_norm_bias": jnp.zeros((d,)),
        # head: transpose conv stride=patch back to voxels
        "head_w": dense(keys[2], d, (px, py, pz, d, cfg.num_classes)),
        "head_b": jnp.zeros((cfg.num_classes,)),
    }
    for i in range(cfg.depth):
        k1, k2, k3, k4 = jax.random.split(keys[4 + i], 4)
        h = int(cfg.mlp_ratio * d)
        params["blocks"].append({
            "ln1_scale": jnp.ones((d,)), "ln1_bias": jnp.zeros((d,)),
            "qkv_w": dense(k1, d, (d, 3 * d)), "qkv_b": jnp.zeros((3 * d,)),
            "proj_w": dense(k2, d, (d, d)), "proj_b": jnp.zeros((d,)),
            "ln2_scale": jnp.ones((d,)), "ln2_bias": jnp.zeros((d,)),
            "mlp_w1": dense(k3, d, (d, h)), "mlp_b1": jnp.zeros((h,)),
            "mlp_w2": dense(k4, h, (h, d)), "mlp_b2": jnp.zeros((d,)),
        })
    return params


def _layernorm(x, scale, bias, eps):
    m = jnp.mean(x.astype(jnp.float32), -1, keepdims=True)
    v = jnp.var(x.astype(jnp.float32), -1, keepdims=True)
    return (((x - m) * jax.lax.rsqrt(v + eps)) * scale + bias).astype(x.dtype)


def _attention(p, x, cfg: PrimusConfig):
    n, t, d = x.shape
    qkv = x @ p["qkv_w"].astype(x.dtype) + p["qkv_b"].astype(x.dtype)
    qkv = qkv.reshape(n, t, 3, cfg.num_heads, cfg.head_dim)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (n, t, h, hd)
    logits = jnp.einsum("nqhd,nkhd->nhqk", q, k) * (cfg.head_dim ** -0.5)
    attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
    out = jnp.einsum("nhqk,nkhd->nqhd", attn, v).reshape(n, t, d)
    return out @ p["proj_w"].astype(x.dtype) + p["proj_b"].astype(x.dtype)


def primus_forward(params: dict, x: jax.Array, cfg: PrimusConfig) -> jax.Array:
    """x: (N, X, Y, Z, C) → logits (N, X, Y, Z, num_classes).

    X/Y/Z must be multiples of the patch size; the pos embedding is
    trilinearly resized when the token grid differs from the one at init.
    """
    n = x.shape[0]
    tok = jax.lax.conv_general_dilated(
        x, params["embed_w"].astype(x.dtype), cfg.patch_size,
        "VALID", dimension_numbers=_DN) + params["embed_b"].astype(x.dtype)
    gx, gy, gz = tok.shape[1:4]
    pos = params["pos"]
    if pos.shape[:3] != (gx, gy, gz):
        pos = jax.image.resize(pos, (gx, gy, gz, pos.shape[-1]), "trilinear")
    tok = tok + pos.astype(tok.dtype)
    h = tok.reshape(n, gx * gy * gz, cfg.embed_dim)

    for blk in params["blocks"]:
        h = h + _attention(blk, _layernorm(h, blk["ln1_scale"],
                                           blk["ln1_bias"], cfg.eps), cfg)
        z = _layernorm(h, blk["ln2_scale"], blk["ln2_bias"], cfg.eps)
        z = jax.nn.gelu(z @ blk["mlp_w1"].astype(h.dtype)
                        + blk["mlp_b1"].astype(h.dtype))
        h = h + (z @ blk["mlp_w2"].astype(h.dtype)
                 + blk["mlp_b2"].astype(h.dtype))

    h = _layernorm(h, params["out_norm_scale"], params["out_norm_bias"],
                   cfg.eps)
    h = h.reshape(n, gx, gy, gz, cfg.embed_dim)
    logits = jax.lax.conv_transpose(
        h, params["head_w"].astype(h.dtype), cfg.patch_size, "VALID",
        dimension_numbers=_DN) + params["head_b"].astype(h.dtype)
    return logits
