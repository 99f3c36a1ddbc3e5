"""Isolate the full-res sliding-window accumulation overhead (VERDICT #2).

Scenario: one z-row of the full-res total sub-model on a 512x512x400
grid — 25 tiles (5x5 xy grid, step 96), patch 128³, 25 classes,
channels-first row buffer (25, 512, 512, 128) fp16.

Measures, per tile:
  fwd       — tile_pred only (scalar-consumed, nothing materialized)
  fwd+ys    — tile_pred scan stacking the 25 gauss-weighted predictions
  chunk     — the real _chunk_step (fwd + ys + 25 unrolled in-place adds)
and prints compiled bytes-accessed for each (cost_analysis), which shows
whether the dynamic_update_slice chain is actually in-place (expected
~10 GB for 25 tiles) or copying the 1.6 GB row buffer per tile (~90 GB).

Usage: python tools/accum_bench.py [--n 3]
"""
import argparse
import sys
import time
from functools import partial

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from boa_tpu.models.unet import ArchConfig, init_unet
from boa_tpu.inference import sliding_window as sw


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32).ravel()[::4096]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=3)
    args = ap.parse_args()

    cfg = ArchConfig(
        n_stages=6, features_per_stage=(32, 64, 128, 256, 320, 320),
        kernel_sizes=((3, 3, 3),) * 6,
        strides=((1, 1, 1),) + ((2, 2, 2),) * 5,
        n_conv_per_stage=(2,) * 6, n_conv_per_stage_decoder=(2,) * 5,
        num_classes=25)
    params = init_unet(jax.random.key(0), cfg)
    stacked = sw.stack_fold_params([params])
    vol = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 512, 512, 400)), jnp.float32)
    from boa_tpu.ops.preprocess import gaussian_importance_map

    gauss = jnp.asarray(gaussian_importance_map((128, 128, 128)))
    xs = np.arange(5) * 96
    starts = np.array([(x, y, 0) for x in xs for y in xs], np.int32)
    valid = np.ones((25,), np.float32)
    K = 25

    # --- chunk: the production row dispatch (lower the production jit
    # itself: a closure-capturing wrapper bakes the 125 MB weights + 400 MB
    # volume into the HLO as constants and the tunnel's remote-compile
    # endpoint rejects the payload with HTTP 413)
    rowbuf = jnp.zeros((25, 512, 512, 128), jnp.float16)
    f_chunk = lambda buf: sw._chunk_step(
        buf, stacked, vol, starts, valid, gauss, np.int32(0), cfg=cfg,
        mirror_axes=(), compute_dtype=jnp.bfloat16, k=K,
        channels_last=False, n_cls_pad=128)
    lowered = sw._chunk_step.lower(
        rowbuf, stacked, vol, jnp.asarray(starts), jnp.asarray(valid),
        gauss, jnp.int32(0), cfg=cfg, mirror_axes=(),
        compute_dtype=jnp.bfloat16, k=K, channels_last=False, n_cls_pad=128)
    comp = lowered.compile()
    ca = comp.cost_analysis()
    ba = (ca or {}).get("bytes accessed", float("nan"))
    print(f"chunk bytes-accessed: {ba/1e9:.1f} GB "
          f"(in-place expectation ~11 GB, copying ~90 GB)")

    rowbuf = jnp.zeros((25, 512, 512, 128), jnp.float16)
    out = f_chunk(rowbuf); sync(out)  # compile via production path
    ts = []
    for _ in range(args.n):
        t0 = time.perf_counter()
        out = f_chunk(out)
        sync(out)
        ts.append(time.perf_counter() - t0)
    t_chunk = float(np.median(ts))
    print(f"chunk: {t_chunk*1e3:.1f} ms total, {t_chunk/K*1e3:.2f} ms/tile")

    # --- chunk with static-index updates (the production row-mode path)
    xy = tuple(map(tuple, starts[:, :2].tolist()))
    f_static = lambda buf: sw._chunk_step(
        buf, stacked, vol, starts, valid, gauss, np.int32(0), cfg=cfg,
        mirror_axes=(), compute_dtype=jnp.bfloat16, k=K,
        channels_last=False, n_cls_pad=128, xy_static=xy)
    lowered = sw._chunk_step.lower(
        rowbuf := jnp.zeros((25, 512, 512, 128), jnp.float16), stacked, vol,
        jnp.asarray(starts), jnp.asarray(valid), gauss, jnp.int32(0),
        cfg=cfg, mirror_axes=(), compute_dtype=jnp.bfloat16, k=K,
        channels_last=False, n_cls_pad=128, xy_static=xy)
    ca = lowered.compile().cost_analysis()
    ba = (ca or {}).get("bytes accessed", float("nan"))
    print(f"chunk-static bytes-accessed: {ba/1e9:.1f} GB")
    out = f_static(rowbuf); sync(out)
    ts = []
    for _ in range(args.n):
        t0 = time.perf_counter()
        out = f_static(out)
        sync(out)
        ts.append(time.perf_counter() - t0)
    t_static = float(np.median(ts))
    print(f"chunk-static: {t_static*1e3:.1f} ms total, "
          f"{t_static/K*1e3:.2f} ms/tile")

    # --- fwd only
    @partial(jax.jit, static_argnames=())
    def f_fwd(vol, stacked, gauss):
        cast = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
            stacked)

        def body(c, s):
            p = sw.tile_pred(cast, vol, s, gauss[..., None], cfg, (),
                             jnp.bfloat16, (128, 128, 128))
            return c + jnp.sum(p[::64, ::64, ::64]), None

        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                            jnp.asarray(starts))
        return c

    float(f_fwd(vol, stacked, gauss))
    ts = []
    for _ in range(args.n):
        t0 = time.perf_counter()
        float(f_fwd(vol, stacked, gauss))
        ts.append(time.perf_counter() - t0)
    t_fwd = float(np.median(ts))
    print(f"fwd:   {t_fwd*1e3:.1f} ms total, {t_fwd/K*1e3:.2f} ms/tile")

    # --- fwd + ys stack (no accumulation)
    @partial(jax.jit, static_argnames=())
    def f_ys(vol, stacked, gauss):
        cast = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
            stacked)

        def body(_, s):
            p = sw.tile_pred(cast, vol, s, gauss[..., None], cfg, (),
                             jnp.bfloat16, (128, 128, 128))
            return None, jnp.transpose(p, (3, 0, 1, 2)).astype(jnp.float16)

        _, ys = jax.lax.scan(body, None, jnp.asarray(starts))
        return jnp.sum(ys[:, :, ::64, ::64, ::64].astype(jnp.float32))

    float(f_ys(vol, stacked, gauss))
    ts = []
    for _ in range(args.n):
        t0 = time.perf_counter()
        float(f_ys(vol, stacked, gauss))
        ts.append(time.perf_counter() - t0)
    t_ys = float(np.median(ts))
    print(f"fwd+ys: {t_ys*1e3:.1f} ms total, {t_ys/K*1e3:.2f} ms/tile")

    print(f"\nys-stack overhead: {(t_ys-t_fwd)/K*1e3:.2f} ms/tile")
    print(f"update overhead:   {(t_chunk-t_ys)/K*1e3:.2f} ms/tile dynamic, "
          f"{(t_static-t_ys)/K*1e3:.2f} ms/tile static "
          f"(floor ~0.4 ms at 819 GB/s)")


if __name__ == "__main__":
    main()
