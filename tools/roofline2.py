"""Roofline part 2: find the ~12 ms of flagship forward time that the
per-conv-stage table (tools/roofline.py) does not account for, and try a
space-to-depth fix for the pathological stride-2 down-convs.

Measures:
  encoder-only / full forward     — composite split
  transpconv at dec4/dec3 shapes  — the jnp.stack+reshape interleave
  deep lump (8³..16³ stages)      — small-op overhead
  s2-conv variants at enc1 shape  — current z-parity fold vs xy
                                    space-to-depth (fold 2x2 xy into
                                    channels; stride-2 becomes stride-1)
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from boa_tpu.models.unet import (ArchConfig, init_unet, unet_forward,
                                 _conv_zm, _transpconv_zm, _same_pad,
                                 _encoder_forward, instance_norm)

rng = np.random.default_rng(0)
dt = jnp.bfloat16


def timed(fn, *args, n=10):
    @jax.jit
    def run(*a):
        def body(c, _):
            y = fn(*((a[0] + c,) + a[1:]))
            return (jnp.max(y[(0,) * y.ndim]) * 0).astype(a[0].dtype), None

        c, _ = jax.lax.scan(body, jnp.zeros((), a[0].dtype), None, length=n)
        return c

    run(*args).block_until_ready()
    outs = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(*args))
        outs.append(time.perf_counter() - t0)
    return float(np.median(outs)) / n


BASE = None


def report(name, sec, flops=None):
    extra = f" {flops/sec/1e12:6.1f} TF/s" if flops else ""
    print(f"{name:34s} {sec*1e3:7.2f} ms{extra}", flush=True)


def main():
    global BASE
    BASE = timed(lambda x: x * 1.000001, jnp.zeros((8, 8), dt))
    print(f"dispatch baseline {BASE*1e3:.2f} ms", flush=True)

    cfg = ArchConfig(
        n_stages=6, features_per_stage=(32, 64, 128, 256, 320, 320),
        kernel_sizes=((3, 3, 3),) * 6,
        strides=((1, 1, 1),) + ((2, 2, 2),) * 5,
        n_conv_per_stage=(2,) * 6, n_conv_per_stage_decoder=(2,) * 5,
        num_classes=25)
    params = init_unet(jax.random.key(0), cfg)
    cast = jax.tree.map(lambda a: a.astype(dt), params)
    x = jnp.asarray(rng.standard_normal((1, 128, 128, 128, 1)), dt)

    sec_full = timed(lambda x, c: unet_forward(c, x, cfg), x, cast) - BASE
    report("full forward", sec_full, 1.05e12)

    def enc_only(x, c):
        # z-major encoder as unet_forward runs it
        xz = jnp.transpose(x, (0, 3, 1, 2, 4))
        from boa_tpu.models.unet import _block_zm

        skips = []
        for s, stage in enumerate(c["encoder"]):
            for b, block in enumerate(stage):
                stride = cfg.strides[s] if b == 0 else (1, 1, 1)
                xz = _block_zm(block, xz, stride, cfg.kernel_sizes[s], cfg)
            skips.append(xz)
        return skips[-1]

    sec_enc = timed(enc_only, x, cast) - BASE
    report("encoder only", sec_enc, 0.40e12)
    report("decoder (full - encoder)", sec_full - sec_enc, 0.65e12)

    # transpconvs in isolation (z-major shapes as the decoder sees them)
    for name, Z, C_in, C_out in (("transp 8³ c320->c256", 8, 320, 256),
                                 ("transp 32³ c128->c64", 32, 128, 64),
                                 ("transp 64³ c64->c32", 64, 64, 32)):
        xz = jnp.asarray(rng.standard_normal((1, Z, Z, Z, C_in)), dt)
        w = jnp.asarray(rng.standard_normal((2, 2, 2, C_out, C_in)) * .05, dt)
        b = jnp.zeros((C_out,), dt)
        sec = timed(lambda xz, w, b: _transpconv_zm(xz, w, b, (2, 2, 2)),
                    xz, w, b) - BASE
        fl = 2.0 * (2 * Z) ** 3 * C_out * C_in  # kernel==stride: 1 tap/out
        report(name, sec, fl)

    # deep stages lump: encoder stages 3..5 on a 16³ c128 input
    xz16 = jnp.asarray(rng.standard_normal((1, 16, 16, 16, 128)), dt)

    def deep(xz, c):
        from boa_tpu.models.unet import _block_zm

        for s in (3, 4, 5):
            for b, block in enumerate(c["encoder"][s]):
                stride = cfg.strides[s] if b == 0 else (1, 1, 1)
                xz = _block_zm(block, xz, stride, cfg.kernel_sizes[s], cfg)
        return xz

    sec = timed(deep, xz16, cast) - BASE
    report("deep enc stages 3-5", sec, 2 * (
        8**3 * 256 * 128 * 27 + 8**3 * 256 * 256 * 27
        + 4**3 * 320 * 256 * 27 + 4**3 * 320 * 320 * 27
        + 2**3 * 320 * 320 * 27 * 2))

    # ---- stride-2 down-conv variants at the enc1 shape --------------
    Z = X = Y = 128
    ci, co = 32, 64
    xz = jnp.asarray(rng.standard_normal((1, Z, X, Y, ci)), dt)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, ci, co)) * 0.05, dt)
    b = jnp.zeros((co,), dt)
    fl = 2.0 * 64**3 * co * ci * 27

    sec = timed(lambda xz, w, b: _conv_zm(xz, w, b, (2, 2, 2),
                                          _same_pad((3, 3, 3))), xz, w, b) - BASE
    report("s2 conv current (z-parity fold)", sec, fl)

    # xy space-to-depth: fold 2x2 xy into channels, conv k2x2 stride 1
    # with taps laid out to reproduce the k3 s2 conv exactly, then the
    # same z handling as the current path (pair-fold + odd-row term).
    _DN2 = ("NHWC", "HWIO", "NHWC")

    def s2_std(xz, w, b):
        n = 1
        zb = Z // 2
        # z pair-fold exactly like _conv_zm: (n*zb, X, Y, 2ci)
        xr = jnp.transpose(xz.reshape(n, zb, 2, X, Y, ci),
                           (0, 1, 3, 4, 2, 5)).reshape(n * zb, X, Y, 2 * ci)
        # xy fold: pad x/y by 1 high so taps 2i-1..2i+1 live in two folded
        # cells; fold AFTER a 1-lo pad so folded cell i holds rows 2i-1,2i
        xp = jnp.pad(xr, ((0, 0), (1, 1), (1, 1), (0, 0)))
        Xf, Yf = (X + 2) // 2, (Y + 2) // 2
        xf = xp.reshape(n * zb, Xf, 2, Yf, 2, 2 * ci)
        xf = jnp.transpose(xf, (0, 1, 3, 2, 4, 5)).reshape(
            n * zb, Xf, Yf, 8 * ci)
        # folded kernel: out[i,j] needs original taps at rows 2i-1..2i+1,
        # cols 2j-1..2j+1 -> folded cells (i, i+1) x (j, j+1): k=2, stride 1
        # channel layout of xf: (qx, qy, zpair, ci) with qx row parity
        wz = jnp.concatenate([w[:, :, 1], w[:, :, 2]], axis=2)  # (3,3,2ci,co)
        wf = jnp.zeros((2, 2, 8 * ci, co), dt)
        for tx in range(3):
            for ty in range(3):
                # original tap (tx-1, ty-1) relative to out pixel at 2i,2j:
                # absolute row 2i-1+tx -> folded cell i + (tx+? ) ...
                fx, qx = divmod(tx, 2)      # row 2i-1+tx = 2(i+fx) + qx - 1
                fy, qy = divmod(ty, 2)
                cbase = (qx * 2 + qy) * 2 * ci
                wf = wf.at[fx, fy, cbase:cbase + 2 * ci, :].add(wz[tx, ty])
        y = jax.lax.conv_general_dilated(
            xf, wf, window_strides=(1, 1), padding="VALID",
            dimension_numbers=_DN2)
        # odd-row z term exactly as _conv_zm
        odd = xr[..., ci:].reshape(n, zb, X, Y, ci)
        odd_m1 = jnp.pad(odd[:, :-1], ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0)))
        y2 = jax.lax.conv_general_dilated(
            odd_m1.reshape(n * zb, X, Y, ci), w[:, :, 0],
            window_strides=(2, 2), padding=((1, 1), (1, 1)),
            dimension_numbers=_DN2)
        out = (y[:, :64, :64] + y2).reshape(n, zb, 64, 64, co)
        return out + b.astype(out.dtype)

    sec2 = timed(s2_std, xz, w, b) - BASE
    report("s2 conv xy-space-to-depth", sec2, fl)

    # parity check of the variant
    ref = _conv_zm(xz.astype(jnp.float32), w.astype(jnp.float32),
                   b.astype(jnp.float32), (2, 2, 2), _same_pad((3, 3, 3)))
    got = s2_std(xz.astype(jnp.float32), w.astype(jnp.float32),
                 b.astype(jnp.float32))
    err = float(jnp.max(jnp.abs(ref - got)))
    print(f"s2 space-to-depth max abs err vs current: {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
