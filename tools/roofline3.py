"""Roofline part 3: the decoder's composite overhead + transpconv rewrite.

Measured so far (roofline2): decoder 15.5 ms of the 23.9 ms forward;
isolated parts of the last decoder stage sum to ~7.9 ms. This bench
times the REAL composite dec4 stage (transp -> concat -> conv1 -> conv2
-> head) and three transpconv formulations at the 64³ c64 -> 128³ c32
shape:

  current  — per-z-tap 2D conv_transpose + stack + reshape
  einsum   — x @ W as one ci->8co matmul (ideal MXU shape) + ONE
             (Z,X,Y,2,2,2,co) -> (2Z,2X,2Y,co) relayout
  conv3d   — lax.conv_transpose with 3D dimension numbers
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from boa_tpu.models.unet import (ArchConfig, init_unet, _block_zm,
                                 _conv_zm, _transpconv_zm)

rng = np.random.default_rng(0)
dt = jnp.bfloat16
_DN3 = ("NDHWC", "DHWIO", "NDHWC")


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


def transp_einsum(xz, w, b, stride):
    """kernel==stride transpconv: one matmul + one interleave relayout.

    xz: (n, Z, X, Y, ci); w: (kx,ky,kz,co,ci) XYZOI like _transpconv_zm.
    """
    n, Z, X, Y, ci = xz.shape
    kx, ky, kz, co, _ = w.shape
    # (n,Z,X,Y,ci) @ (ci, kz*kx*ky*co): taps as output channels
    wm = jnp.transpose(w, (4, 2, 0, 1, 3)).reshape(ci, kz * kx * ky * co)
    t = xz.reshape(-1, ci) @ wm.astype(xz.dtype)
    t = t.reshape(n, Z, X, Y, kz, kx, ky, co)
    t = jnp.transpose(t, (0, 1, 4, 2, 5, 3, 6, 7))
    out = t.reshape(n, Z * kz, X * kx, Y * ky, co)
    return out + b.astype(out.dtype) if b is not None else out


def transp_conv3d(xz, w, b, stride):
    out = jax.lax.conv_transpose(
        xz, jnp.transpose(w, (0, 1, 2, 4, 3)).astype(xz.dtype),
        strides=(stride[2], stride[0], stride[1]), padding="VALID",
        dimension_numbers=_DN3, transpose_kernel=False)
    return out + b.astype(out.dtype) if b is not None else out


def main():
    BASE = timed(lambda x: x * 1.000001, jnp.zeros((8, 8), dt))
    print(f"baseline {BASE*1e3:.2f} ms", flush=True)

    Zs, ci, co = 64, 64, 32
    xz = jnp.asarray(rng.standard_normal((1, Zs, Zs, Zs, ci)), dt)
    w = jnp.asarray(rng.standard_normal((2, 2, 2, co, ci)) * 0.05, dt)
    b = jnp.zeros((co,), dt)
    fl = 2.0 * (2 * Zs) ** 3 * co * ci / 8 * 8

    for name, fn in (("transp current", _transpconv_zm),
                     ("transp einsum", transp_einsum),
                     ("transp conv3d-zmajor", transp_conv3d)):
        try:
            sec = timed(lambda x, w, b, f=fn: f(x, w, b, (2, 2, 2)),
                        xz, w, b) - BASE
            print(f"{name:26s} {sec*1e3:7.2f} ms {fl/sec/1e12:6.1f} TF/s",
                  flush=True)
        except Exception as e:
            print(f"{name:26s} FAILED: {e}", flush=True)

    # numeric parity current vs einsum
    a = _transpconv_zm(xz.astype(jnp.float32), w.astype(jnp.float32),
                       b.astype(jnp.float32), (2, 2, 2))
    c = transp_einsum(xz.astype(jnp.float32), w.astype(jnp.float32),
                      b.astype(jnp.float32), (2, 2, 2))
    print("einsum max err:", float(jnp.max(jnp.abs(a - c))), flush=True)

    # ---- composite dec4 stage: transp + concat + conv1 + conv2 + head
    cfg = ArchConfig(
        n_stages=6, features_per_stage=(32, 64, 128, 256, 320, 320),
        kernel_sizes=((3, 3, 3),) * 6,
        strides=((1, 1, 1),) + ((2, 2, 2),) * 5,
        n_conv_per_stage=(2,) * 6, n_conv_per_stage_decoder=(2,) * 5,
        num_classes=25)
    params = init_unet(jax.random.key(0), cfg)
    cast = jax.tree.map(lambda a: a.astype(dt), params)
    dec = cast["decoder"][4]   # the 64³ -> 128³ stage
    head = cast["seg_heads"][4]
    skip = jnp.asarray(rng.standard_normal((1, 128, 128, 128, 32)), dt)

    def dec4(y, dec, head, skip, transp):
        y = transp(y, dec["transp"]["w"], dec["transp"].get("b"), (2, 2, 2))
        y = jnp.concatenate([y, skip], axis=-1)
        for blk in dec["convs"]:
            y = _block_zm(blk, y, (1, 1, 1), (3, 3, 3), cfg)
        return _conv_zm(y, head["w"], head.get("b"), (1, 1, 1), [(0, 0)] * 3)

    y64 = jnp.asarray(rng.standard_normal((1, 64, 64, 64, 64)), dt)
    fl_dec4 = 2 * 128**3 * (32 * 64 * 27 + 32 * 32 * 27 + 25 * 32) \
        + 2 * 128**3 * 32 * 64 / 8 * 8
    for name, transp in (("dec4 composite (current)", _transpconv_zm),
                         ("dec4 composite (einsum)", transp_einsum)):
        sec = timed(lambda y, d, h, s, t=transp: dec4(y, d, h, s, t),
                    y64, dec, head, skip) - BASE
        print(f"{name:26s} {sec*1e3:7.2f} ms {fl_dec4/sec/1e12:6.1f} TF/s",
              flush=True)


if __name__ == "__main__":
    main()
