"""Transpconv kernel vs XLA on the dec4 upsample floor (real TPU).

The r4 roofline pinned the 64³→128³ c64→32 2x2x2-stride-2 transposed
conv at 1.9 ms — an interleave RELAYOUT, not compute (2.2 GFLOP). The
composite rowconv forward loses overall (README), but this stage's
Pallas kernel (`ops/rowconv.py` transpconv2_rows: interleave as exact
0/1 matmuls) might win ALONE. Times three forms at the flagship shape,
including the layout transposes a hybrid use would pay:

  xla      — models/unet.py _transpconv_zm on the z-major layout
  kernel   — transpconv2_rows alone (row layout in/out)
  hybrid   — z-major in → transpose → kernel → transpose → z-major out
             (what wiring it into the default forward would cost)

Scan-of-N with a carry dependency, scalar-readback sync, dispatch
subtracted. Run from the repo root: python tools/transpconv_bench.py
"""
import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--bx", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from boa_tpu.models.unet import _transpconv_zm
    from boa_tpu.ops import rowconv as rc

    Z = X = Y = 64
    cin, cout = 64, 32
    key = jax.random.key(0)
    # z-major activation (1, Z, X, Y, C) and row-layout view (Z, X, C, Y)
    xz = jax.random.normal(key, (1, Z, X, Y, cin), jnp.bfloat16)
    xr = jnp.transpose(xz[0], (0, 1, 3, 2))
    # XLA path consumes XYZOI (kx, ky, kz, co, ci); kernel takes
    # (a=z, b=x, p=y, ci, co)
    w_xla = jax.random.normal(key, (2, 2, 2, cout, cin), jnp.bfloat16)
    w_rc = jnp.transpose(w_xla, (2, 0, 1, 4, 3))

    def timed(label, fn, arg):
        @jax.jit
        def run(v):
            def body(c, _):
                y = fn(v + c)
                return (y.reshape(-1)[0] * 0).astype(v.dtype), None

            c, _ = jax.lax.scan(body, jnp.zeros((), v.dtype), None,
                                length=args.iters)
            return c

        @jax.jit
        def empty(v):
            return jnp.sum(v.reshape(-1)[::8192]).astype(jnp.float32)

        float(empty(arg))
        t0 = time.perf_counter(); float(empty(arg))
        disp = time.perf_counter() - t0
        float(run(arg))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter(); float(run(arg))
            ts.append((time.perf_counter() - t0 - disp) / args.iters)
        ms = float(np.median(ts)) * 1e3
        print(f"{label}: {ms:.3f} ms", flush=True)
        return ms

    timed("xla _transpconv_zm", lambda v: _transpconv_zm(
        v, w_xla, None, (2, 2, 2)), xz)
    timed("kernel transpconv2_rows", lambda v: rc.transpconv2_rows(
        v, w_rc, bx=args.bx), xr)
    timed("hybrid (transpose+kernel+transpose)", lambda v: jnp.transpose(
        rc.transpconv2_rows(
            jnp.transpose(v[0], (0, 1, 3, 2)), w_rc, bx=args.bx),
        (0, 1, 3, 2))[None], xz)


if __name__ == "__main__":
    main()
