"""Stride-2 rowconv kernel vs the shipped XLA path (enc1.conv1 floor).

The r4 roofline pinned the 128³ c32→c64 stride-2 down-conv at 2.16 ms /
13 TF/s useful (XLA computes the DENSE conv and discards 7/8). The
Pallas kernel (`ops/rowconv.py` conv3d_rows_stride2) computes only the
needed outputs via 0/1 deinterleave matmuls. Times both at the flagship
shape — the shipped z-major `_conv_zm` stride-2 (z-parity channel fold)
+ IN + LReLU, vs the kernel (row layout, fused input norm, Σ/Σ² out).

Scan-of-N with a carry dependency, scalar-readback sync, dispatch
subtracted. Run from the repo root: python tools/stride2_bench.py
"""
import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--bx2", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from boa_tpu.models.unet import _conv_zm, _lrelu, _same_pad, instance_norm
    from boa_tpu.ops import rowconv as rc

    Z = X = Y = 128
    cin, cout = 32, 64
    key = jax.random.key(0)
    xz = jax.random.normal(key, (1, Z, X, Y, cin), jnp.bfloat16)
    xr = jnp.transpose(xz[0], (0, 1, 3, 2))        # (Z, X, C, Y)
    w = jax.random.normal(key, (3, 3, 3, cin, cout), jnp.bfloat16) * 0.1
    w_rc = jnp.transpose(w, (2, 0, 1, 3, 4))       # (kz, kx, ky, ci, co)

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
        gf = 2 * 27 * cin * cout * (Z // 2) * (X // 2) * (Y // 2) / 1e9
        print(f"{label}: {ms:.3f} ms ({gf / ms:.1f} TF/s useful)",
              flush=True)

    def xla(v):
        y = _conv_zm(v, w, None, (2, 2, 2), _same_pad((3, 3, 3)))
        y = instance_norm(y, None, None, 1e-5, axes=(1, 2, 3))
        return _lrelu(y, 0.01)

    def kern(v):
        y, _ = rc.conv3d_rows_stride2(
            v, rc.identity_normact(cin), w_rc, None, slope=1.0,
            out_dtype=jnp.bfloat16, bx2=args.bx2)
        return y

    def hybrid(v):
        # what wiring the kernel into the DEFAULT z-major forward costs:
        # z-major in -> row layout -> kernel -> slice/transpose back
        y, _ = rc.conv3d_rows_stride2(
            jnp.transpose(v[0], (0, 1, 3, 2)), rc.identity_normact(cin),
            w_rc, None, slope=1.0, out_dtype=jnp.bfloat16, bx2=args.bx2)
        return jnp.transpose(y[:, :, :cout], (0, 1, 3, 2))[None]

    timed("xla _conv_zm stride2 +IN+LReLU", xla, xz)
    timed("kernel conv3d_rows_stride2", kern, xr)
    timed("hybrid (transpose+kernel+transpose)", hybrid, xz)


if __name__ == "__main__":
    main()
