"""Roofline of the BCA patch forward (160x160x48, 5-stage arch) on TPU.

VERDICT r4 #5 asked for a roofline of the BCA patch shape (the
batch-1-per-tile rule had only been measured at 128^3). Times the
body_parts/body_regions architecture at batch 1 AND batch 2/4 tiles,
plus the per-tile FLOP count, so the tile-batching question is answered
at this shape too. Scan-of-N with a carry dependency (see
rowconv_bench.py), scalar-readback sync, dispatch subtracted.

Default: the SYNTHETIC arch (isotropic [2,2,2] strides from
plans.synthetic_plans — exactly what tools/e2e_bench.py and the serving
benches run, so the shipped tile_batch decision matches the benched
models). --aniso instead builds nnU-Net-style anisotropic strides for
the 1.5x1.5x5 mm spacing (z pooled only while its resolution is
coarsest-comparable), the shape a REAL weights install would bring —
run it before trusting the batch heuristic on real checkpoints.

Run from the repo root: python tools/bca_roofline.py [--iters 10] [--aniso]
"""
import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--aniso", action="store_true",
                    help="nnU-Net-style anisotropic strides for 1.5x1.5x5 mm"
                    " (real-plan shape) instead of the synthetic arch")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from boa_tpu.models.unet import ArchConfig, init_unet, unet_forward
    from boa_tpu.plans.plans import synthetic_plans

    if args.aniso:
        # nnU-Net pools an axis only while its spacing stays within ~2x of
        # the finest: at (1.5, 1.5, 5) z joins pooling late — z is pooled
        # twice (48->24->12), xy four times (160->10)
        cfg = ArchConfig(
            n_stages=5, features_per_stage=(32, 64, 128, 256, 320),
            kernel_sizes=((3, 3, 1), (3, 3, 3), (3, 3, 3), (3, 3, 3),
                          (3, 3, 3)),
            strides=((1, 1, 1), (2, 2, 1), (2, 2, 2), (2, 2, 2),
                     (2, 2, 1)),
            n_conv_per_stage=(2,) * 5, n_conv_per_stage_decoder=(2,) * 4,
            num_classes=8)
    else:
        plans = synthetic_plans(num_classes=8, patch_size=(160, 160, 48),
                                spacing=(1.5, 1.5, 5.0),
                                features=(32, 64, 128, 256, 320))
        cfg = plans.arch_config()
    print(f"arch: strides={cfg.strides} kernels={cfg.kernel_sizes}",
          flush=True)
    params = init_unet(jax.random.key(0), cfg)
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                          if a.dtype == jnp.float32 else a, params)

    # FLOP count: 2 * prod(out_spatial) * co * ci * prod(kernel) per conv —
    # walk the encoder/decoder shapes
    def conv_gflops():
        total = 0.0
        sp = np.array([160, 160, 48], np.float64)
        feats = cfg.features_per_stage
        ci = 1
        for s in range(cfg.n_stages):
            sp = sp / np.array(cfg.strides[s])
            k = np.prod(cfg.kernel_sizes[s])
            total += 2 * np.prod(sp) * feats[s] * ci * k
            total += 2 * np.prod(sp) * feats[s] * feats[s] * k
            ci = feats[s]
        for i in range(cfg.n_stages - 1):
            s = cfg.n_stages - 1 - i
            sp = sp * np.array(cfg.strides[s])
            k = np.prod(cfg.kernel_sizes[s - 1])
            co = feats[s - 1]
            # kernel==stride transpconv: each output voxel receives exactly
            # ONE ci-by-co tap — no prod(stride) factor
            total += 2 * np.prod(sp) * co * feats[s]
            total += 2 * np.prod(sp) * co * 2 * co * k
            total += 2 * np.prod(sp) * co * co * k
        return total / 1e9

    gf = conv_gflops()

    def timed(n_batch):
        x = jnp.asarray(np.random.default_rng(0).standard_normal(
            (n_batch, 160, 160, 48, 1)), jnp.bfloat16)

        @jax.jit
        def run(x):
            def body(c, _):
                y = unet_forward(params, x + c, cfg)
                return (y[0, 0, 0, 0, 0] * 0).astype(x.dtype), None

            c, _ = jax.lax.scan(body, jnp.zeros((), x.dtype), None,
                                length=args.iters)
            return c

        @jax.jit
        def empty(x):
            return jnp.sum(x[0, 0, 0, :, 0]).astype(jnp.float32)

        float(empty(x))
        t0 = time.perf_counter(); float(empty(x))
        disp = time.perf_counter() - t0
        float(run(x))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter(); float(run(x))
            ts.append((time.perf_counter() - t0 - disp) / args.iters)
        ms = float(np.median(ts)) * 1e3
        per_tile = ms / n_batch
        print(f"batch={n_batch}: {ms:.2f} ms ({per_tile:.2f} ms/tile, "
              f"{gf * n_batch / ms:.1f} TF/s effective, ~{gf:.0f} GF/tile)",
              flush=True)

    for nb in (1, 2, 4):
        timed(nb)


if __name__ == "__main__":
    main()
