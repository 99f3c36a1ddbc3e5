"""Pre-compile the serving programs for a task's bucketed volume shapes.

First-study latency is compile-dominated (~minutes of XLA compiles for a
fresh process/model — CLAUDE.md); the persistent compilation cache
(`~/.boa_tpu/jax_cache`) makes that a one-time cost, and this tool pays it
at deploy time instead of on the first clinical study. The reference has
no equivalent (torch/cuDNN kernels are precompiled); this is the
TPU-native analogue of image-build-time weight baking
(`scripts/download_weights.py:13-34`).

Programs are keyed by (architecture, bucketed volume shape, fold count,
dtypes) — weight VALUES don't matter, so warming with the real model's
architecture covers the real weights too.

CLI:
    python -m boa_tpu.serve.warmup --task total --fast \
        --xy 512 --z-range 200 600 [--bucket 64] [--spacing 1.5 1.5 3.0]
"""

from __future__ import annotations

import argparse
import logging
import time

import numpy as np

from boa_tpu.inference.pipeline import predict_image
from boa_tpu.io.nifti import NiftiImage
from boa_tpu.tasks.registry import resolve_task
from boa_tpu.weights.store import ModelStore

logger = logging.getLogger(__name__)


def warmup_task(store: ModelStore, task_name: str, *, fast: bool = False,
                xy: int | tuple[int, int] = 512,
                z_range: tuple[int, int] = (200, 600),
                bucket: int = 64,
                spacing: tuple[float, float, float] = (1.5, 1.5, 3.0),
                dtype: str = "bfloat16") -> list[float]:
    """Run one tiny-content study per bucketed shape so every program in
    the serving path (resample, chunked sliding window, argmax) lands in
    the in-process jit cache AND the persistent compilation cache.

    `xy` may be a (nx, ny) pair to warm a body-cropped in-plane extent
    (ops/cropping.py 64-buckets crops, so a handful of pairs covers the
    production shape set). The zero-HU warm volume never triggers the
    crop itself (0 HU > the -500 body threshold everywhere), so the
    requested shape is exactly the shape compiled."""
    # resolve through the SAME helper predict_image uses
    task = resolve_task(task_name, fast=fast)
    nx, ny = (xy, xy) if isinstance(xy, int) else xy
    # model-grid z extent for a raw z: the pipeline resamples spacing[2] ->
    # task resample z (warmup must enumerate MODEL-GRID buckets, which is
    # what the predictor pads)
    times = []
    for z_raw in _raw_z_for_buckets(task, spacing, z_range, bucket):
        vol = np.zeros((nx, ny, z_raw), np.int16)
        affine = np.diag([-spacing[0], -spacing[1], spacing[2], 1.0])
        img = NiftiImage(data=vol, affine=affine)
        t0 = time.perf_counter()
        predict_image(img, task_name, store, fast=fast, bucket=bucket,
                      compute_dtype=dtype)
        dt = time.perf_counter() - t0
        times.append(dt)
        logger.info("warmed z=%d in %.1fs", z_raw, dt)
    return times


def _raw_z_for_buckets(task, spacing, z_range, bucket) -> list[int]:
    """One representative raw z per distinct bucketed model-grid extent."""
    resample = task.resample
    zf = 1.0 if resample is None else spacing[2] / resample[2]
    seen, out = set(), []
    for z in range(z_range[0], z_range[1] + 1):
        z_model = int(round(z * zf))
        zb = -(-max(z_model, 1) // bucket) * bucket
        if zb not in seen:
            seen.add(zb)
            out.append(z)
    return out


def bake(store: ModelStore, tasks: list[tuple[str, bool]] | None = None,
         *, xy: int = 512, z_range: tuple[int, int] = (200, 600),
         bucket: int = 64,
         spacing: tuple[float, float, float] = (1.5, 1.5, 3.0),
         stamp: str | None = None, full: bool = False) -> None:
    """Deploy-time warmup over the serving task set (VERDICT r3 #9).

    Populates the in-process jit cache AND the persistent compilation
    cache (`~/.boa_tpu/jax_cache`) for every bucketed shape of the
    default PACS workload (fast total + the two BCA models). With
    `stamp`, a stamp file skips re-baking on subsequent boots of the
    same image+cache volume (delete it to force).

    Intended call sites: `deploy/entrypoint.sh` (BOA_WARMUP_ON_BOOT=1)
    on first boot of a worker, or a manual `python -m boa_tpu.serve.warmup
    --bake` right after weight installation. On standard TPU runtimes the
    persistent cache then removes fresh-process compiles entirely; on
    remote-compile backends (axon) only the partially-cacheable stages
    hit, so the boot-time bake (which warms the live process serving the
    first study when the worker preforks) is the reliable path.
    """
    from pathlib import Path

    if stamp:
        p = Path(stamp).expanduser()
        if p.exists():
            logger.info("warmup stamp %s present, skipping bake", p)
            return
    if tasks is None:
        tasks = [("total", True), ("body_regions", True), ("body_parts", True)]
        if full:
            # full-res serving set (VERDICT r4 #6): the 5-sub-model total
            # ensemble + 5-fold BCA programs, which otherwise cost a
            # ~20-min compile storm on the first non-fast study. The
            # non-fast z sweep is capped to the coarse buckets (every
            # distinct model-grid z is a separate accumulator program).
            tasks += [("total", False), ("body_regions", False),
                      ("body_parts", False)]
    # in-plane extents to warm: the uncropped FOV plus the most common
    # body-crop buckets (ops/cropping.py aligns crops to 64-multiples;
    # a whole-torso 512-FOV study typically crops to ~384x320)
    xys: list[int | tuple[int, int]] = [xy]
    if full and xy == 512:
        xys.append((384, 320))
    for name, fast in tasks:
        for shape_xy in (xys if not fast else xys[:1]):
            try:
                t = warmup_task(store, name, fast=fast, xy=shape_xy,
                                z_range=z_range, bucket=bucket,
                                spacing=spacing)
                logger.info("baked %s xy=%s (%d shapes, %.1fs)", name,
                            shape_xy, len(t), sum(t))
            except FileNotFoundError as exc:  # weights not installed yet
                logger.warning("skipping bake of %s: %s", name, exc)
    if stamp:
        p = Path(stamp).expanduser()
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text("baked\n")


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--task", default="total")
    ap.add_argument("--fast", action="store_true")
    ap.add_argument("--xy", type=int, default=512)
    ap.add_argument("--z-range", type=int, nargs=2, default=(200, 600))
    ap.add_argument("--bucket", type=int, default=64)
    ap.add_argument("--spacing", type=float, nargs=3, default=(1.5, 1.5, 3.0))
    ap.add_argument("--weights", default=None, help="weights root override")
    ap.add_argument("--bake", action="store_true",
                    help="warm the full PACS task set (fast total + BCA)")
    ap.add_argument("--full", action="store_true",
                    help="with --bake: also warm the non-fast programs "
                    "(5-sub-model total ensemble + 5-fold BCA, cropped "
                    "and uncropped in-plane shapes) — long, deploy-time")
    ap.add_argument("--stamp", default=None,
                    help="stamp file: skip the bake when it exists")
    args = ap.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    store = ModelStore(args.weights)
    if args.bake:
        bake(store, xy=args.xy, z_range=tuple(args.z_range),
             bucket=args.bucket, spacing=tuple(args.spacing),
             stamp=args.stamp, full=args.full)
        return
    times = warmup_task(store, args.task, fast=args.fast, xy=args.xy,
                        z_range=tuple(args.z_range), bucket=args.bucket,
                        spacing=tuple(args.spacing))
    print(f"warmed {len(times)} bucketed shapes in {sum(times):.1f}s")


if __name__ == "__main__":
    main()
