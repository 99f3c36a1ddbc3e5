"""Sharded sliding-window parity on the 8-device CPU mesh + stream mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from boa_tpu.inference.sliding_window import (sliding_window_logits,
                                              stack_fold_params)
from boa_tpu.models.unet import ArchConfig, init_unet
from boa_tpu.ops import preprocess as pp
from boa_tpu.parallel.mesh import make_mesh
from boa_tpu.parallel.sharded_inference import (pad_starts_for_mesh,
                                                sliding_window_logits_sharded)


def _cfg(n_cls=4, feats=(4, 8)):
    n = len(feats)
    return ArchConfig(
        n_stages=n, features_per_stage=tuple(feats),
        kernel_sizes=((3, 3, 3),) * n,
        strides=((1, 1, 1),) + ((2, 2, 2),) * (n - 1),
        n_conv_per_stage=(2,) * n, n_conv_per_stage_decoder=(2,) * (n - 1),
        num_classes=n_cls, input_channels=1)


def test_pad_starts():
    starts = np.arange(21).reshape(7, 3).astype(np.int32)
    padded, valid = pad_starts_for_mesh(starts, 4)
    assert len(padded) == 8 and valid.sum() == 7
    np.testing.assert_array_equal(padded[7], starts[0])


def test_sharded_matches_single_device(rng):
    cfg = _cfg()
    params = [init_unet(jax.random.PRNGKey(k), cfg) for k in range(2)]
    stacked = stack_fold_params(params)
    vol = rng.normal(size=(1, 24, 20, 18)).astype(np.float32)
    patch = (16, 16, 16)
    starts = pp.tile_starts(vol.shape[1:], patch, 0.5)
    gauss = pp.gaussian_importance_map(patch)

    ref = np.asarray(sliding_window_logits(
        stacked, jnp.asarray(vol), jnp.asarray(starts), jnp.asarray(gauss),
        cfg, (), jnp.float32, jnp.float32))

    mesh = make_mesh(8, ("dp",), (8,))
    got = np.asarray(sliding_window_logits_sharded(
        stacked, jnp.asarray(vol), starts, gauss, cfg, mesh,
        compute_dtype=jnp.float32))
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)
    agree = (got.argmax(0) == ref.argmax(0)).mean()
    assert agree > 0.999


def test_stream_runner(tmp_path, rng):
    from boa_tpu.serve.stream import StreamRunner, StudyJob

    jobs = []
    for k in range(5):
        data = np.full((24, 24, 12), -1000, np.int16)
        data[6:18, 6:18, :] = 40 + k
        from boa_tpu.io.nifti import NiftiImage

        jobs.append(StudyJob(
            study_id=f"s{k}",
            image=NiftiImage(data=data,
                             affine=np.diag([-1.5, -1.5, 3.0, 1.0])),
            output_dir=tmp_path / f"out{k}"))

    def fake(vol, spacing, task_id):
        seg = np.zeros(vol.shape, np.uint8)
        seg[4:12, 4:12, 2:8] = 1
        return seg

    runner = StreamRunner(task="total", fast=True, fake_predict=fake)
    stats = runner.run(jobs)
    assert stats.n_studies == 5
    assert stats.volumes_per_min > 0
    for k in range(5):
        assert (tmp_path / f"out{k}" / "total.nii.gz").exists()


def test_stream_num_parts(tmp_path):
    from boa_tpu.io.nifti import NiftiImage
    from boa_tpu.serve.stream import StreamRunner, StudyJob

    jobs = [StudyJob(study_id=f"s{k}",
                     image=NiftiImage(
                         data=np.full((16, 16, 8), -1000, np.int16),
                         affine=np.diag([-1.5, -1.5, 3.0, 1.0])))
            for k in range(7)]

    def fake(vol, spacing, task_id):
        return np.zeros(vol.shape, np.uint8)

    runner = StreamRunner(task="total", fast=True, fake_predict=fake,
                          write_outputs=False)
    # reference semantics: files[part_id::num_parts]
    assert runner.run(jobs, num_parts=3, part_id=0).n_studies == 3
    assert runner.run(jobs, num_parts=3, part_id=1).n_studies == 2
    assert runner.run(jobs, num_parts=3, part_id=2).n_studies == 2


def test_zslab_sharded_matches_serial_slabs(rng):
    """The SPMD z-slab path == the same slab algorithm executed serially."""
    from boa_tpu.parallel.sharded_inference import sliding_window_logits_zslab

    cfg = _cfg()
    params = [init_unet(jax.random.PRNGKey(7), cfg)]
    stacked = stack_fold_params(params)
    vol = rng.normal(size=(1, 20, 18, 40)).astype(np.float32)
    patch = (16, 16, 16)
    gauss = pp.gaussian_importance_map(patch)

    mesh = make_mesh(4, ("dp",), (4,))
    got = np.asarray(sliding_window_logits_zslab(
        stacked, jnp.asarray(vol), gauss, cfg, mesh,
        compute_dtype=jnp.float32))
    assert got.shape == (4, 20, 18, 40)

    # serial reference: identical slab/margin/tile math, one slab at a time
    n_dp, Z = 4, 40
    slab, margin = 10, 8
    ext = min(slab + 2 * margin, Z)
    ref = np.zeros_like(got)
    for idx in range(n_dp):
        lo = min(max(idx * slab - margin, 0), Z - ext)
        sl = vol[:, :, :, lo:lo + ext]
        starts = pp.tile_starts((20, 18, ext), patch, 0.5)
        fused = np.asarray(sliding_window_logits(
            jax.tree.map(jnp.asarray, stacked), jnp.asarray(sl),
            jnp.asarray(starts), jnp.asarray(gauss), cfg, (),
            jnp.float32, jnp.float32))
        inner = idx * slab - lo
        ref[:, :, :, idx * slab:(idx + 1) * slab] = \
            fused[:, :, :, inner:inner + slab]
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_sharded_chunked_seg_matches_single_device(rng):
    """Chunked in-place multi-chip path == single-device argmax seg."""
    from boa_tpu.parallel.sharded_inference import \
        sliding_window_seg_sharded_chunked

    cfg = _cfg()
    params = [init_unet(jax.random.PRNGKey(k), cfg) for k in range(2)]
    stacked = stack_fold_params(params)
    vol = rng.normal(size=(1, 24, 20, 18)).astype(np.float32)
    patch = (16, 16, 16)
    starts = pp.tile_starts(vol.shape[1:], patch, 0.5)
    gauss = pp.gaussian_importance_map(patch)

    ref = np.asarray(sliding_window_logits(
        stacked, jnp.asarray(vol), jnp.asarray(starts), jnp.asarray(gauss),
        cfg, (), jnp.float32, jnp.float32)).argmax(0)

    mesh = make_mesh(8, ("dp",), (8,))
    got = np.asarray(sliding_window_seg_sharded_chunked(
        stacked, jnp.asarray(vol), starts, gauss, cfg, mesh,
        compute_dtype=jnp.float32, accum_dtype=jnp.float32, k=2))
    np.testing.assert_array_equal(got, ref.astype(got.dtype))


def test_warmup_buckets(tmp_path):
    """Warmup enumerates one representative raw z per bucketed model-grid
    extent and runs the pipeline for each (fake weights, tiny shapes)."""
    from boa_tpu.serve import warmup as wu
    from boa_tpu.weights.store import ModelStore, create_synthetic_model

    create_synthetic_model(tmp_path, 297, "TotalFast", num_classes=3,
                           trainer="nnUNetTrainer_4000epochs_NoMirroring",
                           patch_size=(16, 16, 16), features=(4, 8),
                           n_folds=1)
    store = ModelStore(tmp_path)
    times = wu.warmup_task(store, "total", fast=True, xy=24,
                           z_range=(20, 40), bucket=16,
                           spacing=(3.0, 3.0, 3.0))
    # 3 mm -> 3 mm model grid: z 20..40 buckets to {32, 48} -> 2 programs
    assert len(times) == 2
