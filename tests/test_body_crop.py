"""In-plane body crop (ops/cropping.py:body_crop_xy).

TPU-first addition (behavioral kin of the reference's `bin/crop_to_body`
and `python_api body_seg=True`): `analyze_ct` crops the study to the HU
body bbox before the first upload, and `nifti.save` pads outputs back so
on-disk volumes are grid-identical to an uncropped run.
"""

import numpy as np
import pytest

from boa_tpu.io import nifti
from boa_tpu.ops.cropping import BodyCrop, body_crop_xy, pad_back


def _phantom(shape=(160, 128, 24), spacing=(1.5, 1.5, 3.0)):
    gx = np.linspace(-1, 1, shape[0], dtype=np.float32)[:, None]
    gy = np.linspace(-1, 1, shape[1], dtype=np.float32)[None, :]
    body = (gx ** 2 / 0.30 + gy ** 2 / 0.25) < 1.0
    vol = np.where(body, 40.0, -1000.0).astype(np.float32)
    vol = np.repeat(vol[:, :, None], shape[2], axis=2)
    aff = np.diag([-spacing[0], -spacing[1], spacing[2], 1.0])
    aff[:3, 3] = (100.0, 90.0, -200.0)
    return nifti.NiftiImage(data=vol.astype(np.int16), affine=aff)


def test_bbox_covers_body_with_margin():
    img = _phantom()
    out, info = body_crop_xy(img, margin_mm=6.0, stride=2)
    assert info is not None
    body = np.asarray(img.data)[:, :, 0] > -500
    xs, ys = np.nonzero(body)
    assert info.x0 <= xs.min() and info.x1 > xs.max()
    assert info.y0 <= ys.min() and info.y1 > ys.max()
    # 64-bucketed extents (unless clamped at the FOV edge)
    assert (info.x1 - info.x0) % 64 == 0 or info.x1 - info.x0 == 160
    assert (info.y1 - info.y0) % 64 == 0 or info.y1 - info.y0 == 128
    # world geometry preserved: voxel (x0, y0, 0) maps to the same point
    orig = img.affine @ np.array([info.x0, info.y0, 0, 1.0])
    new = out.affine @ np.array([0, 0, 0, 1.0])
    np.testing.assert_allclose(new, orig)


def test_skip_when_body_fills_fov():
    img = _phantom()
    img.data = np.full_like(np.asarray(img.data), 40)  # all body
    out, info = body_crop_xy(img)
    assert info is None and out is img


def test_skip_on_empty_volume():
    img = _phantom()
    img.data = np.full_like(np.asarray(img.data), -1000)
    out, info = body_crop_xy(img)
    assert info is None


def test_pad_back_roundtrip():
    img = _phantom()
    out, info = body_crop_xy(img, margin_mm=6.0)
    assert info is not None
    full = pad_back(np.asarray(out.data), info)
    assert full.shape == img.shape
    # inside the crop the voxels are intact, outside zero-filled
    np.testing.assert_array_equal(
        full[info.x0:info.x1, info.y0:info.y1], np.asarray(out.data))
    assert (full[:info.x0] == 0).all() and (full[info.x1:] == 0).all()


def test_save_pads_back_to_original_grid(tmp_path):
    img = _phantom()
    out, info = body_crop_xy(img, margin_mm=6.0)
    seg = nifti.NiftiImage(
        data=(np.asarray(out.data) > -500).astype(np.uint8),
        affine=out.affine, crop_info=info)
    nifti.save(seg, tmp_path / "seg.nii.gz")
    back = nifti.load(tmp_path / "seg.nii.gz")
    assert back.shape == img.shape
    np.testing.assert_allclose(back.affine, img.affine)
    np.testing.assert_array_equal(
        np.asarray(back.data)[info.x0:info.x1, info.y0:info.y1],
        np.asarray(seg.data))


def test_analyze_ct_outputs_grid_identical_with_and_without_crop(tmp_path):
    """End-to-end: a CT-content-derived fake makes labels crop-invariant,
    so the saved total.nii.gz must be voxel-identical either way."""
    from boa_tpu.commands import analyze_ct

    rng = np.random.default_rng(3)
    shape = (128, 96, 24)
    img = _phantom(shape)
    vol = np.asarray(img.data).astype(np.float32)
    vol += 8 * rng.standard_normal(shape, dtype=np.float32)
    img.data = vol.astype(np.int16)
    nifti.save(img, tmp_path / "study.nii.gz")

    def _fake(v, spacing, task_id):
        seg = np.zeros(v.shape, np.uint8)
        seg[np.asarray(v) > -300] = 5  # body interior
        core = np.asarray(v) > 35
        seg[core] = 9
        return seg

    outs = {}
    for flag, sub in (("0", "plain"), ("1", "cropped")):
        import os

        os.environ["BOA_BODY_CROP"] = flag
        try:
            out = tmp_path / f"out_{sub}"
            analyze_ct(input_folder=tmp_path / "study.nii.gz",
                       processed_output_folder=out, excel_output_folder=out,
                       models=["total"], bca_pdf=False,
                       compute_contrast_information=False, fast_total=True,
                       cnr_adjustment=False, fake_predict=_fake)
            outs[sub] = nifti.load(out / "total.nii.gz")
        finally:
            os.environ.pop("BOA_BODY_CROP", None)

    a, b = outs["plain"], outs["cropped"]
    assert a.shape == b.shape == shape
    np.testing.assert_allclose(a.affine, b.affine)
    da, db = np.asarray(a.data), np.asarray(b.data)
    # identical except (at most) cubic-resample edge effects in air at the
    # crop border — inside the body bbox the labels must match exactly
    assert (da != db).mean() < 0.01
    body = np.asarray(img.data) > -300
    np.testing.assert_array_equal(da[body], db[body])


def test_windowed_resample_is_exact_subgrid():
    """The crop-window operators (ops/resample.py `_axis_op_windowed`)
    must reproduce the FULL-grid sample positions: resampling a cropped
    volume with windows == slicing the full-grid resample, to fp32
    rounding inside the margin (the zoom coordinate map depends on the
    full extents, so unwindowed crop resampling shifts sub-voxel-wise)."""
    from boa_tpu.ops import resample as rs

    rng = np.random.default_rng(0)
    full_in, zoom = 160, 2.5 / 3.0
    full_out = rs.zoom_output_shape((full_in,), (zoom,))[0]
    vol = np.full((full_in, 8, 8), -1000.0, np.float32)
    vol[40:120] = rng.normal(40, 30, (80, 8, 8)).astype(np.float32)
    x0, x1 = 32, 128  # crop with >= 8 voxels of air margin
    o0 = int(round(x0 * zoom))
    w = rs.zoom_output_shape((x1 - x0,), (zoom,))[0]

    ref = np.asarray(rs.resample_volume(vol, (full_out, 8, 8), order=3))
    win = ((full_in, full_out, x0, o0), None, None)
    got = np.asarray(rs.resample_volume(vol[x0:x1], (w, 8, 8), order=3,
                                        windows=win))
    # 0.1 HU: the prefilter's IIR tail reaches past the air margin with
    # ~0.268^d weights; downstream casts to int32 HU anyway
    np.testing.assert_allclose(got, ref[o0:o0 + w], rtol=0, atol=0.1)

    seg = (vol > -300).astype(np.uint8) * 7
    ref_n = np.asarray(rs.resample_nearest(seg, (full_out, 8, 8)))
    got_n = np.asarray(rs.resample_nearest(seg[x0:x1], (w, 8, 8),
                                           windows=win))
    np.testing.assert_array_equal(got_n, ref_n[o0:o0 + w])

    # back direction: model grid -> original grid window
    bwin = ((full_out, full_in, o0, x0), None, None)
    back_ref = np.asarray(rs.resample_nearest(ref_n, (full_in, 8, 8)))
    back_got = rs.resample_nearest_host(np.asarray(got_n), (x1 - x0, 8, 8),
                                        windows=bwin)
    np.testing.assert_array_equal(back_got, back_ref[x0:x1])


def test_cropped_run_fake_path_is_bit_identical(tmp_path):
    """Full-pipeline transparency: with the anatomy fake (painted on the
    full model grid, sliced to the crop window) the saved total.nii.gz of
    a cropped run equals the uncropped run EXACTLY — windowed resampling
    makes the crop an exact subgrid, so label borders cannot shift."""
    import os

    from boa_tpu.commands import analyze_ct
    from boa_tpu.testing.anatomy import fake_predict_factory, synth_ct

    shape, spacing = (96, 96, 24), (2.5, 2.5, 6.0)
    affine = np.diag([spacing[0], spacing[1], spacing[2], 1.0])
    img = nifti.NiftiImage(data=synth_ct(shape=shape, spacing=spacing),
                           affine=affine)
    nifti.save(img, tmp_path / "study.nii.gz")

    segs = {}
    for flag in ("0", "1"):
        os.environ["BOA_BODY_CROP"] = flag
        try:
            out = tmp_path / f"o{flag}"
            analyze_ct(input_folder=tmp_path / "study.nii.gz",
                       processed_output_folder=out, excel_output_folder=out,
                       models=["total"], bca_pdf=False, total_preview=False,
                       compute_contrast_information=False, fast_total=True,
                       fake_predict=fake_predict_factory())
            segs[flag] = np.asarray(nifti.load(out / "total.nii.gz").data)
        finally:
            os.environ.pop("BOA_BODY_CROP", None)
    np.testing.assert_array_equal(segs["0"], segs["1"])


def test_predict_image_internal_crop_pads_back():
    """Direct predict_image callers (bench, serve) get the crop + pad-back
    transparently: output grid == input grid, labels where the fake put
    them."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from boa_tpu.inference.pipeline import predict_image
    from boa_tpu.weights.store import ModelStore

    img = _phantom((160, 128, 24))

    def _fake(v, spacing, task_id):
        seg = np.zeros(v.shape, np.uint8)
        seg[np.asarray(v) > -300] = 1
        return seg

    _fake.wants_volume = True
    res = predict_image(img, "body", ModelStore("/nonexistent"), fast=True,
                        fake_predict=_fake, keep_device_seg=True)
    assert res.seg.shape == img.shape
    assert getattr(res.seg, "crop_info", None) is None
    body = np.asarray(img.data) > -300
    seg = np.asarray(res.seg.data)
    assert seg[body].mean() > 0.95        # labels survived the pad-back
    assert seg[~body].mean() < 0.05
    cropped_cache = getattr(img, "_body_cropped", None)
    assert cropped_cache is not None      # upload reuse across repeat calls
    if res.seg_dev_full is not None:
        np.testing.assert_array_equal(np.asarray(res.seg_dev_full), seg)
