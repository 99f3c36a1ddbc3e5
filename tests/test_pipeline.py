"""TS-level pipeline tests using the fake-inference hook (reference test=N,
`nnunet.py:560-578`)."""

import numpy as np
import pytest

from boa_tpu.io.nifti import NiftiImage
from boa_tpu.inference.pipeline import predict_image
from boa_tpu.tasks import class_maps
from boa_tpu.weights.store import ModelStore, create_synthetic_model


def _ct(shape=(40, 38, 30), affine=None, rng=None):
    r = rng or np.random.default_rng(3)
    data = r.integers(-1000, 1200, size=shape).astype(np.int16)
    if affine is None:
        affine = np.array(
            [[-0.9, 0, 0, 100], [0, -0.9, 0, 80], [0, 0, 1.5, -200], [0, 0, 0, 1.0]])
    return NiftiImage(data=data, affine=affine)


def test_fake_single_model_roundtrip():
    """Shapes/affine/orientation survive resample + canonical round trip."""
    img = _ct()
    store = ModelStore("/nonexistent")

    def fake(vol, spacing, task_id):
        # ball in the center of the model-grid volume
        seg = np.zeros(vol.shape, np.uint8)
        cx, cy, cz = [s // 2 for s in vol.shape]
        seg[cx - 3:cx + 3, cy - 3:cy + 3, cz - 3:cz + 3] = 1
        return seg

    res = predict_image(img, "total_fastest", store, fake_predict=fake)
    assert res.seg.shape == img.shape
    np.testing.assert_allclose(res.seg.affine, img.affine)
    assert res.seg.data.dtype == np.uint8
    assert res.seg.data.sum() > 0
    assert res.seg.get_label_map() is not None
    assert res.seg.get_label_map()[1] == "spleen"


def test_keep_device_seg_matches_host_seg():
    """keep_device_seg: the device twin is bit-identical to seg.data
    (same index vectors for host/device nearest resample + orientation)."""
    img = _ct()
    store = ModelStore("/nonexistent")

    def fake(vol, spacing, task_id):
        r = np.random.default_rng(7)
        return r.integers(0, 10, size=vol.shape).astype(np.uint8)

    res = predict_image(img, "body_regions", store, fake_predict=fake,
                        keep_device_seg=True)
    assert res.seg_dev_full is not None
    np.testing.assert_array_equal(np.asarray(res.seg_dev_full),
                                  np.asarray(res.seg.data))
    # cropped predictions can't expose a device twin (undo_crop is host-side)
    mask = NiftiImage(data=(np.asarray(img.data) > 0).astype(np.uint8),
                      affine=img.affine)
    res_c = predict_image(img, "cerebral_bleed", store, crop_mask=mask,
                          fake_predict=fake, keep_device_seg=True)
    assert res_c.seg_dev_full is None


def test_fake_multimodel_merge():
    """5-part merge maps part-local labels into the 117-class space."""
    img = _ct()
    store = ModelStore("/nonexistent")
    calls = []

    def fake(vol, spacing, task_id):
        calls.append(task_id)
        seg = np.zeros(vol.shape, np.uint8)
        # each part predicts its local class 1 in a distinct z-slab
        i = len(calls) - 1
        seg[:, :, 3 * i:3 * i + 3] = 1
        return seg

    res = predict_image(img, "total", store, fake_predict=fake)
    assert calls == [291, 292, 293, 294, 295]
    cm = class_maps.get_class_map("total")
    inv = {v: k for k, v in cm.items()}
    got_labels = set(np.unique(res.seg.data)) - {0}
    expected = set()
    for tid in calls:
        part = class_maps.map_taskid_to_partname[tid]
        name = class_maps.class_map_5_parts[part][1]
        expected.add(inv[name])
    assert got_labels == expected


def test_crop_mask_path():
    img = _ct(shape=(40, 40, 40))
    mask = NiftiImage(data=np.zeros(img.shape, np.uint8), affine=img.affine)
    mask.data[10:25, 12:26, 8:20] = 1
    store = ModelStore("/nonexistent")
    seen_shapes = []

    def fake(vol, spacing, task_id):
        seen_shapes.append(vol.shape)
        return np.ones(vol.shape, np.uint8)

    # cerebral_bleed: 3 mm addon (~3 voxels) keeps the bbox off the border
    res = predict_image(img, "cerebral_bleed", store, crop_mask=mask,
                        fake_predict=fake)
    assert res.seg.shape == img.shape
    # everything outside the (addon-dilated) crop bbox must be zero
    assert res.seg.data[0:2].sum() == 0
    assert res.seg.data[15, 15, 10] == 1


def test_empty_crop_returns_empty():
    img = _ct()
    mask = NiftiImage(data=np.zeros(img.shape, np.uint8), affine=img.affine)
    store = ModelStore("/nonexistent")
    res = predict_image(img, "liver_vessels", store, crop_mask=mask,
                        fake_predict=lambda *a: 1 / 0)
    assert res.seg.data.sum() == 0
    assert res.seg.shape == img.shape


def test_real_synthetic_model_end_to_end(tmp_path):
    """Full path with actual network weights from the synthetic store."""
    store_dir = tmp_path / "weights"
    create_synthetic_model(store_dir, 298, "TotalFastest", num_classes=5,
                           trainer="nnUNetTrainer_4000epochs_NoMirroring",
                           patch_size=(16, 16, 16), spacing=(6.0, 6.0, 6.0),
                           features=(8, 16))
    img = _ct(shape=(48, 44, 40))
    store = ModelStore(store_dir)
    res = predict_image(img, "total_fastest", store, compute_dtype="float32",
                        statistics=True)
    assert res.seg.shape == img.shape
    assert res.stats is not None and "spleen" in res.stats
    assert res.seg_model_grid is not None


def test_real_multimodel_merge_end_to_end(tmp_path):
    """Full `total` 5-sub-model path with real synthetic predictors: the
    class-map merge must place each part's labels at the global indices."""
    from boa_tpu.tasks import class_maps

    store_dir = tmp_path / "weights"
    names = {
        291: "part1_organs", 292: "part2_vertebrae", 293: "part3_cardiac",
        294: "part4_muscles", 295: "part5_ribs",
    }
    for tid, name in names.items():
        part = class_maps.class_map_5_parts[
            class_maps.map_taskid_to_partname[tid]]
        create_synthetic_model(
            store_dir, tid, name, num_classes=max(part) + 1,
            trainer="nnUNetTrainerNoMirroring",
            patch_size=(16, 16, 16), spacing=(6.0, 6.0, 6.0),
            features=(4, 8))
    img = _ct(shape=(40, 36, 32))
    store = ModelStore(store_dir)
    res = predict_image(img, "total", store, compute_dtype="float32",
                        folds=(0,))
    assert res.seg.shape == img.shape
    # all produced labels must be valid `total` label-map indices
    labels = set(np.unique(np.asarray(res.seg.data))) - {0}
    assert labels <= set(res.label_map.keys())


def test_remove_outside_postprocess(tmp_path):
    """heartchambers-style remove-outside-dilated-crop-mask postprocess."""
    store_dir = tmp_path / "weights"
    create_synthetic_model(store_dir, 301, "heartchambers", num_classes=8,
                           trainer="nnUNetTrainer",
                           patch_size=(16, 16, 16), spacing=(6.0, 6.0, 6.0),
                           features=(4, 8))
    img = _ct(shape=(40, 36, 32))
    mask = np.zeros(img.shape, np.uint8)
    mask[14:26, 12:24, 10:22] = 1  # "heart" region
    crop = NiftiImage(data=mask, affine=img.affine.copy())
    store = ModelStore(store_dir)
    res = predict_image(img, "heartchambers_highres", store,
                        crop_mask=crop, compute_dtype="float32")
    seg = np.asarray(res.seg.data)
    # nothing outside the (dilated) heart mask survives
    from boa_tpu.ops.morphology import binary_dilation_cross

    addon = max(1, int(10.0 / float(np.mean(img.zooms))))
    dil = binary_dilation_cross(mask > 0, iterations=addon)
    assert (seg[dil == 0] == 0).all()


def test_nnunet_resampling_option(tmp_path):
    """One-hot order-1 back-resample (TS `nnunet_resampling` flag)."""
    store_dir = tmp_path / "weights"
    create_synthetic_model(store_dir, 298, "fastest2", num_classes=4,
                           trainer="nnUNetTrainer_4000epochs_NoMirroring",
                           patch_size=(16, 16, 16), spacing=(6.0, 6.0, 6.0),
                           features=(4, 8))
    img = _ct(shape=(40, 36, 32))
    store = ModelStore(store_dir)
    res0 = predict_image(img, "total_fastest", store,
                         compute_dtype="float32")
    res1 = predict_image(img, "total_fastest", store,
                         compute_dtype="float32", nnunet_resampling=True)
    assert res1.seg.shape == img.shape
    # both produce valid labels; the smoother resample agrees broadly
    agree = (np.asarray(res0.seg.data) == np.asarray(res1.seg.data)).mean()
    assert agree > 0.8


def test_preview_shaded_surfaces(tmp_path):
    """Preview renders shaded first-hit surfaces (depth-map render, the
    VTK smoothed-contour substitute: preview.py:308-366) and the device
    depth pass agrees with the host fallback."""
    from boa_tpu.compute import preview
    from boa_tpu.tasks.class_maps import get_class_map
    from boa_tpu.testing import anatomy

    shape, spacing = (96, 96, 60), (4.0, 4.0, 6.0)
    seg = anatomy.fake_total_seg(shape, spacing)
    ct = anatomy.synth_ct(shape, spacing)
    n_labels = max(get_class_map("total")) + 1

    d_host = preview._label_depths(seg, n_labels)
    import jax.numpy as jnp

    # the on-device per-group reduction (what generate_preview downloads:
    # one int16 front + uint8 argmin per ROI group) matches the host path
    inv_all = {v: k for k, v in get_class_map("total").items()}
    gf_dev = preview._group_fronts_device(jnp.asarray(seg), inv_all, n_labels)
    gf_host = preview._group_fronts_from_depths(d_host, inv_all)
    assert gf_dev.keys() == gf_host.keys()
    for group in gf_host:
        if gf_host[group] is None:
            assert gf_dev[group] is None
            continue
        fh, wh, lh = gf_host[group]
        fd, wd, ld = gf_dev[group]
        assert lh == ld
        np.testing.assert_array_equal(np.isfinite(fh), np.isfinite(fd))
        np.testing.assert_array_equal(fh[np.isfinite(fh)],
                                      fd[np.isfinite(fd)])
        np.testing.assert_array_equal(wh[np.isfinite(fh)],
                                      wd[np.isfinite(fd)])
    # liver has a front surface with varying depth (3-D, not a flat mask)
    inv = {v: k for k, v in get_class_map("total").items()}
    liver_d = d_host[:, :, inv["liver"]]
    hit = liver_d < preview._FAR
    assert hit.any()
    assert np.ptp(liver_d[hit]) > 2

    ct_img = NiftiImage(data=ct, affine=np.diag([*spacing, 1.0]))
    seg_img = NiftiImage(data=seg, affine=np.diag([*spacing, 1.0]))
    out = tmp_path / "preview.png"
    preview.generate_preview(ct_img, seg_img, get_class_map("total"), out)
    assert out.exists() and out.stat().st_size > 20000


def test_fake_part_segs_merge_to_total():
    """The 5-part fakes (anatomy.fake_part_seg, task ids 291-295) emit
    PART-space ids that the multimodel merge LUT (pipeline merge loop)
    maps back onto exactly the total-space fake — the honest full-res
    bench (tools/e2e_bench.py --full-res) depends on this round trip."""
    from boa_tpu.tasks import class_maps
    from boa_tpu.tasks.class_maps import get_class_map
    from boa_tpu.testing import anatomy

    shape, spacing = (64, 64, 48), (6.0, 6.0, 6.0)
    total = anatomy.fake_total_seg(shape, spacing)
    inv_total = {v: k for k, v in get_class_map("total").items()}

    merged = np.zeros(shape, np.uint8)
    for tid in (291, 292, 293, 294, 295):
        part_map = class_maps.class_map_5_parts[
            class_maps.map_taskid_to_partname[tid]]
        seg_part = anatomy.fake_part_seg(shape, spacing, tid)
        assert seg_part.max() <= max(part_map)
        lut = np.zeros(max(part_map) + 1, np.uint8)
        for jdx, class_name in part_map.items():
            lut[jdx] = inv_total[class_name]
        merged = np.where(seg_part > 0, lut[seg_part], merged)
    # every painted structure lands on its total-space id; where structures
    # from different parts overlap the merge order (task-id order, exactly
    # like the real merge loop) may differ from fake_total_seg's paint
    # order, so compare up to a small overlap fraction
    np.testing.assert_array_equal(merged > 0, total > 0)
    assert (merged == total).mean() > 0.99
    assert set(np.unique(merged)) == set(np.unique(total))
