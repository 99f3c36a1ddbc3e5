"""BCA chain tests: postprocessing, tissues, report builder, pipeline."""

import json

import numpy as np
import pandas as pd
import pytest

from boa_tpu.bca import postprocess as bca_pp
from boa_tpu.bca.definitions import BodyPart, BodyRegion, Tissue
from boa_tpu.bca.report import AggregatableBodyPart, Builder, create_vertebrae_info
from boa_tpu.bca.tissues import subclassify_tissues
from boa_tpu.io.nifti import NiftiImage
from boa_tpu.tasks import class_maps
from boa_tpu.weights.store import ModelStore


def test_region_postprocess_unique_segments():
    seg = np.zeros((30, 30, 30), np.uint8)
    # two pericardium blobs: larger kept, smaller -> 255
    seg[5:15, 5:15, 5:15] = int(BodyRegion.PERICARDIUM)
    seg[20:23, 20:23, 20:23] = int(BodyRegion.PERICARDIUM)
    out = bca_pp.postprocess_region_segmentation(seg)
    assert out[10, 10, 10] == int(BodyRegion.PERICARDIUM)
    assert out[21, 21, 21] == 255


def test_region_postprocess_global_largest():
    seg = np.zeros((30, 30, 30), np.uint8)
    seg[2:20, 2:20, 2:20] = int(BodyRegion.MUSCLE)  # big connected block
    seg[25:28, 25:28, 25:28] = int(BodyRegion.BONE)  # small detached island
    out = bca_pp.postprocess_region_segmentation(seg)
    assert out[10, 10, 10] == int(BodyRegion.MUSCLE)
    assert out[26, 26, 26] == 255


def test_parts_postprocess_fills_holes_and_removes_small():
    seg = np.zeros((40, 40, 20), np.uint8)
    seg[5:35, 5:35, 2:18] = int(BodyPart.TORSO)
    seg[15:20, 15:20, 5:10] = 0  # internal hole (small) -> filled
    seg[36:38, 36:38, 2:4] = int(BodyPart.HEAD)  # tiny blob -> removed
    out = bca_pp.postprocess_part_segmentation(seg)
    assert out[17, 17, 7] == int(BodyPart.TORSO)
    assert (out == int(BodyPart.HEAD)).sum() == 0


def test_parts_postprocess_native_matches_python(rng, monkeypatch):
    """Fused native boa_parts_postprocess_label == the numpy/cv2 path on
    blobby, speckled, and edge-clamped inputs (8/4-connectivity duality
    makes border flood fill equal cv2 external-contour fill)."""
    from boa_tpu import native

    if native.get_lib() is None or \
            not hasattr(native.get_lib(), "boa_parts_postprocess_label"):
        pytest.skip("native lib unavailable")

    cases = []
    # blobby anatomy-like: torso slab with holes + appendages at edges
    seg = np.zeros((40, 36, 24), np.uint8)
    seg[4:32, 6:30, :] = 1          # clamped at z faces
    seg[10:14, 10:14, 4:20] = 0     # big internal hole (kept if >= thr)
    seg[20:22, 20:22, 8:10] = 0     # small hole -> filled
    seg[0:3, 0:3, 0:3] = 2          # small blob at corner -> removed
    seg[33:40, 30:36, 10:24] = 3    # blob clamped at hi faces
    cases.append((seg, 30))
    # random speckle exercises diagonal configurations
    sp = (rng.random((32, 30, 26)) < 0.35).astype(np.uint8)
    sp[sp > 0] = rng.integers(1, 4, size=int((sp > 0).sum())).astype(np.uint8)
    cases.append((sp, 9))
    cases.append((sp, 2))
    for seg_case, thr in cases:
        monkeypatch.setenv("BOA_NATIVE_PARTS", "0")
        want = bca_pp.remove_small_labeled_objects(seg_case.copy(), thr)
        monkeypatch.setenv("BOA_NATIVE_PARTS", "1")
        got = bca_pp.remove_small_labeled_objects(seg_case.copy(), thr)
        np.testing.assert_array_equal(got, want)


def test_subclassify_tissues_rules(rng):
    shape = (20, 20, 10)
    ct = rng.integers(-400, 200, size=shape).astype(np.int16)
    regions = np.zeros(shape, np.uint8)
    regions[:10] = int(BodyRegion.MUSCLE)
    regions[10:, :10] = int(BodyRegion.ABDOMINAL_CAVITY)
    regions[10:, 10:] = int(BodyRegion.BONE)
    out = subclassify_tissues(ct, regions)
    # naive
    ref = np.zeros(shape, np.uint8)
    ref[(regions == int(BodyRegion.MUSCLE)) & (ct >= -29) & (ct <= 150)] = int(
        Tissue.MUSCLE)
    ref[(regions == int(BodyRegion.BONE)) & (ct >= -1000) & (ct <= 3000)] = int(
        Tissue.BONE)
    ref[(regions == int(BodyRegion.ABDOMINAL_CAVITY)) & (ct >= -190)
        & (ct <= -30)] = int(Tissue.VAT)
    ref[(regions == int(BodyRegion.MUSCLE)) & (ct >= -190) & (ct <= -30)] = int(
        Tissue.IMAT)
    np.testing.assert_array_equal(out, ref)


def test_subclassify_tissues_device_raw_path(rng):
    """regions_dev_raw + 1-bit ignore mask == full host-upload path."""
    import jax.numpy as jnp

    shape = (16, 20, 10)
    ct = rng.integers(-400, 200, size=shape).astype(np.int16)
    raw = rng.integers(0, 12, size=shape).astype(np.uint8)
    post = raw.copy()
    post[3:5, 2:9, 1:4] = 255  # postprocess-removed fragments
    want = subclassify_tissues(ct, post)
    got, got_dev, regions_dev = subclassify_tissues(
        ct, post, return_device=True, regions_dev_raw=jnp.asarray(raw))
    np.testing.assert_array_equal(got, want)
    # device regions copy carries the 15-encoded ignore fragments
    assert (np.asarray(regions_dev)[3:5, 2:9, 1:4] == 15).all()
    np.testing.assert_array_equal(
        np.where(post == 255, np.uint8(15), post), np.asarray(regions_dev))
    # no ignore fragments at all: raw passes through untouched
    got2 = subclassify_tissues(ct, raw, regions_dev_raw=jnp.asarray(raw))
    np.testing.assert_array_equal(got2, subclassify_tissues(ct, raw))


def test_subclassify_host_native_parity(rng):
    """The native LUT host rebuild (boa_subclassify_lut) matches the
    device download path bit-for-bit — incl. 255-ignore regions, region
    ids outside every rule, and out-of-range HU values."""
    from boa_tpu.bca import tissues as T

    shape = (24, 16, 12)
    ct = rng.integers(-2000, 4000, size=shape).astype(np.int16)
    ct[0, 0, :4] = (-32768, -1024, 3071, 32767)  # clamp corners
    regions = rng.integers(0, 16, size=shape).astype(np.uint8)
    regions[5:7] = 255  # ignore fragments
    native = T._subclassify_host_native(ct, regions)
    if native is None:
        import pytest

        pytest.skip("native lib unavailable")
    via_device = subclassify_tissues(ct, regions)  # download path
    np.testing.assert_array_equal(native, via_device)
    # the ct_host fast path is what the pipeline calls
    fast = subclassify_tissues(ct, regions, ct_host=ct)
    np.testing.assert_array_equal(fast, via_device)
    # median filtering must NOT take the raw-HU host shortcut
    med = subclassify_tissues(ct, regions, median_filtering=True,
                              ct_host=ct)
    med_ref = subclassify_tissues(ct, regions, median_filtering=True)
    np.testing.assert_array_equal(med, med_ref)
    # the device heatmap-density twin matches the host one
    import jax.numpy as jnp

    from boa_tpu.bca import plots, report

    for axis in (0, 1):
        np.testing.assert_allclose(
            np.asarray(report._tissue_density_pass(jnp.asarray(native), axis)),
            plots.tissue_densities(native, axis), rtol=0, atol=1e-6)


def test_upload_mask_roundtrip(rng):
    from boa_tpu.ops import packing

    for shape in ((16, 5, 3), (13, 4)):  # 8-divisible and not
        m = rng.random(shape) < 0.1
        dev = packing.upload_mask(m)
        np.testing.assert_array_equal(np.asarray(dev) != 0, m)


@pytest.fixture(scope="module")
def synthetic_study():
    rng = np.random.default_rng(5)
    shape = (40, 40, 120)  # 120 slices at 5mm = 600mm scan
    spacing = (2.0, 2.0, 5.0)
    ct = rng.integers(-300, 200, size=shape).astype(np.int16)
    regions = np.zeros(shape, np.uint8)
    regions[10:30, 10:30, 5:55] = int(BodyRegion.ABDOMINAL_CAVITY)  # 250mm
    regions[10:30, 10:30, 55:100] = int(BodyRegion.THORACIC_CAVITY)  # 225mm
    regions[15:25, 15:25, 60:80] = int(BodyRegion.MEDIASTINUM)
    regions[17:23, 17:23, 62:72] = int(BodyRegion.PERICARDIUM)
    regions[5:35, 5:10, 5:100] = int(BodyRegion.MUSCLE)
    regions[30:34, 12:28, 5:100] = int(BodyRegion.SUBCUTANEOUS_TISSUE)
    # overlap slice between thorax and abdomen
    regions[10:30, 10:30, 55] = int(BodyRegion.ABDOMINAL_CAVITY)
    regions[12:28, 12:28, 55] = int(BodyRegion.THORACIC_CAVITY)
    parts = np.zeros(shape, np.uint8)
    parts[5:35, 5:35, :] = int(BodyPart.TORSO)
    tissues = subclassify_tissues(ct, regions)
    return ct, parts, regions, tissues, spacing


def test_body_part_detection(synthetic_study):
    ct, parts, regions, tissues, spacing = synthetic_study
    bp = AggregatableBodyPart.from_body_regions(regions, spacing[2])
    assert AggregatableBodyPart.ABDOMEN in bp
    assert AggregatableBodyPart.THORAX in bp
    assert AggregatableBodyPart.NECK in bp  # 20 slices above mediastinum = 100mm


def test_builder_slicewise_matches_naive(synthetic_study):
    ct, parts, regions, tissues, spacing = synthetic_study
    b = Builder(ct, parts, regions, tissues, spacing)
    df = b.slicewise_measurements()
    ml = np.prod(spacing) / 1000.0
    for t in [Tissue.MUSCLE, Tissue.VAT, Tissue.SAT]:
        name = t.name.capitalize() if t in (Tissue.BONE, Tissue.MUSCLE) else t.name
        ref = (tissues == int(t)).sum(axis=(0, 1)) * ml
        np.testing.assert_allclose(df[name].values, ref, rtol=1e-6)
    np.testing.assert_allclose(
        df["TAT"].values,
        df[["SAT", "VAT", "IMAT", "PAT", "EAT"]].sum(axis=1).values)
    # no-limbs variant only counts torso voxels
    df_nl = b.slicewise_measurements_no_limbs()
    ref_nl = ((tissues == int(Tissue.MUSCLE)) & (parts == int(BodyPart.TORSO))
              ).sum(axis=(0, 1)) * ml
    np.testing.assert_allclose(df_nl["Muscle"].values, ref_nl, rtol=1e-6)


def test_builder_aggregation_and_json(synthetic_study):
    ct, parts, regions, tissues, spacing = synthetic_study
    b = Builder(ct, parts, regions, tissues, spacing)
    b.examined_body_part = AggregatableBodyPart.from_body_regions(regions, spacing[2])
    vertebrae = {"L3": (20, 26)}
    prepared = b.prepare(vertebrae)
    data = b.create_json(**prepared)

    names = [n for n, *_ in prepared["aggregated_measurements"]]
    assert names[:6] == ["Whole Scan", "Ventral Cavity", "Abdominal Cavity",
                         "Thoracic Cavity", "Mediastinum", "Pericardium"]
    assert "L3" in names
    agg = data["aggregated"]["whole_scan"]
    assert agg["num_slices"] == 120
    # describe parity: mean of slice-wise muscle volumes
    df = prepared["slicewise_measurements"]
    ref_mean = float(df["Muscle"].mean())
    np.testing.assert_allclose(agg["measurements"]["muscle"]["mean"], ref_mean)
    ref_std = float(df["Muscle"].std())  # pandas ddof=1
    np.testing.assert_allclose(agg["measurements"]["muscle"]["std"], ref_std)
    # MeanHU parity for a group (abdominal cavity includes the overlap
    # slice at z=55, so the range is [5, 56))
    lo, hi = 5, 56
    abd = data["aggregated"]["abdominal_cavity"]
    assert abd["min_slice_idx"] == lo and abd["max_slice_idx"] == hi
    m = tissues[:, :, lo:hi] == int(Tissue.VAT)
    ref_hu = float(ct[:, :, lo:hi][m].mean())
    np.testing.assert_allclose(abd["measurements"]["vat"]["mean_hu"], ref_hu,
                               rtol=1e-5)
    assert data["body_parts"]["abdomen"] is True
    # slices records
    assert len(data["slices"]) == 120
    assert set(data["slices"][0].keys()) == {
        "bone", "muscle", "tat", "imat", "sat", "vat", "pat", "eat"}


def test_vertebrae_info():
    cm = class_maps.get_class_map("total")
    inv = {v: k for k, v in cm.items()}
    seg = np.zeros((20, 20, 50), np.uint8)
    seg[5:10, 5:10, 10:15] = inv["vertebrae_L3"]
    seg[5:10, 5:10, 30:36] = inv["vertebrae_T5"]
    seg[5:10, 5:10, 40:42] = inv["vertebrae_C7"]
    bp = AggregatableBodyPart.ABDOMEN | AggregatableBodyPart.THORAX
    info = create_vertebrae_info(seg, bp, cm)
    assert info["L3"] == (10, 15)
    assert info["T5"] == (30, 36)
    assert "C7" not in info  # no neck detected


def test_bca_real_model_path(tmp_path):
    """Real (synthetic-weights) BCA model path: weight-store loading,
    trainer-dir resolution (NoMirroring / 1500epochs_NoMirroring),
    label_names plumbing, and the actual fold forward — coverage the CLI
    e2e test lost when it moved onto the fake-predict anatomy hook."""
    from boa_tpu.inference.pipeline import predict_image
    from boa_tpu.weights.store import ModelStore, create_synthetic_model

    wroot = tmp_path / "weights"
    create_synthetic_model(
        wroot, 542, "BCA_body_regions", num_classes=max(BodyRegion) + 1,
        trainer="nnUNetTrainerNoMirroring", patch_size=(16, 16, 8),
        spacing=(1.5, 1.5, 5.0), features=(4, 8),
        label_names=["background"] + [r.name for r in
                                      sorted(BodyRegion, key=int)])
    create_synthetic_model(
        wroot, 543, "BCA_body_parts", num_classes=max(BodyPart) + 1,
        trainer="nnUNetTrainer_1500epochs_NoMirroring",
        patch_size=(16, 16, 8), spacing=(1.5, 1.5, 5.0), features=(4, 8),
        label_names=["background"] + [r.name for r in
                                      sorted(BodyPart, key=int)])
    store = ModelStore(wroot)
    data = np.full((40, 36, 16), -1000, np.int16)
    data[8:32, 8:28, :] = 40
    img = NiftiImage(data=data, affine=np.diag([-1.5, -1.5, 3.0, 1.0]))
    res_r = predict_image(img, "body_regions", store, fast=True)
    assert res_r.seg.shape == data.shape
    assert res_r.label_map[int(BodyRegion.ABDOMINAL_CAVITY)].upper() == \
        BodyRegion.ABDOMINAL_CAVITY.name
    res_p = predict_image(img, "body_parts", store, fast=True)
    assert res_p.seg.shape == data.shape
    assert res_p.label_map[int(BodyPart.TORSO)].upper() == BodyPart.TORSO.name


def test_vertebrae_info_native_matches_numpy(rng, monkeypatch):
    """boa_label_z_presence path == the numpy range-mask/bincount path on
    a dense random seg covering in-range, out-of-range, and 0 labels."""
    from boa_tpu import native
    from boa_tpu.bca import report as report_mod

    if native.get_lib() is None or \
            not hasattr(native.get_lib(), "boa_label_z_presence"):
        pytest.skip("native lib unavailable")
    cm = class_maps.get_class_map("total")
    seg = rng.integers(0, 118, (24, 22, 37)).astype(np.uint8)
    bp = (AggregatableBodyPart.ABDOMEN | AggregatableBodyPart.THORAX
          | AggregatableBodyPart.NECK)
    got = create_vertebrae_info(seg, bp, cm)
    monkeypatch.setattr(report_mod.native, "get_lib", lambda: None)
    want = create_vertebrae_info(seg, bp, cm)
    assert got == want and got  # non-trivial: dense seg hits vertebrae


def test_run_pipeline_fake(tmp_path, synthetic_study):
    from boa_tpu.bca.pipeline import run_pipeline

    ct, parts, regions, tissues, spacing = synthetic_study
    affine = np.diag([*spacing, 1.0])
    img = NiftiImage(data=ct, affine=affine)

    def fake(vol, sp, task_id):
        # return parts for 543, regions for 542 at model grid; the model grid
        # equals the input grid here except z (5mm == input z already)
        src = parts if task_id == 543 else regions
        if vol.shape == src.shape:
            return src
        from boa_tpu.ops import resample as rs

        return np.asarray(rs.resample_nearest(src, vol.shape, "zoom"))

    out = run_pipeline(img, tmp_path, store=ModelStore("/nonexistent"),
                       save_pdf=True, fake_predict=fake)
    assert (tmp_path / "body_parts.nii.gz").exists()
    assert (tmp_path / "body_regions.nii.gz").exists()
    assert (tmp_path / "tissues.nii.gz").exists()
    assert (tmp_path / "bca-measurements.json").exists()
    assert (tmp_path / "report.pdf").exists()
    assert (tmp_path / "report.pdf").stat().st_size > 1000
    assert out["body_parts"]["abdomen"] is True
    saved = json.loads((tmp_path / "bca-measurements.json").read_text())
    assert saved["aggregated"]["whole_scan"]["num_slices"] == 120


def test_run_pipeline_worker_deferred_tissues(tmp_path, synthetic_study):
    """With a HostWorker the host tissue map is rebuilt on the worker
    (defer_host) — artifacts must match the serial run bit-for-bit."""
    from boa_tpu.bca.pipeline import run_pipeline
    from boa_tpu.io import nifti
    from boa_tpu.utils.stages import HostWorker

    ct, parts, regions, tissues, spacing = synthetic_study
    affine = np.diag([*spacing, 1.0])
    img = NiftiImage(data=ct, affine=affine)

    def fake(vol, sp, task_id):
        src = parts if task_id == 543 else regions
        if vol.shape == src.shape:
            return src
        from boa_tpu.ops import resample as rs

        return np.asarray(rs.resample_nearest(src, vol.shape, "zoom"))

    serial_dir = tmp_path / "serial"
    worker_dir = tmp_path / "worker"
    out_s = run_pipeline(img, serial_dir, store=ModelStore("/nonexistent"),
                         save_pdf=True, fake_predict=fake)
    worker = HostWorker()
    try:
        images: dict = {}
        out_w = run_pipeline(img, worker_dir, store=ModelStore("/nonexistent"),
                             save_pdf=True, fake_predict=fake, worker=worker,
                             images_out=images)
    finally:
        worker.close()
    np.testing.assert_array_equal(
        np.asarray(nifti.load(serial_dir / "tissues.nii.gz").data),
        np.asarray(nifti.load(worker_dir / "tissues.nii.gz").data))
    assert out_s == out_w
    assert images["tissues"] is not None
    assert (worker_dir / "report.pdf").stat().st_size > 1000


def test_breast_implant_findings_speckle_fast():
    """A noisy region map with thousands of speckle components must be
    summarized in one labeling pass (regression: the per-component
    full-volume scan was O(n_components x volume) — >45 min on a real-size
    study with a noisy segmentation)."""
    import time

    from boa_tpu.bca.definitions import BodyPart, BodyRegion
    from boa_tpu.bca.report import Builder

    rng = np.random.default_rng(0)
    regions = np.zeros((96, 96, 40), np.uint8)
    speckle = rng.random(regions.shape) < 0.02  # ~7400 tiny components
    regions[speckle] = int(BodyRegion.BREAST_IMPLANT)
    regions[10:30, 40:60, 10:20] = int(BodyRegion.BREAST_IMPLANT)   # left
    regions[66:86, 40:60, 10:20] = int(BodyRegion.BREAST_IMPLANT)   # right
    ct = np.zeros(regions.shape, np.int16)
    parts = np.full(regions.shape, int(BodyPart.TORSO), np.uint8)
    tissues = np.zeros(regions.shape, np.uint8)
    b = Builder(ct, parts, regions, tissues, (2.0, 2.0, 5.0))
    t0 = time.perf_counter()
    out = b._breast_implant_findings(ml_per_voxel=0.02)
    assert time.perf_counter() - t0 < 10.0
    assert len(out) == 1 and "two breast implants" in out[0]


def test_report_pdf_structure(synthetic_study, tmp_path):
    """The PDF carries the expected page structure (multi-page document
    with the summary + per-group pages — structural parity assertion,
    VERDICT r1 weak #9: don't only check existence)."""
    ct, parts, regions, tissues, spacing = synthetic_study
    from boa_tpu.bca.report import (AggregatableBodyPart, Builder,
                                    create_vertebrae_info)

    b = Builder(ct, parts, regions, tissues, spacing)
    b.examined_body_part = (AggregatableBodyPart.ABDOMEN
                            | AggregatableBodyPart.THORAX)
    prepared = b.prepare(None, total=None, total_measurements=None)
    # the PDF may render on the HostWorker: device access must all happen
    # in prepare (main thread) — rendering with the CT gone proves it
    b._ct = None
    pdf = b.create_pdf(**prepared)
    assert pdf.startswith(b"%PDF")
    n_pages = pdf.count(b"/Type /Page") - pdf.count(b"/Type /Pages")
    # summary + heatmaps + slice-check strip + one page per aggregation
    # window (tables + mid-slice overlay image)
    n_aggs = len(prepared["aggregated_measurements"])
    assert n_pages == 3 + n_aggs, \
        f"expected {3 + n_aggs} pages, got {n_pages}"
    # aggregated measurements cover the cavity groups
    names = [name for name, *_ in prepared["aggregated_measurements"]]
    assert "Whole Scan" in names
    assert any("Cavity" in n for n in names)


def test_preview_contains_all_roi_groups(tmp_path):
    """Every ROI-group panel appears in the montage and groups present
    in the phantom produce non-empty overlays."""
    from boa_tpu.compute import preview
    from boa_tpu.tasks.class_maps import get_class_map
    from boa_tpu.testing import anatomy

    shape, spacing = (96, 96, 60), (4.0, 4.0, 6.0)
    seg = anatomy.fake_total_seg(shape, spacing)
    cmap = get_class_map("total")
    inv = {v: k for k, v in cmap.items()}
    depths = preview._label_depths(seg, max(cmap) + 1)
    present = {name for name, rois in preview.ROI_GROUPS.items()
               if any(r in inv and
                      (depths[:, :, inv[r]] < preview._FAR).any()
                      for r in rois)}
    # the phantom populates every ROI group (sternum covers "ribs")
    assert present == set(preview.ROI_GROUPS)
    ct = anatomy.synth_ct(shape, spacing)
    ct_img = NiftiImage(data=ct, affine=np.diag([*spacing, 1.0]))
    seg_img = NiftiImage(data=seg, affine=np.diag([*spacing, 1.0]))
    out = tmp_path / "p.png"
    preview.generate_preview(ct_img, seg_img, cmap, out)
    assert out.exists() and out.stat().st_size > 20000

    # decode the montage and require COLORED (non-gray) segmentation
    # pixels in each of the 5 panels — the CT underlay and titles are
    # grayscale, so saturation only comes from shaded organ surfaces
    import matplotlib.image as mpimg

    rgb = mpimg.imread(out)[..., :3]
    panels = np.array_split(rgb, len(preview.ROI_GROUPS), axis=1)
    for group, panel in zip(preview.ROI_GROUPS, panels):
        saturation = panel.max(axis=-1) - panel.min(axis=-1)
        assert (saturation > 0.15).sum() > 50, \
            f"panel {group!r} has no rendered segmentation"
