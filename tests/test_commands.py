"""End-to-end orchestration tests: analyze_ct with the fake-inference hook
(reference `test=N` switch), workbook content, CLI parsing, metrics glue."""

import json
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from boa_tpu.commands import analyze_ct, write_output_workbook
from boa_tpu.io import nifti, xlsx


@pytest.fixture(scope="module")
def ct_file(tmp_path_factory):
    """Synthetic CT with a body-like ellipse, spine-ish core and air bg."""
    tmp = tmp_path_factory.mktemp("ct")
    rng = np.random.default_rng(1)
    shape = (64, 64, 48)
    gx = np.linspace(-1, 1, shape[0], dtype=np.float32)[:, None]
    gy = np.linspace(-1, 1, shape[1], dtype=np.float32)[None, :]
    body = (gx ** 2 / 0.6 + gy ** 2 / 0.5) < 1.0
    base = np.where(body, 40.0, -1000.0).astype(np.float32)
    vol = base[:, :, None] + 10 * rng.standard_normal(shape, dtype=np.float32)
    img = nifti.NiftiImage(
        data=vol.astype(np.int16),
        affine=np.diag([-1.5, -1.5, 3.0, 1.0]))
    p = tmp / "study.nii.gz"
    nifti.save(img, p)
    return p


def _fake_predict(vol, spacing, task_id):
    """Deterministic fake segmentation: a few blobs per task."""
    rngseed = task_id % 7
    seg = np.zeros(vol.shape, np.uint8)
    cx, cy, cz = (s // 2 for s in vol.shape)
    # central organ blob = label 1..5 bands
    seg[cx - 8:cx + 8, cy - 8:cy + 8, cz - 6:cz + 6] = 1 + rngseed % 3
    seg[cx - 3:cx + 3, cy - 3:cy + 3, :] = 5 + rngseed % 2
    return seg


def test_overlapped_stages_match_serial(ct_file, tmp_path, monkeypatch):
    """BOA_SERIAL_STAGES=1 (reference-style serial execution) and the
    default HostWorker-overlapped run produce identical artifacts."""
    outs = {}
    for mode, env in (("overlap", "0"), ("serial", "1")):
        monkeypatch.setenv("BOA_SERIAL_STAGES", env)
        out = tmp_path / mode
        analyze_ct(
            input_folder=ct_file, processed_output_folder=out,
            excel_output_folder=out, models=["total", "bca"],
            compute_contrast_information=True, total_preview=True,
            bca_pdf=True, fast_total=True, fake_predict=_fake_predict)
        outs[mode] = out
    for seg in ("total.nii.gz", "body_regions.nii.gz", "body_parts.nii.gz",
                "tissues.nii.gz"):
        a = np.asarray(nifti.load(outs["overlap"] / seg).data)
        b = np.asarray(nifti.load(outs["serial"] / seg).data)
        np.testing.assert_array_equal(a, b, err_msg=seg)
    for j in ("total-measurements.json", "bca-measurements.json"):
        assert json.loads((outs["overlap"] / j).read_text()) == \
            json.loads((outs["serial"] / j).read_text()), j
    for art in ("preview_total.png", "report.pdf"):
        assert (outs["overlap"] / art).exists() and \
            (outs["serial"] / art).exists(), art


def test_analyze_ct_from_compressed_dicom_series(ct_file, tmp_path):
    """DICOM-series input (JPEG-LS encapsulated) through the full
    orchestrator: ingest -> models -> metrics -> workbook
    (`commands.py:41-288` with the GDCM-equivalent in-repo codecs)."""
    from boa_tpu.io import dicom, dicom_io

    src = nifti.load(ct_file)
    series = tmp_path / "series"
    dicom_io.write_ct_series(src, series,
                             transfer_syntax=dicom.JPEG_LS_LOSSLESS,
                             extra={"KVP": 120.0})
    out = tmp_path / "out"
    excel_path, stats = analyze_ct(
        input_folder=series,
        processed_output_folder=out,
        excel_output_folder=out,
        models=["total"],
        compute_contrast_information=False,
        total_preview=False,
        bca_pdf=False,
        fast_total=True,
        fake_predict=_fake_predict,
    )
    assert excel_path.exists()
    seg = nifti.load(out / "total.nii.gz")
    assert seg.shape == src.shape
    # the ingested NIfTI matches the pre-compression voxels exactly
    ingested = nifti.load(out / "image.nii.gz")
    np.testing.assert_array_equal(np.asarray(ingested.data),
                                  np.asarray(src.data))
    info = [r[0] for r in xlsx.read_xlsx(excel_path)["info"] if r]
    assert "SeriesInstanceUID" in info


def test_analyze_ct_end_to_end(ct_file, tmp_path):
    out = tmp_path / "out"
    excel_path, stats = analyze_ct(
        input_folder=ct_file,
        processed_output_folder=out,
        excel_output_folder=out,
        models=["total", "bca"],
        compute_contrast_information=True,
        total_preview=True,
        bca_pdf=False,
        fast_total=True,
        fake_predict=_fake_predict,
    )
    assert excel_path.exists()
    # artifacts
    assert (out / "total.nii.gz").exists()
    assert (out / "total-measurements.json").exists()
    assert (out / "bca-measurements.json").exists()
    assert (out / "body_regions.nii.gz").exists()
    assert (out / "tissues.nii.gz").exists()
    assert (out / "debug_information.txt").read_text().startswith("Platform:")
    # stats schema (init.sql fields)
    for key in ("num_voxels", "num_slices", "inference_time", "excel_time",
                "total_time", "bca_metrics_time",
                "totalsegmentator_metrics_time"):
        assert key in stats, key
    # workbook structure
    sheets = xlsx.read_xlsx(excel_path)
    assert "info" in sheets
    assert "regions-statistics" in sheets
    assert "bca-aggregated-measurements" in sheets
    assert "bca-slice-measurements" in sheets
    info_names = [r[0] for r in sheets["info"] if r]
    assert "BOAVersion" in info_names


def test_analyze_ct_skip_if_exists(ct_file, tmp_path):
    out = tmp_path / "out2"
    calls = []

    def counting_fake(vol, spacing, task_id):
        calls.append(task_id)
        return _fake_predict(vol, spacing, task_id)

    analyze_ct(input_folder=ct_file, processed_output_folder=out,
               excel_output_folder=out, models=["total"], bca_pdf=False,
               compute_contrast_information=False, fast_total=True,
               fake_predict=counting_fake)
    n_first = len(calls)
    analyze_ct(input_folder=ct_file, processed_output_folder=out,
               excel_output_folder=out, models=["total"], bca_pdf=False,
               compute_contrast_information=False, fast_total=True,
               recompute=False, fake_predict=counting_fake)
    assert len(calls) == n_first  # skip-if-exists caching (inference.py:82-84)


def test_xlsx_roundtrip(tmp_path):
    df = pd.DataFrame({"A": [1, 2.5], "B": ["x", "y"], "C": [True, False]})
    wb = xlsx.Workbook()
    wb.add_dataframe(df, "sheet1")
    s = wb.add_dataframe(df, "cnr-adjusted", startrow=1)
    s.rows[0] = [("warning text", xlsx.FMT_WARNING)]
    s.merge_row(0, 0, 2)
    p = tmp_path / "t.xlsx"
    wb.save(p)
    back = xlsx.read_xlsx(p)
    assert back["sheet1"][0] == ["A", "B", "C"]
    assert back["sheet1"][1] == [1, "x", True]
    assert back["sheet1"][2] == [2.5, "y", False]
    assert back["cnr-adjusted"][0][0] == "warning text"
    df2 = xlsx.read_xlsx_sheet_df(p, "sheet1")
    assert list(df2.columns) == ["A", "B", "C"]
    assert df2["A"].tolist() == [1, 2.5]


def test_cli_parser_flags():
    from boa_tpu.cli import get_parser

    args = get_parser().parse_args(
        ["-i", "/x.nii.gz", "-o", "/out", "-m", "total+bca", "--fast-total",
         "--cnr-adjustment", "--theme", "dark", "--bca-no-pdf"])
    assert args.models == "total+bca"
    assert args.fast_total and args.cnr_adjustment and args.bca_no_pdf
    assert args.theme == "dark"
    assert args.input_image == Path("/x.nii.gz")


def test_contrast_prediction_heuristic(ct_file, tmp_path):
    from boa_tpu.compute.contrast import predict

    out = tmp_path / "seg"
    out.mkdir()
    ct = nifti.load(ct_file)
    # total seg with an aorta-labeled region
    from boa_tpu.tasks.class_maps import get_class_map

    inv = {v: k for k, v in get_class_map("total").items()}
    seg = np.zeros(ct.shape, np.uint8)
    seg[20:30, 20:30, :] = inv["aorta"]
    nifti.save(nifti.NiftiImage(data=seg, affine=ct.affine.copy()),
               out / "total.nii.gz")
    res = predict(ct_path=ct_file, segmentation_folder=out)
    assert res["phase_ensemble_predicted_class"] == "native"  # soft tissue HU
    assert isinstance(res["git_ensemble_prediction"], float)


def test_radiomics_dir(ct_file, tmp_path):
    from boa_tpu.measure.radiomics import get_radiomics_features_for_entire_dir

    ct = nifti.load(ct_file)
    seg = np.zeros(ct.shape, np.uint8)
    seg[10:30, 10:30, 5:40] = 1
    seg_img = nifti.NiftiImage(data=seg, affine=ct.affine.copy())
    seg_img.set_label_map({1: "roi"})
    nifti.save(seg_img, tmp_path / "total.nii.gz")
    res = get_radiomics_features_for_entire_dir(
        ct_file, tmp_path, tmp_path / "radiomics.json")
    feats = res["total"]["roi"]
    assert feats["present"] and feats["voxels"] == 20 * 20 * 35
    assert np.isfinite(feats["entropy"])
    assert json.loads((tmp_path / "radiomics.json").read_text())


def test_analyze_ct_with_pdf_report(ct_file, tmp_path):
    """BCA PDF report generation (matplotlib replaces weasyprint)."""
    out = tmp_path / "pdf_out"
    analyze_ct(input_folder=ct_file, processed_output_folder=out,
               excel_output_folder=out, models=["total", "bca"],
               compute_contrast_information=False, bca_pdf=True,
               fast_total=True, fake_predict=_fake_predict)
    report = out / "report.pdf"
    assert report.exists()
    blob = report.read_bytes()
    assert blob[:5] == b"%PDF-" and len(blob) > 5000
