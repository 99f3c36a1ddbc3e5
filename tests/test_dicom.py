"""DICOM codec tests: series round-trip, validation gates, SEG round-trip,
encapsulated PDF, deterministic UIDs, STOW payload construction."""

import numpy as np
import pytest

from boa_tpu.io import dicom, dicom_io, dicom_seg, nifti, storage


@pytest.fixture()
def ct_image(rng):
    data = rng.integers(-1000, 1500, size=(32, 28, 12)).astype(np.int16)
    affine = np.diag([-0.7, -0.7, 2.5, 1.0])
    affine[:3, 3] = (100.0, 80.0, -50.0)
    return nifti.NiftiImage(data=data, affine=affine)


@pytest.fixture()
def series_dir(ct_image, tmp_path):
    dicom_io.write_ct_series(ct_image, tmp_path / "dicoms",
                             extra={"KVP": 120.0, "XRayTubeCurrent": 200})
    return tmp_path / "dicoms"


def test_series_roundtrip(ct_image, series_dir):
    img, files, hdr = dicom_io.read_series(series_dir)
    assert len(files) == 12
    np.testing.assert_array_equal(np.asarray(img.data),
                                  np.asarray(ct_image.data))
    np.testing.assert_allclose(img.affine, ct_image.affine, atol=1e-6)
    assert hdr.Modality == "CT"
    assert hdr.get("KVP") == 120.0


def test_dcmread_implicit_vr(ct_image, series_dir, tmp_path):
    """Implicit-VR-LE datasets parse via the tag dictionary."""
    ds = dicom.dcmread(sorted(series_dir.iterdir())[0])
    # re-encode body as implicit VR is not supported for writing; check the
    # raw-dataset fallback path instead (no preamble, implicit VR)
    import struct

    raw = bytearray()
    for kw, val in [("Modality", "CT"), ("SeriesNumber", 7)]:
        g, e, vr = dicom.DICT[kw]
        enc = dicom._encode_value(vr, val)
        raw += struct.pack("<HHI", g, e, len(enc)) + enc
    ds2 = dicom.dcmread(bytes(raw))
    assert ds2.Modality == "CT"
    assert ds2.SeriesNumber == 7
    assert ds.SOPClassUID == dicom.CT_IMAGE_STORAGE


@pytest.mark.parametrize("ts_attr", ["RLE_LOSSLESS", "JPEG_LS_LOSSLESS",
                                     "JPEG_2000_LOSSLESS"])
def test_compressed_series_roundtrip(ct_image, tmp_path, ts_attr):
    """A whole series written with a compressed transfer syntax reads
    back voxel-identical (the shape hospitals actually send — GDCM read
    in compute/io.py:326-383)."""
    ts = getattr(dicom, ts_attr)
    if ts_attr == "JPEG_2000_LOSSLESS":
        from boa_tpu.io import dicom_codecs

        if dicom_codecs._pil_jpeg2000() is None:
            pytest.skip("Pillow/OpenJPEG encoder unavailable")
    dicom_io.write_ct_series(ct_image, tmp_path / "dcm", transfer_syntax=ts)
    first = dicom.dcmread(sorted((tmp_path / "dcm").iterdir())[0])
    assert first.file_meta.TransferSyntaxUID == ts
    img, files, _ = dicom_io.read_series(tmp_path / "dcm")
    np.testing.assert_array_equal(np.asarray(img.data),
                                  np.asarray(ct_image.data))


def test_get_image_info(series_dir, tmp_path):
    nifti_path, info = dicom_io.get_image_info(series_dir, tmp_path / "out")
    assert nifti_path.exists()
    names = {r["name"] for r in info}
    assert {"StudyInstanceUID", "SeriesInstanceUID", "Modality", "KVP",
            "PixelSpacingX", "SliceThickness"} <= names
    kvp = next(r["value"] for r in info if r["name"] == "KVP")
    assert kvp == 120.0


def test_validate_dicom_gates(series_dir):
    ds = dicom.dcmread(sorted(series_dir.iterdir())[0],
                       stop_before_pixels=True)
    assert dicom_io.validate_dicom(ds, 12) is None
    assert "less than 10" in dicom_io.validate_dicom(ds, 3)
    ds.Modality = "MR"
    assert "not CT" in dicom_io.validate_dicom(ds, 12)
    ds.Modality = "CT"
    ds.ImageType = ["DERIVED", "SECONDARY", "LOCALIZER"]
    assert "disqualifying" in dicom_io.validate_dicom(ds, 12)
    ds.ImageType = ["ORIGINAL"]
    ds.ImageOrientationPatient = [1, 0, 0, 0, 0, 1]  # coronal
    msg = dicom_io.validate_dicom(ds, 12)
    assert "coronal" in msg


def test_deterministic_uids():
    a = dicom.generate_uid(entropy_srcs=["x", "y"])
    b = dicom.generate_uid(entropy_srcs=["x", "y"])
    c = dicom.generate_uid(entropy_srcs=["x", "z"])
    assert a == b != c
    assert a.startswith(dicom.PYDICOM_ROOT_UID) and len(a) <= 64
    r1, r2 = dicom.generate_uid(), dicom.generate_uid()
    assert r1 != r2


def test_seg_roundtrip(ct_image, series_dir, rng):
    img, files, hdr = dicom_io.read_series(series_dir)
    headers = [dicom.dcmread(f, stop_before_pixels=True) for f in files]
    seg = np.zeros(img.shape, np.uint8)
    # z ranges overlap (slices 4-5 carry both labels): regression for the
    # reader duplicating shared slice positions in its z index
    seg[4:12, 5:15, 2:6] = 1
    seg[20:28, 10:20, 4:11] = 3
    label_map = {1: "liver", 3: "spleen"}
    ds = dicom_seg.write_multiclass_seg(seg, label_map, headers,
                                        "Total Body Segmentation",
                                        colors={1: (200, 30, 30),
                                                3: (30, 30, 200)})
    assert ds.Modality == "SEG"
    assert ds.SegmentationType == "BINARY"
    assert [s.SegmentLabel for s in ds.SegmentSequence] == ["liver", "spleen"]
    back, names = dicom_seg.read_seg_labelmap(ds)
    # labels renumbered to segment numbers 1..n
    expect = np.zeros_like(seg)
    expect[seg == 1] = 1
    expect[seg == 3] = 2
    # only slices containing any segment are present in the SEG
    zs = sorted(set(np.where(seg.any(axis=(0, 1)))[0]))
    np.testing.assert_array_equal(back, expect[:, :, zs])
    assert names == {1: "liver", 2: "spleen"}


def test_seg_file_roundtrip(ct_image, series_dir, tmp_path):
    img, files, hdr = dicom_io.read_series(series_dir)
    headers = [dicom.dcmread(f, stop_before_pixels=True) for f in files]
    seg = np.zeros(img.shape, np.uint8)
    seg[10:20, 10:20, :] = 2
    ds = dicom_seg.write_multiclass_seg(seg, {2: "aorta"}, headers, "seg")
    p = tmp_path / "seg.dcm"
    dicom.dcmwrite(p, ds)
    ds2 = dicom.dcmread(p)
    assert ds2.SegmentSequence[0].SegmentLabel == "aorta"
    assert int(ds2.NumberOfFrames) == 12
    back, _ = dicom_seg.read_seg_labelmap(ds2)
    assert back.shape == (32, 28, 12)
    assert (back == 1).sum() == (seg == 2).sum()


def test_encapsulated_pdf(series_dir, tmp_path):
    hdr = dicom.dcmread(sorted(series_dir.iterdir())[0],
                        stop_before_pixels=True)
    pdf = b"%PDF-1.4 fake pdf content"
    ds = dicom_seg.write_encapsulated_pdf(pdf, hdr)
    assert ds.Modality == "DOC"
    assert ds.MIMETypeOfEncapsulatedDocument == "application/pdf"
    p = tmp_path / "report.dcm"
    dicom.dcmwrite(p, ds)
    ds2 = dicom.dcmread(p)
    assert ds2.get("EncapsulatedDocument")[:9] == b"%PDF-1.4 "
    assert ds2.StudyInstanceUID == hdr.StudyInstanceUID


def test_build_output_dicoms(ct_image, series_dir, tmp_path):
    seg_dir = tmp_path / "segs"
    seg_dir.mkdir()
    seg = np.zeros(ct_image.shape, np.uint8)
    seg[5:15, 5:15, 3:9] = 1
    seg_img = nifti.NiftiImage(data=seg, affine=ct_image.affine.copy())
    seg_img.set_label_map({1: "spleen"})
    nifti.save(seg_img, seg_dir / "total.nii.gz")
    (seg_dir / "report.pdf").write_bytes(b"%PDF-1.4 x")
    generated, info = storage.build_output_dicoms(series_dir, seg_dir)
    kinds = [i["name"] for i in info]
    assert kinds == ["total", "report"]
    assert len(generated) == 2
    # deterministic UIDs: same inputs -> same series UIDs
    g2, info2 = storage.build_output_dicoms(series_dir, seg_dir)
    assert info[0]["series_instance_uid"] == info2[0]["series_instance_uid"]


def test_cielab_encoding():
    # white -> L*=100 -> 65535; neutral a/b -> ~32896 (128/255)
    L, a, b = dicom.rgb_to_cielab_dicom((255, 255, 255))
    assert L == 65535
    assert abs(a - 32896) < 300 and abs(b - 32896) < 300
    L0, _, _ = dicom.rgb_to_cielab_dicom((0, 0, 0))
    assert L0 == 0


def test_analyze_ct_from_dicom_dir(tmp_path, rng):
    """Full study run with a DICOM directory input (io ingest path)."""
    from boa_tpu.commands import analyze_ct

    data = np.full((40, 40, 16), -1000, np.int16)
    data[8:32, 8:32, :] = 40
    img = nifti.NiftiImage(data=data, affine=np.diag([-1.5, -1.5, 3.0, 1.0]))
    dicom_io.write_ct_series(img, tmp_path / "dicoms")

    def fake(vol, spacing, task_id):
        seg = np.zeros(vol.shape, np.uint8)
        seg[10:20, 10:20, 2:10] = 1
        return seg

    out = tmp_path / "out"
    excel_path, stats = analyze_ct(
        input_folder=tmp_path / "dicoms",
        processed_output_folder=out, excel_output_folder=out,
        models=["total"], bca_pdf=False, compute_contrast_information=False,
        fast_total=True, fake_predict=fake)
    assert (out / "image.nii.gz").exists()
    assert excel_path.exists()
    from boa_tpu.io import xlsx

    info_rows = xlsx.read_xlsx(excel_path)["info"]
    names = [r[0] for r in info_rows if r]
    assert "StudyInstanceUID" in names and "Modality" in names


def test_snomed_template_codes():
    """DICOM-SEG metas carry organ-specific SNOMED codes (parity:
    totalsegmentator_snomed_mapping.csv via templates/generate.py)."""
    from boa_tpu.templates.generate import snomed_mapping, template_for_kind

    mapping = snomed_mapping()
    assert len(mapping) >= 117
    tpl = template_for_kind("total")
    segs = {s["SegmentLabel"]: s for s in tpl["segmentAttributes"][0]}
    liver = segs["liver"]["SegmentedPropertyTypeCodeSequence"]
    assert liver["CodeValue"] == mapping["liver"][
        "SegmentedPropertyTypeCodeSequence"]["CodeValue"]
    assert liver["CodeValue"] != "85756007"  # not the generic fallback
    left = segs["kidney_left"]
    assert left["SegmentedPropertyTypeModifierCodeSequence"]["CodeMeaning"] == "Left"
    # every total segment resolves to a non-fallback type code
    assert all(
        s["SegmentedPropertyTypeCodeSequence"]["CodeValue"] != "85756007"
        for s in tpl["segmentAttributes"][0])


# ------------------------------------------------------- compressed syntaxes
def _ct_slice(rng, rows=64, cols=64):
    """Synthetic CT-like slice: smooth anatomy + noise, int16 HU."""
    yy, xx = np.mgrid[:rows, :cols]
    body = (((xx - cols / 2) / (cols * 0.4)) ** 2
            + ((yy - rows / 2) / (rows * 0.45)) ** 2) <= 1.0
    img = np.full((rows, cols), -1000, np.int16)
    img[body] = (40 + 30 * np.sin(xx[body] / 5.0)
                 + rng.normal(0, 12, body.sum())).astype(np.int16)
    return img


def test_rle_roundtrip_frame(rng):
    from boa_tpu.io import dicom_codecs

    img = _ct_slice(rng).view(np.uint16)
    frame = dicom_codecs.encode_rle(img)
    back = dicom_codecs.decode_rle(frame, *img.shape, 2)
    np.testing.assert_array_equal(back, img)
    # python fallback decodes identically to the native path
    back_py = dicom_codecs._decode_rle_python(frame, *img.shape, 2)
    np.testing.assert_array_equal(back_py, img)


def test_jpeg_lossless_roundtrip_frame(rng):
    from boa_tpu.io import dicom_codecs

    img = _ct_slice(rng).view(np.uint16)
    frame = dicom_codecs.encode_jpeg_lossless_sv1(img, precision=16)
    back = dicom_codecs.decode_jpeg_lossless(frame)
    np.testing.assert_array_equal(back, img)
    back_py = dicom_codecs._decode_jpegll_python(frame)
    np.testing.assert_array_equal(back_py, img)


def test_jpeg_ls_roundtrip_frames(rng):
    """T.87 codec: encoder round-trips through BOTH the native (C++) and
    the pure-python decoder on patterns exercising regular mode, run mode
    (incl. end-of-line runs), the Golomb escape path and 16-bit range.
    Parity: CharLS/GDCM read in compute/io.py:326-383."""
    from boa_tpu.io import dicom_codecs

    cases = [
        _ct_slice(rng).view(np.uint16),                       # CT-like
        np.full((40, 50), 1234, np.uint16),                   # pure run
        rng.integers(0, 65536, (20, 21)).astype(np.uint16),   # max entropy
        np.repeat(rng.integers(0, 16, (16, 8)), 8,
                  axis=1).astype(np.uint16),                  # broken runs
        (np.arange(48)[:, None] * 7 +
         np.arange(40)[None, :] * 3).astype(np.uint16),       # gradient
    ]
    for img in cases:
        frame = dicom_codecs.encode_jpeg_ls(img)
        back_py = dicom_codecs._decode_jpegls_python(frame)
        np.testing.assert_array_equal(back_py, img)
        back = dicom_codecs.decode_jpeg_ls(frame)
        np.testing.assert_array_equal(back, img)


def test_jpeg2000_roundtrip_frames(rng):
    """J2K lossless (reversible 5/3 via Pillow/OpenJPEG): exact on CT-like,
    uniform and max-entropy 16-bit frames. Parity: GDCM read in
    compute/io.py:326-383."""
    from boa_tpu.io import dicom_codecs

    if dicom_codecs._pil_jpeg2000() is None:
        pytest.skip("Pillow/OpenJPEG encoder unavailable")
    cases = [
        _ct_slice(rng).view(np.uint16),
        np.full((40, 50), 1234, np.uint16),
        rng.integers(0, 65536, (20, 21)).astype(np.uint16),
    ]
    for img in cases:
        frame = dicom_codecs.encode_jpeg2000(img)
        assert frame[:2] == b"\xff\x4f"  # raw codestream, not JP2
        back = dicom_codecs.decode_jpeg2000(frame)
        np.testing.assert_array_equal(back, img)


@pytest.mark.parametrize("ts_name", ["rle", "jpegll", "jpegls", "j2k"])
def test_compressed_file_read_parity(tmp_path, rng, ts_name):
    """A compressed Part-10 file reads back identical to the uncompressed
    path (parity: GDCM read in compute/io.py:326-383)."""
    from boa_tpu.io import dicom, dicom_codecs

    img = _ct_slice(rng)
    raw16 = img.view(np.uint16)
    ds = dicom.Dataset()
    ds.SOPClassUID = dicom.CT_IMAGE_STORAGE
    ds.SOPInstanceUID = dicom.generate_uid()
    ds.Rows, ds.Columns = img.shape
    ds.BitsAllocated = 16
    ds.BitsStored = 16
    ds.HighBit = 15
    ds.PixelRepresentation = 1
    ds.SamplesPerPixel = 1
    ds.PhotometricInterpretation = "MONOCHROME2"
    if ts_name == "rle":
        ts = dicom.RLE_LOSSLESS
        frame = dicom_codecs.encode_rle(raw16)
    elif ts_name == "jpegls":
        ts = dicom.JPEG_LS_LOSSLESS
        frame = dicom_codecs.encode_jpeg_ls(raw16)
    elif ts_name == "j2k":
        if dicom_codecs._pil_jpeg2000() is None:
            pytest.skip("Pillow/OpenJPEG encoder unavailable")
        ts = dicom.JPEG_2000_LOSSLESS
        frame = dicom_codecs.encode_jpeg2000(raw16)
    else:
        ts = dicom.JPEG_LOSSLESS_SV1
        frame = dicom_codecs.encode_jpeg_lossless_sv1(raw16)
    ds.PixelData = dicom.encapsulate([frame])
    meta = dicom.Dataset()
    meta.TransferSyntaxUID = ts
    ds.file_meta = meta
    p = tmp_path / f"{ts_name}.dcm"
    dicom.dcmwrite(p, ds)

    back = dicom.dcmread(p)
    assert back.file_meta.get("TransferSyntaxUID") == ts
    arr = dicom.pixel_array(back)
    assert arr.dtype == np.int16
    np.testing.assert_array_equal(arr, img)
    # stop_before_pixels still works on encapsulated files
    hdr = dicom.dcmread(p, stop_before_pixels=True)
    assert hdr.get("PixelData") is None
    assert int(hdr.get("Rows")) == img.shape[0]


def test_multiframe_jpegll_with_offset_table(tmp_path, rng):
    from boa_tpu.io import dicom, dicom_codecs

    frames_np = [_ct_slice(rng).view(np.uint16) for _ in range(3)]
    frames = [dicom_codecs.encode_jpeg_lossless_sv1(f) for f in frames_np]
    ds = dicom.Dataset()
    ds.SOPClassUID = dicom.CT_IMAGE_STORAGE
    ds.SOPInstanceUID = dicom.generate_uid()
    ds.Rows, ds.Columns = frames_np[0].shape
    ds.BitsAllocated = 16
    ds.PixelRepresentation = 0
    ds.NumberOfFrames = 3
    ds.PixelData = dicom.encapsulate(frames)
    meta = dicom.Dataset()
    meta.TransferSyntaxUID = dicom.JPEG_LOSSLESS_SV1
    ds.file_meta = meta
    p = tmp_path / "mf.dcm"
    dicom.dcmwrite(p, ds)
    arr = dicom.pixel_array(dicom.dcmread(p))
    assert arr.shape == (3, *frames_np[0].shape)
    for k in range(3):
        np.testing.assert_array_equal(arr[k], frames_np[k])


def test_unsupported_syntax_clear_error(tmp_path, rng):
    from boa_tpu.io import dicom

    ds = dicom.Dataset()
    ds.SOPClassUID = dicom.CT_IMAGE_STORAGE
    ds.SOPInstanceUID = dicom.generate_uid()
    meta = dicom.Dataset()
    meta.TransferSyntaxUID = dicom.EXPLICIT_VR_BE  # big endian: unsupported
    ds.file_meta = meta
    p = tmp_path / "bad.dcm"
    dicom.dcmwrite(p, ds)
    # force the meta ts back (dcmwrite normalizes unknown ts to explicit LE)
    raw = bytearray(p.read_bytes())
    idx = raw.find(b"1.2.840.10008.1.2.1\x00")
    if idx >= 0:
        raw[idx:idx + 20] = b"1.2.840.10008.1.2.2"[:20].ljust(20, b"\x00")
    p.write_bytes(bytes(raw))
    with pytest.raises(ValueError, match="transfer syntax"):
        dicom.dcmread(p)


def test_jpeg_dct_decode_matches_quantized_reconstruction():
    """Lossy JPEG (baseline 8-bit and extended 12-bit): the native decoder
    reproduces round(IDCT(dequantized coefficients)) exactly, and with a
    unit quant table the round trip is within DCT rounding (±1)."""
    from boa_tpu.io import dicom_codecs as dc

    rng = np.random.default_rng(7)  # self-seeded: session rng is stateful

    def oracle(img, precision, qt):
        shift = 1 << (precision - 1)
        rows, cols = img.shape
        ph, pw = -(-rows // 8) * 8, -(-cols // 8) * 8
        padded = np.pad(img.astype(np.float64) - shift,
                        ((0, ph - rows), (0, pw - cols)), mode="edge")
        b = dc._jdct_basis()
        blocks = padded.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3)
        f = np.einsum("ux,ijxy,vy->ijuv", b, blocks, b)
        q = np.round(f / qt.reshape(8, 8)) * qt.reshape(8, 8)
        sp = np.einsum("ux,ijuv,vy->ijxy", b, q, b)
        rec = np.clip(np.round(sp) + shift, 0, (1 << precision) - 1)
        return rec.transpose(0, 2, 1, 3).reshape(ph, pw)[:rows, :cols
                                                         ].astype(np.uint16)

    qt1 = np.ones(64, np.int64)
    x = np.linspace(0, 255, 37)[None, :] * np.ones((29, 1))
    img8 = (x + rng.normal(0, 10, (29, 37))).clip(0, 255).astype(np.uint16)
    frame8 = dc.encode_jpeg_dct(img8, precision=8, quant_table=qt1)
    dec8 = dc.decode_jpeg_dct(frame8)
    np.testing.assert_array_equal(dec8, oracle(img8, 8, qt1))
    assert np.abs(dec8.astype(int) - img8.astype(int)).max() <= 1

    img12 = rng.normal(2048, 400, (45, 52)).clip(0, 4095).astype(np.uint16)
    frame12 = dc.encode_jpeg_dct(img12, precision=12, quant_table=qt1)
    dec12 = dc.decode_jpeg_dct(frame12)
    np.testing.assert_array_equal(dec12, oracle(img12, 12, qt1))
    assert np.abs(dec12.astype(int) - img12.astype(int)).max() <= 1

    # genuinely lossy table still reconstructs the quantized coefficients
    qtq = np.clip(dc._JDCT_STD_QT * 2, 1, 255)
    frame_q = dc.encode_jpeg_dct(img8, precision=8, quant_table=qtq)
    np.testing.assert_array_equal(dc.decode_jpeg_dct(frame_q),
                                  oracle(img8, 8, qtq))


def test_jpeg_dct_pil_cross_validation():
    """Independent oracle: libjpeg (via Pillow) decodes our baseline
    streams within ±1 of the native decoder, and our decoder reads
    PIL-ENCODED monochrome and 4:4:4 color JPEGs."""
    PIL = pytest.importorskip("PIL.Image")
    import io as _io

    from boa_tpu.io import dicom_codecs as dc

    rng = np.random.default_rng(7)  # self-seeded: session rng is stateful
    img = rng.integers(0, 256, (40, 33)).astype(np.uint16)
    ours = dc.encode_jpeg_dct(img, precision=8,
                              quant_table=np.ones(64, np.int64))
    pil = np.asarray(PIL.open(_io.BytesIO(ours)))
    native = dc.decode_jpeg_dct(ours)
    assert np.abs(pil.astype(int) - native.astype(int)).max() <= 1

    # PIL-encoded grayscale
    buf = _io.BytesIO()
    PIL.fromarray(img.astype(np.uint8), "L").save(buf, "JPEG", quality=90)
    dec = dc.decode_jpeg_dct(buf.getvalue())
    ref = np.asarray(PIL.open(_io.BytesIO(buf.getvalue())))
    assert dec.shape == img.shape
    assert np.abs(dec.astype(int) - ref.astype(int)).max() <= 1

    # PIL-encoded color 4:4:4 (3-component interleaved scan)
    rgb = rng.integers(0, 256, (24, 31, 3)).astype(np.uint8)
    buf = _io.BytesIO()
    PIL.fromarray(rgb, "RGB").save(buf, "JPEG", quality=95, subsampling=0)
    dec3 = dc.decode_jpeg_dct(buf.getvalue())
    assert dec3.shape == (24, 31, 3)
    # PIL's convert("YCbCr") round-trips through clipped RGB, so allow a
    # few counts of slack on top of the decoders' own rounding
    ycc = np.asarray(PIL.open(_io.BytesIO(buf.getvalue())).convert("YCbCr"))
    assert np.abs(dec3[..., 0].astype(int) - ycc[..., 0].astype(int)
                  ).max() <= 5

    # 4:2:0 subsampled stream decodes; the full-res luma plane agrees
    buf = _io.BytesIO()
    smooth = np.clip(np.add.outer(np.linspace(0, 200, 26),
                                  np.linspace(0, 40, 34)), 0, 255)
    rgb2 = np.stack([smooth, smooth * 0.8, smooth * 0.5],
                    -1).astype(np.uint8)
    PIL.fromarray(rgb2, "RGB").save(buf, "JPEG", quality=95, subsampling=2)
    dec420 = dc.decode_jpeg_dct(buf.getvalue())
    assert dec420.shape == (26, 34, 3)
    ycc2 = np.asarray(PIL.open(_io.BytesIO(buf.getvalue())).convert("YCbCr"))
    assert np.abs(dec420[..., 0].astype(int) - ycc2[..., 0].astype(int)
                  ).max() <= 5


def test_jpeg_extended_ct_series_roundtrip(tmp_path):
    """A CT series written as JPEG Extended 12-bit (…4.51) reads back with
    small lossy error and correct HU rescaling (the CT convention: unsigned
    12-bit stored values, RescaleIntercept -1024)."""
    from boa_tpu.io import dicom, dicom_io, nifti

    rng = np.random.default_rng(7)
    smooth = np.add.outer(np.linspace(-500, 500, 24),
                          np.linspace(0, 200, 20))
    data = np.repeat(smooth[:, :, None], 6, axis=2).astype(np.int16)
    data += rng.integers(-5, 5, data.shape).astype(np.int16)
    img = nifti.NiftiImage(data=data, affine=np.diag([1.0, 1.0, 3.0, 1.0]))
    out = tmp_path / "dcm"
    out.mkdir()
    files = dicom_io.write_ct_series(img, out,
                                     transfer_syntax=dicom.JPEG_EXTENDED)
    ds = dicom.dcmread(files[0])
    assert ds.BitsStored == 12 and ds.LossyImageCompression == "01"
    back, _, _ = dicom_io.read_series(out)
    err = np.abs(np.asarray(back.data).astype(int) - data.astype(int))
    assert err.mean() < 8 and err.max() < 80
    assert back.shape == img.shape


def _patch_sos_pt(frame: bytes, pt: int) -> bytes:
    """Set the point transform (SOS Al nibble) of a single-scan stream."""
    pos = 2
    buf = bytearray(frame)
    while pos < len(buf):
        marker = buf[pos + 1]
        pos += 2
        if marker == 0xD8:
            continue
        seg = int.from_bytes(buf[pos:pos + 2], "big")
        if marker == 0xDA:
            ns = buf[pos + 2]
            al_at = pos + 2 + 1 + 2 * ns + 2  # Ss, Se, then Ah/Al
            buf[al_at] = (buf[al_at] & 0xF0) | pt
            return bytes(buf)
        pos += seg
    raise AssertionError("no SOS")


def test_jpegll_point_transform_python_matches_native(rng):
    """Pt>0 streams: prediction must run in the unshifted domain (T.81
    H.2.1) — the python fallback previously stored shifted values back
    into the neighborhood and overflowed uint16."""
    from boa_tpu import native
    from boa_tpu.io import dicom_codecs

    img = rng.integers(0, 1 << 12, (23, 17)).astype(np.uint16)
    frame = _patch_sos_pt(
        dicom_codecs.encode_jpeg_lossless_sv1(img, precision=12), pt=1)
    got_py = dicom_codecs._decode_jpegll_python(frame)
    # decoding a Pt=1 stream reconstructs img>>1 then shifts back
    assert got_py.dtype == np.uint16 and got_py.shape == img.shape
    if native.get_lib() is not None:
        got_native = dicom_codecs._decode_jpegll_native(native.get_lib(),
                                                        frame)
        np.testing.assert_array_equal(got_py, got_native)


def test_jpegll_python_rejects_restart_intervals(rng):
    from boa_tpu.io import dicom_codecs

    img = rng.integers(0, 256, (8, 8)).astype(np.uint16)
    frame = dicom_codecs.encode_jpeg_lossless_sv1(img, precision=8)
    dri = bytes([0xFF, 0xDD, 0x00, 0x04, 0x00, 0x08])
    patched = frame[:2] + dri + frame[2:]
    with pytest.raises(ValueError, match="restart"):
        dicom_codecs._decode_jpegll_python(patched)


def test_un_undefined_length_sequence_implicit_content(tmp_path, rng):
    """PS3.5 6.2.2: undefined-length UN element contents are implicit VR
    LE even inside an explicit-VR file (private sequences surviving
    implicit->explicit transcoding)."""
    import struct

    ds = dicom.Dataset()
    ds.PatientName = "UN^Seq"
    buf = bytearray()
    # element (0009,0010) VR UN, undefined length
    buf += struct.pack("<HH", 0x0009, 0x0010) + b"UN\x00\x00" \
        + struct.pack("<I", 0xFFFFFFFF)
    # one item, undefined length, containing an IMPLICIT-VR element
    buf += struct.pack("<HHI", 0xFFFE, 0xE000, 0xFFFFFFFF)
    payload = b"PRIVATE!"
    buf += struct.pack("<HHI", 0x0009, 0x0001, len(payload)) + payload
    buf += struct.pack("<HHI", 0xFFFE, 0xE00D, 0)  # item delimiter
    buf += struct.pack("<HHI", 0xFFFE, 0xE0DD, 0)  # sequence delimiter

    path = tmp_path / "un.dcm"
    dicom.dcmwrite(path, ds)
    raw = bytearray(path.read_bytes())
    raw += buf  # append the UN sequence at the dataset tail
    back = dicom.dcmread(bytes(raw))
    assert back.get("PatientName") == "UN^Seq"
    items = back.get((0x0009, 0x0010))
    assert isinstance(items, list) and len(items) == 1
    assert items[0].get((0x0009, 0x0001)) == payload
