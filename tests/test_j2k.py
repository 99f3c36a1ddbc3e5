"""In-repo JPEG 2000 decoder (io/j2k.py + native/jpeg2000.cpp) vs the
Pillow/OpenJPEG oracle. Parity target: the GDCM read path of the
reference (compute/io.py:326-383) for .4.90 lossless streams."""

import io

import numpy as np
import pytest

from boa_tpu.io import j2k

Image = pytest.importorskip("PIL.Image", reason="Pillow oracle needed")


def _enc(img: np.ndarray, **kw) -> bytes:
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG2000", irreversible=False,
                              no_jp2=True, **kw)
    return buf.getvalue()


def _oracle(data: bytes) -> np.ndarray:
    return np.array(Image.open(io.BytesIO(data))).astype(np.int64)


CASES = {
    "u8-noise": lambda rng: (rng.integers(0, 255, (16, 16))
                             .astype(np.uint8), {}),
    "u8-rect": lambda rng: (rng.integers(0, 255, (24, 17))
                            .astype(np.uint8), {}),
    "u16-grad": lambda rng: ((np.arange(32 * 45).reshape(32, 45) % 4096)
                             .astype(np.uint16), {}),
    "u16-noise": lambda rng: (rng.integers(0, 65536, (33, 29))
                              .astype(np.uint16), {}),
    "one-res": lambda rng: (rng.integers(0, 255, (16, 16))
                            .astype(np.uint8), {"num_resolutions": 1}),
    "cb32": lambda rng: (rng.integers(0, 4096, (70, 70)).astype(np.uint16),
                         {"codeblock_size": (32, 32)}),
    "multi-cb": lambda rng: (rng.integers(0, 4096, (200, 150))
                             .astype(np.uint16), {}),
    "ct-like": lambda rng: ((np.clip(rng.normal(40, 120, (96, 96)),
                                     -1024, 3071) + 1024)
                            .astype(np.uint16), {}),
    "rpcl": lambda rng: (rng.integers(0, 4096, (80, 64)).astype(np.uint16),
                         {"progression": "RPCL"}),
    "cprl": lambda rng: (rng.integers(0, 4096, (80, 64)).astype(np.uint16),
                         {"progression": "CPRL"}),
    "layers": lambda rng: (rng.integers(0, 4096, (80, 64)).astype(np.uint16),
                           {"quality_mode": "rates",
                            "quality_layers": [40, 10, 1]}),
    "tiles": lambda rng: (rng.integers(0, 4096, (130, 100))
                          .astype(np.uint16), {"tile_size": (64, 64)}),
}


@pytest.mark.parametrize("case", sorted(CASES))
def test_python_decoder_matches_openjpeg(case, rng):
    img, kw = CASES[case](rng)
    data = _enc(img, **kw)
    # oracle decode, not the original pixels: openjpeg's encoder is
    # lossy on partial-width tiles even with irreversible=False, and the
    # decoder contract is to reproduce the STREAM
    want = _oracle(data)
    got = j2k.decode(data)
    np.testing.assert_array_equal(got, want)
    if case != "tiles":  # lossless cases also round-trip the pixels
        np.testing.assert_array_equal(got, img.astype(np.int64))


def test_malformed_siz_rejected_not_crash(rng):
    """XTsiz=0 (hostile/corrupt SIZ) must raise, not divide by zero —
    the native path must return an error code, not SIGFPE the process."""
    from boa_tpu.io import dicom_codecs

    img = rng.integers(0, 255, (16, 16)).astype(np.uint8)
    data = bytearray(_enc(img))
    pos = data.find(b"\xff\x51")
    # SIZ payload starts at pos+6 (marker+len+Rsiz): XTsiz at offset 18
    data[pos + 6 + 16:pos + 6 + 20] = (0).to_bytes(4, "big")
    data = bytes(data)
    with pytest.raises(ValueError):
        j2k.decode(data)
    if dicom_codecs._j2k_native_lib() is not None:
        with pytest.raises(ValueError, match="native J2K decode failed"):
            dicom_codecs._decode_j2k_native(data)


def test_bitreader_stuffing_is_reader_local():
    """skip_raw over bytes ending in 0xFF (SOP tails, packet bodies) must
    not trigger bit-stuffing on the next header byte."""
    br = j2k.BitReader(bytes([0x00, 0xFF, 0b10110010]))
    br.skip_raw(2)               # externally skipped; ends with 0xFF
    assert br.bits(8) == 0b10110010  # full 8 bits, no 7-bit unstuffing
    # whereas a CONSUMED 0xFF does unstuff the following byte
    br2 = j2k.BitReader(bytes([0xFF, 0b01110010]))
    assert br2.bits(8) == 0xFF
    assert br2.bits(7) == 0b1110010


def test_eph_streams_decode_identically(rng):
    """EPH sits between packet header and body: a stream with FF92
    markers inserted at every header end (and Scod bit 2 set) must
    decode identically to the EPH-free original — python AND native."""
    from boa_tpu.io import dicom_codecs

    img = rng.integers(0, 4096, (40, 33)).astype(np.uint16)
    data = _enc(img)
    siz, cp, tiles = j2k._parse_markers(data)
    assert len(tiles) == 1
    isot, tdata = tiles[0]

    # trace packet-header end offsets within the tile bitstream
    res = j2k._build_bands(0, 0, siz["xsiz"], siz["ysiz"],
                           cp.n_levels, cp.cb_w, cp.cb_h)
    br = j2k.BitReader(tdata)
    ends: list[int] = []
    for layer in range(cp.n_layers):
        for r in range(cp.n_levels + 1):
            j2k._decode_packet(br, res[r], layer, cp, [], header_ends=ends)

    new_tile = bytearray(tdata)
    for pos in sorted(ends, reverse=True):
        new_tile[pos:pos] = b"\xff\x92"

    out = bytearray(data)
    # set Scod bit 2 (EPH) in COD
    cod = out.find(b"\xff\x52")
    out[cod + 4] |= 4
    # splice the new tile bitstream, fixing Psot
    sot = out.find(b"\xff\x90")
    psot_old = int.from_bytes(out[sot + 6:sot + 10], "big")
    sod = out.find(b"\xff\x93", sot)
    start = sod + 2
    out[start:start + len(tdata)] = new_tile
    psot_new = psot_old + (len(new_tile) - len(tdata))
    out[sot + 6:sot + 10] = psot_new.to_bytes(4, "big")
    out = bytes(out)

    want = j2k.decode(data)
    np.testing.assert_array_equal(j2k.decode(out), want)
    if dicom_codecs._j2k_native_lib() is not None:
        got = dicom_codecs._decode_j2k_native(out)
        np.testing.assert_array_equal(
            got, (want.astype(np.int64) & 0xFFFF).astype(np.uint16))


def test_rejects_non_codestream():
    with pytest.raises(ValueError, match="SOC"):
        j2k.decode(b"\x00\x01\x02\x03")


def test_rejects_irreversible(rng):
    img = rng.integers(0, 255, (16, 16)).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG2000", irreversible=True,
                              no_jp2=True)
    with pytest.raises(ValueError, match="5/3"):
        j2k.decode(buf.getvalue())


def test_signed_component(rng):
    """Signed Ssiz (DICOM PixelRepresentation=1 encodes): no DC shift,
    two's-complement bit pattern out — python and native agree."""
    from boa_tpu.io import dicom_codecs

    img = rng.integers(0, 4096, (32, 24)).astype(np.uint16)
    data = bytearray(_enc(img))
    # SIZ Ssiz byte: SOC(2) + marker(2) + Lsiz(2) + 36 payload bytes in
    pos = data.find(b"\xff\x51")
    ssiz_at = pos + 4 + 36
    assert data[ssiz_at] == 15  # 16-bit unsigned
    data[ssiz_at] = 0x80 | 15   # flip to signed
    data = bytes(data)
    got_py = j2k.decode(data)
    # same coefficients, no +2^15 DC shift
    np.testing.assert_array_equal(
        (got_py + (1 << 15)).astype(np.int64) & 0xFFFF,
        img.astype(np.int64))
    if dicom_codecs._j2k_native_lib() is not None:
        got_nat = dicom_codecs._decode_j2k_native(data)
        np.testing.assert_array_equal(
            got_nat, (got_py.astype(np.int64) & 0xFFFF).astype(np.uint16))


def test_native_decoder_matches_python(rng):
    """The C++ port (native/jpeg2000.cpp) agrees with io/j2k.py on a
    CT-like frame; skipped when the native lib is unavailable."""
    from boa_tpu.io import dicom_codecs

    if dicom_codecs._j2k_native_lib() is None:
        pytest.skip("native lib unavailable")
    img = (np.clip(rng.normal(40, 120, (128, 96)), -1024, 3071)
           + 1024).astype(np.uint16)
    data = _enc(img)
    got = dicom_codecs._decode_j2k_native(data)
    np.testing.assert_array_equal(got, j2k.decode(data).astype(np.uint16))
