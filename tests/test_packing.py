"""4-bit label packing (ops/packing.py): host/device parity, fallbacks.

Used by the tissue pass (bca/tissues.py) to halve tunnel payloads."""

import numpy as np
import pytest

from boa_tpu.ops import packing


@pytest.fixture
def labels(rng):
    return rng.integers(0, 12, (16, 7, 5)).astype(np.uint8)


def test_host_roundtrip(labels):
    np.testing.assert_array_equal(
        packing.unpack_host(packing.pack_host(labels)), labels)


def test_native_pack_matches_numpy(labels, monkeypatch):
    """boa_pack4/unpack4_axis0 == the pure-numpy forms."""
    from boa_tpu import native

    if native.get_lib() is None or \
            not hasattr(native.get_lib(), "boa_pack4_axis0"):
        pytest.skip("native lib unavailable")
    packed_nat = packing.pack_host(labels)
    unpacked_nat = packing.unpack_host(packed_nat)
    monkeypatch.setattr(packing, "_native_lib", lambda: None)
    np.testing.assert_array_equal(packed_nat, packing.pack_host(labels))
    np.testing.assert_array_equal(unpacked_nat,
                                  packing.unpack_host(packed_nat))
    np.testing.assert_array_equal(unpacked_nat, labels)


def test_device_matches_host(labels):
    import jax.numpy as jnp

    packed_h = packing.pack_host(labels)
    packed_d = np.asarray(packing.pack_device(jnp.asarray(labels)))
    np.testing.assert_array_equal(packed_h, packed_d)
    unpacked_d = np.asarray(packing.unpack_device(jnp.asarray(packed_h)))
    np.testing.assert_array_equal(unpacked_d, labels)


def test_upload_download_identity(labels):
    dev = packing.upload_labels(labels)
    np.testing.assert_array_equal(np.asarray(dev), labels)
    np.testing.assert_array_equal(packing.download_labels(dev, 15), labels)


@pytest.mark.parametrize("case", ["odd_major", "big_labels", "non_u8"])
def test_unpackable_falls_back(case, rng):
    if case == "odd_major":
        a = rng.integers(0, 12, (15, 4, 4)).astype(np.uint8)
    elif case == "big_labels":
        a = rng.integers(0, 200, (16, 4, 4)).astype(np.uint8)
    else:
        a = rng.integers(0, 12, (16, 4, 4)).astype(np.int16)
    dev = packing.upload_labels(a)
    np.testing.assert_array_equal(np.asarray(dev), a)
    np.testing.assert_array_equal(
        packing.download_labels(dev, int(a.max())), a)


def test_tissue_pass_uses_packing(rng):
    """subclassify_tissues output is unchanged by the packed transfers."""
    from boa_tpu.bca.tissues import subclassify_tissues

    ct = rng.integers(-1000, 1500, (32, 16, 8)).astype(np.int16)
    regions = rng.integers(0, 11, (32, 16, 8)).astype(np.uint8)
    host, dev, regions_dev = subclassify_tissues(ct, regions,
                                                 return_device=True)
    np.testing.assert_array_equal(host, np.asarray(dev))
    np.testing.assert_array_equal(np.asarray(regions_dev), regions)


def test_packbits_device_matches_numpy(rng):
    import jax.numpy as jnp

    m = (rng.random((24, 7, 5)) > 0.5).astype(np.uint8)
    packed = np.asarray(packing.packbits_device(jnp.asarray(m)))
    np.testing.assert_array_equal(packed, np.packbits(m, axis=0))


def test_download_mask_roundtrip_and_fallback(rng):
    import jax.numpy as jnp

    m = (rng.random((24, 6, 4)) > 0.7).astype(np.uint8)
    np.testing.assert_array_equal(packing.download_mask(jnp.asarray(m)), m)
    # bool input
    np.testing.assert_array_equal(
        packing.download_mask(jnp.asarray(m) > 0), m)
    # major dim not a multiple of 8: plain download
    odd = (rng.random((13, 6, 4)) > 0.5).astype(np.uint8)
    np.testing.assert_array_equal(packing.download_mask(jnp.asarray(odd)), odd)


def test_xordelta_host_device_parity(rng):
    import jax.numpy as jnp

    labels = rng.integers(0, 118, (16, 12, 33)).astype(np.uint8)
    enc_h = packing.xordelta_enc_host(labels)
    enc_d = np.asarray(packing.xordelta_enc_device(jnp.asarray(labels)))
    np.testing.assert_array_equal(enc_h, enc_d)
    np.testing.assert_array_equal(packing.xordelta_dec_host(enc_h), labels)
    np.testing.assert_array_equal(
        np.asarray(packing.xordelta_dec_device(jnp.asarray(enc_h))), labels)


def test_xordelta_native_matches_numpy(rng, monkeypatch):
    from boa_tpu import native

    if native.get_lib() is None or \
            not hasattr(native.get_lib(), "boa_xordelta_enc_u8"):
        pytest.skip("native lib unavailable")
    labels = rng.integers(0, 118, (8, 9, 21)).astype(np.uint8)
    enc_nat = packing.xordelta_enc_host(labels)
    dec_nat = packing.xordelta_dec_host(enc_nat)
    monkeypatch.setattr(packing, "_native_lib", lambda: None)
    np.testing.assert_array_equal(enc_nat, packing.xordelta_enc_host(labels))
    np.testing.assert_array_equal(dec_nat, packing.xordelta_dec_host(enc_nat))
    np.testing.assert_array_equal(dec_nat, labels)


def test_wide_label_roundtrip(rng):
    """117-class seg (the full-res `total` model grid) roundtrips through
    the XOR-delta upload/download codec bit-exactly."""
    labels = rng.integers(0, 118, (24, 10, 40)).astype(np.uint8)
    dev = packing.upload_labels(labels, 117)
    np.testing.assert_array_equal(np.asarray(dev), labels)
    np.testing.assert_array_equal(packing.download_labels(dev, 117), labels)


def test_pack12_roundtrip_and_device(rng, monkeypatch):
    import jax.numpy as jnp

    ct = rng.integers(-1024, 3072, (16, 9, 7)).astype(np.int16)
    packed = packing.pack12_host(ct)
    assert packed.shape == (24, 9, 7) and packed.dtype == np.uint8
    np.testing.assert_array_equal(packing.unpack12_host(packed), ct)
    np.testing.assert_array_equal(
        np.asarray(packing.unpack12_device(jnp.asarray(packed))), ct)
    # numpy fallbacks match the native kernels
    from boa_tpu import native

    if native.get_lib() is not None and \
            hasattr(native.get_lib(), "boa_pack12_axis0"):
        monkeypatch.setattr(packing, "_native_lib", lambda: None)
        np.testing.assert_array_equal(packed, packing.pack12_host(ct))
        np.testing.assert_array_equal(packing.unpack12_host(packed), ct)


def test_delta16_roundtrip(rng):
    import jax.numpy as jnp

    ct = rng.integers(-1024, 3072, (8, 5, 31)).astype(np.int16)
    enc = packing.delta16_enc_host(ct)
    np.testing.assert_array_equal(
        np.asarray(packing.delta16_dec_device(jnp.asarray(enc))), ct)


@pytest.mark.parametrize("codec", ["raw", "pack12", "delta16"])
def test_upload_ct_lossless(codec, rng, monkeypatch):
    monkeypatch.setenv("BOA_CT_CODEC", codec)
    ct = rng.integers(-1024, 3072, (16, 9, 7)).astype(np.int16)
    np.testing.assert_array_equal(np.asarray(packing.upload_ct(ct)), ct)
    # out-of-range HU (range_warning case): pack12 must fall back, and the
    # upload stays lossless for every codec
    hot = ct.copy()
    hot[0, 0, 0] = 32000
    hot[1, 0, 0] = -32000
    np.testing.assert_array_equal(np.asarray(packing.upload_ct(hot)), hot)


def test_pack12_checked_single_pass(rng, monkeypatch):
    """The fused validate+pack pass matches pack12_host in range and
    refuses out-of-range data (native kernel AND numpy fallback)."""
    ct = rng.integers(-1024, 3072, (16, 9, 7)).astype(np.int16)
    hot = ct.copy()
    hot[11, 3, 2] = 3072  # one voxel past the 12-bit ceiling
    for native_off in (False, True):
        if native_off:
            monkeypatch.setattr(packing, "_native_lib", lambda: None)
        packed = packing.pack12_host_checked(ct)
        np.testing.assert_array_equal(packed, packing.pack12_host(ct))
        assert packing.pack12_host_checked(hot) is None
        assert packing.pack12_host_checked(
            np.full((4, 3), -32768, np.int16)) is None


def test_stale_hu_range_not_trusted(rng, monkeypatch):
    """Replacing img.data after the CT range check must NOT reuse the old
    range for pack12 gating: a stale in-range verdict would silently wrap
    out-of-range HU through the 12-bit pack."""
    from boa_tpu.compute.inference import range_warning
    from boa_tpu.io.nifti import NiftiImage

    monkeypatch.setenv("BOA_CT_CODEC", "pack12")
    ct = rng.integers(-1024, 3072, (16, 9, 8)).astype(np.int16)
    img = NiftiImage(data=ct, affine=np.eye(4))
    range_warning(np.asarray(img.data), img=img)
    assert getattr(img, "_hu_range")[0] is img.data
    hot = ct.copy()
    hot[0, 0, 0] = 32000  # out of pack12 range
    object.__setattr__(img, "data", hot)  # pipeline convention: replace
    np.testing.assert_array_equal(np.asarray(img.device_data()), hot)


def test_body_crop_rebinds_hu_range(rng):
    """body_crop_xy carries the range-check verdict, rebound to the crop's
    own buffer so device_data's identity check trusts it."""
    from boa_tpu.compute.inference import range_warning
    from boa_tpu.io.nifti import NiftiImage
    from boa_tpu.ops.cropping import body_crop_xy

    ct = np.full((192, 192, 4), -1000, np.int16)
    ct[64:96, 64:112] = rng.integers(-200, 200, (32, 48, 4)).astype(np.int16)
    img = NiftiImage(data=ct, affine=np.eye(4))
    range_warning(np.asarray(img.data), img=img)
    cropped, info = body_crop_xy(img)
    assert info is not None
    hr = getattr(cropped, "_hu_range", None)
    assert hr is not None and hr[0] is cropped.data
    np.testing.assert_array_equal(np.asarray(cropped.device_data()),
                                  np.asarray(cropped.data))


def test_device_data_uses_ct_codec(rng, monkeypatch):
    """NiftiImage.device_data routes int16 through upload_ct losslessly."""
    from boa_tpu.io.nifti import NiftiImage

    monkeypatch.setenv("BOA_CT_CODEC", "delta16")
    ct = rng.integers(-1024, 3072, (16, 9, 8)).astype(np.int16)
    img = NiftiImage(data=ct.copy(), affine=np.eye(4))
    np.testing.assert_array_equal(np.asarray(img.device_data()), ct)


def test_tissue_pass_encodes_ignore_fragments(rng):
    """255-ignore fragments (bca/postprocess.py) ride the tunnel as the
    packable stand-in 15; the tissue map itself is unchanged."""
    from boa_tpu.bca.tissues import IGNORE_XFER, subclassify_tissues

    ct = rng.integers(-1000, 1500, (32, 16, 8)).astype(np.int16)
    regions = rng.integers(0, 11, (32, 16, 8)).astype(np.uint8)
    regions[:4, :4, :2] = 255
    host, dev, regions_dev = subclassify_tissues(ct, regions,
                                                 return_device=True)
    ref = subclassify_tissues(ct, np.where(regions == 255, 0, regions))
    # 255 matches no tissue rule, so remapping it cannot change the output
    np.testing.assert_array_equal(host, ref)
    rd = np.asarray(regions_dev)
    np.testing.assert_array_equal(rd == IGNORE_XFER, regions == 255)
    np.testing.assert_array_equal(rd[regions != 255], regions[regions != 255])
