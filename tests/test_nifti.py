import numpy as np
import pytest

from boa_tpu.io import nifti


def test_roundtrip_int16(tmp_path, rng):
    data = rng.integers(-1024, 3000, size=(17, 19, 23)).astype(np.int16)
    affine = np.array(
        [[0.7, 0, 0, -100], [0, -0.7, 0, 50], [0, 0, 2.5, -400], [0, 0, 0, 1.0]]
    )
    img = nifti.NiftiImage(data=data, affine=affine)
    for name in ["a.nii", "a.nii.gz"]:
        p = tmp_path / name
        nifti.save(img, p)
        back = nifti.load(p)
        np.testing.assert_array_equal(back.data, data)
        np.testing.assert_allclose(back.affine, affine, atol=1e-5)
        assert back.zooms == pytest.approx((0.7, 0.7, 2.5), abs=1e-5)


def test_roundtrip_float_and_uint8(tmp_path, rng):
    for dt in [np.float32, np.uint8]:
        data = (rng.random((5, 6, 7)) * 100).astype(dt)
        img = nifti.NiftiImage(data=data, affine=np.eye(4))
        p = tmp_path / f"x_{dt.__name__}.nii.gz"
        nifti.save(img, p)
        back = nifti.load(p)
        np.testing.assert_array_equal(back.data, data)
        assert back.data.dtype == dt


def test_label_map_extension_roundtrip(tmp_path):
    img = nifti.NiftiImage(data=np.zeros((4, 4, 4), np.uint8), affine=np.eye(4))
    img.set_label_map({1: "spleen", 2: "kidney_right"})
    p = tmp_path / "seg.nii.gz"
    nifti.save(img, p)
    back = nifti.load(p)
    assert back.get_label_map() == {1: "spleen", 2: "kidney_right"}


def test_canonical_roundtrip(rng):
    """LPS-ish affine -> canonical RAS -> undo must be the identity."""
    data = rng.integers(0, 255, size=(9, 11, 13)).astype(np.uint8)
    affine = np.array(
        [[-0.9, 0, 0, 120], [0, -0.8, 0, 95], [0, 0, 1.5, -300], [0, 0, 0, 1.0]]
    )
    img = nifti.NiftiImage(data=data, affine=affine)
    canon, ornt = nifti.as_closest_canonical(img)
    # canonical affine must have positive diagonal (RAS+)
    assert np.all(np.diag(canon.affine)[:3] > 0)
    # world coordinates of a voxel must be preserved under reorientation
    ijk = np.array([3, 4, 5, 1.0])
    world_orig = img.affine @ ijk
    # find the voxel in canonical image holding the same value
    restored = nifti.undo_canonical(canon, ornt, img.affine)
    np.testing.assert_array_equal(restored.data, data)
    np.testing.assert_allclose(restored.affine, affine)
    del world_orig


def test_canonical_permuted_axes(rng):
    data = rng.integers(0, 255, size=(8, 10, 12)).astype(np.uint8)
    # axis order z,x,y with a flip
    affine = np.array(
        [[0, 0, 2.0, -50], [-1.0, 0, 0, 30], [0, 1.0, 0, -20], [0, 0, 0, 1.0]]
    )
    img = nifti.NiftiImage(data=data, affine=affine)
    canon, ornt = nifti.as_closest_canonical(img)
    assert np.all(np.diag(canon.affine)[:3] > 0)
    restored = nifti.undo_canonical(canon, ornt, img.affine)
    np.testing.assert_array_equal(restored.data, data)


def test_scl_slope_applied(tmp_path):
    """Hand-craft a header with scl_slope=2, inter=10."""
    import struct

    data = np.arange(8, dtype=np.int16).reshape(2, 2, 2)
    img = nifti.NiftiImage(data=data, affine=np.eye(4))
    p = tmp_path / "s.nii"
    nifti.save(img, p)
    raw = bytearray(p.read_bytes())
    struct.pack_into("<2f", raw, 112, 2.0, 10.0)
    p.write_bytes(bytes(raw))
    back = nifti.load(p)
    np.testing.assert_allclose(back.data, data.astype(np.float32) * 2 + 10)


def test_device_data_cached():
    """device_data uploads once per instance and invalidates if the data
    array is replaced."""
    img = nifti.NiftiImage(data=np.arange(24, dtype=np.int16).reshape(2, 3, 4),
                           affine=np.eye(4))
    d1 = img.device_data()
    assert img.device_data() is d1  # cached
    np.testing.assert_array_equal(np.asarray(d1), img.data)
    img.data = img.data + 1
    d2 = img.device_data()
    assert d2 is not d1
    np.testing.assert_array_equal(np.asarray(d2), img.data)
