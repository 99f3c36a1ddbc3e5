"""Resampling parity vs scipy (the reference's compute substrate).

scipy.ndimage.zoom IS what TotalSegmentator runs (`resampling.py:24-56`), so
matching it on random volumes is direct numeric parity with the reference's
hottest non-NN op. The skimage 'resize' convention is validated against a
hand-rolled map_coordinates reference replicating skimage internals.
"""

import numpy as np
import pytest
from scipy import ndimage as ndi

from boa_tpu.ops import resample as rs


@pytest.mark.parametrize("order", [0, 1, 3])
@pytest.mark.parametrize("shape,zoom", [((19, 17, 13), 1.7), ((24, 20, 16), 0.55)])
def test_zoom_parity(order, shape, zoom, rng):
    vol = rng.normal(size=shape).astype(np.float32) * 100
    ref = ndi.zoom(vol.astype(np.float64), zoom, order=order, mode="nearest")
    out_shape = rs.zoom_output_shape(shape, [zoom] * 3)
    assert ref.shape == out_shape
    if order == 0:
        got = np.asarray(rs.resample_nearest(vol, out_shape, convention="zoom"))
        np.testing.assert_array_equal(got, ref.astype(np.float32))
    else:
        got = np.asarray(rs.resample_volume(vol, out_shape, order=order, convention="zoom"))
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-3)


@pytest.mark.parametrize("order", [1, 3])
def test_resize_parity_halfpixel(order, rng):
    """Reference impl of skimage.resize: map_coordinates on half-pixel grid."""
    vol = rng.normal(size=(14, 11, 9)).astype(np.float64)
    new_shape = (21, 7, 13)
    grids = np.meshgrid(
        *[(np.arange(n) + 0.5) * (o / n) - 0.5 for n, o in zip(new_shape, vol.shape)],
        indexing="ij",
    )
    ref = ndi.map_coordinates(vol, np.array(grids), order=order, mode="nearest",
                              prefilter=order > 1)
    got = np.asarray(rs.resample_volume(vol, new_shape, order=order, convention="resize"))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_separate_z(rng):
    """Anisotropic mode: cubic in-plane, order-0 along z."""
    vol = rng.normal(size=(12, 12, 30)).astype(np.float32)
    new_shape = (18, 18, 10)
    got = np.asarray(rs.resample_volume(vol, new_shape, order=3, convention="resize",
                                        separate_z_order=0))
    # z rows must be exact copies of input slices (order 0 = nearest)
    iz = rs.axis_nearest_indices(30, 10, "resize")
    inplane = np.asarray(rs.resample_volume(vol[:, :, iz], (18, 18, 10), order=3,
                                            convention="resize"))
    np.testing.assert_allclose(got, inplane, rtol=1e-4, atol=1e-4)


def test_seg_onehot_resample(rng):
    seg = rng.integers(0, 4, size=(10, 10, 10)).astype(np.uint8)
    out = np.asarray(rs.resample_seg_onehot(seg, (15, 15, 15), num_classes=4))
    assert out.shape == (15, 15, 15)
    assert set(np.unique(out)) <= {0, 1, 2, 3}
    # upsample then downsample back preserves dominant structure
    back = np.asarray(rs.resample_seg_onehot(out, (10, 10, 10), num_classes=4))
    assert (back == seg).mean() > 0.9


def test_multichannel_batch(rng):
    vol = rng.normal(size=(2, 5, 8, 8, 8)).astype(np.float32)
    out = rs.resample_volume(vol, (4, 4, 4), order=1, convention="resize")
    assert out.shape == (2, 5, 4, 4, 4)


def test_change_spacing_shape_and_affine():
    out_shape, zoom, new_spacing = rs.change_spacing_shape(
        (100, 100, 50), (0.8, 0.8, 3.0), (1.5, 1.5, 1.5))
    assert out_shape == (53, 53, 100)
    aff = np.diag([0.8, -0.8, 3.0, 1.0])
    new_aff = rs.rescale_affine(aff, zoom)
    np.testing.assert_allclose(np.abs(np.diag(new_aff)[:3]), [1.5, 1.5, 1.5])
    # target_shape mode inverts exactly
    shape2, zoom2, sp2 = rs.change_spacing_shape(
        out_shape, new_spacing, target_shape=(100, 100, 50))
    assert shape2 == (100, 100, 50)


def test_nnunet_compute_new_shape():
    assert rs.compute_new_shape((512, 512, 300), (0.7, 0.7, 3.0), (1.5, 1.5, 1.5)) == (
        239, 239, 600)
