"""Connected components + morphology parity vs scipy."""

import numpy as np
import pytest
from scipy import ndimage

from boa_tpu import native
from boa_tpu.ops import connected_components as cc
from boa_tpu.ops import morphology, postprocessing


@pytest.fixture(scope="module")
def blobs(rng=None):
    r = np.random.default_rng(7)
    vol = (r.random((40, 35, 30)) > 0.7).astype(np.uint8)
    return vol


def test_native_lib_builds():
    assert native.get_lib() is not None, "C++ native lib should build here"


@pytest.mark.parametrize("connectivity", [1, 3])
def test_label_matches_scipy(blobs, connectivity):
    structure = ndimage.generate_binary_structure(3, connectivity)
    ref_labels, ref_n = ndimage.label(blobs, structure=structure)
    got_labels, got_n = cc.label(blobs, connectivity)
    assert got_n == ref_n
    # same partition: label images must be identical up to renaming
    pairs = set(zip(ref_labels.ravel().tolist(), got_labels.ravel().tolist()))
    assert len(pairs) == ref_n + 1  # bijection incl. background


def test_largest_component(blobs):
    ref_labels, ref_n = ndimage.label(blobs)
    sizes = np.bincount(ref_labels.ravel())
    sizes[0] = 0
    ref = (ref_labels == np.argmax(sizes)).astype(np.uint8)
    got = cc.largest_component(blobs, connectivity=1)
    np.testing.assert_array_equal(got, ref)


def test_filter_by_size(blobs):
    got = cc.filter_components_by_size(blobs, (5, 1e10), connectivity=1)
    ref_labels, ref_n = ndimage.label(blobs)
    sizes = np.bincount(ref_labels.ravel(), minlength=ref_n + 1)
    keep = (sizes > 5) & (sizes <= 1e10)
    keep[0] = False
    np.testing.assert_array_equal(got, keep[ref_labels].astype(np.uint8))


def test_dilation_erosion_cross(blobs):
    for it in [1, 3]:
        ref_d = ndimage.binary_dilation(blobs, iterations=it)
        got_d = morphology.binary_dilation_cross(blobs, iterations=it)
        np.testing.assert_array_equal(got_d, ref_d.astype(np.uint8))
        ref_e = ndimage.binary_erosion(blobs, iterations=it)
        got_e = morphology.binary_erosion_cross(blobs, iterations=it)
        np.testing.assert_array_equal(got_e, ref_e.astype(np.uint8))


def test_erosion_box():
    m = np.zeros((20, 20, 20), np.uint8)
    m[4:16, 4:16, 4:16] = 1
    got = np.asarray(morphology.erosion_box(m, 6))
    # erosion by 6-cube: interior shrinks by (3, 2) on each axis
    ref = np.zeros_like(m)
    ref[6:14, 6:14, 6:14] = 0
    from scipy.ndimage import binary_erosion

    ref = binary_erosion(m, structure=np.ones((6, 6, 6)))
    np.testing.assert_array_equal(got, ref.astype(np.uint8))


def test_median_filter_inplane(rng):
    vol = rng.normal(size=(12, 13, 5)).astype(np.float32)
    got = np.asarray(morphology.median_filter_inplane(vol))
    ref = ndimage.median_filter(vol, size=(3, 3, 1))
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_keep_largest_blob_multilabel():
    seg = np.zeros((20, 20, 20), np.uint8)
    seg[2:8, 2:8, 2:8] = 1      # big blob of class 1
    seg[15:17, 15:17, 15:17] = 1  # small blob of class 1
    seg[10:12, 2:4, 2:4] = 2
    cmap = {1: "body_trunc", 2: "other"}
    out = postprocessing.keep_largest_blob_multilabel(seg, cmap, ["body_trunc"])
    assert out[3, 3, 3] == 1
    assert out[15, 15, 15] == 0
    assert out[10, 2, 2] == 2  # untouched class


def test_extract_skin():
    ct = np.full((24, 24, 24), -1000, np.int16)
    body = np.zeros((24, 24, 24), np.uint8)
    body[6:18, 6:18, 6:18] = 1
    ct[6:18, 6:18, 6:18] = 40
    skin = postprocessing.extract_skin(ct, body)
    assert skin.sum() > 0
    assert skin[12, 12, 12] == 0  # interior is not skin
