"""Measurement engine parity vs a naive numpy replica of the reference math
(`body_organ_analysis/compute/measurements.py`)."""

import numpy as np
import pytest
from scipy import ndimage

from boa_tpu.measure.measurements import (
    ADIPOSE_TISSUE,
    compute_measurements_arrays,
    compute_pfav_mask,
)
from boa_tpu.tasks import class_maps

CM = {idx: n for idx, n in class_maps.get_class_map("total").items()}
INV = {n: i for i, n in CM.items()}


def _erode6(mask):
    """skimage binary_erosion(ones(6)^3 pad_end) == scipy with 7^3 zero-padded
    footprint, border_value=1."""
    kern = np.zeros((7, 7, 7), bool)
    kern[:6, :6, :6] = True
    return ndimage.binary_erosion(mask, structure=kern, border_value=1)


def _naive_region(ct, mask, spacing, a_mean, a_std):
    if mask.sum() == 0:
        return {"present": False}
    hu = ct[mask]
    out = {
        "present": True,
        "volume_ml": mask.sum() * np.prod(spacing) / 1000.0,
        "mean_hu": float(hu.mean()),
        "std_hu": float(hu.std()),
        "min_hu": float(hu.min()),
        "median_hu": float(np.median(hu)),
        "max_hu": float(hu.max()),
        "25th_percentile_hu": float(np.percentile(hu, 25)),
        "75th_percentile_hu": float(np.percentile(hu, 75)),
    }
    out["cnr"] = (hu.mean() - a_mean) / a_std if a_mean is not None else None
    return out


@pytest.fixture(scope="module")
def volume():
    rng = np.random.default_rng(11)
    shape = (48, 44, 40)
    ct = rng.integers(-1000, 1200, size=shape).astype(np.int16)
    seg = np.zeros(shape, np.uint8)
    seg[10:24, 10:24, 10:24] = INV["autochthon_left"]
    seg[26:40, 10:24, 10:24] = INV["autochthon_right"]
    # muscle-like HU inside autochthon so the fat-free eroded reference is
    # non-empty (random HU would leave fat-range holes that erode to nothing)
    muscle = rng.integers(20, 80, size=shape).astype(np.int16)
    auto_region = np.isin(seg, [INV["autochthon_left"], INV["autochthon_right"]])
    ct[auto_region] = muscle[auto_region]
    seg[10:20, 26:38, 8:20] = INV["aorta"]
    seg[28:40, 26:40, 8:30] = INV["lung_upper_lobe_left"]
    seg[5:9, 5:9, 30:36] = INV["spleen"]
    return ct, seg


def test_measurements_match_naive(volume):
    ct, seg = volume
    spacing = (1.0, 1.0, 2.0)
    got = compute_measurements_arrays(ct, {"total": seg}, spacing,
                                      cnr_adjustment=True)

    # naive autochthon reference
    auto = np.isin(seg, [INV["autochthon_left"], INV["autochthon_right"]])
    fat_free = auto & ((ct < ADIPOSE_TISSUE[0]) | (ct > ADIPOSE_TISSUE[1]))
    eroded = _erode6(fat_free)
    a_mean = float(ct[eroded].mean())
    a_std = float(ct[eroded].std())
    np.testing.assert_allclose(got["info"]["autochthon_mean"], a_mean, rtol=1e-5)
    np.testing.assert_allclose(got["info"]["autochthon_std"], a_std, rtol=1e-4)

    for region in ["autochthon_left", "aorta", "spleen", "autochthon"]:
        if region == "autochthon":
            mask = auto
        else:
            mask = seg == INV[region]
        ref = _naive_region(ct, mask, spacing, a_mean, a_std)
        g = got["segmentations"]["total"][region]
        for k, v in ref.items():
            if v is None:
                assert g[k] is None
            elif isinstance(v, bool):
                assert g[k] == v, k
            else:
                np.testing.assert_allclose(g[k], v, rtol=1e-5, atol=1e-5,
                                           err_msg=f"{region}.{k}")

    # absent region
    assert got["segmentations"]["total"]["liver"] == {"present": False,
                                                      "cnr": None} or \
        got["segmentations"]["total"]["liver"]["present"] is False


def test_pulmonary_fat_metrics(volume):
    ct, seg = volume
    spacing = (1.0, 1.0, 2.0)
    got = compute_measurements_arrays(ct, {"total": seg}, spacing)
    lung = seg == INV["lung_upper_lobe_left"]
    fat = lung & (ct >= ADIPOSE_TISSUE[0]) & (ct <= ADIPOSE_TISSUE[1])
    ref = _naive_region(ct, fat, spacing, None, None)
    g = got["segmentations"]["total"]["ct_pfav_lung_upper_lobe_left"]
    for k in ["volume_ml", "mean_hu", "median_hu", "25th_percentile_hu"]:
        np.testing.assert_allclose(g[k], ref[k], rtol=1e-5, err_msg=k)
    # lobe aggregation = union of left lobes
    g_side = got["segmentations"]["total"]["ct_pfav_lobe_left"]
    np.testing.assert_allclose(g_side["volume_ml"], ref["volume_ml"], rtol=1e-6)

    pfav = compute_pfav_mask(ct, seg)
    np.testing.assert_array_equal(pfav > 0, fat)


def test_cnr_adjusted(volume):
    ct, seg = volume
    spacing = (1.0, 1.0, 2.0)
    got = compute_measurements_arrays(ct, {"total": seg}, spacing,
                                      cnr_adjustment=True)
    adj = got["cnr_adjusted"]
    assert set(adj.keys()) == {"aorta", "autochthon_left", "autochthon_right"}

    auto = np.isin(seg, [INV["autochthon_left"], INV["autochthon_right"]])
    fat_free = auto & ((ct < ADIPOSE_TISSUE[0]) | (ct > ADIPOSE_TISSUE[1]))
    a = ct[_erode6(fat_free)]
    a_mean, a_std = float(a.mean()), float(a.std())

    # aorta: plain erosion, CNR vs reference
    aorta_eroded = _erode6(seg == INV["aorta"])
    ref = _naive_region(ct, aorta_eroded, spacing, a_mean, a_std)
    for k in ["volume_ml", "mean_hu", "std_hu", "cnr", "75th_percentile_hu"]:
        np.testing.assert_allclose(adj["aorta"][k], ref[k], rtol=1e-4, err_msg=k)

    # autochthon_*: fat exclusion + erosion, cnr explicitly None
    al_mask = _erode6((seg == INV["autochthon_left"])
                      & ((ct < ADIPOSE_TISSUE[0]) | (ct > ADIPOSE_TISSUE[1])))
    ref_l = _naive_region(ct, al_mask, spacing, a_mean, a_std)
    np.testing.assert_allclose(adj["autochthon_left"]["mean_hu"], ref_l["mean_hu"],
                               rtol=1e-5)
    assert adj["autochthon_left"]["cnr"] is None


def test_major_minor_axis_degenerate_slice():
    """A thin/fragmented body slice whose minor-axis ray misses the contour
    yields (None, None) instead of crashing (regression: IndexError on a
    synthetic noisy study aborted the whole TS-metrics stage)."""
    from boa_tpu.compute.ts_metrics import major_minor_axis

    l3 = np.zeros((40, 40, 10), bool)
    l3[18:22, 18:22, 4:6] = True
    body = np.zeros((40, 40, 10), bool)
    body[5:35, 20, :] = True  # 1-voxel-thin line: degenerate contour
    maj, mino = major_minor_axis(l3, body, (1.0, 1.0, 1.0))
    assert maj is None or isinstance(maj, float)
    assert mino is None or isinstance(mino, float)


def test_find_axes_ellipse_recovers_diameters():
    """find_axes on a filled ellipse returns the major/minor diameters
    within raster tolerance (behavior of reference geometry.py:49-85)."""
    from boa_tpu.compute.geometry import find_axes

    h = w = 200
    yy, xx = np.mgrid[:h, :w]
    a, b = 80.0, 45.0  # semi-axes: major along x, minor along y
    mask = ((xx - 100) / a) ** 2 + ((yy - 100) / b) ** 2 <= 1.0
    maj_a, maj_b, min_a, min_b = find_axes(mask)
    major = np.hypot(*(maj_a - maj_b))
    minor = np.hypot(*(min_a - min_b))
    assert abs(major - 2 * a) < 4.0
    assert abs(minor - 2 * b) < 4.0
    # major axis should be along x, minor along y
    assert abs(maj_a[1] - maj_b[1]) < abs(maj_a[0] - maj_b[0]) * 0.2
    assert abs(min_a[0] - min_b[0]) < abs(min_a[1] - min_b[1]) * 0.2


def test_convex_hull_matches_scipy():
    from scipy import spatial

    from boa_tpu.compute.geometry import convex_hull

    rng = np.random.default_rng(7)
    pts = rng.integers(0, 100, size=(300, 2))
    ours = convex_hull(pts)
    ref = pts[spatial.ConvexHull(pts.astype(float)).vertices]
    assert {tuple(p) for p in ours} == {tuple(p) for p in ref}


def test_adjusted_label_volume_matches_per_mask_erosion(rng):
    """The fused per-class erosion (one min/max window pair) must equal
    erosion_box_border1 applied to each disjoint class mask."""
    import jax.numpy as jnp

    from boa_tpu.measure.measurements import _adjusted_label_volume
    from boa_tpu.ops.morphology import erosion_box_border1

    shape = (24, 20, 18)
    ct = rng.integers(-500, 500, shape).astype(np.int16)
    seg = rng.integers(0, 4, shape).astype(np.uint8)  # adjacent classes
    labels, fat_excl = (1, 2, 3), (False, True, False)
    got = np.asarray(_adjusted_label_volume(
        jnp.asarray(seg), jnp.asarray(ct), labels, fat_excl))
    nonfat = (ct < ADIPOSE_TISSUE[0]) | (ct > ADIPOSE_TISSUE[1])
    want = np.zeros(shape, np.int32)
    for i, (lb, fx) in enumerate(zip(labels, fat_excl), start=1):
        m = seg == lb
        if fx:
            m = m & nonfat
        er = np.asarray(erosion_box_border1(jnp.asarray(
            m.astype(np.uint8)), 6)) > 0
        assert not (want[er] != 0).any()  # eroded classes stay disjoint
        want[er] = i
    np.testing.assert_array_equal(got, want)


def test_pfav_mask_device_matches_host(volume):
    import jax.numpy as jnp

    from boa_tpu.measure.measurements import _pfav_mask_device

    ct, seg = volume
    want = compute_pfav_mask(ct, seg)
    got = _pfav_mask_device(jnp.asarray(ct), jnp.asarray(seg))
    np.testing.assert_array_equal(got, want)


def test_radiomics_hist_path_matches_direct(rng):
    """Integer CTs take the one-pass histogram path; its features must
    equal the direct per-label numpy math (first_order_features)."""
    from boa_tpu.measure.radiomics import (first_order_features,
                                           get_radiomics_features)

    shape = (20, 18, 16)
    ct = rng.integers(-1000, 1500, shape).astype(np.int16)
    seg = rng.integers(0, 4, shape).astype(np.uint8)
    label_map = {1: "a", 2: "b", 3: "c"}
    spacing = (1.0, 1.5, 2.0)
    got = get_radiomics_features(ct, seg, spacing, label_map,
                                 with_shape=False)
    mlpv = float(np.prod(spacing)) / 1000.0
    for lb, name in label_map.items():
        want = first_order_features(ct[seg == lb], mlpv)
        assert set(got[name]) == set(want)
        for k, wv in want.items():
            # entropy/uniformity: np.histogram's float fast-path may bin an
            # exactly-on-edge value differently than the searchsorted edge
            # rule (one voxel in an adjacent bin) — everything else is exact
            rtol = 1e-6 if k in ("entropy", "uniformity") else 1e-12
            np.testing.assert_allclose(got[name][k], wv, rtol=rtol,
                                       err_msg=f"{name}.{k}")
    # empty class
    got_e = get_radiomics_features(ct, np.zeros(shape, np.uint8), spacing,
                                   {1: "a"})
    assert got_e["a"]["present"] is False
    assert got_e["a"]["shape_VoxelVolume"] == 0.0  # zeroed shape class


def test_radiomics_out_of_range_falls_back_exact(rng):
    """Metal-implant HU above 3071 must not be histogram-clipped."""
    from boa_tpu.measure.radiomics import get_radiomics_features

    shape = (12, 10, 8)
    ct = rng.integers(-1000, 1500, shape).astype(np.int16)
    seg = np.zeros(shape, np.uint8)
    seg[2:6, 2:6, 2:6] = 1
    ct[3, 3, 3] = 10000  # implant voxel
    got = get_radiomics_features(ct, seg, (1, 1, 1), {1: "implant"})
    assert got["implant"]["maximum"] == 10000.0
