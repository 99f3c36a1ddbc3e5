"""pyradiomics shape-class parity tests (measure/shape.py).

Oracles are analytic: the marching-cubes mesh of a single voxel is an
exact octahedron; digital spheres/ellipsoids/boxes have closed-form
areas, volumes, PCA axis lengths (solid ellipsoid: eigenvalue a^2/5 per
semi-axis a -> pyradiomics axis length 4a/sqrt(5)) and diameters; and
closed surfaces are translation-invariant under the divergence-theorem
volume (watertightness)."""

import numpy as np
import pytest

from boa_tpu.measure.shape import _mesh_area_volume_verts, shape_features

SHAPE_KEYS = {
    "shape_Elongation", "shape_Flatness", "shape_LeastAxisLength",
    "shape_MajorAxisLength", "shape_Maximum2DDiameterColumn",
    "shape_Maximum2DDiameterRow", "shape_Maximum2DDiameterSlice",
    "shape_Maximum3DDiameter", "shape_MeshVolume", "shape_MinorAxisLength",
    "shape_Sphericity", "shape_SurfaceArea", "shape_SurfaceVolumeRatio",
    "shape_VoxelVolume",
}


def _ellipsoid(a, b, c, pad=3):
    gx = np.arange(-(a + pad), a + pad + 1)
    gy = np.arange(-(b + pad), b + pad + 1)
    gz = np.arange(-(c + pad), c + pad + 1)
    X, Y, Z = np.meshgrid(gx, gy, gz, indexing="ij")
    return (X / a) ** 2 + (Y / b) ** 2 + (Z / c) ** 2 <= 1.0


def test_single_voxel_exact_octahedron():
    area, vol, verts = _mesh_area_volume_verts(np.ones((1, 1, 1), bool),
                                               (1, 1, 1))
    assert area == pytest.approx(np.sqrt(3.0), rel=1e-12)
    assert vol == pytest.approx(1.0 / 6.0, rel=1e-12)
    assert len(verts) == 6  # +-x, +-y, +-z midpoints


def test_feature_name_parity_with_reference_list():
    f = shape_features(np.ones((4, 4, 4), bool), (1, 1, 1))
    assert set(f) == SHAPE_KEYS  # totalsegmentator/statistics.py:22


def test_sphere_analytic():
    r = 20
    f = shape_features(_ellipsoid(r, r, r), (1.0, 1.0, 1.0))
    assert f["shape_MeshVolume"] == pytest.approx(4 / 3 * np.pi * r**3,
                                                  rel=0.02)
    # binary marching cubes overestimates smooth areas (staircase); the
    # bound is loose but one-sided
    assert 1.0 <= f["shape_SurfaceArea"] / (4 * np.pi * r * r) < 1.12
    assert f["shape_MajorAxisLength"] == pytest.approx(4 * r / np.sqrt(5),
                                                       rel=0.02)
    assert f["shape_Elongation"] == pytest.approx(1.0, rel=0.02)
    assert f["shape_Flatness"] == pytest.approx(1.0, rel=0.02)
    assert f["shape_Maximum3DDiameter"] == pytest.approx(2 * r + 1, rel=0.02)
    assert 0.88 < f["shape_Sphericity"] <= 1.0
    assert f["shape_VoxelVolume"] == pytest.approx(4 / 3 * np.pi * r**3,
                                                   rel=0.02)


def test_ellipsoid_axes_and_diameters():
    a, b, c = 20, 10, 5
    f = shape_features(_ellipsoid(a, b, c), (1.0, 1.0, 1.0))
    assert f["shape_MajorAxisLength"] == pytest.approx(4 * a / np.sqrt(5),
                                                       rel=0.03)
    assert f["shape_MinorAxisLength"] == pytest.approx(4 * b / np.sqrt(5),
                                                       rel=0.03)
    assert f["shape_LeastAxisLength"] == pytest.approx(4 * c / np.sqrt(5),
                                                       rel=0.03)
    assert f["shape_Elongation"] == pytest.approx(b / a, rel=0.03)
    assert f["shape_Flatness"] == pytest.approx(c / a, rel=0.03)
    # slice plane = x-y: diameter 2a+1; row plane = y-z: 2b+1
    assert f["shape_Maximum2DDiameterSlice"] == pytest.approx(2 * a + 1,
                                                              rel=0.03)
    assert f["shape_Maximum2DDiameterRow"] == pytest.approx(2 * b + 1,
                                                            rel=0.03)
    assert f["shape_Maximum2DDiameterColumn"] == pytest.approx(2 * a + 1,
                                                               rel=0.03)


def test_box_with_anisotropic_spacing():
    m = np.ones((10, 8, 6), bool)
    sp = (1.5, 1.5, 5.0)
    f = shape_features(m, sp)
    true_vol = 10 * 8 * 6 * np.prod(sp)
    assert f["shape_VoxelVolume"] == pytest.approx(true_vol, rel=1e-12)
    # mesh volume: the box minus chamfered edges/corners — within 3%
    assert f["shape_MeshVolume"] == pytest.approx(true_vol, rel=0.03)
    box = 2 * (15 * 12 + 15 * 30 + 12 * 30)
    assert f["shape_SurfaceArea"] == pytest.approx(box, rel=0.08)
    assert f["shape_SurfaceVolumeRatio"] == pytest.approx(
        f["shape_SurfaceArea"] / f["shape_MeshVolume"], rel=1e-12)


@pytest.mark.parametrize("seed,thr", [(7, 0.6), (1, 0.4), (2, 0.8)])
def test_watertight_translation_invariance(seed, thr):
    rng = np.random.default_rng(seed)
    m = rng.random((12, 13, 11)) > thr  # adversarial speckle
    _, v1, _ = _mesh_area_volume_verts(m, (1, 1, 1))
    shifted = np.zeros((20, 21, 19), bool)
    shifted[5:17, 6:19, 4:15] = m
    _, v2, _ = _mesh_area_volume_verts(shifted, (1, 1, 1))
    # the divergence-theorem volume is origin-dependent unless the global
    # surface is closed — equality proves watertightness incl. every
    # ambiguous-face configuration the speckle hits
    assert v1 == pytest.approx(v2, abs=1e-9)


def test_watertight_every_configuration():
    # every 2x2x2 corner pattern, embedded in a zero border: the enclosed
    # volume must be translation-invariant for all 256 marching-cubes
    # configurations (incl. every ambiguous face/diagonal case)
    for cfg in range(256):
        m = np.zeros((2, 2, 2), bool)
        for i in range(8):
            if (cfg >> i) & 1:
                m[i & 1, (i >> 1) & 1, (i >> 2) & 1] = True
        _, v1, _ = _mesh_area_volume_verts(m, (1, 1, 1))
        big = np.zeros((7, 8, 9), bool)
        big[3:5, 4:6, 5:7] = m
        _, v2, _ = _mesh_area_volume_verts(big, (1, 1, 1))
        assert v1 == pytest.approx(v2, abs=1e-12), cfg


def test_empty_and_full_masks():
    z = shape_features(np.zeros((4, 4, 4), bool), (1, 1, 1))
    assert all(v == 0.0 for v in z.values())
    f = shape_features(np.ones((3, 3, 3), bool), (2.0, 1.0, 1.0))
    assert f["shape_VoxelVolume"] == pytest.approx(27 * 2.0)
    assert f["shape_MeshVolume"] > 0


def test_radiomics_includes_shape_and_new_firstorder():
    from boa_tpu.measure.radiomics import get_radiomics_features

    rng = np.random.default_rng(0)
    ct = rng.integers(-200, 300, (24, 24, 24)).astype(np.int16)
    seg = np.zeros((24, 24, 24), np.uint8)
    seg[4:16, 5:15, 6:14] = 1
    out = get_radiomics_features(ct, seg, (1.0, 1.0, 1.0), {0: "bg", 1: "roi"})
    roi = out["roi"]
    assert SHAPE_KEYS <= set(roi)
    assert roi["shape_VoxelVolume"] == pytest.approx(12 * 10 * 8)
    assert "robust_mean_absolute_deviation" in roi
    assert roi["total_energy"] == pytest.approx(roi["energy"], rel=1e-9)
    # robust MAD <= MAD by construction
    assert roi["robust_mean_absolute_deviation"] <= \
        roi["mean_absolute_deviation"] + 1e-9
