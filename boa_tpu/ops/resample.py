"""Separable spline resampling as MXU matmuls.

The reference resamples with two different conventions:

* TotalSegmentator `change_spacing` (`totalsegmentator/resampling.py:129-222`)
  -> `scipy.ndimage.zoom(..., mode="nearest", order=order)`: align-corners
  coordinate map ``x_old = x_new * (n_in-1)/(n_out-1)``, output shape
  ``round(n_in * zoom)``.
* nnU-Net `resample_data_or_seg` (`nnunetv2/preprocessing/resampling/
  default_resampling.py:113-200`) -> `skimage.transform.resize(mode='edge',
  anti_aliasing=False)`: half-pixel map ``x_old = (x_new+0.5)*n_in/n_out-0.5``,
  plus the anisotropic separate-z mode (2D in-plane resize + order-0/1 z).

Both are *separable linear operators* per axis. We build the exact per-axis
operator matrix on the host by pushing an identity matrix through
`scipy.ndimage.map_coordinates` (including cubic-spline prefiltering, mode
'nearest'), cache it, and apply the three axis operators on the TPU as dense
matmuls — turning a scipy C hot loop (SURVEY.md §3 hot loop #2) into three
MXU contractions. Exactness: the operator matrix *is* the scipy kernel by
construction, so device results match scipy to fp32 rounding.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from scipy import ndimage as ndi


# ---------------------------------------------------------------------------
# host: operator-matrix construction
# ---------------------------------------------------------------------------


def _coords_zoom(n_in: int, n_out: int) -> np.ndarray:
    """scipy.ndimage.zoom grid_mode=False (align corners)."""
    if n_out <= 1 or n_in <= 1:
        return np.zeros(n_out)
    return np.arange(n_out) * (n_in - 1) / (n_out - 1)


def _coords_resize(n_in: int, n_out: int) -> np.ndarray:
    """skimage.transform.resize / align_corners=False (half-pixel centers)."""
    return (np.arange(n_out) + 0.5) * (n_in / n_out) - 0.5


@lru_cache(maxsize=512)
def axis_operator(n_in: int, n_out: int, order: int, convention: str) -> np.ndarray:
    """(n_out, n_in) matrix M with out = M @ x for 1D spline resampling.

    convention: 'zoom' (ndimage.zoom align-corners) or 'resize'
    (skimage half-pixel). order: spline order 0/1/3/5. Boundary mode
    'nearest' (== skimage 'edge').
    """
    if n_in == n_out and convention in ("zoom", "resize"):
        return np.eye(n_in, dtype=np.float32)
    coords = {"zoom": _coords_zoom, "resize": _coords_resize}[convention](n_in, n_out)
    eye = np.eye(n_in, dtype=np.float64)
    # out[i, j] = spline_interp(eye[:, j]) at coords[i]
    cgrid = np.stack(
        [np.repeat(coords, n_in), np.tile(np.arange(n_in, dtype=np.float64), n_out)]
    ).reshape(2, n_out, n_in)
    mat = ndi.map_coordinates(eye, cgrid, order=order, mode="nearest", prefilter=order > 1)
    return np.ascontiguousarray(mat, dtype=np.float32)


@lru_cache(maxsize=512)
def axis_nearest_indices(n_in: int, n_out: int, convention: str) -> np.ndarray:
    """Order-0 resampling as a gather index vector (exact scipy semantics)."""
    mat = axis_operator(n_in, n_out, 0, convention)
    return np.argmax(mat, axis=1).astype(np.int32)


def compute_new_shape(old_shape, old_spacing, new_spacing) -> tuple[int, ...]:
    """nnU-Net shape rule (`default_resampling.py:24-30`): round(sp/nsp * n)."""
    return tuple(
        int(round(i / j * k)) for i, j, k in zip(old_spacing, new_spacing, old_shape)
    )


def zoom_output_shape(old_shape, zoom) -> tuple[int, ...]:
    """ndimage.zoom shape rule: round(n * zoom)."""
    return tuple(int(round(n * z)) for n, z in zip(old_shape, zoom))


# ---------------------------------------------------------------------------
# device: separable application
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("precision",))
def _apply3(vol: jax.Array, mx: jax.Array, my: jax.Array, mz: jax.Array,
            precision: str = "highest") -> jax.Array:
    """vol (..., X, Y, Z) -> (..., X', Y', Z') via three contractions."""
    p = {"default": jax.lax.Precision.DEFAULT, "high": jax.lax.Precision.HIGH,
         "highest": jax.lax.Precision.HIGHEST}[precision]
    out = jnp.einsum("...xyz,ax->...ayz", vol, mx, precision=p)
    out = jnp.einsum("...xyz,by->...xbz", out, my, precision=p)
    out = jnp.einsum("...xyz,cz->...xyc", out, mz, precision=p)
    return out


def _axis_op_windowed(n_in: int, n_out: int, order: int, convention: str,
                      window) -> np.ndarray:
    """Axis operator, optionally sliced out of a FULL-grid operator.

    `window = (full_in, full_out, in0, out0)` makes a cropped volume's
    resample an *exact subgrid* of the full-grid resample: both the zoom
    and resize coordinate maps depend on the full extents, so resampling
    a crop with its own extents shifts every sample sub-voxel-wise. The
    sliced rows' support can extend past the crop columns; with the body
    crop's air margin the truncated weights act on constant air (and the
    cubic prefilter's IIR tail decays ~0.268^d), so results match the
    full-grid resample to fp32 rounding inside the window.
    """
    if window is None:
        return axis_operator(n_in, n_out, order, convention)
    full_in, full_out, in0, out0 = window
    rows = axis_operator(full_in, full_out, order, convention)[
        out0:out0 + n_out]
    mat = np.ascontiguousarray(rows[:, in0:in0 + n_in])
    # fold the dropped columns' weights onto the window-edge columns
    # (nearest-extension): rows near the window edge have kernel support
    # outside it; the crop margin guarantees the outside content equals
    # the edge content (air), so this reproduces the full-grid values
    if in0 > 0:
        mat[:, 0] += rows[:, :in0].sum(axis=1)
    if in0 + n_in < full_in:
        mat[:, -1] += rows[:, in0 + n_in:].sum(axis=1)
    return mat


def _axis_idx_windowed(n_in: int, n_out: int, convention: str,
                       window) -> np.ndarray:
    """Nearest-index vector, optionally sliced from the full-grid map."""
    if window is None:
        return axis_nearest_indices(n_in, n_out, convention)
    full_in, full_out, in0, out0 = window
    idx = axis_nearest_indices(full_in, full_out, convention)
    return np.clip(idx[out0:out0 + n_out] - in0, 0, n_in - 1).astype(np.int32)


def resample_volume(vol: jax.Array | np.ndarray, new_shape: tuple[int, int, int],
                    order: int = 3, convention: str = "zoom",
                    separate_z_order: int | None = None,
                    windows=None) -> jax.Array:
    """Resample the last 3 axes of ``vol`` to ``new_shape``.

    separate_z_order: if not None, in-plane (x,y) uses ``order`` and the z
    axis uses this order — nnU-Net's anisotropic separate-z mode
    (`default_resampling.py:33-67`; order_z=0 by default).
    windows: optional per-axis (full_in, full_out, in0, out0) triple-slice
    spec (see `_axis_op_windowed`) aligning a cropped resample to the
    full-grid sample positions.
    """
    vol = jnp.asarray(vol)
    in_shape = vol.shape[-3:]
    z_order = order if separate_z_order is None else separate_z_order
    w = windows or (None, None, None)
    mx = jnp.asarray(_axis_op_windowed(in_shape[0], new_shape[0], order,
                                       convention, w[0]))
    my = jnp.asarray(_axis_op_windowed(in_shape[1], new_shape[1], order,
                                       convention, w[1]))
    mz = jnp.asarray(_axis_op_windowed(in_shape[2], new_shape[2], z_order,
                                       convention, w[2]))
    return _apply3(vol.astype(jnp.float32), mx, my, mz)


def resample_nearest(vol: jax.Array | np.ndarray, new_shape: tuple[int, int, int],
                     convention: str = "zoom", windows=None) -> jax.Array:
    """Order-0 resample of the last 3 axes (labels); pure gather, any dtype."""
    vol = jnp.asarray(vol)
    in_shape = vol.shape[-3:]
    w = windows or (None, None, None)
    ix = jnp.asarray(_axis_idx_windowed(in_shape[0], new_shape[0], convention, w[0]))
    iy = jnp.asarray(_axis_idx_windowed(in_shape[1], new_shape[1], convention, w[1]))
    iz = jnp.asarray(_axis_idx_windowed(in_shape[2], new_shape[2], convention, w[2]))
    out = jnp.take(vol, ix, axis=-3)
    out = jnp.take(out, iy, axis=-2)
    return jnp.take(out, iz, axis=-1)


def resample_nearest_host(vol: np.ndarray, new_shape: tuple[int, int, int],
                          convention: str = "zoom", windows=None) -> np.ndarray:
    """Order-0 resample on the HOST (pure np.take gathers, same cached index
    vectors as the device path — bit-identical results). Used when the label
    volume is already host-side and an extra device round-trip would cost
    more than the gather (host↔device bandwidth is ~20-80 MB/s through the
    TPU tunnel)."""
    in_shape = vol.shape[-3:]
    w = windows or (None, None, None)
    out = vol
    for axis, (n_in, n_out) in enumerate(zip(in_shape, new_shape)):
        if n_in == n_out and w[axis] is None:
            continue  # identity axis: np.take would still copy ~50 MB here
        idx = _axis_idx_windowed(n_in, n_out, convention, w[axis])
        if n_in == n_out and np.array_equal(idx, np.arange(n_in)):
            continue
        out = np.take(out, idx, axis=axis - 3)
    return out


def resample_seg_onehot(seg: jax.Array | np.ndarray, new_shape: tuple[int, int, int],
                        num_classes: int, order: int = 1,
                        convention: str = "resize",
                        separate_z_order: int | None = None,
                        windows=None) -> jax.Array:
    """Segmentation resampling via per-class linear interpolation + argmax.

    Parity: batchgenerators ``resize_segmentation`` (used by nnU-Net's
    `resample_data_or_seg` when is_seg and order > 0) — one-hot each class,
    resample with ``order``, take the class with maximal weight.
    """
    seg = jnp.asarray(seg)
    oh = jax.nn.one_hot(seg.astype(jnp.int32), num_classes, axis=0, dtype=jnp.float32)
    res = resample_volume(oh, new_shape, order=order, convention=convention,
                          separate_z_order=separate_z_order, windows=windows)
    return jnp.argmax(res, axis=0).astype(seg.dtype)


# ---------------------------------------------------------------------------
# high-level: TS change_spacing equivalent (device-side, affine on host)
# ---------------------------------------------------------------------------


def change_spacing_shape(old_shape, old_spacing, new_spacing=None, target_shape=None):
    """Shape + zoom math of `totalsegmentator/resampling.py:171-180`."""
    old_shape = np.asarray(old_shape[:3])
    old_spacing = np.asarray(old_spacing[:3], dtype=np.float64)
    if target_shape is not None:
        zoom = np.asarray(target_shape) / old_shape
        new_spacing = old_spacing / zoom
    else:
        new_spacing = np.asarray(new_spacing, dtype=np.float64)
        zoom = old_spacing / new_spacing
    out_shape = zoom_output_shape(old_shape, zoom) if target_shape is None \
        else tuple(int(t) for t in target_shape)
    return out_shape, zoom, new_spacing


def rescale_affine(affine: np.ndarray, zoom) -> np.ndarray:
    """Scale affine columns by 1/zoom (`resampling.py:190-196`)."""
    new_affine = np.copy(affine)
    for i in range(3):
        new_affine[:3, i] = new_affine[:3, i] / zoom[i]
    return new_affine
