"""Connected-component labeling: native C++ union-find with scipy fallback.

The reference's CC substrate is scipy.ndimage.label (6-connectivity;
`totalsegmentator/postprocessing.py:14,57`) and skimage.measure.label
(26-connectivity; `body_composition_analysis/body_regions/postprocess.py`).
Label *values* may differ between backends; all consumers only use
component identity/sizes, which are backend-invariant.
"""

from __future__ import annotations

import numpy as np

from boa_tpu import native


def label(mask: np.ndarray, connectivity: int = 1) -> tuple[np.ndarray, int]:
    """Label connected components of a boolean/uint8 3D mask.

    connectivity: 1 = 6-neighborhood (scipy default), 3 = 26-neighborhood
    (skimage default for 3D).
    """
    mask = np.ascontiguousarray(mask.astype(np.uint8, copy=False))
    lib = native.get_lib()
    if lib is not None:
        labels = np.empty(mask.shape, dtype=np.int32)
        n = lib.boa_label3d(
            mask.ctypes.data, *[int(s) for s in mask.shape], int(connectivity),
            labels.ctypes.data)
        return labels, int(n)
    from scipy import ndimage

    structure = ndimage.generate_binary_structure(3, connectivity)
    labels, n = ndimage.label(mask, structure=structure)
    return labels.astype(np.int32), int(n)


def largest_component(mask: np.ndarray, connectivity: int = 1) -> np.ndarray:
    """Mask of the largest connected component (keep_largest_blob parity)."""
    mask = np.ascontiguousarray(mask.astype(np.uint8, copy=False))
    lib = native.get_lib()
    if lib is not None:
        out = np.empty(mask.shape, dtype=np.uint8)
        lib.boa_largest_component(
            mask.ctypes.data, *[int(s) for s in mask.shape], int(connectivity),
            out.ctypes.data)
        return out
    labels, n = label(mask, connectivity)
    if n == 0:
        return np.zeros_like(mask)
    sizes = component_sizes(labels, n)  # native path avoids the int64 temp
    sizes[0] = 0
    return (labels == np.argmax(sizes)).astype(np.uint8)


def filter_components_by_size(mask: np.ndarray, interval: tuple[float, float],
                              connectivity: int = 1) -> np.ndarray:
    """Keep components with voxel count in (interval[0], interval[1]].

    Parity: `remove_small_blobs` (`postprocessing.py:46-74`) keeps blobs with
    ``interval[0] < size <= interval[1]``.
    """
    mask = np.ascontiguousarray(mask.astype(np.uint8, copy=False))
    lib = native.get_lib()
    if lib is not None:
        out = np.empty(mask.shape, dtype=np.uint8)
        lib.boa_filter_components_by_size(
            mask.ctypes.data, *[int(s) for s in mask.shape], int(connectivity),
            float(interval[0]), float(interval[1]), out.ctypes.data)
        return out
    labels, n = label(mask, connectivity)
    sizes = component_sizes(labels, n)  # native path avoids the int64 temp
    keep = (sizes > interval[0]) & (sizes <= interval[1])
    keep[0] = False
    return keep[labels].astype(np.uint8)


def histogram_u8(data: np.ndarray) -> np.ndarray:
    """256-bin histogram of a uint8 array (native; avoids np.bincount's
    8x int64 upcast temp on 78M-voxel volumes)."""
    lib = native.get_lib()
    flat = data.reshape(-1)
    if lib is not None and hasattr(lib, "boa_histogram_u8") and \
            flat.dtype == np.uint8 and flat.flags.c_contiguous:
        out = np.zeros(256, np.int64)
        lib.boa_histogram_u8(flat.ctypes.data, flat.size, out.ctypes.data)
        return out
    return np.bincount(flat.ravel().astype(np.intp), minlength=256)[:256]


def minmax(data: np.ndarray) -> tuple[float, float]:
    """Fused single-pass (min, max) of an int16/float32 array (native;
    numpy's separate .min()/.max() walk the volume twice — ~4 s on a
    300 MB CT at this host's ~150 MB/s)."""
    lib = native.get_lib()
    # ravel(order="K") walks memory order: a no-copy view for C- OR
    # F-contiguous inputs (nifti.load yields F-order views), and min/max
    # are order-invariant. Non-contiguous arrays skip to the numpy path
    # rather than pay ravel's hidden copy.
    if data.flags.c_contiguous or data.flags.f_contiguous:
        flat = np.ravel(data, order="K")
    else:
        flat = data
    if lib is not None and flat.ndim == 1 and flat.size > 0:
        if flat.dtype == np.int16 and hasattr(lib, "boa_minmax_i16"):
            out = np.empty(2, np.int16)
            lib.boa_minmax_i16(flat.ctypes.data, flat.size,
                               out[0:].ctypes.data, out[1:].ctypes.data)
            return float(out[0]), float(out[1])
        if flat.dtype == np.float32 and hasattr(lib, "boa_minmax_f32"):
            out = np.empty(2, np.float32)
            lib.boa_minmax_f32(flat.ctypes.data, flat.size,
                               out[0:].ctypes.data, out[1:].ctypes.data)
            return float(out[0]), float(out[1])
    return float(data.min()), float(data.max())


def keep_largest_lut_inplace(seg: np.ndarray, lut: np.ndarray,
                             connectivity: int = 3,
                             ignore_value: int = 255) -> bool:
    """Overwrite every component of {lut[seg]} except the largest with
    `ignore_value`, in place. Fused native path: no mask volume, no
    labels volume (run-based sizes). Returns True when handled natively;
    False means the caller must use the generic label/filter path.
    """
    lib = native.get_lib()
    if lib is None or not hasattr(lib, "boa_keep_largest_lut") or \
            seg.dtype != np.uint8 or not seg.flags.c_contiguous:
        return False
    lut = np.ascontiguousarray(lut.astype(np.uint8, copy=False))
    if lut.size < 256:
        lut = np.pad(lut, (0, 256 - lut.size))
    lib.boa_keep_largest_lut(seg.ctypes.data, *[int(s) for s in seg.shape],
                             lut.ctypes.data, int(connectivity),
                             int(ignore_value))
    return True


def parts_postprocess_label(seg: np.ndarray, label_value: int,
                            box: tuple, ring: tuple, threshold: int,
                            out: np.ndarray) -> int | None:
    """Fused native per-label body-parts postprocess: slice-wise external
    fill + 26-conn small-object removal + hole filtering on the bbox of
    `seg == label_value`, writing `label_value` into `out` at surviving
    voxels. box = ((x0,x1),(y0,y1),(z0,z1)) padded bbox; ring = 6 flags
    (lo/hi per axis) marking faces that carry a 1-voxel background pad
    ring. Returns voxels written, or None when no native lib (caller
    falls back to the numpy/cv2 path)."""
    lib = native.get_lib()
    if lib is None or not hasattr(lib, "boa_parts_postprocess_label") or \
            seg.dtype != np.uint8 or not seg.flags.c_contiguous or \
            out.dtype != np.uint8 or not out.flags.c_contiguous:
        return None
    (x0, x1), (y0, y1), (z0, z1) = box
    ring_arr = np.asarray(ring, np.uint8)
    return int(lib.boa_parts_postprocess_label(
        seg.ctypes.data, *[int(s) for s in seg.shape], int(label_value),
        int(x0), int(x1), int(y0), int(y1), int(z0), int(z1),
        ring_arr.ctypes.data, int(threshold), out.ctypes.data))


def component_sizes(labels: np.ndarray, n: int) -> np.ndarray:
    lib = native.get_lib()
    if lib is not None and labels.dtype == np.int32 and \
            labels.flags.c_contiguous:
        sizes = np.zeros(n + 1, np.int64)
        lib.boa_component_sizes(labels.ctypes.data, labels.size, int(n),
                                sizes.ctypes.data)
        return sizes
    return np.bincount(labels.ravel(), minlength=n + 1)
