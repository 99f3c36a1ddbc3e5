"""Mask-based cropping with affine bookkeeping.

Parity: `totalsegmentator/cropping.py` — `get_bbox_from_mask` (`:11-37`),
`crop_to_bbox(_nifti)` (`:40-74`), `crop_to_mask` (`:77-103`, addon given in
mm and converted to voxels), `undo_crop` (`:127-133`, zero-fill).

`body_crop_xy` is a TPU-first addition with no line-for-line reference
equivalent (the closest behaviors are `bin/crop_to_body` and the
`body_seg=True` crop of `totalsegmentator/python_api.py`): the host↔device
link and the MXU both pay for every air voxel, so `analyze_ct` crops the
study to an HU-threshold body bounding box in-plane before the first
upload. Saved volumes are zero-padded back to the original grid by
`io/nifti.py:save` (see `NiftiImage.crop_info`), so on-disk outputs are
grid-identical to the uncropped run.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from boa_tpu.io.nifti import NiftiImage


@dataclass(frozen=True)
class BodyCrop:
    """In-plane crop bookkeeping: pad-back target for saved volumes."""

    orig_shape: tuple[int, int, int]
    orig_affine: np.ndarray
    x0: int
    x1: int
    y0: int
    y1: int

    @property
    def voxel_fraction(self) -> float:
        ox, oy, _ = self.orig_shape
        return (self.x1 - self.x0) * (self.y1 - self.y0) / float(ox * oy)


def body_crop_xy(img: NiftiImage, threshold: float = -500.0,
                 margin_mm: float = 16.0, stride: int = 4,
                 min_saving: float = 0.10
                 ) -> tuple[NiftiImage, BodyCrop | None]:
    """Crop a CT to the in-plane bounding box of voxels above `threshold`.

    The bbox is found on a stride-subsampled view (a ~1/64th host pass),
    expanded by `margin_mm` plus the stride slack, and aligned outward to
    multiples of 8 so 4-bit/1-bit packed transfers stay applicable.
    z is never cropped: slice-indexed outputs (BCA slice measurements,
    vertebra z-presence) stay directly comparable.

    Returns `(img, None)` when cropping would save less than `min_saving`
    of the in-plane area (nothing to win — skip the copies).
    """
    data = np.asarray(img.data)
    if data.ndim != 3:
        return img, None
    sx, sy, sz = data.shape
    sample = data[::stride, ::stride, ::max(1, stride)]
    fg = sample > threshold
    px = fg.any(axis=(1, 2))
    py = fg.any(axis=(0, 2))
    if not bool(px.any()):
        return img, None
    zooms = img.zooms
    nzx = np.flatnonzero(px)
    nzy = np.flatnonzero(py)
    mx = int(np.ceil(margin_mm / max(zooms[0], 1e-3))) + stride
    my = int(np.ceil(margin_mm / max(zooms[1], 1e-3))) + stride
    x0 = max(0, int(nzx[0]) * stride - mx)
    x1 = min(sx, (int(nzx[-1]) + 1) * stride + mx)
    y0 = max(0, int(nzy[0]) * stride - my)
    y1 = min(sy, (int(nzy[-1]) + 1) * stride + my)
    # bucket the cropped extent to multiples of 64: XLA compiles one
    # program per volume shape, so free-form crops would recompile per
    # study — 64-buckets keep the program count bounded (and keep the
    # %8 alignment that packed transfers need)
    def _bucket(lo: int, hi: int, n: int) -> tuple[int, int]:
        lo = (lo // 8) * 8
        w = min(n, ((hi - lo + 63) // 64) * 64)
        hi = min(n, lo + w)
        lo = max(0, hi - w)
        return lo, hi

    x0, x1 = _bucket(x0, x1, sx)
    y0, y1 = _bucket(y0, y1, sy)
    if (x1 - x0) * (y1 - y0) > (1.0 - min_saving) * sx * sy:
        return img, None
    info = BodyCrop(orig_shape=(sx, sy, sz),
                    orig_affine=np.array(img.affine, dtype=np.float64,
                                         copy=True),
                    x0=x0, x1=x1, y0=y0, y1=y1)
    affine = np.copy(img.affine)
    affine[:3, 3] = (affine @ np.array([x0, y0, 0.0, 1.0]))[:3]
    # keep a VIEW: jnp.asarray makes its own contiguous copy at upload
    # time, and a second resident host copy would only burn RAM + a
    # ~150 MB/s single-core pass
    out = NiftiImage(data=data[x0:x1, y0:y1], affine=affine,
                     crop_info=info)
    rng = getattr(img, "_hu_range", None)
    if rng is not None and rng[0] is img.data:
        # crop range ⊆ original, so the upload_ct gating carries — rebound
        # to the crop's own buffer identity (see compute/inference.py)
        object.__setattr__(out, "_hu_range", (out.data, rng[1], rng[2]))
    return out, info


def pad_back(data: np.ndarray, info: "BodyCrop") -> np.ndarray:
    """Zero-fill cropped voxels back into the original in-plane grid."""
    full = np.zeros(info.orig_shape[:2] + data.shape[2:], dtype=data.dtype)
    full[info.x0:info.x1, info.y0:info.y1] = data
    return full


def get_bbox_from_mask(mask: np.ndarray, outside_value: float = 0,
                       addon=(0, 0, 0)) -> list[list[int]]:
    if isinstance(addon, int):
        addon = [addon] * 3
    # per-axis any-projections: np.where would materialize ~24 B/voxel of
    # int64 coordinates (hundreds of MB for a body mask) on this host
    fg = mask > outside_value
    projs = [fg.any(axis=(1, 2)), fg.any(axis=(0, 2)), fg.any(axis=(0, 1))]
    if not projs[0].any():
        return [[0, mask.shape[0]], [0, mask.shape[1]], [0, mask.shape[2]]]
    bbox = []
    for ax, p in enumerate(projs):
        nz = np.flatnonzero(p)
        lo = int(nz[0]) - int(addon[ax])
        hi = int(nz[-1]) + 1 + int(addon[ax])
        bbox.append([max(0, lo), min(mask.shape[ax], hi)])
    return bbox


def crop_to_bbox(data: np.ndarray, bbox) -> np.ndarray:
    return data[bbox[0][0]:bbox[0][1], bbox[1][0]:bbox[1][1], bbox[2][0]:bbox[2][1]]


def crop_img_to_bbox(img: NiftiImage, bbox, dtype=None) -> NiftiImage:
    """Crop and shift the affine origin to the bbox corner."""
    data = crop_to_bbox(np.asarray(img.data), bbox)
    affine = np.copy(img.affine)
    affine[:3, 3] = (affine @ np.array([bbox[0][0], bbox[1][0], bbox[2][0], 1.0]))[:3]
    if dtype is not None:
        data = data.astype(dtype)
    return NiftiImage(data=np.ascontiguousarray(data), affine=affine)


def crop_to_mask(img: NiftiImage, mask_img: NiftiImage, addon_mm=(0, 0, 0),
                 dtype=None) -> tuple[NiftiImage, list[list[int]]]:
    """Crop `img` to the bbox of `mask_img` (+ addon in mm per axis)."""
    addon_vox = (np.array(addon_mm) / np.array(img.zooms)).astype(int)
    bbox = get_bbox_from_mask(np.asarray(mask_img.data), outside_value=0,
                              addon=addon_vox)
    return crop_img_to_bbox(img, bbox, dtype), bbox


def undo_crop(img: NiftiImage, ref_img: NiftiImage, bbox) -> NiftiImage:
    """Zero-fill `img` back into the full extent of `ref_img`."""
    out = np.zeros(ref_img.shape, dtype=np.asarray(img.data).dtype)
    out[bbox[0][0]:bbox[0][1], bbox[1][0]:bbox[1][1], bbox[2][0]:bbox[2][1]] = img.data
    return NiftiImage(data=out, affine=ref_img.affine.copy(),
                      crop_info=getattr(ref_img, "crop_info", None))
