"""Mask-based cropping with affine bookkeeping.

Parity: `totalsegmentator/cropping.py` — `get_bbox_from_mask` (`:11-37`),
`crop_to_bbox(_nifti)` (`:40-74`), `crop_to_mask` (`:77-103`, addon given in
mm and converted to voxels), `undo_crop` (`:127-133`, zero-fill).
"""

from __future__ import annotations

import numpy as np

from boa_tpu.io.nifti import NiftiImage


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
    return NiftiImage(data=out, affine=ref_img.affine.copy())
