"""Tissue subclassification: tissue = HU-range ∩ body-region.

Parity: `body_composition_analysis/tissue/subclassification.py:10-63` —
optional in-plane 3x3 median filter on the CT, precomputed HU-range masks,
derivation-table application onto the body-region map.

TPU design: single jitted elementwise pass (the reference materializes one
boolean volume per HU range and per rule).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from boa_tpu.bca.definitions import TISSUE_RULES, Tissue
from boa_tpu.ops import packing
from boa_tpu.ops.morphology import median_filter_inplane

_RULES = tuple((int(t), float(lo), float(hi), int(r)) for t, (lo, hi), r in TISSUE_RULES)
_MAX_TISSUE = max(int(t) for t in Tissue)
IGNORE_VALUE = 255     # bca/postprocess.py removed-fragment marker
IGNORE_XFER = 15       # its packable stand-in on the device copy


@jax.jit
def _subclassify(ct: jax.Array, regions: jax.Array) -> jax.Array:
    out = jnp.zeros(regions.shape, jnp.uint8)
    ctf = ct.astype(jnp.float32)
    for tissue, lo, hi, region in _RULES:  # static unroll, XLA fuses to one pass
        m = (regions == region) & (ctf >= lo) & (ctf <= hi)
        out = jnp.where(m, jnp.uint8(tissue), out)
    return out


def _rules_lut() -> np.ndarray:
    """(256, 4096) uint8: tissue id per (region, HU+1024), rules applied
    in order exactly like the device kernel (later rules overwrite)."""
    lut = np.zeros((256, 4096), np.uint8)
    hu = np.arange(-1024, 3072, dtype=np.float32)
    for tissue, lo, hi, region in _RULES:
        lut[region, (hu >= lo) & (hu <= hi)] = tissue
    return lut


_LUT: np.ndarray | None = None


def _subclassify_host_native(ct_host: np.ndarray,
                             body_regions: np.ndarray) -> np.ndarray | None:
    """One-pass native LUT kernel over host-resident ct+regions — replaces
    downloading the full tissue map through the tunnel. Exactly matches
    the device `_subclassify` for int16 CTs (integer rule bounds; out-of-
    range HU clamps to values no rule matches; region ids outside every
    rule — incl. the 255/15 ignore encodings — map to 0)."""
    from boa_tpu.native import get_lib

    lib = get_lib()
    if lib is None or not hasattr(lib, "boa_subclassify_lut"):
        return None
    global _LUT
    if _LUT is None:
        _LUT = np.ascontiguousarray(_rules_lut())
    ct_c = np.ascontiguousarray(ct_host)
    rg_c = np.ascontiguousarray(body_regions)
    out = np.empty(ct_c.shape, np.uint8)
    import ctypes

    lib.boa_subclassify_lut(
        ct_c.ctypes.data_as(ctypes.c_void_p),
        rg_c.ctypes.data_as(ctypes.c_void_p),
        _LUT.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int64(out.size), out.ctypes.data_as(ctypes.c_void_p))
    return out


def subclassify_tissues(ct_data: np.ndarray, body_regions: np.ndarray,
                        median_filtering: bool = False,
                        return_device: bool = False,
                        regions_dev_raw=None,
                        ct_host: np.ndarray | None = None,
                        defer_host: bool = False):
    """ct_data, body_regions: (x, y, z) volumes on the same grid.

    return_device=True also returns the device-resident tissue map so
    downstream device consumers (report builder) skip a re-upload.

    regions_dev_raw: device-resident PRE-postprocess region seg on the same
    grid (predict_image keep_device_seg) — the region postprocess only ever
    sets removed fragments to 255 (bca/postprocess.py), so instead of
    re-uploading the full speckled label volume the device copy is rebuilt
    as raw ∘ (sparse ignore mask), and only a 1-bit-packed, mostly-zero
    mask crosses the tunnel.

    ct_host: the HOST int16 CT matching `ct_data` (which may be a cached
    device upload). When given (and no median filter), the host tissue map
    is rebuilt locally by the native LUT kernel instead of downloading the
    full 4-bit-packed map — at 600 slices that download is 5-7.5 s of
    serial tunnel time for bytes the host can recompute in ~0.25 s.

    defer_host: return a zero-arg CALLABLE in place of the host array when
    the native rebuild is available — the caller runs it on the overlapped
    HostWorker (it makes no device calls). Running the rebuild on the MAIN
    thread measured 4.7-11 s wall at 600 slices: this single-core host
    round-robins it against the worker's queued stages, where the old
    download was idle tunnel time the worker drained for free.
    """
    from boa_tpu.utils.timing import Spans

    spans = Spans("tissues")
    ct = jnp.asarray(ct_data)
    if median_filtering:
        ct = median_filter_inplane(ct.astype(jnp.float32), 3)
    # both label volumes cross the tunnel 4-bit packed when possible: the
    # speckled tissue map especially compresses poorly as raw bytes. The
    # region postprocess emits 255-ignore fragments (bca/postprocess.py
    # IGNORE_VALUE) which alone break the <16 packing bound, so the
    # device copy encodes ignore as IGNORE_XFER=15 — every consumer
    # (the rules here, the builder's region_z_counts) matches real region
    # ids <= 11 by equality, so the encoding is transparent.
    body_regions = np.asarray(body_regions)
    if regions_dev_raw is not None \
            and tuple(regions_dev_raw.shape) == body_regions.shape:
        ignore = body_regions == IGNORE_VALUE
        regions_dev = jnp.asarray(regions_dev_raw)
        if ignore.any():
            mask_dev = packing.upload_mask(ignore)
            regions_dev = jnp.where(mask_dev != 0, jnp.uint8(IGNORE_XFER),
                                    regions_dev)
        spans.mark("ignore_mask+upload", sync=regions_dev)
    else:
        xfer = body_regions
        if body_regions.dtype == np.uint8:
            from boa_tpu.ops.connected_components import histogram_u8

            present = np.nonzero(histogram_u8(body_regions))[0]
            if present.size and present[-1] > 15 \
                    and (present[:-1] < IGNORE_XFER).all() \
                    and present[-1] == IGNORE_VALUE:
                xfer = np.where(body_regions == IGNORE_VALUE,
                                np.uint8(IGNORE_XFER), body_regions)
        regions_dev = packing.upload_labels(xfer)
    dev = _subclassify(ct, regions_dev)
    spans.mark("subclassify", sync=dev)
    host = None
    native_ok = (not median_filtering and ct_host is not None
                 and ct_host.dtype == np.int16
                 and ct_host.shape == body_regions.shape)
    if native_ok and defer_host:
        from boa_tpu.native import get_lib

        lib = get_lib()
        if lib is not None and hasattr(lib, "boa_subclassify_lut"):
            host = partial(_subclassify_host_native, ct_host, body_regions)
    if host is None and native_ok:
        host = _subclassify_host_native(ct_host, body_regions)
        spans.mark("host_rebuild")
    if host is None:
        host = packing.download_labels(dev, _MAX_TISSUE)
        spans.mark("download+unpack")
    return (host, dev, regions_dev) if return_device else host
