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


@jax.jit
def _subclassify(ct: jax.Array, regions: jax.Array) -> jax.Array:
    out = jnp.zeros(regions.shape, jnp.uint8)
    ctf = ct.astype(jnp.float32)
    for tissue, lo, hi, region in _RULES:  # static unroll, XLA fuses to one pass
        m = (regions == region) & (ctf >= lo) & (ctf <= hi)
        out = jnp.where(m, jnp.uint8(tissue), out)
    return out


def subclassify_tissues(ct_data: np.ndarray, body_regions: np.ndarray,
                        median_filtering: bool = False,
                        return_device: bool = False):
    """ct_data, body_regions: (x, y, z) volumes on the same grid.

    return_device=True also returns the device-resident tissue map so
    downstream device consumers (report builder) skip a re-upload.
    """
    ct = jnp.asarray(ct_data)
    if median_filtering:
        ct = median_filter_inplane(ct.astype(jnp.float32), 3)
    # both label volumes cross the tunnel 4-bit packed when possible: the
    # speckled tissue map especially compresses poorly as raw bytes.
    # upload_labels MUST scan for the real max (a host pass): the region
    # postprocess emits 255-ignore fragments (bca/postprocess.py
    # IGNORE_VALUE), and packing a >15 label would corrupt its byte pair.
    body_regions = np.asarray(body_regions)
    regions_dev = packing.upload_labels(body_regions)
    dev = _subclassify(ct, regions_dev)
    host = packing.download_labels(dev, _MAX_TISSUE)
    return (host, dev, regions_dev) if return_device else host
