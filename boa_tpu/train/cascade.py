"""Cascade stage bridging: lowres predictions → fullres training inputs.

Parity: `nnunetv2/training/nnUNetTrainer/nnUNetTrainer.py:1251-1337` —
after the lowres stage trains, its predictions over the training cases are
resampled onto the next stage's preprocessed grid and stored
(`predicted_next_stage/<config>/{case}`); the cascade trainer then loads
them alongside each case and feeds them as one-hot input channels.

Here the bridge is `predict_next_stage`: sliding-window predict every
case of the lowres `CaseStore`, nearest-resample the label map to the
target store's case grid, and attach it via `CaseStore.save_prev_seg`
(read back by the cascade `DataLoader`).
"""

from __future__ import annotations

import logging
from typing import Sequence

import jax.numpy as jnp
import numpy as np

from boa_tpu.models.unet import ArchConfig
from boa_tpu.train.dataset import CaseStore

logger = logging.getLogger(__name__)


def predict_next_stage(params, arch: ArchConfig,
                       lowres_store: CaseStore, target_store: CaseStore,
                       patch: Sequence[int],
                       case_ids: Sequence[str] | None = None,
                       step_size: float = 0.5) -> list[str]:
    """Attach lowres-model predictions to `target_store` as prev-stage segs.

    `params` is one fold's parameter pytree of the lowres model (`arch`,
    patch `patch`); cases are the PREPROCESSED lowres arrays, so the
    network runs on them directly (like the reference's validation-time
    export). Returns the case ids processed.
    """
    from boa_tpu.inference.sliding_window import (sliding_window_logits,
                                                  stack_fold_params)
    from boa_tpu.ops import preprocess as pp
    from boa_tpu.ops import resample as rs

    patch = tuple(patch)
    stacked = stack_fold_params([params])
    gauss = jnp.asarray(pp.gaussian_importance_map(patch))
    ids = list(case_ids) if case_ids is not None else lowres_store.case_ids()
    done = []
    for cid in ids:
        case = lowres_store.load_case(cid, memmap=False)
        data = np.asarray(case.data, np.float32)
        padded, revert = pp.pad_to_patch(data, patch)
        starts = pp.tile_starts(padded.shape[-3:], patch, step_size)
        logits = sliding_window_logits(
            stacked, jnp.asarray(padded), jnp.asarray(starts), gauss, arch,
            accum_dtype=jnp.float32)
        seg = jnp.argmax(logits, axis=0)[revert]
        target_shape = np.load(target_store.root / f"{cid}_seg.npy",
                               mmap_mode="r").shape
        if tuple(seg.shape) != tuple(target_shape):
            seg = rs.resample_nearest(seg, tuple(target_shape),
                                      convention="resize")
        target_store.save_prev_seg(cid, np.asarray(seg))
        done.append(cid)
        logger.info("next-stage seg for %s: %s -> %s", cid,
                    tuple(data.shape[-3:]), tuple(target_shape))
    return done
