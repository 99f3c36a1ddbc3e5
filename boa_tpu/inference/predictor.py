"""Per-model predictor: preprocessed-volume -> segmentation, device-resident.

Parity: `nnunetv2/inference/predict_from_raw_data.py` `nnUNetPredictor`
(`:39`), collapsed into a single device pipeline:

  preprocess (crop-to-nonzero, CTNormalization, spline resample to plan
  spacing — `default_preprocessor.py:45-118`)
  -> pad to patch (`predict_from_raw_data.py:657`)
  -> sliding-window fold-ensemble logits (`:470-631`)
  -> revert padding, resample logits to pre-resample shape
     (`export_prediction.py:14-56`), argmax, re-insert into the nonzero bbox
     (`:57-77`).

The reference crosses two process boundaries (preprocess workers, export
pool) and a thread/queue device boundary per tile; here the host only
computes shapes/bboxes and the volume stays on the TPU throughout.
"""

from __future__ import annotations

import os
from collections import OrderedDict
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from boa_tpu.models.unet import ArchConfig
from boa_tpu.ops import preprocess as pp
from boa_tpu.ops import resample as rs
from boa_tpu.plans.plans import ModelPlans
from boa_tpu.inference.sliding_window import (sliding_window_logits,
                                              sliding_window_seg_chunked,
                                              stack_fold_params)

ANISO_THRESHOLD = 3.0  # nnunetv2/configuration.py


def determine_separate_z(current_spacing, new_spacing,
                         threshold: float = ANISO_THRESHOLD):
    """(do_separate_z, axis) — parity: `default_resampling.py:33-67`."""

    def _sep(sp):
        return (np.max(sp) / np.min(sp)) > threshold

    def _axis(sp):
        return np.where(np.max(sp) / np.array(sp) == 1)[0]

    if _sep(current_spacing):
        axis = _axis(current_spacing)
    elif _sep(new_spacing):
        axis = _axis(new_spacing)
    else:
        return False, None
    if len(axis) != 1:
        return False, None
    return True, int(axis[0])


def _argmax_resampled(logits: jax.Array, target_shape: tuple[int, ...],
                      sep_z, chunk: int = 8) -> jax.Array:
    """argmax over classes of order-1-resampled logits, streamed in class
    chunks with a running (max, argmax) pair."""
    n_cls = logits.shape[0]
    best = jnp.full(target_shape, -jnp.inf, jnp.float32)
    idx = jnp.zeros(target_shape, jnp.int32)
    for c0 in range(0, n_cls, chunk):
        ch = rs.resample_volume(logits[c0:c0 + chunk].astype(jnp.float32),
                                target_shape, order=1,
                                convention="resize", separate_z_order=sep_z)
        m = jnp.max(ch, axis=0)
        a = jnp.argmax(ch, axis=0).astype(jnp.int32) + c0
        idx = jnp.where(m > best, a, idx)
        best = jnp.maximum(best, m)
    return idx


from functools import partial


@partial(jax.jit, static_argnames=("pads", "schemes"))
def _normalize_pad(vol, props4, *, pads, schemes):
    """Per-channel normalization + pad-to-patch prologue of the fused path.

    vol: (C, X, Y, Z); props4: (C, 4) [clip_lo, clip_hi, mean, std] rows
    (ignored for ZScore channels); schemes: one name per channel
    (`default_preprocessor.py:85-99` normalizes each channel separately).
    """
    chans = []
    for c, scheme in enumerate(schemes):
        v = vol[c].astype(jnp.float32)
        if scheme == "CTNormalization":
            v = jnp.clip(v, props4[c, 0], props4[c, 1])
            v = (v - props4[c, 2]) / props4[c, 3]
        else:
            v = (v - jnp.mean(v)) / jnp.maximum(jnp.std(v), 1e-8)
        chans.append(v)
    v = jnp.stack(chans)
    if any(p != (0, 0) for p in pads):
        v = jnp.pad(v, ((0, 0),) + tuple(pads))
    return v


# --- device-resident weight cache -------------------------------------
# Loading a model for every study costs ~1 s of npz disk reads plus ~3 s
# of host->device weight upload through the tunnel (125 MB for the fast
# `total` model). The reference pays the equivalent torch.load once per
# nnUNetPredictor process (`predict_from_raw_data.py:83-120`) and keeps the
# module on the GPU; serving here goes through `predict_image` per study,
# so the stacked fold-ensemble params are cached on device across calls,
# bounded by a byte budget (BOA_WEIGHT_CACHE_BYTES, default 6 GB — the
# v5e has 16 GB HBM and the sliding-window accumulators need the rest).
_STACKED_CACHE: OrderedDict = OrderedDict()


def _cache_budget() -> int:
    return int(float(os.environ.get("BOA_WEIGHT_CACHE_BYTES", 6e9)))


def load_stacked_cached(store, task_id: int, trainer: str, model: str,
                        folds) -> tuple[ModelPlans, object]:
    """(plans, stacked device params) for a model, cached across studies."""
    budget = _cache_budget()
    mdir = store.model_dir(task_id, trainer, model=model)
    if folds is None:  # None = all available folds (python_api folds=None)
        folds = sorted(int(p.name.split("_")[1]) for p in mdir.glob("fold_*"))
    # fingerprint the checkpoint files so re-imported weights at the same
    # path invalidate the cache instead of serving stale params
    stamp = []
    for f in folds:
        for name in ("checkpoint_final.npz", "checkpoint_final.pth"):
            p = mdir / f"fold_{f}" / name
            if p.exists():
                st = p.stat()
                stamp.append((f, name, st.st_mtime_ns, st.st_size))
                break
    key = (str(store.root), task_id, trainer, model, tuple(folds),
           tuple(stamp))
    hit = _STACKED_CACHE.get(key)
    if hit is not None:
        _STACKED_CACHE.move_to_end(key)
        return hit[0], hit[1]
    plans, params = store.load(task_id, trainer=trainer, model=model,
                               folds=folds)
    stacked = stack_fold_params(params)
    if budget <= 0:
        return plans, stacked
    stacked = jax.tree.map(jnp.asarray, stacked)
    nbytes = sum(x.nbytes for x in jax.tree.leaves(stacked))
    for stale in [k for k in _STACKED_CACHE if k[:5] == key[:5]]:
        del _STACKED_CACHE[stale]  # same model, outdated fingerprint
    _STACKED_CACHE[key] = (plans, stacked, nbytes)
    total = sum(v[2] for v in _STACKED_CACHE.values())
    while total > budget and len(_STACKED_CACHE) > 1:
        _, evicted = _STACKED_CACHE.popitem(last=False)
        total -= evicted[2]
    return plans, stacked


@dataclass
class Predictor:
    """Fold-ensemble sliding-window predictor for one model."""

    plans: ModelPlans
    fold_params: list | None = None  # one parameter pytree per fold
    tile_step_size: float = 0.5
    use_gaussian: bool = True
    mirror_axes: tuple[int, ...] = ()  # empty: NoMirroring (all BOA models)
    compute_dtype: str = "bfloat16"
    # accumulator dtype for the fused logit volume: "auto" keeps fp32 until
    # the volume would exceed ~2 GB, then drops to fp16 (the reference is
    # always fp16, predict_from_raw_data.py:587; fp32 is strictly better and
    # we only give it up when HBM forces us to)
    accum_dtype: str = "auto"
    # shape bucketing for serving: pad the resampled volume up to multiples
    # of `bucket` voxels per axis so studies with nearby shapes reuse the
    # same compiled sliding-window program (XLA compiles per static shape;
    # a fresh study shape costs ~30-60 s of compilation otherwise). The pad
    # is the same zero padding nnU-Net applies to reach the patch size.
    bucket: int | None = None
    # pre-stacked (and typically device-cached) fold params; when given,
    # `fold_params` is ignored and no host->device weight upload happens
    stacked_params: object = None

    def __post_init__(self) -> None:
        self.cfg: ArchConfig = self.plans.arch_config()
        if self.stacked_params is not None:
            self._stacked = self.stacked_params
        else:
            if self.fold_params is None:
                raise ValueError("Predictor needs fold_params or stacked_params")
            self._stacked = stack_fold_params(self.fold_params)
        self._dtype = jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32
        # 2d configuration: slices are independent samples of a per-slice
        # net (cfg.two_d), so the "tile" spans the full z extent — the
        # z-major batched-2D conv path turns the whole slice stack into one
        # batched 2D conv per layer (no per-slice loop, no z overlap needed)
        self.two_d = len(self.plans.patch_size) == 2

    def _patch3(self, spatial) -> tuple[int, int, int]:
        p = self.plans.patch_size_xyz
        if not self.two_d:
            return tuple(p)
        return (p[0], p[1], int(spatial[2]))

    def _gauss(self, patch):
        if not self.use_gaussian:
            return jnp.ones(patch, jnp.float32)
        if not self.two_d:
            return pp.gaussian_importance_map(patch)
        # in-plane Gaussian, flat over z (slices don't overlap). Broadcast
        # ON DEVICE: the 2d "patch" spans the full z extent, so a host
        # broadcast_to+ascontiguousarray materializes a (px, py, Z) volume
        # (hundreds of MB) on the slow core and ships it through the
        # tunnel; only the (px, py, 1) map needs to cross.
        g2 = pp.gaussian_importance_map((patch[0], patch[1], 1))
        return jnp.broadcast_to(jnp.asarray(g2), tuple(patch))

    # ------------------------------------------------------------------
    def predict_logits(self, vol_cxyz: np.ndarray | jax.Array) -> jax.Array:
        """Sliding-window logits for an already-preprocessed (C,X,Y,Z) volume.

        Device-resident: if the input is already a device array nothing
        crosses the host boundary (padding runs as a device op).
        """
        vol = jnp.asarray(vol_cxyz)
        if vol.dtype != jnp.float32:
            vol = vol.astype(jnp.float32)
        spatial = vol.shape[-3:]
        patch = self._patch3(spatial)
        pads = []
        for n, p in zip(spatial, patch):
            target = max(p, n)
            if self.bucket:
                target = -(-target // self.bucket) * self.bucket
            d = target - n
            pads.append((d // 2, d - d // 2))
        if any(p != (0, 0) for p in pads):
            vol = jnp.pad(vol, [(0, 0)] * (vol.ndim - 3) + pads)
        revert = tuple(slice(b, b + n) for (b, _), n in zip(pads, spatial))
        starts = pp.tile_starts(vol.shape[-3:], patch, self.tile_step_size)
        gauss = self._gauss(patch)
        if self.accum_dtype == "auto":
            nbytes = 4 * self.cfg.num_classes * int(np.prod(vol.shape[-3:]))
            acc = jnp.float16 if nbytes > 2e9 else jnp.float32
        else:
            acc = {"float16": jnp.float16, "float32": jnp.float32,
                   "bfloat16": jnp.bfloat16}[self.accum_dtype]
        try:
            logits = sliding_window_logits(
                self._stacked, vol, jnp.asarray(starts),
                jnp.asarray(gauss), self.cfg, self.mirror_axes, self._dtype,
                acc)
            # dispatch is async: force a 1-voxel readback so an HBM OOM
            # surfaces HERE, inside the try, not at a later consumer
            # (same probe as the fused path below)
            np.asarray(logits[(0,) * logits.ndim])
        except Exception as exc:  # HBM OOM → halve the accumulator footprint
            # (engine-tier recovery, SURVEY §5: the reference retries the
            # sliding window with CPU result arrays on CUDA OOM,
            # predict_from_raw_data.py:663-675)
            if "RESOURCE_EXHAUSTED" not in str(exc) or acc == jnp.float16:
                raise
            import logging

            logging.getLogger(__name__).warning(
                "sliding window ran out of HBM with %s accumulators; "
                "retrying with float16", acc.__name__)
            logits = sliding_window_logits(
                self._stacked, vol, jnp.asarray(starts),
                jnp.asarray(gauss), self.cfg, self.mirror_axes, self._dtype,
                jnp.float16)
        if any(p != (0, 0) for p in pads):
            logits = logits[(slice(None), *revert)]
        return logits

    # ------------------------------------------------------------------
    def _predict_seg_fused(self, dev: jax.Array,
                           schemes: tuple[str, ...]) -> jax.Array:
        """Fused no-resample path: (C,X,Y,Z) raw volume → uint label seg."""
        spatial = dev.shape[-3:]
        patch = self._patch3(spatial)
        pads = []
        for n, p in zip(spatial, patch):
            target = max(p, n)
            if self.bucket:
                target = -(-target // self.bucket) * self.bucket
            d = target - n
            pads.append((d // 2, d - d // 2))
        padded_shape = tuple(n + a + b for n, (a, b) in zip(spatial, pads))
        starts = pp.tile_starts(padded_shape, patch, self.tile_step_size)
        gauss = self._gauss(patch)
        if self.accum_dtype == "auto":
            nbytes = 4 * self.cfg.num_classes * int(np.prod(padded_shape))
            acc = jnp.float16 if nbytes > 2e9 else jnp.float32
        else:
            acc = {"float16": jnp.float16, "float32": jnp.float32,
                   "bfloat16": jnp.bfloat16}[self.accum_dtype]
        rows = []
        for c, scheme in enumerate(schemes):
            props = self.plans.channel_intensity_properties(c) if \
                scheme == "CTNormalization" else {}
            rows.append([
                float(props.get("percentile_00_5", 0.0)),
                float(props.get("percentile_99_5", 0.0)),
                float(props.get("mean", 0.0)),
                max(float(props.get("std", 1.0)), 1e-8)])
        props4 = jnp.asarray(rows, jnp.float32)
        seg_dtype = jnp.uint8 if self.cfg.num_classes <= 255 else jnp.uint16
        v = _normalize_pad(dev, props4, pads=tuple(pads), schemes=schemes)
        revert = tuple((b, b + n) for (b, _), n in zip(pads, spatial))
        # Tile batching is ARCH-conditional (tools/bca_roofline.py): archs
        # that pool z hard (the synthetic 160x160x48 BCA arch, isotropic
        # strides, z 48->3) leave the deep stages dispatch-bound and
        # batch=2 wins 30% (27.96 vs 39.75 ms/tile); an anisotropic
        # real-plan-shaped arch (z pooled 48->12) measured the OPPOSITE
        # (15.13 batch=1 vs 17.75 batch=2), and 128³ archs also lose.
        # Discriminate on the measured cause — the z-pooling factor —
        # plus small-z patch and no mirror TTA (the flip batching in
        # _forward_tta owns the batch dim).
        z_pool = int(np.prod([s[2] for s in self.cfg.strides]))
        tb = 2 if (16 <= patch[2] <= 64 and z_pool >= 16
                   and not self.mirror_axes and len(starts) >= 2) else 1
        return sliding_window_seg_chunked(
            self._stacked, v, starts, gauss, self.cfg,
            mirror_axes=self.mirror_axes, compute_dtype=self._dtype,
            accum_dtype=acc, seg_dtype=seg_dtype, revert=revert,
            tile_batch=tb)

    # ------------------------------------------------------------------
    def predict(self, vol_xyz: np.ndarray | jax.Array, spacing_xyz,
                return_device: bool = False,
                return_probabilities: bool = False,
                prev_seg_xyz: np.ndarray | jax.Array | None = None
                ) -> np.ndarray | jax.Array:
        """Full nnU-Net-equivalent prediction for a raw (X,Y,Z) volume at
        `spacing_xyz`; returns a uint8/uint16 label volume of the same shape.

        ``prev_seg_xyz`` is the previous cascade stage's label volume on
        the SAME grid as the input; it is cropped/resampled alongside the
        data (nearest) and appended as one one-hot channel per foreground
        label (`data_iterators.py:156-159` + `predict_from_raw_data.py:249-252`).
        Required when the configuration declares a ``previous_stage``.

        The volume is uploaded at most once and every stage runs on device;
        with ``return_device`` the result stays there too (the pipeline
        downloads only the final model-grid seg — host↔device bandwidth is
        the scarcest resource, see bench notes).

        ``return_probabilities`` returns ``(seg, probs)`` with probs a
        float16 (n_classes, X, Y, Z) array of softmax (sigmoid for
        region-based plans) probabilities at the input grid — the
        `save_probabilities` expert flag of the reference
        (`predict_from_raw_data.py` export with probabilities; logits are
        resampled first and the nonlinearity applied after, matching
        `export_prediction.py` order). Forces the general logits path.
        """
        assert self.plans.transpose_forward == [0, 1, 2], (
            "non-identity transpose_forward not yet supported")
        if self.plans.previous_stage is not None and prev_seg_xyz is None:
            raise ValueError(
                f"configuration {self.plans.configuration_name!r} is a "
                f"cascade stage: it needs the previous stage "
                f"({self.plans.previous_stage!r}) segmentation as "
                f"prev_seg_xyz (predict_from_raw_data.py:249-252)")
        dev = jnp.asarray(vol_xyz)
        if dev.dtype != jnp.float32:
            dev = dev.astype(jnp.float32)
        if dev.ndim == 3:  # single channel; engine paths may pass (C,X,Y,Z)
            dev = dev[None]
        n_ch = dev.shape[0]
        orig_shape = dev.shape[-3:]
        prev_dev = None
        if prev_seg_xyz is not None:
            prev_dev = jnp.asarray(prev_seg_xyz)
            if prev_dev.shape != orig_shape:
                raise ValueError(
                    f"prev-stage seg shape {prev_dev.shape} != input grid "
                    f"{orig_shape}")

        # 1. crop to nonzero over ALL channels (cropping.py:19-39 builds the
        #    nonzero mask from every channel); one host sync for the bbox
        bbox = np.asarray(pp.bbox_array(dev))
        full_extent = bool((bbox[:, 0] == 0).all()
                           and (bbox[:, 1] == np.array(orig_shape)).all())
        if not full_extent:
            dev = jax.lax.slice(dev, [0] + bbox[:, 0].tolist(),
                                [n_ch] + bbox[:, 1].tolist())
            if prev_dev is not None:  # same bbox as the data (run_case_npy)
                prev_dev = jax.lax.slice(prev_dev, bbox[:, 0].tolist(),
                                         bbox[:, 1].tolist())
        shape_before_resample = dev.shape[-3:]

        # 2. normalize BEFORE resampling (default_preprocessor.py:85-88),
        #    one scheme per channel
        schemes = tuple((self.plans.normalization_schemes * n_ch)[:n_ch])

        # fast path: already on the model grid (the TS pipeline pre-resamples)
        # and plain softmax labels → one fused device program
        plan_sp = self.plans.spacing_xyz
        if self.two_d:
            # 2d configs resample in-plane only; through-plane stays native
            plan_sp = (plan_sp[0], plan_sp[1], float(spacing_xyz[2]))
        tgt_spacing0 = np.array(plan_sp, dtype=np.float64)
        cur_spacing0 = np.array(spacing_xyz, dtype=np.float64)
        new_shape0 = rs.compute_new_shape(shape_before_resample, cur_spacing0,
                                          tgt_spacing0)
        if tuple(new_shape0) == tuple(shape_before_resample) \
                and not self.plans.has_regions \
                and not return_probabilities \
                and prev_dev is None \
                and all(s in ("CTNormalization", "ZScoreNormalization",
                              "ZScore") for s in schemes):
            old_accum = self.accum_dtype
            try:
                seg_cropped = self._predict_seg_fused(dev, schemes)
                # the chunked path allocates + fills the accumulator across
                # several async dispatches, so an HBM OOM surfaces at the
                # NEXT blocking readback, not at dispatch — force a 1-voxel
                # readback here so the fp16 retry below still catches it
                np.asarray(seg_cropped[:1, :1, :1])
            except Exception as exc:  # HBM OOM → force fp16 accumulators
                auto_fp16 = (self.accum_dtype == "auto"
                             and 4 * self.cfg.num_classes
                             * int(np.prod(dev.shape[-3:])) > 2e9)
                if "RESOURCE_EXHAUSTED" not in str(exc) \
                        or self.accum_dtype == "float16" or auto_fp16:
                    raise  # already fp16 (explicit or auto): retry is futile
                try:
                    self.accum_dtype = "float16"
                    seg_cropped = self._predict_seg_fused(dev, schemes)
                    # probe while the fp16 override is active: a second OOM
                    # must surface here, not at a consumer after restore
                    np.asarray(seg_cropped[:1, :1, :1])
                finally:
                    self.accum_dtype = old_accum
            np_dt = np.uint8 if self.cfg.num_classes <= 255 else np.uint16
            if full_extent:
                seg = seg_cropped
            else:
                seg = jax.lax.dynamic_update_slice(
                    jnp.zeros(orig_shape, seg_cropped.dtype), seg_cropped,
                    bbox[:, 0].tolist())
            if return_device:
                return seg
            return np.asarray(seg).astype(np_dt)

        chans = []
        for c, scheme in enumerate(schemes):
            if scheme == "CTNormalization":
                chans.append(pp.ct_normalize(
                    dev[c], self.plans.channel_intensity_properties(c)))
            elif scheme in ("ZScoreNormalization", "ZScore"):
                chans.append(pp.zscore_normalize(dev[c]))
            else:
                raise NotImplementedError(f"normalization scheme {scheme}")
        dev = jnp.stack(chans) if n_ch > 1 else chans[0][None]

        # 3. resample to plan spacing (skimage/'resize' convention, order 3,
        #    separate-z order 0 when anisotropic)
        tgt_spacing = tgt_spacing0
        cur_spacing = cur_spacing0
        new_shape = rs.compute_new_shape(shape_before_resample, cur_spacing, tgt_spacing)
        if self.two_d:
            do_sep, axis = False, None  # per-slice in-plane resample only
        else:
            do_sep, axis = determine_separate_z(cur_spacing, tgt_spacing)
        sep_z = 0 if (do_sep and axis == 2) else None
        if tuple(new_shape) != tuple(shape_before_resample):
            dev = rs.resample_volume(dev, tuple(new_shape), order=3,
                                     convention="resize", separate_z_order=sep_z)

        # 3b. cascade input: prev-stage seg resampled to the model grid
        #     (nearest, like any seg) and one-hotted over foreground labels
        #     (`convert_labelmap_to_one_hot`, appended per
        #     `data_iterators.py:158-159`)
        if prev_dev is not None:
            if tuple(new_shape) != tuple(shape_before_resample):
                prev_dev = rs.resample_nearest(prev_dev, tuple(new_shape),
                                               convention="resize")
            fg = self.plans.foreground_labels
            onehot = jnp.stack(
                [(prev_dev == lb).astype(jnp.float32) for lb in fg])
            dev = jnp.concatenate([dev, onehot], axis=0)

        # 4. sliding window
        logits = self.predict_logits(dev)

        # 5. resample logits back to pre-resample shape (order 1), argmax.
        #    Done class-chunked with a running max so the full-resolution
        #    (C, X, Y, Z) fp32 logit volume is never materialized (the
        #    reference pays this cost on host RAM in the export pool,
        #    `export_prediction.py:14-56`; at 117 classes × 512³ it would
        #    be tens of GB of HBM here).
        np_dt = np.uint8 if self.cfg.num_classes <= 255 else np.uint16
        dt = jnp.uint8 if self.cfg.num_classes <= 255 else jnp.uint16
        probs_dev = None
        if return_probabilities:
            # materialize the full back-resampled logits (expert flag; the
            # reference pays the same (C, X, Y, Z) footprint in host RAM)
            if tuple(new_shape) != tuple(shape_before_resample):
                logits = rs.resample_volume(
                    logits.astype(jnp.float32), shape_before_resample,
                    order=1, convention="resize", separate_z_order=sep_z)
            if self.plans.has_regions:
                probs_dev = jax.nn.sigmoid(logits.astype(jnp.float32))
            else:
                probs_dev = jax.nn.softmax(logits.astype(jnp.float32), axis=0)
            probs_dev = probs_dev.astype(jnp.float16)
            if self.plans.has_regions:
                order = self.plans.regions_class_order
                assert order is not None
                seg_cropped = jnp.zeros(logits.shape[1:], dt)
                for i, c in enumerate(order):
                    seg_cropped = jnp.where(logits[i] > 0.0,
                                            jnp.asarray(c, dt), seg_cropped)
            else:
                seg_cropped = jnp.argmax(logits, axis=0).astype(dt)
        elif self.plans.has_regions:
            # sigmoid heads: paint regions in regions_class_order
            # (LabelManager.convert_probabilities_to_segmentation:170-176)
            order = self.plans.regions_class_order
            assert order is not None, "region-based plans need " \
                "regions_class_order in dataset.json"
            if tuple(new_shape) != tuple(shape_before_resample):
                logits = rs.resample_volume(
                    logits.astype(jnp.float32), shape_before_resample,
                    order=1, convention="resize", separate_z_order=sep_z)
            seg_cropped = jnp.zeros(logits.shape[1:], dt)
            for i, c in enumerate(order):
                seg_cropped = jnp.where(logits[i] > 0.0, jnp.asarray(c, dt),
                                        seg_cropped)  # sigmoid(x)>0.5 ⇔ x>0
        elif tuple(new_shape) != tuple(shape_before_resample):
            seg_cropped = _argmax_resampled(
                logits, tuple(shape_before_resample), sep_z).astype(dt)
        else:
            seg_cropped = jnp.argmax(logits, axis=0).astype(dt)

        # 6. re-insert into original shape at bbox (export_prediction.py:57-77)
        if full_extent:
            seg = seg_cropped
        else:
            seg = jax.lax.dynamic_update_slice(
                jnp.zeros(orig_shape, dt), seg_cropped, bbox[:, 0].tolist())
        if probs_dev is not None:
            if not full_extent:
                probs_dev = jax.lax.dynamic_update_slice(
                    jnp.zeros((probs_dev.shape[0],) + orig_shape, jnp.float16),
                    probs_dev, [0] + bbox[:, 0].tolist())
            if return_device:
                return seg, probs_dev
            return np.asarray(seg).astype(np_dt), np.asarray(probs_dev)
        if return_device:
            return seg
        return np.asarray(seg).astype(np_dt)
