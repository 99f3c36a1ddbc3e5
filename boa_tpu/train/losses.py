"""Segmentation losses, channels-last, fp32 accumulation.

Parity: `nnunetv2/training/loss/dice.py` (MemoryEfficientSoftDiceLoss,
batch_dice + smooth=1e-5 + denominator clamp 1e-8), `robust_ce_loss.py`
(CE on integer targets, TopK variant k=10%), `compound_losses.py`
(DC_and_CE_loss with weight_ce=weight_dice=1, do_bg=False for the dice
term), and `deep_supervision.py` + `nnUNetTrainer.py:410-418` (exp-decay
weights 1/2^i, lowest resolution zeroed, normalized to sum 1).

Design difference vs the reference: the DDP cross-rank AllGatherGrad of
tp/fp/fn (`dice.py:36-38,108-110`, `utilities/ddp_allgather.py:25-48`) is
unnecessary here — under `jit` over a `Mesh` the batch axis is a *global*
logical axis, so `jnp.sum` over it already is the cross-chip reduction
(GSPMD inserts the psum); under `shard_map` pass `axis_name="dp"` and the
same loss emits an explicit `lax.psum`.

Layout: logits (N, X, Y, Z, C), integer targets (N, X, Y, Z).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _one_hot(target: jax.Array, num_classes: int) -> jax.Array:
    return jax.nn.one_hot(target, num_classes, dtype=jnp.float32)


def soft_dice_loss(
    logits: jax.Array,
    target: jax.Array,
    *,
    batch_dice: bool = True,
    do_bg: bool = False,
    smooth: float = 1e-5,
    loss_mask: jax.Array | None = None,
    axis_name: str | None = None,
) -> jax.Array:
    """Memory-efficient soft dice (`dice.py:58-120`), negated dice score.

    With ``batch_dice`` the tp/pred/gt sums run over batch + spatial axes
    (`dice.py:25-28` axes = [0, 2, 3, 4]); cross-device reduction via
    ``axis_name`` replaces AllGatherGrad when used inside shard_map.
    """
    n_cls = logits.shape[-1]
    # Perf note (measured on v5e, flagship 6-stage 2x128^3 train step at
    # ~291 ms/iter): (a) replacing the one-hot volumes with a
    # gather/segment_sum confusion pass made the step 1.8x SLOWER — TPU
    # scatter cost scales with update count; (b) casting probs/one-hot to
    # bf16 changed nothing (±2%) — XLA already fuses the one-hot compare
    # into the multiply-reduce, so no (…, C) volume is materialized and
    # the traffic is dominated by the fp32 softmax reads. Keep fp32.
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    y = _one_hot(target, n_cls)
    if not do_bg:
        probs = probs[..., 1:]
        y = y[..., 1:]
    spatial = tuple(range(1, probs.ndim - 1))
    if loss_mask is not None:
        m = loss_mask[..., None].astype(jnp.float32)
        intersect = jnp.sum(probs * y * m, spatial)
        sum_pred = jnp.sum(probs * m, spatial)
        sum_gt = jnp.sum(y * m, spatial)
    else:
        intersect = jnp.sum(probs * y, spatial)      # (N, C')
        sum_pred = jnp.sum(probs, spatial)
        sum_gt = jnp.sum(y, spatial)
    if batch_dice:
        intersect = jnp.sum(intersect, axis=0)
        sum_pred = jnp.sum(sum_pred, axis=0)
        sum_gt = jnp.sum(sum_gt, axis=0)
        if axis_name is not None:
            intersect = jax.lax.psum(intersect, axis_name)
            sum_pred = jax.lax.psum(sum_pred, axis_name)
            sum_gt = jax.lax.psum(sum_gt, axis_name)
    dc = (2.0 * intersect + smooth) / jnp.clip(sum_gt + sum_pred + smooth, 1e-8)
    return -jnp.mean(dc)


def softmax_ce_loss(logits: jax.Array, target: jax.Array,
                    loss_mask: jax.Array | None = None) -> jax.Array:
    """Cross-entropy on integer labels (`robust_ce_loss.py` RobustCrossEntropyLoss)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, target[..., None].astype(jnp.int32),
                               axis=-1)[..., 0]
    if loss_mask is not None:
        m = loss_mask.astype(jnp.float32)
        return jnp.sum(nll * m) / jnp.clip(jnp.sum(m), 1.0)
    return jnp.mean(nll)


def topk_ce_loss(logits: jax.Array, target: jax.Array,
                 k_percent: float = 10.0,
                 label_smoothing: float = 0.0) -> jax.Array:
    """TopK CE (`robust_ce_loss.py:22-31`): mean of the worst k% voxel
    losses. ``label_smoothing`` follows torch CE semantics — the smoothed
    per-voxel loss is (1−ε)·nll + ε·mean_c(−logp_c) — for the
    nnUNetTrainerTopk10LossLS01 variant (`variants/loss/
    nnUNetTrainerTopkLoss.py:130-138`, label_smoothing=0.1)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, target[..., None].astype(jnp.int32),
                               axis=-1)[..., 0]
    if label_smoothing > 0.0:
        nll = (1 - label_smoothing) * nll \
            - label_smoothing * jnp.mean(logp, axis=-1)
    nll = nll.reshape(-1)
    k = max(1, int(nll.size * k_percent / 100.0))
    topk = jax.lax.top_k(nll, k)[0]
    return jnp.mean(topk)


def dice_ce_loss(
    logits: jax.Array,
    target: jax.Array,
    *,
    batch_dice: bool = True,
    weight_ce: float = 1.0,
    weight_dice: float = 1.0,
    smooth: float = 1e-5,
    loss_mask: jax.Array | None = None,
    axis_name: str | None = None,
) -> jax.Array:
    """DC_and_CE_loss (`compound_losses.py:9-47`, built at
    `nnUNetTrainer.py:399-402`): dice term do_bg=False, smooth=1e-5
    (smooth=0 for the nnUNetTrainerDiceCELoss_noSmooth variant).

    Fused: one log-softmax feeds both terms (`probs = exp(logp)` is
    bitwise the softmax formula), where the reference — and the separate
    soft_dice_loss/softmax_ce_loss here — normalize the big (…, C) volume
    twice, forward and backward.
    """
    n_cls = logits.shape[-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    probs = jnp.exp(logp)
    y = _one_hot(target, n_cls)
    probs_fg, y_fg = probs[..., 1:], y[..., 1:]  # dice do_bg=False
    spatial = tuple(range(1, probs.ndim - 1))
    nll = -jnp.take_along_axis(logp, target[..., None].astype(jnp.int32),
                               axis=-1)[..., 0]
    if loss_mask is not None:
        m = loss_mask[..., None].astype(jnp.float32)
        intersect = jnp.sum(probs_fg * y_fg * m, spatial)
        sum_pred = jnp.sum(probs_fg * m, spatial)
        sum_gt = jnp.sum(y_fg * m, spatial)
        mm = loss_mask.astype(jnp.float32)
        ce = jnp.sum(nll * mm) / jnp.clip(jnp.sum(mm), 1.0)
    else:
        intersect = jnp.sum(probs_fg * y_fg, spatial)
        sum_pred = jnp.sum(probs_fg, spatial)
        sum_gt = jnp.sum(y_fg, spatial)
        ce = jnp.mean(nll)
    if batch_dice:
        intersect = jnp.sum(intersect, axis=0)
        sum_pred = jnp.sum(sum_pred, axis=0)
        sum_gt = jnp.sum(sum_gt, axis=0)
        if axis_name is not None:
            intersect = jax.lax.psum(intersect, axis_name)
            sum_pred = jax.lax.psum(sum_pred, axis_name)
            sum_gt = jax.lax.psum(sum_gt, axis_name)
    dc = -jnp.mean((2.0 * intersect + smooth) /
                   jnp.clip(sum_gt + sum_pred + smooth, 1e-8))
    return weight_ce * ce + weight_dice * dc


def dice_topk_loss(logits: jax.Array, target: jax.Array, *,
                   batch_dice: bool = True, k_percent: float = 10.0,
                   axis_name: str | None = None) -> jax.Array:
    """DC_and_topk_loss (`compound_losses.py` / `variants/loss/
    nnUNetTrainerTopkLoss.py:154-163`): dice(do_bg=False, smooth=1e-5)
    + TopK-10% CE, equally weighted."""
    dc = soft_dice_loss(logits, target, batch_dice=batch_dice,
                        axis_name=axis_name)
    return dc + topk_ce_loss(logits, target, k_percent=k_percent)


def make_loss(name: str, *, batch_dice: bool = True,
              axis_name: str | None = None):
    """Loss dispatcher for the trainer-variant families
    (`variants/loss/*.py`): name → fn(logits, target).

    dice_ce (default) | dice_ce_nosmooth | ce | dice | topk10 |
    topk10_ls01 | dice_topk10.
    """
    table = {
        "dice_ce": lambda o, t: dice_ce_loss(
            o, t, batch_dice=batch_dice, axis_name=axis_name),
        "dice_ce_nosmooth": lambda o, t: dice_ce_loss(
            o, t, batch_dice=batch_dice, smooth=0.0, axis_name=axis_name),
        "ce": lambda o, t: softmax_ce_loss(o, t),
        "dice": lambda o, t: soft_dice_loss(
            o, t, batch_dice=batch_dice, axis_name=axis_name),
        "topk10": lambda o, t: topk_ce_loss(o, t, k_percent=10.0),
        "topk10_ls01": lambda o, t: topk_ce_loss(
            o, t, k_percent=10.0, label_smoothing=0.1),
        "dice_topk10": lambda o, t: dice_topk_loss(
            o, t, batch_dice=batch_dice, axis_name=axis_name),
    }
    try:
        return table[name]
    except KeyError:
        raise ValueError(f"unknown loss {name!r}; one of {sorted(table)}")


def ds_weights(n_outputs: int) -> np.ndarray:
    """Deep-supervision weights (`nnUNetTrainer.py:410-418`): 1/2^i,
    lowest-resolution head zeroed, normalized to sum 1."""
    w = np.array([1.0 / (2.0 ** i) for i in range(n_outputs)])
    if n_outputs > 1:
        w[-1] = 0.0
    return w / w.sum()


def downsample_target(target: jax.Array, shape: Sequence[int]) -> jax.Array:
    """Nearest-neighbor label downsampling for DS heads (the reference does
    this in the augmenter: DownsampleSegForDSTransform, order 0)."""
    if tuple(target.shape[1:]) == tuple(shape):
        return target
    return jax.image.resize(target, (target.shape[0], *shape), method="nearest")


def deep_supervision_loss(
    outputs: Sequence[jax.Array],
    target: jax.Array,
    *,
    batch_dice: bool = True,
    axis_name: str | None = None,
    loss_fn=None,
) -> jax.Array:
    """Weighted base loss over all DS heads (`deep_supervision.py`
    wrapper); ``loss_fn`` defaults to Dice+CE and accepts any
    `make_loss` result for the loss-variant trainers.

    ``outputs`` is highest resolution first, as `unet_forward(all_heads=True)`
    returns; the target is nearest-downsampled per head.
    """
    if loss_fn is None:
        loss_fn = lambda o, t: dice_ce_loss(o, t, batch_dice=batch_dice,
                                            axis_name=axis_name)
    w = ds_weights(len(outputs))
    total = jnp.float32(0.0)
    for wi, out in zip(w, outputs):
        if wi == 0.0:
            continue
        t = downsample_target(target, out.shape[1:-1])
        total = total + wi * loss_fn(out, t)
    return total


def pseudo_dice(logits: jax.Array, target: jax.Array,
                axis_name: str | None = None) -> jax.Array:
    """Online per-class hard dice on the highest-resolution head, used for
    the EMA validation metric (`nnUNetTrainer.py:1040-1086`). Returns (C-1,)
    foreground dice."""
    n_cls = logits.shape[-1]
    pred = jnp.argmax(logits, axis=-1)
    p = _one_hot(pred, n_cls)[..., 1:]
    y = _one_hot(target, n_cls)[..., 1:]
    axes = tuple(range(0, p.ndim - 1))
    tp = jnp.sum(p * y, axes)
    fp = jnp.sum(p * (1 - y), axes)
    fn = jnp.sum((1 - p) * y, axes)
    if axis_name is not None:
        tp, fp, fn = (jax.lax.psum(v, axis_name) for v in (tp, fp, fn))
    denom = 2 * tp + fp + fn
    # absent-and-not-predicted classes are NaN like the reference
    # (nnUNetTrainer averages with np.nanmean) — scoring them 0 would
    # drown the mean dice in zeros for a 100+-class patch sample
    return jnp.where(denom > 0, 2 * tp / jnp.clip(denom, 1e-8), jnp.nan)


def soft_dice_loss_sigmoid(logits: jax.Array, target_onehot: jax.Array,
                           *, batch_dice: bool = True, smooth: float = 1e-5,
                           axis_name: str | None = None) -> jax.Array:
    """Region-based dice: sigmoid heads vs multi-hot region targets."""
    probs = jax.nn.sigmoid(logits.astype(jnp.float32))
    y = target_onehot.astype(jnp.float32)
    spatial = tuple(range(1, probs.ndim - 1))
    intersect = jnp.sum(probs * y, spatial)
    sum_pred = jnp.sum(probs, spatial)
    sum_gt = jnp.sum(y, spatial)
    if batch_dice:
        intersect = jnp.sum(intersect, axis=0)
        sum_pred = jnp.sum(sum_pred, axis=0)
        sum_gt = jnp.sum(sum_gt, axis=0)
        if axis_name is not None:
            intersect = jax.lax.psum(intersect, axis_name)
            sum_pred = jax.lax.psum(sum_pred, axis_name)
            sum_gt = jax.lax.psum(sum_gt, axis_name)
    dc = (2.0 * intersect + smooth) / jnp.clip(sum_gt + sum_pred + smooth,
                                               1e-8)
    return -jnp.mean(dc)


def dice_bce_loss(logits: jax.Array, target_onehot: jax.Array,
                  *, batch_dice: bool = True, weight_ce: float = 1.0,
                  weight_dice: float = 1.0,
                  axis_name: str | None = None) -> jax.Array:
    """DC_and_BCE_loss for region-based training (`compound_losses.py:50-88`,
    selected at `nnUNetTrainer.py:392-397` when the label manager has
    regions): sigmoid dice with do_bg=True + BCEWithLogits."""
    dc = soft_dice_loss_sigmoid(logits, target_onehot, batch_dice=batch_dice,
                                axis_name=axis_name)
    z = logits.astype(jnp.float32)
    y = target_onehot.astype(jnp.float32)
    bce = jnp.mean(jnp.maximum(z, 0) - z * y + jnp.log1p(jnp.exp(-jnp.abs(z))))
    return weight_ce * bce + weight_dice * dc


def regions_to_multihot(target: jax.Array,
                        regions: Sequence[Sequence[int]]) -> jax.Array:
    """Integer label map -> (..., R) float multi-hot region targets.

    Parity: `label_handling.py convert_labels_to_regions` — a voxel belongs
    to every region whose label set contains its label (regions overlap).
    """
    chans = []
    for region in regions:
        labels = (region,) if isinstance(region, int) else tuple(region)
        m = jnp.zeros(target.shape, jnp.bool_)
        for lb in labels:
            m = m | (target == lb)
        chans.append(m)
    return jnp.stack(chans, axis=-1).astype(jnp.float32)


def deep_supervision_loss_regions(
    outputs: Sequence[jax.Array],
    target: jax.Array,
    regions: Sequence[Sequence[int]],
    *,
    batch_dice: bool = True,
    axis_name: str | None = None,
) -> jax.Array:
    """Weighted Dice+BCE over all DS heads for region-based training
    (`nnUNetTrainer._build_loss:391-397` picks DC_and_BCE_loss when the
    label manager has regions)."""
    w = ds_weights(len(outputs))
    total = jnp.float32(0.0)
    for wi, out in zip(w, outputs):
        if wi == 0.0:
            continue
        t = downsample_target(target, out.shape[1:-1])
        total = total + wi * dice_bce_loss(
            out, regions_to_multihot(t, regions), batch_dice=batch_dice,
            axis_name=axis_name)
    return total


def pseudo_dice_regions(logits: jax.Array, target: jax.Array,
                        regions: Sequence[Sequence[int]],
                        axis_name: str | None = None) -> jax.Array:
    """Online hard dice per region for sigmoid heads (the region-based
    analogue of pseudo_dice: `nnUNetTrainer.py:1040-1086` thresholds the
    sigmoid at 0.5 instead of argmaxing)."""
    p = (logits.astype(jnp.float32) > 0.0).astype(jnp.float32)  # sigmoid>.5
    y = regions_to_multihot(target, regions)
    spatial = tuple(range(0, p.ndim - 1))
    tp = jnp.sum(p * y, spatial)
    fp = jnp.sum(p * (1 - y), spatial)
    fn = jnp.sum((1 - p) * y, spatial)
    if axis_name is not None:
        tp = jax.lax.psum(tp, axis_name)
        fp = jax.lax.psum(fp, axis_name)
        fn = jax.lax.psum(fn, axis_name)
    return 2 * tp / jnp.clip(2 * tp + fp + fn, 1e-8)
