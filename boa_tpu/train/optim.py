"""SGD + Nesterov momentum + PolyLR, exact torch semantics.

Parity: `nnUNetTrainer.py:507-511` (SGD lr=1e-2, weight_decay=3e-5,
momentum=0.99, nesterov=True), `lr_scheduler/polylr.py:18` (per-epoch
lr = lr0·(1 − step/max)^0.9), `nnUNetTrainer.py:992-999` (grad-clip 12).

Hand-rolled (not optax) so the update rule matches torch.optim.SGD
bit-for-bit — required for checkpoint-resume parity with converted torch
optimizer states:

    g   = grad + wd·p
    buf = momentum·buf + g           (no dampening)
    d   = g + momentum·buf           (nesterov)
    p  -= lr·d
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def poly_lr(initial_lr: float, step: int | jax.Array, max_steps: int,
            exponent: float = 0.9):
    return initial_lr * (1 - step / max_steps) ** exponent


def init_sgd_state(params):
    """Momentum buffers, zero-initialized (torch lazily inits to the first
    gradient; buf=0 gives the identical first update: 0·m + g = g)."""
    return jax.tree.map(jnp.zeros_like, params)


def clip_by_global_norm(grads, max_norm: float):
    norm = jnp.sqrt(sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                        for g in jax.tree.leaves(grads)))
    # torch clip_grad_norm_: coef = max_norm / (norm + 1e-6), capped at 1
    scale = jnp.minimum(1.0, max_norm / (norm + 1e-6))
    return jax.tree.map(lambda g: g * scale, grads), norm


def sgd_nesterov_update(params, grads, momentum_buf, lr,
                        momentum: float = 0.99, weight_decay: float = 3e-5):
    """One fused SGD step; returns (new_params, new_momentum_buf)."""

    def upd(p, g, b):
        g = g.astype(jnp.float32) + weight_decay * p
        b = momentum * b + g
        d = g + momentum * b
        return p - lr * d, b

    out = jax.tree.map(upd, params, grads, momentum_buf)
    new_params = jax.tree.map(lambda t: t[0], out,
                              is_leaf=lambda t: isinstance(t, tuple))
    new_buf = jax.tree.map(lambda t: t[1], out,
                           is_leaf=lambda t: isinstance(t, tuple))
    return new_params, new_buf


# ---------------------------------------------------------------------------
# AdamW + warmup schedules (Primus trainers: AdamW lr 3e-4, wd 5e-2,
# betas (0.9, 0.98); `lr_scheduler/warmup.py` Lin_incr / PolyLR-offset)
# ---------------------------------------------------------------------------


def init_adamw_state(params, amsgrad: bool = False):
    zeros = lambda: jax.tree.map(jnp.zeros_like, params)
    state = {"m": zeros(), "v": zeros(), "step": jnp.zeros((), jnp.int32)}
    if amsgrad:
        state["vmax"] = zeros()
    return state


def adamw_update(params, grads, state, lr, betas=(0.9, 0.98),
                 eps: float = 1e-8, weight_decay: float = 5e-2,
                 amsgrad: bool = False):
    """torch.optim.AdamW semantics (decoupled weight decay); optional
    AMSGrad running-max second moment (nnUNetTrainerAdam passes
    amsgrad=True — `variants/optimizer/nnUNetTrainerAdam.py:10-13`)."""
    b1, b2 = betas
    step = state["step"] + 1
    t = step.astype(jnp.float32)
    bc1 = 1 - b1 ** t
    bc2 = 1 - b2 ** t

    def upd(p, g, m, v, vm):
        g = g.astype(jnp.float32)
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        vm = jnp.maximum(vm, v) if amsgrad else v
        p = p * (1 - lr * weight_decay)
        p = p - lr * (m / bc1) / (jnp.sqrt(vm / bc2) + eps)
        return p, m, v, vm

    vmax = state.get("vmax", state["v"])
    out = jax.tree.map(upd, params, grads, state["m"], state["v"], vmax)
    is4 = lambda x: isinstance(x, tuple)
    new = {"m": jax.tree.map(lambda o: o[1], out, is_leaf=is4),
           "v": jax.tree.map(lambda o: o[2], out, is_leaf=is4),
           "step": step}
    if amsgrad:
        new["vmax"] = jax.tree.map(lambda o: o[3], out, is_leaf=is4)
    return jax.tree.map(lambda o: o[0], out, is_leaf=is4), new


#: Adam and AdamW share the same state layout (m/v/step [+vmax])
init_adam_state = init_adamw_state


def adam_update(params, grads, state, lr, betas=(0.9, 0.999),
                eps: float = 1e-8, weight_decay: float = 0.0,
                amsgrad: bool = False):
    """torch.optim.Adam semantics: COUPLED weight decay (added to the
    gradient, unlike AdamW's decay-on-params) and optional AMSGrad
    (running max of the second moment). Used by the nnUNetTrainerAdam /
    nnUNetTrainerVanillaAdam variant family
    (`variants/optimizer/nnUNetTrainerAdam.py:8-29` — AdamW(amsgrad=True)
    and vanilla Adam, both under PolyLR)."""
    b1, b2 = betas
    step = state["step"] + 1
    t = step.astype(jnp.float32)
    bc1 = 1 - b1 ** t
    bc2 = 1 - b2 ** t

    def upd(p, g, m, v, vm):
        g = g.astype(jnp.float32) + weight_decay * p
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        vm = jnp.maximum(vm, v) if amsgrad else v
        p = p - lr * (m / bc1) / (jnp.sqrt(vm / bc2) + eps)
        return p, m, v, vm

    vmax = state.get("vmax", state["v"])
    out = jax.tree.map(upd, params, grads, state["m"], state["v"], vmax)
    is4 = lambda x: isinstance(x, tuple)
    new = {"m": jax.tree.map(lambda o: o[1], out, is_leaf=is4),
           "v": jax.tree.map(lambda o: o[2], out, is_leaf=is4),
           "step": step}
    if amsgrad:
        new["vmax"] = jax.tree.map(lambda o: o[3], out, is_leaf=is4)
    return jax.tree.map(lambda o: o[0], out, is_leaf=is4), new


def cosine_anneal_lr(initial_lr: float, step, max_steps: int,
                     eta_min: float = 0.0) -> float:
    """torch CosineAnnealingLR closed form (nnUNetTrainerCosAnneal:
    T_max=num_epochs): eta_min + (lr0−eta_min)·(1+cos(π·t/T))/2.

    Host float64 math (like torch's scheduler) — the per-epoch schedules
    are host scalars; jnp here cost a device dispatch per epoch and ~1e-9
    fp32 deviation from torch."""
    return eta_min + (initial_lr - eta_min) * 0.5 * (
        1 + math.cos(math.pi * step / max_steps))


def lin_incr_lr(initial_lr: float, step, warmup_steps: int) -> float:
    """Linear warmup 0 → initial_lr (`lr_scheduler/warmup.py` Lin_incr)."""
    return initial_lr * min((step + 1) / warmup_steps, 1.0)


def poly_lr_offset(initial_lr: float, step, max_steps: int,
                   offset: int, exponent: float = 0.9) -> float:
    """PolyLR starting after a warmup offset (PolyLRScheduler_offset)."""
    eff = max(step - offset, 0)
    return initial_lr * (1 - eff / max(max_steps - offset, 1)) ** exponent
