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
    scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-6))
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
