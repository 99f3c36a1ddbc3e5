"""Training subsystem tests: loss semantics, torch-exact SGD, learning
smoke test, and the multi-chip SPMD train step on the 8-device CPU mesh."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from boa_tpu.models.unet import ArchConfig, init_unet
from boa_tpu.train.losses import (deep_supervision_loss, dice_ce_loss,
                                  ds_weights, pseudo_dice, soft_dice_loss,
                                  softmax_ce_loss, topk_ce_loss)
from boa_tpu.train.optim import (clip_by_global_norm, init_sgd_state, poly_lr,
                                 sgd_nesterov_update)
from boa_tpu.train.trainer import TrainConfig, Trainer, make_train_step


def _arch(num_classes=3, feats=(4, 8), deep_supervision=True):
    n = len(feats)
    return ArchConfig(
        n_stages=n, features_per_stage=tuple(feats),
        kernel_sizes=((3, 3, 3),) * n,
        strides=((1, 1, 1),) + ((2, 2, 2),) * (n - 1),
        n_conv_per_stage=(2,) * n, n_conv_per_stage_decoder=(2,) * (n - 1),
        num_classes=num_classes, input_channels=1,
        deep_supervision=deep_supervision)


# ---------------------------------------------------------------- losses
def test_dice_perfect_prediction(rng):
    y = rng.integers(0, 3, size=(2, 8, 8, 8))
    logits = jax.nn.one_hot(y, 3) * 100.0  # near-delta softmax
    dc = soft_dice_loss(jnp.asarray(logits), jnp.asarray(y))
    assert float(dc) == pytest.approx(-1.0, abs=1e-4)
    ce = softmax_ce_loss(jnp.asarray(logits), jnp.asarray(y))
    assert float(ce) == pytest.approx(0.0, abs=1e-4)
    assert float(dice_ce_loss(jnp.asarray(logits), jnp.asarray(y))) == \
        pytest.approx(-1.0, abs=1e-3)


def test_ce_matches_torch(rng):
    logits = rng.normal(size=(2, 6, 6, 6, 4)).astype(np.float32)
    y = rng.integers(0, 4, size=(2, 6, 6, 6))
    ours = float(softmax_ce_loss(jnp.asarray(logits), jnp.asarray(y)))
    ref = torch.nn.functional.cross_entropy(
        torch.from_numpy(np.transpose(logits, (0, 4, 1, 2, 3))),
        torch.from_numpy(y).long()).item()
    assert ours == pytest.approx(ref, rel=1e-5)


def test_dice_matches_reference_formula(rng):
    """Mirror MemoryEfficientSoftDiceLoss semantics in torch (dice.py:58-120)."""
    logits = rng.normal(size=(2, 6, 6, 6, 4)).astype(np.float32)
    y = rng.integers(0, 4, size=(2, 6, 6, 6))
    ours = float(soft_dice_loss(jnp.asarray(logits), jnp.asarray(y),
                                batch_dice=True, do_bg=False, smooth=1e-5))

    x = torch.softmax(torch.from_numpy(np.transpose(logits, (0, 4, 1, 2, 3))), 1)
    yt = torch.from_numpy(y).long()
    oh = torch.zeros_like(x).scatter_(1, yt[:, None], 1)[:, 1:]
    x = x[:, 1:]
    axes = (2, 3, 4)
    intersect = (x * oh).sum(axes).sum(0)
    sum_pred = x.sum(axes).sum(0)
    sum_gt = oh.sum(axes).sum(0)
    ref = -((2 * intersect + 1e-5) /
            (sum_gt + sum_pred + 1e-5).clamp_min(1e-8)).mean().item()
    assert ours == pytest.approx(ref, rel=1e-5)


def test_topk_ce(rng):
    logits = rng.normal(size=(1, 4, 4, 4, 3)).astype(np.float32)
    y = rng.integers(0, 3, size=(1, 4, 4, 4))
    full = float(topk_ce_loss(jnp.asarray(logits), jnp.asarray(y), 100.0))
    ref = float(softmax_ce_loss(jnp.asarray(logits), jnp.asarray(y)))
    assert full == pytest.approx(ref, rel=1e-5)
    worst = float(topk_ce_loss(jnp.asarray(logits), jnp.asarray(y), 10.0))
    assert worst >= full


def test_ds_weights():
    w = ds_weights(4)  # nnUNetTrainer.py:410-418
    assert w[-1] == 0.0
    assert w.sum() == pytest.approx(1.0)
    assert w[0] > w[1] > w[2]
    raw = np.array([1, 0.5, 0.25, 0.0])
    np.testing.assert_allclose(w, raw / raw.sum())


def test_deep_supervision_loss_runs(rng):
    y = jnp.asarray(rng.integers(0, 3, size=(1, 8, 8, 8)))
    outs = [jnp.asarray(rng.normal(size=(1, s, s, s, 3)).astype(np.float32))
            for s in (8, 4, 2)]
    val = float(deep_supervision_loss(outs, y))
    assert np.isfinite(val)


def test_pseudo_dice_perfect(rng):
    y = rng.integers(0, 3, size=(1, 6, 6, 6))
    logits = jax.nn.one_hot(y, 3) * 10.0
    d = pseudo_dice(jnp.asarray(logits), jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(d), 1.0, atol=1e-6)


# ---------------------------------------------------------------- optimizer
def test_sgd_matches_torch_exactly(rng):
    """3 steps of our SGD == torch.optim.SGD(momentum=0.99, nesterov=True,
    weight_decay=3e-5) to float32 precision."""
    p0 = rng.normal(size=(5, 7)).astype(np.float32)
    grads = [rng.normal(size=(5, 7)).astype(np.float32) for _ in range(3)]

    tp = torch.nn.Parameter(torch.from_numpy(p0.copy()))
    opt = torch.optim.SGD([tp], lr=0.01, momentum=0.99, nesterov=True,
                          weight_decay=3e-5)
    for g in grads:
        opt.zero_grad()
        tp.grad = torch.from_numpy(g.copy())
        opt.step()

    params = {"w": jnp.asarray(p0)}
    buf = init_sgd_state(params)
    for g in grads:
        params, buf = sgd_nesterov_update(params, {"w": jnp.asarray(g)}, buf,
                                          0.01)
    np.testing.assert_allclose(np.asarray(params["w"]),
                               tp.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_poly_lr():
    # polylr.py:18: lr0 * (1 - step/max)^0.9
    assert poly_lr(1e-2, 0, 1000) == pytest.approx(1e-2)
    assert poly_lr(1e-2, 500, 1000) == pytest.approx(1e-2 * 0.5 ** 0.9)


def test_grad_clip(rng):
    g = {"a": jnp.asarray(rng.normal(size=(100,)).astype(np.float32) * 10)}
    clipped, norm = clip_by_global_norm(g, 12.0)
    cn = float(jnp.linalg.norm(clipped["a"]))
    assert cn == pytest.approx(min(float(norm), 12.0), rel=1e-5)


# ---------------------------------------------------------------- train step
def _toy_batch(rng, batch=2, size=16, n_cls=3):
    """Sphere-blob segmentation: label = f(intensity), learnable quickly."""
    x = np.zeros((batch, size, size, size, 1), np.float32)
    y = np.zeros((batch, size, size, size), np.int32)
    coords = np.stack(np.meshgrid(*[np.arange(size)] * 3, indexing="ij"), -1)
    for b in range(batch):
        c = rng.uniform(4, size - 4, 3)
        r = rng.uniform(2, 5)
        d = np.linalg.norm(coords - c, axis=-1)
        y[b] = np.where(d < r / 2, 2, np.where(d < r, 1, 0))
        x[b, ..., 0] = (y[b] * 2.0 - 1.0) + rng.normal(size=(size,) * 3) * 0.1
    return x, y


def test_train_step_learns(rng):
    cfg = TrainConfig(arch=_arch(), compute_dtype="float32",
                      num_epochs=10, iters_per_epoch=5)
    params = init_unet(jax.random.PRNGKey(0), cfg.arch)
    buf = init_sgd_state(params)
    step = make_train_step(cfg, donate=False)
    losses = []
    for i in range(30):
        x, y = _toy_batch(rng, size=12)
        params, buf, m = step(params, buf, jnp.asarray(x), jnp.asarray(y),
                              jnp.float32(1e-2))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) - 0.1


def test_trainer_checkpoint_roundtrip(tmp_path, rng):
    cfg = TrainConfig(arch=_arch(feats=(2, 4)), compute_dtype="float32",
                      num_epochs=4, iters_per_epoch=2)
    tr = Trainer(cfg, tmp_path)

    def gen():
        while True:
            yield _toy_batch(rng, batch=1, size=8)

    g = gen()
    tr.train_epoch(g)
    tr.train_epoch(g)
    tr.save_checkpoint(tmp_path / "ck.pkl")
    p_before = jax.tree.map(np.asarray, tr.state.params)

    tr2 = Trainer(cfg, tmp_path)
    tr2.load_checkpoint(tmp_path / "ck.pkl")
    assert tr2.state.epoch == 2
    for a, b in zip(jax.tree.leaves(p_before),
                    jax.tree.leaves(tr2.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# ---------------------------------------------------------------- multichip
def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    assert len(jax.devices()) == 8
    ge.dryrun_multichip(8)


def test_dp_sharded_step_matches_single_device(rng):
    """The SPMD step over dp=8 produces the same loss as single-device."""
    from boa_tpu.parallel.mesh import (batch_sharding, label_sharding,
                                       make_mesh, param_shardings)

    arch = _arch(feats=(4, 8))
    cfg = TrainConfig(arch=arch, compute_dtype="float32")
    params = init_unet(jax.random.PRNGKey(1), arch)
    buf = init_sgd_state(params)
    x, y = _toy_batch(rng, batch=8, size=8)

    step1 = make_train_step(cfg, donate=False)
    _, _, m1 = step1(params, buf, jnp.asarray(x), jnp.asarray(y),
                     jnp.float32(1e-2))

    mesh = make_mesh(8, ("dp", "sp", "tp"), (8, 1, 1))
    ps = param_shardings(mesh, params)
    xs, ys = batch_sharding(mesh), label_sharding(mesh)
    stepN = make_train_step(cfg, in_shardings=(ps, ps, xs, ys, None),
                            donate=False)
    with mesh:
        _, _, mN = stepN(jax.device_put(params, ps), jax.device_put(buf, ps),
                         jax.device_put(jnp.asarray(x), xs),
                         jax.device_put(jnp.asarray(y), ys), jnp.float32(1e-2))
    assert float(m1["loss"]) == pytest.approx(float(mN["loss"]), rel=1e-4)


def test_trainer_variants():
    from boa_tpu.train.variants import apply_variant, get_variant

    v = get_variant("nnUNetTrainer_4000epochs_NoMirroring")
    assert v.num_epochs == 4000 and v.mirror_axes == ()
    assert get_variant("nnUNetTrainerDiceTopK10Loss_2000epochs").loss == \
        "dice_topk10"
    assert get_variant("nnUNetTrainer_MOSAIC_1k_QuarterLR_NoMirroring"
                       ).initial_lr == pytest.approx(2.5e-3)
    # unknown names parse markers
    v2 = get_variant("nnUNetTrainer_750epochs_NoMirroring_custom")
    assert v2.num_epochs == 750 and v2.mirror_axes == ()
    cfg = TrainConfig(arch=_arch())
    cfg2, spec = apply_variant(cfg, "nnUNetTrainer_2000epochs_NoMirroring")
    assert cfg2.num_epochs == 2000 and spec.mirror_axes == ()


def test_da5_augmentation(rng):
    from boa_tpu.train.augment import augment_batch_da5

    x, y = _toy_batch(rng, batch=1, size=12)
    xo, yo = augment_batch_da5(jax.random.PRNGKey(0), jnp.asarray(x),
                               jnp.asarray(y))
    assert xo.shape == x.shape and yo.shape == y.shape
    assert np.isfinite(np.asarray(xo)).all()


def test_multihost_mesh_layout_and_step(rng):
    """make_multihost_mesh places hosts on the outer dp axis (dp rides
    DCN, sp/tp stay intra-host) and the train step runs over it —
    simulated as 2 hosts x 4 devices on the virtual CPU mesh (SURVEY §5
    distributed-backend parity)."""
    from boa_tpu.parallel.mesh import (batch_sharding, label_sharding,
                                       make_multihost_mesh, param_shardings)

    mesh = make_multihost_mesh(n_hosts=2, ici_shape=(1, 2, 2))
    assert dict(mesh.shape) == {"dp": 2, "sp": 2, "tp": 2}
    devs = mesh.devices
    # outer dp rows are distinct host groups: row 0 = devices 0..3
    row0 = {d.id for d in devs[0].ravel()}
    row1 = {d.id for d in devs[1].ravel()}
    assert row0 == {0, 1, 2, 3} and row1 == {4, 5, 6, 7}

    arch = _arch(feats=(4, 8))
    cfg = TrainConfig(arch=arch, compute_dtype="float32")
    params = init_unet(jax.random.PRNGKey(1), arch)
    buf = init_sgd_state(params)
    x, y = _toy_batch(rng, batch=4, size=8)
    ps = param_shardings(mesh, params)
    step = make_train_step(cfg, in_shardings=(
        ps, ps, batch_sharding(mesh), label_sharding(mesh), None),
        donate=False)
    with mesh:
        _, _, metrics = step(jax.device_put(params, ps),
                             jax.device_put(buf, ps),
                             jnp.asarray(x), jnp.asarray(y),
                             jnp.float32(1e-2))
    assert np.isfinite(float(metrics["loss"]))


def test_region_based_training_step():
    """Region-based training (overlapping sigmoid targets): DS Dice+BCE
    loss + region pseudo-dice (`nnUNetTrainer._build_loss:391-397`)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from boa_tpu.models.unet import ArchConfig, init_unet
    from boa_tpu.train.losses import (pseudo_dice_regions,
                                      regions_to_multihot)
    from boa_tpu.train.optim import init_sgd_state
    from boa_tpu.train.trainer import TrainConfig, make_eval_step, \
        make_train_step

    regions = ((1, 2), (2,))  # region 0 = whole organ, region 1 = core
    arch = ArchConfig(
        n_stages=2, features_per_stage=(4, 8), kernel_sizes=((3, 3, 3),) * 2,
        strides=((1, 1, 1), (2, 2, 2)), n_conv_per_stage=(2, 2),
        n_conv_per_stage_decoder=(2,), num_classes=len(regions),
        input_channels=1, deep_supervision=True)
    cfg = TrainConfig(arch=arch, compute_dtype="float32", regions=regions)

    params = init_unet(jax.random.PRNGKey(0), arch)
    mom = init_sgd_state(params)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 8, 8, 8, 1)).astype(np.float32)
    y = rng.integers(0, 3, size=(2, 8, 8, 8)).astype(np.int32)

    step = make_train_step(cfg, donate=False)
    p2, m2, metrics = step(params, mom, jnp.asarray(x), jnp.asarray(y),
                           jnp.float32(1e-2))
    assert np.isfinite(float(metrics["loss"]))
    moved = any(not np.allclose(np.asarray(a), np.asarray(b))
                for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)))
    assert moved

    # eval step returns one dice per REGION; perfect logits give dice 1
    ev = make_eval_step(cfg)
    d = np.asarray(ev(p2, jnp.asarray(x), jnp.asarray(y)))
    assert d.shape == (len(regions),)
    mh = regions_to_multihot(jnp.asarray(y), regions)
    perfect = (mh * 20.0 - 10.0)  # logits: +10 inside, -10 outside
    np.testing.assert_allclose(
        np.asarray(pseudo_dice_regions(perfect, jnp.asarray(y), regions)),
        1.0, atol=1e-6)
