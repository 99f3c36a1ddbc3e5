"""Trainer-variant machinery: recipe resolution (incl. Primus), optimizer
torch-parity for the Adam families, loss-variant semantics, schedules.

Parity targets: `variants/optimizer/nnUNetTrainerAdam.py`,
`variants/loss/nnUNetTrainerTopkLoss.py`, `lr_scheduler/{polylr,warmup}.py`,
CosineAnnealingLR, `primus/primus_trainers.py:18-260`,
`variants/sampling/nnUNetTrainer_probabilisticOversampling.py`.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from boa_tpu.models.unet import ArchConfig
from boa_tpu.train.losses import make_loss
from boa_tpu.train.optim import (adam_update, adamw_update, init_adam_state)
from boa_tpu.train.trainer import TrainConfig, make_train_step, schedule_lr
from boa_tpu.train.variants import (VARIANTS, apply_variant, get_variant,
                                    primus_train_config)


def _tiny_arch(**kw):
    return ArchConfig(
        n_stages=2, features_per_stage=(4, 8),
        kernel_sizes=((3, 3, 3),) * 2,
        strides=((1, 1, 1), (2, 2, 2)),
        n_conv_per_stage=(2, 2), n_conv_per_stage_decoder=(2,),
        num_classes=3, input_channels=1, **kw)


# ------------------------------------------------------------ Adam parity
def _run_parity(our_update, our_state, torch_opt_fn, steps=5, shape=(7, 3)):
    rng = np.random.default_rng(0)
    p0 = rng.normal(size=shape).astype(np.float32)
    params = {"w": jnp.asarray(p0)}
    state = our_state(params)
    tp = torch.nn.Parameter(torch.from_numpy(p0.copy()))
    opt = torch_opt_fn([tp])
    for _ in range(steps):
        g = rng.normal(size=shape).astype(np.float32)
        params, state = our_update(params, {"w": jnp.asarray(g)}, state)
        tp.grad = torch.from_numpy(g.copy())
        opt.step()
    np.testing.assert_allclose(np.asarray(params["w"]),
                               tp.detach().numpy(), rtol=2e-6, atol=2e-7)


def test_vanilla_adam_matches_torch_coupled_decay():
    """adam_update == torch.optim.Adam with coupled weight decay
    (nnUNetTrainerVanillaAdam)."""
    _run_parity(
        lambda p, g, s: adam_update(p, g, s, 1e-3, weight_decay=1e-2),
        lambda p: init_adam_state(p),
        lambda ps: torch.optim.Adam(ps, lr=1e-3, weight_decay=1e-2))


def test_adamw_amsgrad_matches_torch():
    """adamw_update(amsgrad=True) == torch.optim.AdamW(amsgrad=True)
    (nnUNetTrainerAdam) — the vmax running max must propagate."""
    _run_parity(
        lambda p, g, s: adamw_update(p, g, s, 1e-3, betas=(0.9, 0.999),
                                     weight_decay=1e-2, amsgrad=True),
        lambda p: init_adam_state(p, amsgrad=True),
        lambda ps: torch.optim.AdamW(ps, lr=1e-3, weight_decay=1e-2,
                                     amsgrad=True))


def test_adamw_primus_betas_match_torch():
    """AdamW with the Primus betas (0.9, 0.98) / wd 5e-2."""
    _run_parity(
        lambda p, g, s: adamw_update(p, g, s, 3e-4, betas=(0.9, 0.98),
                                     weight_decay=5e-2),
        lambda p: init_adam_state(p),
        lambda ps: torch.optim.AdamW(ps, lr=3e-4, betas=(0.9, 0.98),
                                     weight_decay=5e-2))


# ------------------------------------------------------------ loss variants
def test_topk_label_smoothing_matches_torch(rng):
    """topk10_ls01: per-voxel CE with label_smoothing=0.1, top-10% mean
    (TopKLoss with batchgenerators' smooth CE)."""
    logits = rng.normal(size=(2, 4, 4, 4, 3)).astype(np.float32)
    y = rng.integers(0, 3, (2, 4, 4, 4)).astype(np.int32)
    ours = float(make_loss("topk10_ls01")(jnp.asarray(logits),
                                          jnp.asarray(y)))
    ce = torch.nn.functional.cross_entropy(
        torch.from_numpy(np.transpose(logits, (0, 4, 1, 2, 3))),
        torch.from_numpy(y).long(), reduction="none", label_smoothing=0.1)
    flat = ce.flatten()
    k = max(1, int(flat.numel() * 0.10))  # reference truncates (TopKLoss)
    ref = float(flat.topk(k).values.mean())
    assert ours == pytest.approx(ref, rel=1e-5)


def test_dice_ce_nosmooth_dispatch(rng):
    """smooth=0 changes the dice term (DiceCELoss_noSmooth)."""
    logits = rng.normal(size=(1, 4, 4, 4, 3)).astype(np.float32)
    y = rng.integers(0, 3, (1, 4, 4, 4)).astype(np.int32)
    a = float(make_loss("dice_ce")(jnp.asarray(logits), jnp.asarray(y)))
    b = float(make_loss("dice_ce_nosmooth")(jnp.asarray(logits),
                                            jnp.asarray(y)))
    assert a != pytest.approx(b, rel=1e-9)


# ------------------------------------------------------------ lr schedules
def test_schedule_boundaries():
    cfg = TrainConfig(arch=_tiny_arch(), initial_lr=1e-2, num_epochs=1000,
                      lr_schedule="cos")
    assert schedule_lr(cfg, 0) == pytest.approx(1e-2)
    assert schedule_lr(cfg, 500) == pytest.approx(
        1e-2 * 0.5 * (1 + np.cos(np.pi * 0.5)))
    assert schedule_lr(cfg, 1000) == pytest.approx(0.0, abs=1e-18)

    import dataclasses

    w = dataclasses.replace(cfg, lr_schedule="warmup_poly", warmup_epochs=50)
    assert schedule_lr(w, 0) == pytest.approx(1e-2 / 50)
    assert schedule_lr(w, 49) == pytest.approx(1e-2)       # warmup done
    assert schedule_lr(w, 50) == pytest.approx(1e-2)       # poly offset start
    assert schedule_lr(w, 525) == pytest.approx(
        1e-2 * (1 - 475 / 950) ** 0.9)
    # torch-float64 exactness (the jnp fp32 versions were ~1e-9 off)
    assert isinstance(schedule_lr(cfg, 123), float)


# ----------------------------------------------------------- apply_variant
def test_apply_variant_each_new_family():
    base = TrainConfig(arch=_tiny_arch(deep_supervision=True))

    cfg, _ = apply_variant(base, "nnUNetTrainerCosAnneal")
    assert cfg.lr_schedule == "cos"
    cfg, _ = apply_variant(base, "nnUNetTrainerAdam3en4")
    assert cfg.optimizer == "adamw_amsgrad" and cfg.initial_lr == 3e-4
    cfg, _ = apply_variant(base, "nnUNetTrainerVanillaAdam")
    assert cfg.optimizer == "adam"
    cfg, _ = apply_variant(base, "nnUNetTrainerTopk10LossLS01")
    assert cfg.loss == "topk10_ls01"
    cfg, _ = apply_variant(base, "nnUNetTrainerNoDeepSupervision")
    assert not cfg.arch.deep_supervision
    cfg, spec = apply_variant(base, "nnUNetTrainerNoDA")
    assert spec.no_da and spec.mirror_axes == ()
    cfg, spec = apply_variant(base, "nnUNetTrainerDA5")
    assert spec.aggressive_da


def test_probabilistic_oversampling_recompute():
    """Base probabilistic trainer recomputes percent as the realised
    round-rule fraction: batch 2 @ 0.33 -> 0.5; _033/_010 pin it."""
    base = TrainConfig(arch=_tiny_arch())
    cfg, spec = apply_variant(base, "nnUNetTrainer_probabilisticOversampling",
                              batch_size=2)
    assert spec.probabilistic_oversampling
    assert cfg.oversample_foreground_percent == pytest.approx(0.5)
    cfg, _ = apply_variant(base, "nnUNetTrainer_probabilisticOversampling",
                           batch_size=3)
    assert cfg.oversample_foreground_percent == pytest.approx(1 / 3)
    cfg, _ = apply_variant(base,
                           "nnUNetTrainer_probabilisticOversampling_033")
    assert cfg.oversample_foreground_percent == pytest.approx(0.33)
    cfg, _ = apply_variant(base,
                           "nnUNetTrainer_probabilisticOversampling_010")
    assert cfg.oversample_foreground_percent == pytest.approx(0.10)


def test_dataloader_probabilistic_draw(tmp_path, rng):
    """probabilistic mode actually draws Bernoulli(percent) per sample."""
    from boa_tpu.train.dataloader import DataLoader
    from boa_tpu.train.dataset import CaseStore

    store = CaseStore(tmp_path / "cases")
    data = rng.normal(size=(16, 16, 16)).astype(np.float32)
    seg = np.zeros((16, 16, 16), np.int8)
    seg[4:8, 4:8, 4:8] = 1
    store.save_case("c0", data, seg)
    dl = DataLoader(store, (8, 8, 8), batch_size=4, oversample_percent=1.0,
                    probabilistic_oversampling=True, seed=0)
    monkey = []
    orig = dl._sample_patch
    dl._sample_patch = lambda case, fg: monkey.append(fg) or orig(case, fg)
    dl.next_batch()
    assert monkey == [True] * 4  # p=1.0 -> every sample foreground-forced
    dl2 = DataLoader(store, (8, 8, 8), batch_size=4, oversample_percent=0.0,
                     probabilistic_oversampling=True, seed=0)
    monkey2 = []
    orig2 = dl2._sample_patch
    dl2._sample_patch = lambda case, fg: monkey2.append(fg) or orig2(case, fg)
    dl2.next_batch()
    assert monkey2 == [False] * 4


# ------------------------------------------------------------------ Primus
def test_primus_trainer_recipes():
    from boa_tpu.models.primus import PrimusConfig

    cfg, spec = primus_train_config("nnUNet_Primus_S_Trainer", num_classes=4)
    assert isinstance(cfg.arch, PrimusConfig)
    assert cfg.arch.embed_dim == 396
    assert cfg.initial_lr == 3e-4 and cfg.weight_decay == 5e-2
    assert cfg.grad_clip == 1.0 and cfg.optimizer == "adamw"
    assert cfg.adam_betas == (0.9, 0.98)
    assert cfg.lr_schedule == "warmup_poly"
    assert spec.batch_size is None

    cfg, spec = primus_train_config("nnUNet_Primus_M_Trainer_BS8_2e4",
                                    num_classes=4)
    assert cfg.arch.embed_dim == 864
    assert cfg.initial_lr == 2e-4 and spec.batch_size == 8

    assert get_variant("nnUNet_Trainer_BS8").batch_size == 8
    with pytest.raises(ValueError, match="not a Primus"):
        primus_train_config("nnUNetTrainer", num_classes=4)
    # every Primus entry resolves to a buildable recipe
    for name, spec in VARIANTS.items():
        if spec.primus:
            c, _ = primus_train_config(name, num_classes=2)
            assert c.arch.embed_dim > 0


def test_primus_smoke_train_step(rng):
    """One AdamW train step on a tiny Primus ViT: finite loss, params move
    (the make_train_step model-family dispatch)."""
    from boa_tpu.models.primus import PrimusConfig
    from boa_tpu.train.trainer import init_opt_state

    arch = PrimusConfig(embed_dim=16, depth=2, num_heads=2,
                        patch_size=(4, 4, 4), num_classes=3)
    cfg = TrainConfig(arch=arch, initial_lr=3e-4, weight_decay=5e-2,
                      grad_clip=1.0, optimizer="adamw",
                      adam_betas=(0.9, 0.98), lr_schedule="warmup_poly",
                      compute_dtype="float32")
    step = make_train_step(cfg, donate=False)
    from boa_tpu.train.trainer import _init_model

    params = _init_model(jax.random.PRNGKey(0), arch)
    opt = init_opt_state(cfg, params)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 8, 1)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 3, (2, 8, 8, 8)).astype(np.int32))
    p0 = np.asarray(params["blocks"][0]["qkv_w"]).copy()
    params2, opt2, metrics = step(params, opt, x, y, jnp.float32(3e-4))
    assert np.isfinite(float(metrics["loss"]))
    assert not np.array_equal(np.asarray(params2["blocks"][0]["qkv_w"]), p0)
    assert "step" in opt2  # AdamW state threaded, not SGD momentum


def test_build_trainer_routes_primus(tmp_path):
    """A Primus trainer name must build the ViT (not a UNet) and BS8
    variants must carry their batch size in the spec — regression guard
    for the silent-UNet bug."""
    from boa_tpu.models.primus import PrimusConfig
    from boa_tpu.train.run_training import build_trainer

    trainer, mesh, spec = build_trainer(
        tmp_path, (32, 32, 32), num_classes=3, epochs=2, iters=2,
        trainer_name="nnUNet_Primus_M_Trainer_BS8")
    assert isinstance(trainer.cfg.arch, PrimusConfig)
    assert spec.primus == "M" and spec.batch_size == 8
    assert trainer.cfg.num_epochs == 2 and trainer.cfg.iters_per_epoch == 2

    trainer2, _, spec2 = build_trainer(
        tmp_path / "u", (32, 32, 32), num_classes=3, epochs=2, iters=2,
        trainer_name="nnUNetTrainerDA5")
    assert not isinstance(trainer2.cfg.arch, PrimusConfig)
    assert spec2.aggressive_da
