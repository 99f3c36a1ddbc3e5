"""Training entry point.

Parity: `nnunetv2/run/run_training.py:137-190` `nnUNetv2_train` — but the
reference's mp.spawn-per-GPU + NCCL process group becomes a single SPMD
program over a `jax.sharding.Mesh`: pass --dp/--sp/--tp to shard the jitted
train step across chips (GSPMD inserts the gradient all-reduces DDP did).

Usage:
    python -m boa_tpu.train.run_training CASES_DIR OUT_DIR \
        --patch 128 128 128 --batch 2 --epochs 1000 [--resume]
"""

from __future__ import annotations

import argparse
import json
import logging
from pathlib import Path

import jax
import numpy as np

logger = logging.getLogger(__name__)


def build_trainer(out_dir: Path, patch, num_classes: int,
                  features=(32, 64, 128, 256, 320, 320),
                  epochs: int = 1000, iters: int = 250,
                  mesh_shape=None, compute_dtype: str = "bfloat16",
                  trainer_name: str | None = None, batch_size: int = 2,
                  in_channels: int = 1):
    """Trainer + mesh (+ variant spec) for an arch derived from
    patch/classes. Batch size matters here only for the probabilistic-
    oversampling percent recompute; the case store belongs to the
    DataLoader."""
    from boa_tpu.models.unet import ArchConfig
    from boa_tpu.parallel.mesh import (batch_sharding, label_sharding,
                                       make_mesh, param_shardings)
    from boa_tpu.train.trainer import TrainConfig, Trainer
    from boa_tpu.train.variants import VariantSpec, apply_variant

    n = len(features)
    # cap pool depth by patch size, PER AXIS (stride-2 per stage until the
    # axis bottoms out) — a singleton z axis (the 2d configuration) never
    # pools or convolves through-plane
    depths = [int(np.log2(p)) for p in patch]
    n = min(n, max(depths) + 1)
    two_d = patch[2] == 1
    kz = 1 if two_d else 3
    arch = ArchConfig(
        n_stages=n, features_per_stage=tuple(features[:n]),
        kernel_sizes=((3, 3, kz),) * n,
        strides=((1, 1, 1),) + tuple(
            tuple(2 if s <= depths[i] else 1 for i in range(3))
            for s in range(1, n)),
        n_conv_per_stage=(2,) * n, n_conv_per_stage_decoder=(2,) * (n - 1),
        num_classes=num_classes, input_channels=in_channels,
        deep_supervision=True, two_d=two_d)
    cfg = TrainConfig(arch=arch, num_epochs=epochs, iters_per_epoch=iters,
                      compute_dtype=compute_dtype)
    spec = VariantSpec()
    if trainer_name:
        from boa_tpu.train.variants import get_variant

        if get_variant(trainer_name).primus is not None:
            # Primus trainers swap the whole network family: build the
            # ViT arch + AbstractPrimus recipe instead of the UNet above
            from boa_tpu.train.variants import primus_train_config

            cfg, spec = primus_train_config(
                trainer_name, num_classes, input_channels=in_channels,
                num_epochs=epochs, iters_per_epoch=iters,
                batch_size=batch_size, compute_dtype=compute_dtype)
            import dataclasses

            # the variant recipe sets its own epoch count; the caller's
            # explicit loop control wins (same contract as the UNet branch)
            cfg = dataclasses.replace(cfg, num_epochs=epochs,
                                      iters_per_epoch=iters)
        else:
            # the variant recipe (loss/optimizer/schedule/oversampling/DA
            # markers); the caller's explicit epochs/iters keep loop control
            cfg, spec = apply_variant(cfg, trainer_name,
                                      batch_size=batch_size)
            import dataclasses

            cfg = dataclasses.replace(cfg, num_epochs=epochs,
                                      iters_per_epoch=iters)

    in_shardings = None
    mesh = None
    if mesh_shape is not None:
        mesh = make_mesh(int(np.prod(mesh_shape)), ("dp", "sp", "tp"),
                         mesh_shape)
        trainer = Trainer(cfg, out_dir)
        ps = param_shardings(mesh, trainer.state.params)
        in_shardings = (ps, ps, batch_sharding(mesh), label_sharding(mesh),
                        None)
        from boa_tpu.train.trainer import (make_train_step,
                                           opt_state_shardings)

        trainer._step = make_train_step(cfg, in_shardings=in_shardings)
        trainer.state.params = jax.device_put(trainer.state.params, ps)
        trainer.state.momentum_buf = jax.device_put(
            trainer.state.momentum_buf, opt_state_shardings(cfg, ps))
        return trainer, mesh, spec
    return Trainer(cfg, out_dir), None, spec


def run_training(cases_dir: str | Path, out_dir: str | Path,
                 patch=(128, 128, 128), batch_size: int = 2,
                 num_classes: int | None = None, epochs: int = 1000,
                 iters: int = 250, resume: bool = False,
                 mesh_shape=None, augment: bool = True,
                 mirror_axes: "tuple[int, ...] | None" = None, seed: int = 0,
                 fold: "int | str" = "all",
                 validate: bool = False,
                 pretrained_weights: "str | Path | None" = None,
                 trainer_name: str | None = None,
                 cascade: bool = False) -> dict:
    """`fold` selects the nnU-Net 5-fold split (splits_final.json beside the
    cases, created on first use); "all" trains on everything. `validate`
    runs the final-weights validation pass over the fold's val split after
    training (nnUNetTrainer.perform_actual_validation:1212). `trainer_name`
    applies the full variant recipe (loss/optimizer/schedule, DA5/NoDA,
    probabilistic oversampling, mirror axes) — the reference's `-tr` flag;
    explicit `epochs`/`iters`/`mirror_axes` args still win loop control.
    `cascade=True` trains a 3d_cascade_fullres-style stage: every case
    must carry a previous-stage seg (`train.cascade.predict_next_stage`),
    which enters the network as one one-hot channel per foreground label
    with the cascade augmentations (`nnUNetTrainer.py:137,646-652,802-829`)."""
    from boa_tpu.train.augment import augment_batch
    from boa_tpu.train.dataloader import DataLoader
    from boa_tpu.train.dataset import CaseStore, load_or_create_splits

    cases_dir, out_dir = Path(cases_dir), Path(out_dir)
    store = CaseStore(cases_dir)
    if num_classes is None:
        # max label across ALL cases (the first case alone may lack the
        # highest-labeled organ, silently shrinking the output head)
        mx = 0
        for cid in store.case_ids():
            case = store.load_case(cid)
            if case.class_locations:
                mx = max(mx, max(int(k) for k in case.class_locations))
            else:
                mx = max(mx, int(np.max(np.asarray(case.seg))))
        num_classes = mx + 1
    split = None
    if fold != "all":
        splits = load_or_create_splits(store)
        split = splits[int(fold)]
        logger.info("fold %s: %d train / %d val cases", fold,
                    len(split["train"]), len(split["val"]))
    n_data_ch = store.load_case(store.case_ids()[0]).data.shape[0]
    fg_labels = tuple(range(1, num_classes))
    in_channels = n_data_ch + (len(fg_labels) if cascade else 0)
    trainer, mesh, spec = build_trainer(out_dir, patch, num_classes,
                                        epochs=epochs, iters=iters,
                                        mesh_shape=mesh_shape,
                                        trainer_name=trainer_name,
                                        batch_size=batch_size,
                                        in_channels=in_channels)
    if trainer_name:
        # variant DA/sampling markers drive the loader + augment stack;
        # an EXPLICIT mirror_axes argument (e.g. --no-mirroring) wins over
        # the variant default
        if spec.no_da:
            augment = False
        if mirror_axes is None:
            mirror_axes = spec.mirror_axes
        if spec.batch_size:
            batch_size = spec.batch_size  # BS8 Primus trainers
        if spec.aggressive_da and cascade:
            logger.warning(
                "%s: DA5 preset is not implemented for cascade "
                "augmentations; using the default cascade stack",
                trainer_name)
    if mirror_axes is None:
        mirror_axes = (0, 1, 2)
    if patch[2] == 1 and tuple(mirror_axes) == (0, 1, 2):
        mirror_axes = (0, 1)  # 2d configuration mirrors in-plane only
    # self-describing training output: weights/store.export_trained_model
    # turns it into a servable store entry from this metadata
    out_dir.mkdir(parents=True, exist_ok=True)
    arch = trainer.cfg.arch
    (out_dir / "export_meta.json").write_text(json.dumps({
        "patch_size": list(patch),
        "num_classes": int(num_classes),
        "features_per_stage": list(arch.features_per_stage),
        "cases_dir": str(cases_dir.resolve()),  # export runs from any cwd
    }))
    ckpt = out_dir / "checkpoint_latest.pkl"
    if resume and ckpt.exists():
        trainer.load_checkpoint(ckpt)
        logger.info("Resumed from epoch %d", trainer.state.epoch)
    elif pretrained_weights is not None:
        trainer.state.params = load_pretrained_weights(
            trainer.state.params, pretrained_weights, verbose=True)

    loader = DataLoader(
        store, patch, batch_size, seed=seed,
        case_ids=split["train"] if split else None,
        oversample_percent=trainer.cfg.oversample_foreground_percent,
        probabilistic_oversampling=spec.probabilistic_oversampling,
        cascade=cascade,
        cascade_cc_dropout_p=0.2 if augment else 0.0)
    key = jax.random.PRNGKey(seed)
    aug_fn = augment_batch
    if spec.aggressive_da:
        from boa_tpu.train.augment import augment_batch_da5 as aug_fn

    def batches():
        nonlocal key
        for batch in loader.prefetched():
            if cascade:
                x, y, prev = batch
                if augment:
                    from boa_tpu.train.augment import augment_batch_cascade

                    key, sub = jax.random.split(key)
                    yield augment_batch_cascade(
                        sub, jax.numpy.asarray(x), jax.numpy.asarray(y),
                        jax.numpy.asarray(prev), fg_labels,
                        mirror_axes=tuple(mirror_axes))
                else:
                    onehot = np.stack([(prev == lb) for lb in fg_labels],
                                      axis=-1).astype(np.float32)
                    yield np.concatenate([x, onehot], axis=-1), y
            elif augment:
                x, y = batch
                key, sub = jax.random.split(key)
                yield aug_fn(sub, jax.numpy.asarray(x),
                             jax.numpy.asarray(y),
                             mirror_axes=tuple(mirror_axes))
            else:
                yield batch

    gen = batches()
    last = {}
    ctx = mesh or _nullcontext()
    with ctx:
        while trainer.state.epoch < epochs:
            last = trainer.train_epoch(gen)
            logger.info("epoch %d: loss=%.4f dice=%.4f ema=%.4f (%.1fs)",
                        last["epoch"], last["loss"], last["dice"],
                        last["ema_dice"], last["epoch_time"])
    trainer.final_checkpoint()
    if validate and split:
        last["validation"] = perform_actual_validation(
            trainer, store, split["val"], out_dir, patch)
    return last


def load_pretrained_weights(params: dict, fname: str | Path,
                            verbose: bool = False) -> dict:
    """Transfer-learning init: copy encoder+decoder weights, keep the new
    model's segmentation heads.

    Parity: `nnunetv2/run/load_pretrained_weights.py:7-62` — every
    non-seg-head key must exist in the pretrained checkpoint with the same
    shape (incompatible architectures fail loudly); keys ending in
    seg_layers (our `seg_heads`) are never transferred.
    """
    import pickle

    with open(fname, "rb") as f:
        blob = pickle.load(f)
    pre = blob["params"] if isinstance(blob, dict) and "params" in blob \
        else blob

    def _check(dst, src):
        if tuple(dst.shape) != tuple(np.asarray(src).shape):
            raise ValueError(
                f"pretrained parameter shape {np.asarray(src).shape} does "
                f"not match the network's {tuple(dst.shape)}; the "
                f"pretrained model is not compatible with this network")
        return jax.numpy.asarray(src, dst.dtype)

    out = dict(params)
    for key in ("encoder", "decoder"):
        if key not in pre:
            raise KeyError(f"pretrained checkpoint has no '{key}' weights")
        try:
            out[key] = jax.tree.map(_check, params[key], pre[key])
        except ValueError as exc:
            raise ValueError(f"incompatible '{key}' weights: {exc}") from exc
    if verbose:
        n = sum(x.size for x in jax.tree.leaves(
            {k: out[k] for k in ("encoder", "decoder")}))
        logger.info("transferred %d pretrained parameters "
                    "(segmentation heads kept fresh)", n)
    return out


def perform_actual_validation(trainer, store, val_ids, out_dir: Path,
                              patch) -> dict:
    """Predict every validation case with the final weights and evaluate.

    Parity: `nnUNetTrainer.perform_actual_validation` (`:1212`) — full
    Gaussian-fused sliding-window prediction of the fold's val split,
    segmentations written to `validation/{case}.nii.gz`, metrics (per-case
    and mean Dice/IoU) to `validation/summary.json`. Cases are already
    preprocessed (normalized, plan spacing), so the network runs directly
    on the stored arrays like the reference does.
    """
    import jax.numpy as jnp

    from boa_tpu.engine.evaluation import evaluate_folder_arrays
    from boa_tpu.inference.sliding_window import (sliding_window_logits,
                                                  stack_fold_params)
    from boa_tpu.io import nifti
    from boa_tpu.ops import preprocess as pp

    val_dir = Path(out_dir) / "validation"
    val_dir.mkdir(parents=True, exist_ok=True)
    stacked = stack_fold_params([trainer.state.params])
    cfg = trainer.cfg.arch
    gauss = pp.gaussian_importance_map(tuple(patch))
    refs, preds = {}, {}
    for cid in val_ids:
        case = store.load_case(cid, memmap=False)
        data = np.asarray(case.data, np.float32)
        if data.shape[0] < cfg.input_channels and case.prev_seg is not None:
            # cascade stage: append the prev-stage one-hot channels
            fg = range(1, cfg.num_classes)
            onehot = np.stack([(np.asarray(case.prev_seg) == lb)
                               for lb in fg]).astype(np.float32)
            data = np.concatenate([data, onehot], axis=0)
        padded, revert = pp.pad_to_patch(data, tuple(patch))
        starts = pp.tile_starts(padded.shape[-3:], tuple(patch), 0.5)
        logits = sliding_window_logits(
            stacked, jax.numpy.asarray(padded), jnp.asarray(starts),
            jnp.asarray(gauss), cfg, accum_dtype=jnp.float32)
        seg = np.asarray(jnp.argmax(logits, axis=0))[revert].astype(np.uint8)
        sp = list(case.properties.get("spacing", (1.0, 1.0, 1.0)))[:3]
        nifti.save(nifti.NiftiImage(data=seg,
                                    affine=np.diag(list(sp) + [1.0])),
                   val_dir / f"{cid}.nii.gz")
        refs[cid] = np.asarray(case.seg)
        preds[cid] = seg
    labels = sorted({int(v) for s in refs.values()
                     for v in np.unique(s) if v > 0})
    summary = evaluate_folder_arrays(refs, preds, labels,
                                     out_file=val_dir / "summary.json")
    logger.info("validation: %d cases, foreground mean Dice %.4f",
                len(refs), summary.get("foreground_mean", {}).get(
                    "Dice", float("nan")))
    return summary


class _nullcontext:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False


def main(argv=None) -> None:
    ap = argparse.ArgumentParser("boa_tpu-train")
    ap.add_argument("cases_dir", type=Path)
    ap.add_argument("out_dir", type=Path)
    ap.add_argument("--patch", type=int, nargs=3, default=[128, 128, 128])
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--epochs", type=int, default=1000)
    ap.add_argument("--iters", type=int, default=250)
    ap.add_argument("--num-classes", type=int, default=None)
    ap.add_argument("--resume", "--c", action="store_true")
    ap.add_argument("--fold", default="all",
                    help="nnU-Net 5-fold split index, or 'all' (default)")
    ap.add_argument("--validate", action="store_true", default=False,
                    help="run the final validation pass over the fold's "
                         "val split after training")
    ap.add_argument("--pretrained_weights", type=Path, default=None,
                    help="checkpoint to transfer encoder/decoder weights "
                         "from (segmentation heads stay fresh)")
    ap.add_argument("--dp", type=int, default=1)
    ap.add_argument("--sp", type=int, default=1)
    ap.add_argument("--tp", type=int, default=1)
    ap.add_argument("--no-augment", action="store_true")
    ap.add_argument("--no-mirroring", action="store_true",
                    help="disable mirror augmentation (the NoMirroring "
                         "trainer variants all BOA models use)")
    ap.add_argument("--tr", dest="trainer_name", default=None,
                    help="trainer-variant name (nnUNetTrainerDA5, "
                         "nnUNetTrainer_probabilisticOversampling, ...)")
    ap.add_argument("--cascade", action="store_true", default=False,
                    help="train a cascade (3d_cascade_fullres) stage: "
                         "cases must carry *_prevseg.npy previous-stage "
                         "segmentations (train.cascade.predict_next_stage)")
    args = ap.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    mesh_shape = None
    if args.dp * args.sp * args.tp > 1:
        mesh_shape = (args.dp, args.sp, args.tp)
    run_training(args.cases_dir, args.out_dir, tuple(args.patch), args.batch,
                 args.num_classes, args.epochs, args.iters, args.resume,
                 mesh_shape, augment=not args.no_augment,
                 mirror_axes=() if args.no_mirroring else None,
                 fold=args.fold, validate=args.validate,
                 pretrained_weights=args.pretrained_weights,
                 trainer_name=args.trainer_name, cascade=args.cascade)


if __name__ == "__main__":
    main()
