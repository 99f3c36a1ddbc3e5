"""Torch oracle: minimal PlainConvUNet / ResidualEncoderUNet.

Built from the published dynamic_network_architectures spec (the pip package
the reference resolves via plans, `get_network_from_plans.py:17`) so our JAX
implementation and checkpoint converter can be numerically validated without
downloading weights. Module attribute names replicate the checkpoint key
layout of real nnU-Net checkpoints (encoder.stages.S.convs.B.conv.weight,
decoder.transpconvs.I, decoder.seg_layers.I, ...).
"""

from __future__ import annotations

import torch
import torch.nn as nn


class ConvDropoutNormReLU(nn.Module):
    def __init__(self, c_in, c_out, kernel, stride, bias=True, nonlin=True):
        super().__init__()
        pad = tuple((k - 1) // 2 for k in kernel)
        self.conv = nn.Conv3d(c_in, c_out, kernel, stride, pad, bias=bias)
        self.norm = nn.InstanceNorm3d(c_out, eps=1e-5, affine=True)
        self.nonlin = nn.LeakyReLU(0.01, inplace=True) if nonlin else nn.Identity()
        # the real package also registers the ops as an nn.Sequential, so
        # real state dicts carry DUPLICATE `all_modules.N.*` keys for every
        # conv/norm parameter — replicate that so converter tests exercise
        # the true key layout
        self.all_modules = nn.Sequential(self.conv, self.norm, self.nonlin)

    def forward(self, x):
        return self.all_modules(x)


class StackedConvBlocks(nn.Module):
    def __init__(self, n, c_in, c_out, kernel, first_stride, bias=True):
        super().__init__()
        blocks = [ConvDropoutNormReLU(c_in, c_out, kernel, first_stride, bias)]
        for _ in range(n - 1):
            blocks.append(ConvDropoutNormReLU(c_out, c_out, kernel, (1, 1, 1), bias))
        self.convs = nn.Sequential(*blocks)

    def forward(self, x):
        return self.convs(x)


class BasicBlockD(nn.Module):
    def __init__(self, c_in, c_out, kernel, stride, bias=True):
        super().__init__()
        self.conv1 = ConvDropoutNormReLU(c_in, c_out, kernel, stride, bias)
        self.conv2 = ConvDropoutNormReLU(c_out, c_out, kernel, (1, 1, 1), bias, nonlin=False)
        if any(s != 1 for s in stride) or c_in != c_out:
            self.skip = nn.Sequential(
                nn.Conv3d(c_in, c_out, 1, stride, bias=bias),
                nn.InstanceNorm3d(c_out, eps=1e-5, affine=True),
            )
        else:
            self.skip = nn.Identity()
        self.nonlin2 = nn.LeakyReLU(0.01, inplace=True)

    def forward(self, x):
        return self.nonlin2(self.conv2(self.conv1(x)) + self.skip(x))


class PlainConvEncoder(nn.Module):
    def __init__(self, c_in, cfg):
        super().__init__()
        stages = []
        for s in range(cfg.n_stages):
            stages.append(StackedConvBlocks(
                cfg.n_conv_per_stage[s], c_in, cfg.features_per_stage[s],
                cfg.kernel_sizes[s], cfg.strides[s], cfg.conv_bias))
            c_in = cfg.features_per_stage[s]
        self.stages = nn.Sequential(*stages)

    def forward(self, x):
        skips = []
        for st in self.stages:
            x = st(x)
            skips.append(x)
        return skips


class ResidualEncoder(nn.Module):
    def __init__(self, c_in, cfg):
        super().__init__()
        self.stem = StackedConvBlocks(1, c_in, cfg.features_per_stage[0],
                                      cfg.kernel_sizes[0], (1, 1, 1), cfg.conv_bias)
        c_in = cfg.features_per_stage[0]
        stages = []
        nb = cfg.n_blocks_per_stage or cfg.n_conv_per_stage
        for s in range(cfg.n_stages):
            blocks = []
            for b in range(nb[s]):
                stride = cfg.strides[s] if b == 0 else (1, 1, 1)
                blocks.append(BasicBlockD(c_in, cfg.features_per_stage[s],
                                          cfg.kernel_sizes[s], stride, cfg.conv_bias))
                c_in = cfg.features_per_stage[s]
            stages.append(nn.Sequential(*blocks))
        self.stages = nn.Sequential(*stages)

    def forward(self, x):
        x = self.stem(x)
        skips = []
        for st in self.stages:
            x = st(x)
            skips.append(x)
        return skips


class UNetDecoder(nn.Module):
    def __init__(self, cfg, deep_supervision, encoder=None):
        super().__init__()
        # the real UNetDecoder keeps a reference to its encoder, which
        # torch registers as a submodule — real checkpoints therefore
        # contain a full duplicate `decoder.encoder.*` key set
        if encoder is not None:
            self.encoder = encoder
        self.deep_supervision = deep_supervision
        transpconvs, stages, seg_layers = [], [], []
        for i, s in enumerate(range(cfg.n_stages - 1, 0, -1)):
            c_below = cfg.features_per_stage[s]
            c_skip = cfg.features_per_stage[s - 1]
            transpconvs.append(nn.ConvTranspose3d(
                c_below, c_skip, cfg.strides[s], cfg.strides[s], bias=True))
            stages.append(StackedConvBlocks(
                cfg.n_conv_per_stage_decoder[i], 2 * c_skip, c_skip,
                cfg.kernel_sizes[s - 1], (1, 1, 1), cfg.conv_bias))
            seg_layers.append(nn.Conv3d(c_skip, cfg.num_classes, 1, bias=True))
        self.transpconvs = nn.ModuleList(transpconvs)
        self.stages = nn.ModuleList(stages)
        self.seg_layers = nn.ModuleList(seg_layers)

    def forward(self, skips):
        outputs = []
        y = skips[-1]
        n = len(self.stages)
        for i in range(n):
            y = self.transpconvs[i](y)
            y = torch.cat([y, skips[-(i + 2)]], dim=1)
            y = self.stages[i](y)
            if self.deep_supervision or i == n - 1:
                outputs.append(self.seg_layers[i](y))
        if self.deep_supervision:
            return outputs[::-1]
        return outputs[-1]


class TorchUNet(nn.Module):
    def __init__(self, cfg, deep_supervision=False):
        super().__init__()
        if cfg.residual_encoder:
            self.encoder = ResidualEncoder(cfg.input_channels, cfg)
        else:
            self.encoder = PlainConvEncoder(cfg.input_channels, cfg)
        self.decoder = UNetDecoder(cfg, deep_supervision, encoder=self.encoder)

    def forward(self, x):
        return self.decoder(self.encoder(x))


def full_checkpoint(model: nn.Module, trainer_name: str = "nnUNetTrainer",
                    configuration: str = "3d_fullres",
                    mirror_axes=(0, 1, 2), ddp_prefix: bool = False) -> dict:
    """A complete real-format checkpoint dict as nnUNetTrainer saves it
    (`nnUNetTrainer.py:1149-1210`) and the predictor consumes it
    (`predict_from_raw_data.py:83-120`): network_weights, trainer/plans
    identity, init args, optimizer + grad-scaler state, logging, EMA."""
    import copy

    # the optimizer step runs on a copy so the caller's model (and any
    # previously emitted checkpoint) is not mutated
    stepped = copy.deepcopy(model)
    opt = torch.optim.SGD(stepped.parameters(), lr=1e-2, momentum=0.99,
                          nesterov=True, weight_decay=3e-5)
    # one step so the optimizer state dict is non-trivial
    loss = sum(p.sum() for p in stepped.parameters() if p.requires_grad)
    loss.backward()
    opt.step()
    weights = {k: v.clone() for k, v in model.state_dict().items()}
    if ddp_prefix:
        weights = {f"module.{k}": v for k, v in weights.items()}
    return {
        "network_weights": weights,
        "optimizer_state": opt.state_dict(),
        "grad_scaler_state": None,
        "logging": {"train_losses": [0.9], "val_losses": [0.8],
                    "ema_fg_dice": [0.1]},
        "_best_ema": 0.1,
        "current_epoch": 1,
        "init_args": {
            "plans": {"plans_name": "nnUNetPlans"},
            "configuration": configuration,
            "fold": 0,
            "dataset_json": {},
            "device": {"type": "cuda"},
        },
        "trainer_name": trainer_name,
        "inference_allowed_mirroring_axes": tuple(mirror_axes),
    }


def real_format_plans(cfg, spacing=(1.5, 1.5, 1.5), patch=(64, 64, 64),
                      dataset_name: str = "Dataset990_mirror") -> dict:
    """A plans.json document in the current nnU-Net schema
    (`plans_handler.py:31-341` consumption side), written independently
    from the published format."""
    n = cfg.n_stages
    return {
        "dataset_name": dataset_name,
        "plans_name": "nnUNetPlans",
        "original_median_spacing_after_transp": list(spacing),
        "original_median_shape_after_transp": [128, 256, 256],
        "image_reader_writer": "SimpleITKIO",
        "transpose_forward": [0, 1, 2],
        "transpose_backward": [0, 1, 2],
        "experiment_planner_used": "ExperimentPlanner",
        "label_manager": "LabelManager",
        "foreground_intensity_properties_per_channel": {
            "0": {"max": 1500.0, "mean": 100.0, "median": 80.0,
                  "min": -1000.0, "percentile_00_5": -900.0,
                  "percentile_99_5": 1200.0, "std": 300.0}},
        "configurations": {
            "3d_fullres": {
                "data_identifier": "nnUNetPlans_3d_fullres",
                "preprocessor_name": "DefaultPreprocessor",
                "batch_size": 2,
                "patch_size": list(patch),
                "median_image_size_in_voxels": [128.0, 256.0, 256.0],
                "spacing": list(spacing),
                "normalization_schemes": ["CTNormalization"],
                "use_mask_for_norm": [False],
                "resampling_fn_data": "resample_data_or_seg_to_shape",
                "resampling_fn_seg": "resample_data_or_seg_to_shape",
                "resampling_fn_data_kwargs": {
                    "is_seg": False, "order": 3, "order_z": 0,
                    "force_separate_z": None},
                "resampling_fn_seg_kwargs": {
                    "is_seg": True, "order": 1, "order_z": 0,
                    "force_separate_z": None},
                "resampling_fn_probabilities":
                    "resample_data_or_seg_to_shape",
                "resampling_fn_probabilities_kwargs": {
                    "is_seg": False, "order": 1, "order_z": 0,
                    "force_separate_z": None},
                "architecture": {
                    "network_class_name":
                        "dynamic_network_architectures.architectures."
                        "unet.PlainConvUNet",
                    "arch_kwargs": {
                        "n_stages": n,
                        "features_per_stage": list(cfg.features_per_stage),
                        "conv_op": "torch.nn.modules.conv.Conv3d",
                        "kernel_sizes": [list(k) for k in cfg.kernel_sizes],
                        "strides": [list(s) for s in cfg.strides],
                        "n_conv_per_stage": list(cfg.n_conv_per_stage),
                        "n_conv_per_stage_decoder":
                            list(cfg.n_conv_per_stage_decoder),
                        "conv_bias": True,
                        "norm_op":
                            "torch.nn.modules.instancenorm.InstanceNorm3d",
                        "norm_op_kwargs": {"eps": 1e-05, "affine": True},
                        "dropout_op": None,
                        "dropout_op_kwargs": None,
                        "nonlin": "torch.nn.LeakyReLU",
                        "nonlin_kwargs": {"inplace": True},
                    },
                    "_kw_requires_import": ["conv_op", "norm_op",
                                            "dropout_op", "nonlin"],
                },
                "batch_dice": True,
            },
        },
    }
