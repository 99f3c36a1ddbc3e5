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

    def forward(self, x):
        return self.nonlin(self.norm(self.conv(x)))


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
    def __init__(self, cfg, deep_supervision):
        super().__init__()
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
        self.decoder = UNetDecoder(cfg, deep_supervision)

    def forward(self, x):
        return self.decoder(self.encoder(x))
