"""torch nnU-Net checkpoint -> JAX parameter pytree converter.

Parity target: per-fold ``checkpoint_final.pth`` files produced by
`nnunetv2/training/nnUNetTrainer/nnUNetTrainer.py:1149-1210` and loaded for
inference at `nnunetv2/inference/predict_from_raw_data.py:83-120`
(``network_weights`` entry of the checkpoint dict, dynamic_network_
architectures module naming).

Layout conversions (torch NCDHW -> our channels-last NXYZC):
* Conv3d weight  (O, I, kx, ky, kz) -> (kx, ky, kz, I, O)
* ConvTranspose3d weight (I, O, kx, ky, kz) -> (kx, ky, kz, O, I)
  (applied via jax.lax.conv_transpose(..., transpose_kernel=True))
* InstanceNorm3d weight/bias -> norm_scale / norm_bias

Key patterns are matched with regexes so both the plain encoder
(`encoder.stages.S[.J].convs.B.{conv,norm}.*`) and the residual encoder
(`encoder.stages.S[.J].blocks.B.{conv1,conv2,skip}.*`, `encoder.stem...`)
naming of dynamic_network_architectures are handled.
"""

from __future__ import annotations

import re
from collections import defaultdict
from pathlib import Path
from typing import Any, Mapping

import numpy as np

from boa_tpu.models.unet import ArchConfig


def _conv_w(t) -> np.ndarray:
    a = np.asarray(t, dtype=np.float32)
    return np.ascontiguousarray(a.transpose(2, 3, 4, 1, 0))


def _vec(t) -> np.ndarray:
    return np.asarray(t, dtype=np.float32)


def load_torch_state_dict(path: str | Path) -> dict[str, np.ndarray]:
    """Load a checkpoint_final.pth without requiring CUDA; returns numpy."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt.get("network_weights", ckpt) if isinstance(ckpt, dict) else ckpt
    # strip DDP "module." prefixes (nnUNetTrainer.py:1149-1210 save handling)
    return {k.removeprefix("module.").removeprefix("_orig_mod."): v.numpy()
            for k, v in state.items()}


_ENC_PLAIN = re.compile(
    r"^encoder\.stages\.(\d+)\.(?:\d+\.)?convs\.(\d+)\.(conv|norm)\.(weight|bias)$")
_ENC_RES = re.compile(
    r"^encoder\.stages\.(\d+)\.(?:\d+\.)?(?:blocks\.)?(\d+)\."
    r"(conv1|conv2|skip)\.(?:(conv|norm|0|1)\.)?(weight|bias)$")
_STEM = re.compile(r"^encoder\.stem\.(?:\d+\.)?convs\.(\d+)\.(conv|norm)\.(weight|bias)$")
_DEC_TRANSP = re.compile(r"^decoder\.transpconvs\.(\d+)\.(weight|bias)$")
_DEC_CONV = re.compile(
    r"^decoder\.stages\.(\d+)\.(?:\d+\.)?convs\.(\d+)\.(conv|norm)\.(weight|bias)$")
_SEG = re.compile(r"^decoder\.seg_layers\.(\d+)\.(weight|bias)$")


def _block_set(dst: dict, kind: str, name: str, value: np.ndarray) -> None:
    if kind == "conv":
        dst["w" if name == "weight" else "b"] = _conv_w(value) if name == "weight" else _vec(value)
    else:  # norm
        dst["norm_scale" if name == "weight" else "norm_bias"] = _vec(value)


#: key patterns that are legitimately unconsumed in real checkpoints:
#: the decoder's registered back-reference to the encoder (full duplicate
#: key set), the ConvDropoutNormReLU all_modules Sequential aliases, and
#: norm bookkeeping buffers
_ALIAS_KEYS = re.compile(
    r"^decoder\.encoder\.|\.all_modules\.|num_batches_tracked$"
    r"|\.running_(mean|var)$")


def convert_state_dict(state: Mapping[str, Any], cfg: ArchConfig,
                       strict: bool = False) -> dict:
    """Convert a torch state dict into the boa_tpu U-Net parameter pytree.

    strict=True raises if any key is neither consumed nor a known alias —
    the guard that a real checkpoint's layout is fully understood
    (`predict_from_raw_data.py:83-120` consumption contract).
    """
    enc: dict[int, dict[int, dict]] = defaultdict(lambda: defaultdict(dict))
    enc_res: dict[int, dict[int, dict]] = defaultdict(
        lambda: defaultdict(lambda: {"conv1": {}, "conv2": {}, "skip": {}}))
    stem: dict[int, dict] = defaultdict(dict)
    dec_t: dict[int, dict] = defaultdict(dict)
    dec_c: dict[int, dict[int, dict]] = defaultdict(lambda: defaultdict(dict))
    seg: dict[int, dict] = defaultdict(dict)
    matched = 0
    unconsumed: list[str] = []

    for key, value in state.items():
        m = _ENC_PLAIN.match(key)
        if m and not cfg.residual_encoder:
            s, b, kind, name = int(m[1]), int(m[2]), m[3], m[4]
            _block_set(enc[s][b], kind, name, value)
            matched += 1
            continue
        m = _STEM.match(key)
        if m:
            _block_set(stem[int(m[1])], m[2], m[3], value)
            matched += 1
            continue
        m = _ENC_RES.match(key)
        if m and cfg.residual_encoder:
            s, b, part, sub, name = int(m[1]), int(m[2]), m[3], m[4], m[5]
            blk = enc_res[s][b]
            if part == "skip":
                # skip.0 = conv, skip.1 = norm (nn.Sequential)
                kind = "conv" if sub in ("0", "conv", None) else "norm"
                _block_set(blk["skip"], kind, name, value)
            else:
                kind = sub if sub in ("conv", "norm") else "conv"
                _block_set(blk[part], kind, name, value)
            matched += 1
            continue
        m = _DEC_TRANSP.match(key)
        if m:
            i, name = int(m[1]), m[2]
            if name == "weight":
                dec_t[i]["w"] = _conv_w(value)  # (I,O,k..) -> (k..,O,I)
            else:
                dec_t[i]["b"] = _vec(value)
            matched += 1
            continue
        m = _DEC_CONV.match(key)
        if m:
            i, b, kind, name = int(m[1]), int(m[2]), m[3], m[4]
            _block_set(dec_c[i][b], kind, name, value)
            matched += 1
            continue
        m = _SEG.match(key)
        if m:
            i, name = int(m[1]), m[2]
            if name == "weight":
                seg[i]["w"] = _conv_w(value)
            else:
                seg[i]["b"] = _vec(value)
            matched += 1
            continue
        if not _ALIAS_KEYS.search(key):
            unconsumed.append(key)
        # alias/bookkeeping keys are silently skipped

    params: dict[str, Any] = {"encoder": [], "decoder": [], "seg_heads": []}
    if cfg.residual_encoder:
        if len(stem) > 1:
            # the JAX ResEnc stem is a single conv block; silently keeping
            # only convs.0 would compute a different forward than the
            # checkpoint (its keys were already counted as consumed, so
            # strict mode cannot catch it downstream)
            raise ValueError(
                f"checkpoint stem has {len(stem)} convs; this architecture "
                "supports exactly one stem conv block")
        if stem:
            params["stem"] = stem[0]
        for s in range(cfg.n_stages):
            stage = []
            for b in sorted(enc_res[s]):
                blk = dict(enc_res[s][b])
                if not blk["skip"]:
                    del blk["skip"]
                stage.append(blk)
            params["encoder"].append(stage)
    else:
        for s in range(cfg.n_stages):
            params["encoder"].append([enc[s][b] for b in sorted(enc[s])])

    n_dec = cfg.n_stages - 1
    for i in range(n_dec):
        params["decoder"].append(
            {"transp": dec_t[i], "convs": [dec_c[i][b] for b in sorted(dec_c[i])]})
        params["seg_heads"].append(seg[i])
    if matched == 0:
        raise ValueError("no recognizable nnU-Net keys found in state dict")
    if strict and unconsumed:
        raise ValueError(
            f"{len(unconsumed)} state-dict key(s) not consumed by the "
            f"converter: {unconsumed[:8]}{'...' if len(unconsumed) > 8 else ''}")
    return params


def convert_checkpoint(path: str | Path, cfg: ArchConfig,
                       strict: bool = True) -> dict:
    """File-level conversion; strict by default so a real checkpoint with
    an unrecognized key layout fails loudly instead of silently dropping
    parameters."""
    return convert_state_dict(load_torch_state_dict(path), cfg,
                              strict=strict)


def save_params_npz(params: dict, path: str | Path) -> None:
    """Flatten the pytree to an .npz (portable, no torch needed to reload)."""
    import jax

    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    arrays = {}
    for keypath, leaf in flat:
        name = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in keypath)
        arrays[name] = np.asarray(leaf)
    np.savez_compressed(path, **arrays)


def load_params_npz(path: str | Path, cfg: ArchConfig) -> dict:
    """Rebuild the pytree from an .npz written by save_params_npz."""
    data = np.load(path)

    root: dict[str, Any] = {}
    for name, arr in data.items():
        parts = name.split("/")
        node: Any = root
        for i, p in enumerate(parts[:-1]):
            nxt = parts[i + 1]
            key: Any = int(p) if p.isdigit() else p
            if isinstance(node, dict):
                node = node.setdefault(key, [] if nxt.isdigit() else {})
            else:  # list
                while len(node) <= key:
                    node.append([] if nxt.isdigit() else {})
                node = node[key]
        last = parts[-1]
        lk: Any = int(last) if last.isdigit() else last
        if isinstance(node, dict):
            node[lk] = arr
        else:
            while len(node) <= lk:
                node.append(None)
            node[lk] = arr
    return root
