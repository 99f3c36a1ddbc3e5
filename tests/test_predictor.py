"""End-to-end predictor parity vs a straight-line replica of the reference
nnUNetPredictor path (torch network + scipy resampling + numpy Gaussian
fusion). Verifies SURVEY §7 step 3-4: Dice/argmax identity on synthetic
models and volumes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
from scipy import ndimage as ndi

from boa_tpu.inference.predictor import Predictor
from boa_tpu.inference.sliding_window import sliding_window_logits, stack_fold_params
from boa_tpu.ops import preprocess as pp
from boa_tpu.plans.plans import synthetic_plans
from boa_tpu.weights.convert import convert_state_dict

from tests.torch_mirror import TorchUNet


def _make_model(plans, seed=0):
    cfg = plans.arch_config()
    torch.manual_seed(seed)
    net = TorchUNet(cfg).eval()
    params = convert_state_dict(net.state_dict(), cfg)
    return net, params


def _ref_sliding_window(nets, vol_c, patch, step):
    """Reference fold-ensemble sliding window (fp32, no mirroring)."""
    padded, revert = pp.pad_to_patch(vol_c, patch)
    starts = pp.tile_starts(padded.shape[-3:], patch, step)
    gauss = pp.gaussian_importance_map(patch)
    acc = None
    for net in nets:
        logits = np.zeros((NUM_CLASSES, *padded.shape[-3:]), np.float32)
        weights = np.zeros(padded.shape[-3:], np.float32)
        for sx, sy, sz in starts:
            tile = padded[:, sx:sx + patch[0], sy:sy + patch[1], sz:sz + patch[2]]
            with torch.no_grad():
                pred = net(torch.from_numpy(tile[None]))[0].numpy()
            logits[:, sx:sx + patch[0], sy:sy + patch[1], sz:sz + patch[2]] += pred * gauss
            weights[sx:sx + patch[0], sy:sy + patch[1], sz:sz + patch[2]] += gauss
        logits /= weights
        acc = logits if acc is None else acc + logits
    acc /= len(nets)
    return acc[(slice(None), *revert)]


NUM_CLASSES = 4
PATCH = (16, 16, 16)


@pytest.fixture(scope="module")
def plans():
    return synthetic_plans(num_classes=NUM_CLASSES, patch_size=PATCH,
                           spacing=(3.0, 3.0, 3.0), features=(8, 16, 32))


def test_sliding_window_matches_reference(plans, rng):
    net1, p1 = _make_model(plans, 0)
    net2, p2 = _make_model(plans, 1)
    vol = rng.normal(size=(1, 24, 20, 18)).astype(np.float32)

    ref = _ref_sliding_window([net1, net2], vol, PATCH, 0.5)

    pred = Predictor(plans=plans, fold_params=[p1, p2], compute_dtype="float32")
    got = np.asarray(pred.predict_logits(vol))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)
    # argmax (the actual segmentation) should be essentially identical
    agree = (got.argmax(0) == ref.argmax(0)).mean()
    assert agree > 0.999


def test_full_predict_pipeline(plans, rng):
    """Raw volume path: crop -> normalize -> resample -> SW -> back -> bbox."""
    net, params = _make_model(plans, 0)
    # CT-like volume with zero margins (exercises crop-to-nonzero)
    vol = np.zeros((40, 36, 30), np.float32)
    inner = rng.normal(size=(30, 28, 22)).astype(np.float32) * 300 + 50
    vol[5:35, 4:32, 3:25] = inner
    spacing = (2.0, 2.0, 7.0)  # anisotropy 3.5 > 3: separate-z path

    pred = Predictor(plans=plans, fold_params=[params], compute_dtype="float32")
    seg = pred.predict(vol, spacing)
    assert seg.shape == vol.shape
    assert seg.dtype == np.uint8

    # reference path in numpy/torch
    bbox = pp.nonzero_bbox(vol)
    cropped = pp.crop_to_bbox(vol, bbox)
    props = plans.intensity_properties
    norm = np.clip(cropped, props["percentile_00_5"], props["percentile_99_5"])
    norm = (norm - props["mean"]) / props["std"]
    new_shape = tuple(
        int(round(s / t * n))
        for s, t, n in zip(spacing, plans.spacing_xyz, cropped.shape))

    def _resize(v, shape, order):
        grids = np.meshgrid(
            *[(np.arange(n) + 0.5) * (o / n) - 0.5 for n, o in zip(shape, v.shape)],
            indexing="ij")
        return ndi.map_coordinates(v.astype(np.float64), np.array(grids), order=order,
                                   mode="nearest", prefilter=order > 1)

    # separate-z: in-plane cubic, z nearest (order 0)
    # map_coordinates order-0 rounding is floor(x + 0.5), not banker's round
    iz = np.clip(np.floor((np.arange(new_shape[2]) + 0.5)
                          * (cropped.shape[2] / new_shape[2])), 0,
                 cropped.shape[2] - 1).astype(int)
    tmp = norm[:, :, iz]
    res = np.stack([_resize(tmp[:, :, k], new_shape[:2], 3) for k in range(len(iz))], -1)

    ref_logits = _ref_sliding_window([net], res[None].astype(np.float32), PATCH, 0.5)
    back = np.stack([
        np.stack([_resize(ref_logits[c][:, :, k], cropped.shape[:2], 1)
                  for k in range(ref_logits.shape[-1])], -1)
        for c in range(NUM_CLASSES)])
    # z back-resample nearest
    izb = np.clip(np.floor((np.arange(cropped.shape[2]) + 0.5)
                           * (ref_logits.shape[-1] / cropped.shape[2])), 0,
                  ref_logits.shape[-1] - 1).astype(int)
    back = back[:, :, :, izb]
    ref_seg = np.zeros_like(seg)
    sl = tuple(slice(b[0], b[1]) for b in bbox)
    ref_seg[sl] = back.argmax(0).astype(np.uint8)

    agree = (seg == ref_seg).mean()
    assert agree > 0.995, f"segmentation agreement {agree}"


def test_mirror_tta_against_torch(plans, rng):
    """Mirror TTA averaging matches the reference flip loop."""
    net, params = _make_model(plans, 0)
    vol = rng.normal(size=(1, 16, 16, 16)).astype(np.float32)
    import itertools

    import jax.numpy as jnp

    x = torch.from_numpy(vol[None])
    with torch.no_grad():
        ref = net(x).numpy()
        axes = [2, 3, 4]
        combos = [c for i in range(3) for c in itertools.combinations(axes, i + 1)]
        for c in combos:
            ref += torch.flip(net(torch.flip(x, c)), c).numpy()
        ref /= len(combos) + 1

    from boa_tpu.inference.sliding_window import _forward_tta

    xj = jnp.asarray(np.transpose(vol, (1, 2, 3, 0))[None])
    got = np.asarray(_forward_tta(params, xj, plans.arch_config(), (0, 1, 2)))
    got = np.transpose(got, (3, 0, 1, 2))[None]
    np.testing.assert_allclose(got, ref[0][None].transpose(1, 0, 2, 3, 4)[0][None]
                               if False else ref, rtol=2e-4, atol=2e-4)


def test_fp16_accumulator_parity(plans, rng):
    """The auto-fp16 accumulator path (large class counts) stays close to
    fp32 accumulation and produces identical argmax segs (SURVEY §7(d))."""
    from boa_tpu.inference.predictor import Predictor

    net, params = _make_model(plans, 0)
    vol = rng.normal(size=(1, 24, 20, 18)).astype(np.float32)
    p32 = Predictor(plans=plans, fold_params=[params],
                    compute_dtype="float32", accum_dtype="float32")
    p16 = Predictor(plans=plans, fold_params=[params],
                    compute_dtype="float32", accum_dtype="float16")
    l32 = np.asarray(p32.predict_logits(vol), np.float32)
    l16 = np.asarray(p16.predict_logits(vol), np.float32)
    # tile-corner voxels carry fp16-subnormal Gaussian weights and underflow
    # in BOTH this and the reference fp16 path; compare the interior
    c = (slice(None), slice(2, -2), slice(2, -2), slice(2, -2))
    scale = np.abs(l32[c]).max() + 1e-6
    assert np.abs(l32[c] - l16[c]).max() / scale < 0.02
    assert (l32[c].argmax(0) == l16[c].argmax(0)).mean() > 0.999


def test_region_based_inference(rng):
    """Sigmoid heads + regions_class_order painting (LabelManager parity)."""
    from boa_tpu.plans.plans import synthetic_plans

    plans = synthetic_plans(num_classes=3, patch_size=PATCH,
                            spacing=(1.0, 1.0, 1.0), features=(4, 8))
    # convert to a region-based dataset: 2 overlapping regions
    plans.dataset["labels"] = {"background": 0, "whole": [1, 2], "core": [2]}
    plans.dataset["regions_class_order"] = [1, 2]
    assert plans.has_regions
    assert plans.num_segmentation_heads == 2

    from boa_tpu.models.unet import init_unet
    from boa_tpu.inference.predictor import Predictor

    params = init_unet(jax.random.PRNGKey(0), plans.arch_config())
    pred = Predictor(plans=plans, fold_params=[params],
                     compute_dtype="float32")
    vol = rng.normal(size=(20, 18, 16)).astype(np.float32) * 200 + 40
    seg = pred.predict(vol, (1.0, 1.0, 1.0))
    assert seg.shape == vol.shape
    assert set(np.unique(seg)) <= {0, 1, 2}
    # painting order: wherever head-1 (core) fires, label must be 2
    dev = pp.ct_normalize(jnp.asarray(vol), plans.intensity_properties)
    logits = np.asarray(pred.predict_logits(dev[None]))
    core = logits[1] > 0
    assert core.any()
    assert (seg[core] == 2).all()


def test_dice_bce_loss(rng):
    import torch

    from boa_tpu.train.losses import dice_bce_loss, soft_dice_loss_sigmoid

    logits = rng.normal(size=(2, 6, 6, 6, 3)).astype(np.float32)
    y = (rng.random((2, 6, 6, 6, 3)) > 0.5).astype(np.float32)
    # perfect prediction -> dice -> -1
    perfect = (y * 2 - 1) * 50.0
    assert float(soft_dice_loss_sigmoid(jnp.asarray(perfect),
                                        jnp.asarray(y))) == \
        pytest.approx(-1.0, abs=1e-3)
    # BCE component matches torch BCEWithLogits
    ours = float(dice_bce_loss(jnp.asarray(logits), jnp.asarray(y),
                               weight_dice=0.0))
    ref = torch.nn.functional.binary_cross_entropy_with_logits(
        torch.from_numpy(logits), torch.from_numpy(y)).item()
    assert ours == pytest.approx(ref, rel=1e-5)


def test_shape_bucketing(plans, rng):
    """Bucketed shapes reuse compiled programs; argmax output matches the
    unbucketed path away from the padded border."""
    from boa_tpu.inference.predictor import Predictor

    net, params = _make_model(plans, 0)
    p0 = Predictor(plans=plans, fold_params=[params], compute_dtype="float32")
    pb = Predictor(plans=plans, fold_params=[params], compute_dtype="float32",
                   bucket=16)
    vol = rng.normal(size=(1, 21, 19, 17)).astype(np.float32)
    lb = np.asarray(pb.predict_logits(vol))
    assert lb.shape[1:] == (21, 19, 17)  # transparent to the caller
    # bucketing == centered zero-pad to the bucket shape, then crop: the
    # bucketed program must produce exactly what the plain path produces
    # on the padded volume
    pads = [(d // 2, d - d // 2) for d in
            (32 - 21, 32 - 19, 32 - 17)]
    volp = np.pad(vol, [(0, 0)] + pads)
    l0p = np.asarray(p0.predict_logits(volp))
    crop = tuple(slice(a, a + n) for (a, _), n in zip(pads, (21, 19, 17)))
    np.testing.assert_allclose(lb, l0p[(slice(None), *crop)],
                               rtol=1e-4, atol=1e-4)
    # two different small volumes land on the SAME padded program shape
    vol2 = rng.normal(size=(1, 24, 22, 20)).astype(np.float32)
    lb2 = pb.predict_logits(vol2)
    assert tuple(lb2.shape[1:]) == (24, 22, 20)


def test_weight_cache(tmp_path, monkeypatch):
    """Device-resident stacked-params cache: hit on repeat load, byte-budget
    eviction, and Predictor(stacked_params=...) producing identical segs."""
    from boa_tpu.inference import predictor as pred_mod
    from boa_tpu.weights.store import ModelStore, create_synthetic_model

    monkeypatch.setattr(pred_mod, "_STACKED_CACHE", type(pred_mod._STACKED_CACHE)())
    for tid, name in [(901, "CacheA"), (902, "CacheB")]:
        create_synthetic_model(tmp_path, tid, name, num_classes=3,
                               patch_size=(16, 16, 16), features=(4, 8),
                               n_folds=1)
    store = ModelStore(tmp_path)

    plans, stacked = pred_mod.load_stacked_cached(store, 901, "nnUNetTrainer",
                                                  "3d_fullres", (0,))
    _, stacked2 = pred_mod.load_stacked_cached(store, 901, "nnUNetTrainer",
                                               "3d_fullres", (0,))
    assert stacked2 is stacked  # cache hit returns the same device pytree

    # folds=None resolves to the available fold list and hits the same entry
    _, stacked3 = pred_mod.load_stacked_cached(store, 901, "nnUNetTrainer",
                                               "3d_fullres", None)
    assert stacked3 is stacked

    # identical predictions from cached stacked params vs fresh fold params
    vol = np.random.default_rng(0).normal(40, 80, (20, 18, 16)).astype(np.int16)
    _, params = store.load(901, folds=(0,))
    seg_fresh = Predictor(plans=plans, fold_params=params).predict(
        vol, (1.5, 1.5, 1.5))
    seg_cached = Predictor(plans=plans, stacked_params=stacked).predict(
        vol, (1.5, 1.5, 1.5))
    np.testing.assert_array_equal(seg_fresh, seg_cached)

    # eviction: shrink the budget below two models -> LRU entry drops
    nbytes = sum(x.nbytes for x in jax.tree.leaves(stacked))
    monkeypatch.setenv("BOA_WEIGHT_CACHE_BYTES", str(int(nbytes * 1.5)))
    pred_mod.load_stacked_cached(store, 902, "nnUNetTrainer", "3d_fullres", (0,))
    keys = [k[1] for k in pred_mod._STACKED_CACHE]
    assert keys == [902]  # 901 evicted, 902 resident


def test_chunked_layout_branches(plans, rng):
    """sliding_window_seg_chunked: the channels-first (big-accumulator)
    branch must match the channels-last fast path exactly."""
    from boa_tpu.inference.sliding_window import sliding_window_seg_chunked
    from boa_tpu.ops import preprocess as pp

    _, params = _make_model(plans)
    stacked = stack_fold_params([params])
    cfg = plans.arch_config()
    patch = plans.patch_size_xyz
    vol = jnp.asarray(rng.normal(0, 1, (1, 24, 20, 18)).astype(np.float32))
    pads = [(0, max(p - n, 0)) for p, n in zip(patch, vol.shape[1:])]
    vol = jnp.pad(vol, [(0, 0)] + pads)
    starts = pp.tile_starts(vol.shape[1:], patch, 0.5)
    gauss = pp.gaussian_importance_map(patch)
    revert = tuple((0, n) for n in (24, 20, 18))

    seg_last = sliding_window_seg_chunked(
        stacked, vol, starts, gauss, cfg, accum_dtype=jnp.float32,
        revert=revert, k=3)
    seg_first = sliding_window_seg_chunked(
        stacked, vol, starts, gauss, cfg, accum_dtype=jnp.float32,
        revert=revert, k=3, accum_budget_bytes=1)  # force channels-first
    np.testing.assert_array_equal(np.asarray(seg_last), np.asarray(seg_first))
    assert seg_last.shape == (24, 20, 18)


def test_chunked_tile_batch_parity(plans, rng):
    """tile_batch=2 (the small-z MXU-fill path, 2 folds, both accumulator
    layouts) produces bit-identical segmentations to tile_batch=1."""
    from boa_tpu.inference.sliding_window import sliding_window_seg_chunked
    from boa_tpu.ops import preprocess as pp

    params = [_make_model(plans, seed=s)[1] for s in (0, 1)]
    stacked = stack_fold_params(params)
    cfg = plans.arch_config()
    patch = plans.patch_size_xyz
    vol = jnp.asarray(rng.normal(0, 1, (1, 24, 20, 18)).astype(np.float32))
    pads = [(0, max(p - n, 0)) for p, n in zip(patch, vol.shape[1:])]
    vol = jnp.pad(vol, [(0, 0)] + pads)
    starts = pp.tile_starts(vol.shape[1:], patch, 0.5)
    gauss = pp.gaussian_importance_map(patch)
    revert = tuple((0, n) for n in (24, 20, 18))

    for budget in (6e9, 1):  # channels-last AND channels-first branches
        ref = sliding_window_seg_chunked(
            stacked, vol, starts, gauss, cfg, accum_dtype=jnp.float32,
            compute_dtype=jnp.float32, revert=revert, k=3,
            accum_budget_bytes=budget)
        got = sliding_window_seg_chunked(
            stacked, vol, starts, gauss, cfg, accum_dtype=jnp.float32,
            compute_dtype=jnp.float32, revert=revert, k=3,
            accum_budget_bytes=budget, tile_batch=2)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_chunked_matches_reference_logits(plans, rng):
    """sliding_window_seg_chunked (the production fused path) == argmax of
    the weight-normalized reference accumulation, with 2 folds and a chunk
    size that forces a padded (masked) last chunk."""
    from boa_tpu.inference.sliding_window import (sliding_window_logits,
                                                  sliding_window_seg_chunked)
    from boa_tpu.ops import preprocess as pp

    params = [_make_model(plans, seed=s)[1] for s in (0, 1)]
    stacked = stack_fold_params(params)
    cfg = plans.arch_config()
    patch = plans.patch_size_xyz
    vol = jnp.asarray(rng.normal(0, 1, (1, 28, 24, 16)).astype(np.float32))
    pads = [(0, max(p - n, 0)) for p, n in zip(patch, vol.shape[1:])]
    vol = jnp.pad(vol, [(0, 0)] + pads)
    starts = pp.tile_starts(vol.shape[1:], patch, 0.5)
    assert len(starts) % 4 != 0  # k=4 exercises the valid-mask padding
    gauss = pp.gaussian_importance_map(patch)

    ref = np.asarray(sliding_window_logits(
        stacked, vol, jnp.asarray(starts), jnp.asarray(gauss), cfg, (),
        jnp.float32, jnp.float32)).argmax(0)
    got = np.asarray(sliding_window_seg_chunked(
        stacked, vol, starts, gauss, cfg, compute_dtype=jnp.float32,
        accum_dtype=jnp.float32, k=4,
        revert=tuple((0, n) for n in vol.shape[1:])))
    np.testing.assert_array_equal(got, ref.astype(got.dtype))


def test_zscore_normalization_path(rng):
    """MR-style models (ZScoreNormalization, totalsegmentator MR tasks):
    the device op matches numpy, and both the fused on-grid path and the
    resampled general path execute the scheme branch."""
    vol = np.abs(rng.normal(400.0, 150.0, (24, 20, 18))).astype(np.float32)
    dev = pp.zscore_normalize(jnp.asarray(vol))
    manual = (vol - vol.mean(dtype=np.float64)) / vol.std(dtype=np.float64)
    np.testing.assert_allclose(np.asarray(dev), manual, rtol=2e-5, atol=2e-5)

    zp = synthetic_plans(num_classes=NUM_CLASSES, patch_size=PATCH,
                         spacing=(3.0, 3.0, 3.0), features=(8, 16, 32))
    conf = zp.plans["configurations"]["3d_fullres"]
    conf["normalization_schemes"] = ["ZScoreNormalization"]
    _, params = _make_model(zp, 0)
    pred = Predictor(plans=zp, fold_params=[params], compute_dtype="float32")
    seg = pred.predict(vol, (3.0, 3.0, 3.0))      # on-grid: fused path
    assert seg.shape == vol.shape
    assert set(np.unique(seg)) <= set(range(NUM_CLASSES))
    seg2 = pred.predict(vol, (2.0, 2.0, 2.0))     # off-grid: general path
    assert seg2.shape == vol.shape


def test_multichannel_predict_parity(rng):
    """Multi-modal (2-channel) prediction: per-channel ZScore normalization
    + fused sliding window match the torch mirror fold ensemble
    (`default_preprocessor.py:85-99` normalizes each channel separately)."""
    plans2 = synthetic_plans(num_classes=NUM_CLASSES, patch_size=PATCH,
                             spacing=(3.0, 3.0, 3.0), features=(8, 16, 32),
                             channels=2,
                             normalization="ZScoreNormalization")
    assert plans2.num_input_channels == 2
    net, params = _make_model(plans2)
    vol = rng.normal(50, 300, size=(2, 20, 18, 16)).astype(np.float32)

    norm = np.stack([(c - c.mean()) / max(c.std(), 1e-8) for c in vol])
    ref_logits = _ref_sliding_window([net], norm, PATCH, 0.5)
    ref_seg = np.argmax(ref_logits, axis=0)

    pred = Predictor(plans=plans2, fold_params=[params],
                     compute_dtype="float32", accum_dtype="float32")
    seg = pred.predict(vol, (3.0, 3.0, 3.0))
    assert (seg == ref_seg).mean() > 0.999

    # general (resampling) path accepts channels too
    seg_rs = pred.predict(vol, (3.0, 3.0, 6.0))
    assert seg_rs.shape == vol.shape[1:]


def test_multichannel_mixed_schemes(rng):
    """Channel 0 CTNormalization + channel 1 ZScore both apply (the plans
    list one scheme per channel)."""
    plans2 = synthetic_plans(num_classes=NUM_CLASSES, patch_size=PATCH,
                             spacing=(3.0, 3.0, 3.0), features=(8, 16, 32),
                             channels=2)
    plans2.conf["normalization_schemes"] = ["CTNormalization",
                                            "ZScoreNormalization"]
    net, params = _make_model(plans2)
    vol = rng.normal(50, 400, size=(2, 20, 18, 16)).astype(np.float32)

    props = plans2.channel_intensity_properties(0)
    c0 = np.clip(vol[0], props["percentile_00_5"], props["percentile_99_5"])
    c0 = (c0 - props["mean"]) / props["std"]
    c1 = (vol[1] - vol[1].mean()) / max(vol[1].std(), 1e-8)
    ref_seg = np.argmax(_ref_sliding_window([net], np.stack([c0, c1]),
                                            PATCH, 0.5), axis=0)

    pred = Predictor(plans=plans2, fold_params=[params],
                     compute_dtype="float32", accum_dtype="float32")
    seg = pred.predict(vol, (3.0, 3.0, 3.0))
    assert (seg == ref_seg).mean() > 0.999


def test_convert_rejects_multi_conv_stem():
    """A ResEnc checkpoint with a 2-conv stem cannot be represented by the
    single-stem-block architecture — must raise, not silently drop."""
    import numpy as np_
    import pytest

    from boa_tpu.models.unet import ArchConfig
    from boa_tpu.weights import convert as cv

    cfg = ArchConfig(n_stages=2, features_per_stage=(8, 16),
                     kernel_sizes=((3, 3, 3), (3, 3, 3)),
                     strides=((1, 1, 1), (2, 2, 2)),
                     n_conv_per_stage=(1, 1), n_conv_per_stage_decoder=(1,),
                     num_classes=2, input_channels=1, residual_encoder=True)
    state = {}
    for i in range(2):  # two stem convs: unrepresentable
        state[f"encoder.stem.convs.{i}.conv.weight"] =             np_.zeros((8, 8 if i else 1, 3, 3, 3), np_.float32)
        state[f"encoder.stem.convs.{i}.conv.bias"] = np_.zeros(8, np_.float32)
        state[f"encoder.stem.convs.{i}.norm.weight"] = np_.ones(8, np_.float32)
        state[f"encoder.stem.convs.{i}.norm.bias"] = np_.zeros(8, np_.float32)
    with pytest.raises(ValueError, match="stem"):
        cv.convert_state_dict(state, cfg)

