"""Primus ViT model, AdamW/warmup optimizer, RTSTRUCT writer, imageio
registry."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from boa_tpu.io import dicom, dicom_io, imageio, nifti, rtstruct
from boa_tpu.models.primus import (PrimusConfig, init_primus,
                                   primus_config, primus_forward)
from boa_tpu.train.optim import (adamw_update, init_adamw_state,
                                 lin_incr_lr, poly_lr_offset)


def _tiny_cfg():
    return PrimusConfig(embed_dim=32, depth=2, num_heads=4,
                        patch_size=(4, 4, 4), num_classes=3)


def test_primus_forward_shapes(rng):
    cfg = _tiny_cfg()
    params = init_primus(jax.random.PRNGKey(0), cfg, grid=(4, 4, 4))
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 16, 1)).astype(np.float32))
    y = primus_forward(params, x, cfg)
    assert y.shape == (2, 16, 16, 16, 3)
    assert np.isfinite(np.asarray(y)).all()
    # pos-embedding resize path: different grid at call time
    x2 = jnp.asarray(rng.normal(size=(1, 8, 16, 8, 1)).astype(np.float32))
    y2 = primus_forward(params, x2, cfg)
    assert y2.shape == (1, 8, 16, 8, 3)


def test_primus_variants():
    for v in ("S", "B", "M", "L"):
        cfg = primus_config(v, num_classes=5)
        assert cfg.embed_dim % cfg.num_heads == 0


def test_primus_gradient_step(rng):
    cfg = _tiny_cfg()
    params = init_primus(jax.random.PRNGKey(0), cfg, grid=(2, 2, 2))
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 8, 1)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 3, size=(1, 8, 8, 8)))

    def loss_fn(p):
        logits = primus_forward(p, x, cfg)
        logp = jax.nn.log_softmax(logits, -1)
        return -jnp.mean(jnp.take_along_axis(logp, y[..., None], -1))

    l0, grads = jax.value_and_grad(loss_fn)(params)
    state = init_adamw_state(params)
    lr = lin_incr_lr(3e-4, 0, 10)
    params2, state = adamw_update(params, grads, state, lr)
    l1 = loss_fn(params2)
    assert np.isfinite(float(l0)) and float(l1) != float(l0)


def test_adamw_matches_torch(rng):
    p0 = rng.normal(size=(6, 5)).astype(np.float32)
    grads = [rng.normal(size=(6, 5)).astype(np.float32) for _ in range(3)]
    tp = torch.nn.Parameter(torch.from_numpy(p0.copy()))
    opt = torch.optim.AdamW([tp], lr=3e-4, betas=(0.9, 0.98),
                            weight_decay=5e-2)
    for g in grads:
        opt.zero_grad()
        tp.grad = torch.from_numpy(g.copy())
        opt.step()
    params = {"w": jnp.asarray(p0)}
    state = init_adamw_state(params)
    for g in grads:
        params, state = adamw_update(params, {"w": jnp.asarray(g)}, state,
                                     3e-4)
    np.testing.assert_allclose(np.asarray(params["w"]), tp.detach().numpy(),
                               rtol=1e-4, atol=1e-6)


def test_warmup_schedules():
    assert float(lin_incr_lr(3e-4, 0, 50)) == pytest.approx(3e-4 / 50)
    assert float(lin_incr_lr(3e-4, 49, 50)) == pytest.approx(3e-4)
    assert float(lin_incr_lr(3e-4, 200, 50)) == pytest.approx(3e-4)
    assert float(poly_lr_offset(1e-2, 50, 1000, offset=50)) == \
        pytest.approx(1e-2)
    assert float(poly_lr_offset(1e-2, 525, 1000, offset=50)) == \
        pytest.approx(1e-2 * 0.5 ** 0.9)


# ------------------------------------------------------------------ rtstruct
def test_rtstruct_roundtrip(tmp_path, rng):
    data = np.zeros((32, 28, 8), np.int16)
    img = nifti.NiftiImage(data=data, affine=np.diag([-0.8, -0.8, 2.0, 1.0]))
    files = dicom_io.write_ct_series(img, tmp_path / "dcm")
    headers = [dicom.dcmread(f, stop_before_pixels=True) for f in files]
    seg = np.zeros((32, 28, 8), np.uint8)
    seg[5:15, 6:16, 2:6] = 1
    ds = rtstruct.write_rtstruct(seg, {1: "liver"}, headers,
                                 colors={1: (255, 0, 0)})
    assert ds.Modality == "RTSTRUCT"
    assert ds.StructureSetROISequence[0].ROIName == "liver"
    contours = ds.ROIContourSequence[0].ContourSequence
    assert len(contours) == 4  # slices 2..5
    assert contours[0].ContourGeometricType == "CLOSED_PLANAR"
    # contour points lie on the slice plane and inside the mask bbox (LPS)
    pts = np.asarray(contours[0].ContourData).reshape(-1, 3)
    assert np.allclose(pts[:, 2], headers[2].ImagePositionPatient[2])
    p = tmp_path / "rt.dcm"
    dicom.dcmwrite(p, ds)
    back = dicom.dcmread(p)
    assert back.StructureSetROISequence[0].ROIName == "liver"
    assert len(back.ROIContourSequence[0].ContourSequence) == 4


# ------------------------------------------------------------------ imageio
def test_imageio_registry(tmp_path, rng):
    data = rng.integers(-500, 500, (10, 12, 8)).astype(np.int16)
    img = nifti.NiftiImage(data=data, affine=np.diag([1.0, 1.0, 2.0, 1.0]))
    # nifti
    imageio.write_image(img, tmp_path / "a.nii.gz")
    back = imageio.read_image(tmp_path / "a.nii.gz")
    np.testing.assert_array_equal(np.asarray(back.data), data)
    # npz
    imageio.write_image(img, tmp_path / "a.npz")
    back2 = imageio.read_image(tmp_path / "a.npz")
    np.testing.assert_array_equal(np.asarray(back2.data), data)
    np.testing.assert_allclose(back2.affine, img.affine)
    # dicom dir
    imageio.write_image(img, tmp_path / "dcmdir")
    back3 = imageio.read_image(tmp_path / "dcmdir")
    np.testing.assert_array_equal(np.asarray(back3.data), data)
    with pytest.raises(ValueError):
        imageio.io_for_path(tmp_path / "x.txt")
