"""Weights download path over a localhost HTTP server.

Exercises the zero-egress-untestable half of the weights manager
(`totalsegmentator/libs.py:120-220` download_url_and_unpack parity):
download -> unzip -> in-place checkpoint pre-conversion -> ModelStore
load -> forward.
"""

import http.server
import json
import threading
import zipfile

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _serve_dir(directory):
    handler = lambda *a, **k: http.server.SimpleHTTPRequestHandler(  # noqa: E731
        *a, directory=str(directory), **k)
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, f"http://127.0.0.1:{srv.server_address[1]}"


def test_download_unzip_preconvert_and_serve(tmp_path, monkeypatch):
    from boa_tpu.weights import manager
    from boa_tpu.weights.store import ModelStore
    from tests.torch_mirror import TorchUNet, full_checkpoint, \
        real_format_plans
    from boa_tpu.models.unet import ArchConfig

    cfg = ArchConfig(
        n_stages=2, features_per_stage=(4, 8), kernel_sizes=((3, 3, 3),) * 2,
        strides=((1, 1, 1), (2, 2, 2)), n_conv_per_stage=(2, 2),
        n_conv_per_stage_decoder=(2,), num_classes=3, input_channels=1)
    torch.manual_seed(0)
    net = TorchUNet(cfg).eval()

    # build the release layout: DatasetXXX_Name/trainer__plans__model/fold_0
    src = tmp_path / "release" / "Dataset901_Toy"
    mdir = src / "nnUNetTrainer__nnUNetPlans__3d_fullres"
    (mdir / "fold_0").mkdir(parents=True)
    (mdir / "plans.json").write_text(json.dumps(
        real_format_plans(cfg, patch=(16, 16, 16),
                          dataset_name="Dataset901_Toy")))
    (mdir / "dataset.json").write_text(json.dumps({
        "channel_names": {"0": "CT"},
        "labels": {"background": 0, "a": 1, "b": 2},
        "numTraining": 4, "file_ending": ".nii.gz"}))
    torch.save(full_checkpoint(net), mdir / "fold_0" / "checkpoint_final.pth")

    zpath = tmp_path / "release" / "Dataset901_Toy.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        for p in sorted(src.rglob("*")):
            if p.is_file():
                z.write(p, p.relative_to(src.parent))

    srv, base = _serve_dir(tmp_path / "release")
    try:
        monkeypatch.setitem(manager.WEIGHT_URLS, 901,
                            ("Dataset901_Toy", f"{base}/Dataset901_Toy.zip"))
        root = tmp_path / "weights"
        target = manager.download_task_weights(901, root=root)
        assert target == root / "Dataset901_Toy"
        # pre-conversion produced the npz in place
        npz = target / "nnUNetTrainer__nnUNetPlans__3d_fullres" / \
            "fold_0" / "checkpoint_final.npz"
        assert npz.exists()
        # idempotent second call: already present, no re-download
        assert manager.download_task_weights(901, root=root) == target

        plans, params = ModelStore(root).load(901, folds=(0,))
        assert plans.patch_size_xyz == (16, 16, 16)
        # converted weights reproduce the torch forward
        from boa_tpu.models.unet import unet_forward

        x = np.random.default_rng(1).normal(
            size=(16, 16, 16, 1)).astype(np.float32)
        with torch.no_grad():
            ref = net(torch.from_numpy(
                np.transpose(x, (3, 0, 1, 2))[None])).numpy()[0]
        out = np.transpose(np.asarray(
            unet_forward(params[0], x[None], plans.arch_config()))[0],
            (3, 0, 1, 2))
        np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)
    finally:
        srv.shutdown()
