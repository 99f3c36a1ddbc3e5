import numpy as np

from boa_tpu.measure.statistics import get_basic_statistics, quantile_from_hist


def _naive_stats(seg, ct, spacing, cmap, metric="mean"):
    vox = float(np.prod(spacing))
    ct = ct.astype(np.int16)
    out = {}
    for k, name in cmap.items():
        m = seg == k
        touches = (m[:3].any() or m[-3:].any() or m[:, :3].any() or m[:, -3:].any()
                   or m[:, :, :3].any() or m[:, :, -3:].any())
        if touches:
            out[name] = {"volume": 0.0, "intensity": 0.0}
        elif m.sum() == 0:
            out[name] = {"volume": 0.0, "intensity": 0.0}
        else:
            inten = ct[m].mean() if metric == "mean" else np.median(ct[m])
            out[name] = {"volume": float(m.sum() * vox),
                         "intensity": float(np.round(inten, 5))}
    return out


def test_basic_statistics_matches_naive(rng):
    seg = np.zeros((30, 28, 26), np.uint8)
    seg[8:14, 8:14, 8:14] = 1
    seg[16:22, 10:20, 6:12] = 2
    seg[0:5, 0:5, 0:5] = 3  # touches border -> excluded
    ct = rng.integers(-1000, 1500, size=seg.shape).astype(np.int16)
    cmap = {1: "spleen", 2: "liver", 3: "edge_organ", 4: "absent"}
    spacing = (1.5, 1.5, 3.0)
    for metric in ["mean", "median"]:
        got = get_basic_statistics(seg, ct, spacing, cmap, metric=metric)
        ref = _naive_stats(seg, ct, spacing, cmap, metric=metric)
        for name in cmap.values():
            assert got[name]["volume"] == ref[name]["volume"], name
            np.testing.assert_allclose(got[name]["intensity"],
                                       ref[name]["intensity"], atol=1e-3)


def test_quantiles_from_hist_exact(rng):
    vals = rng.integers(-500, 500, size=1000).astype(np.int32)
    hist = np.zeros((1, 4096))
    for v in vals:
        hist[0, v + 1024] += 1
    for q in [0.25, 0.5, 0.75]:
        got = quantile_from_hist(hist, q)[0]
        ref = np.quantile(vals, q)
        np.testing.assert_allclose(got, ref, atol=1e-9)
