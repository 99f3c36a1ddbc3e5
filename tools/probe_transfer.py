"""Microbench: attribute full-res e2e hot spans to concrete transfer ops.

Findings (2026-08-19, TPU v5e through the tunnel):
  - download_labels (512,512,400) u8 117-label realistic seg: 4.2 s first,
    ~0 s repeats (the tunnel dedupes identical buffers).
  - device nearest 400->600 + orientation, synced: 40-50 ms warm.
  - host nearest+orient of the same: 0.19 s warm.
  - see CT upload section: raw int16 vs byte-split (hi/lo planes).
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from boa_tpu.ops import resample as rs
from boa_tpu.testing import anatomy

print("devices:", jax.devices(), flush=True)


def t(label, fn, n=3):
    best = []
    for _ in range(n):
        t0 = time.perf_counter()
        r = fn()
        dt = time.perf_counter() - t0
        best.append(dt)
        del r
    print(f"{label}: {min(best):.3f}s (runs: {[f'{x:.3f}' for x in best]})",
          flush=True)


# CT upload raw vs split.  Fresh noise per run so the tunnel's buffer
# dedupe cannot serve a cached copy.
rng = np.random.default_rng(1)
base = anatomy.synth_ct((512, 512, 600), (1.5, 1.5, 1.0))


def up_raw():
    ct = base + rng.integers(-2, 3, base.shape, dtype=np.int16)
    d = jnp.asarray(ct)
    return float(jnp.sum(d.astype(jnp.float32)[::64, ::64, ::64]))


t("CT int16 600sl raw upload", up_raw, n=3)


def up_split():
    ct = base + rng.integers(-2, 3, base.shape, dtype=np.int16)
    u = ct.view(np.uint16)
    lo = (u & 0xFF).astype(np.uint8)
    hi = (u >> 8).astype(np.uint8)
    dlo = jnp.asarray(lo)
    dhi = jnp.asarray(hi)
    d = ((dhi.astype(jnp.uint16) << 8) | dlo.astype(jnp.uint16)).astype(jnp.int16)
    return float(jnp.sum(d.astype(jnp.float32)[::64, ::64, ::64]))


t("CT int16 600sl byte-split upload", up_split, n=3)

# host split cost alone
def split_host():
    u = base.view(np.uint16)
    lo = (u & 0xFF).astype(np.uint8)
    hi = (u >> 8).astype(np.uint8)
    return lo, hi


t("host byte-split pass", split_host)

# device cubic z-resamples (BCA 5 mm grid and total 1.5 mm grid)
ct_dev = jnp.asarray(base)
float(jnp.sum(ct_dev.astype(jnp.float32)[::64, ::64, ::64]))


def rsp(target):
    out_shape, zoom, sp = rs.change_spacing_shape(
        (512, 512, 600), (1.5, 1.5, 1.0), target)
    r = rs.resample_volume(ct_dev, out_shape, order=3,
                           convention="zoom").astype(jnp.int32)
    return float(jnp.sum(r.astype(jnp.float32)[::16, ::16, ::16]))


t("device cubic z 600->120 (BCA grid)", lambda: rsp((1.5, 1.5, 5.0)))
t("device cubic z 600->400 (total grid)", lambda: rsp((1.5, 1.5, 1.5)))
print("done", flush=True)
