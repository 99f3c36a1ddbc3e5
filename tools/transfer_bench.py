"""Tunnel-transfer codec shootout on the real TPU.

Measures, at post-body-crop full-res production scale with REALISTIC
payloads (anatomy phantom CT, realistic 117-class fake-total labels):

  upload (int16 CT):   raw vs pack12 vs delta16      (ops/packing.upload_ct)
  download (u8 seg):   raw vs xdelta                 (download_labels_wide)
  upload (u8 seg):     raw vs xdelta                 (upload_labels_wide)

The tunnel compressor makes payload *entropy* matter as much as byte
count, so synthetic noise would mis-rank the codecs — this uses the same
phantom/labels as tools/e2e_bench.py. Timings include the host-side codec
pass (that's the honest cost on this 1-core host). Compare medians; the
tunnel varies ±2x between sessions, so in-session ranking is what counts.

Run from the repo root: python tools/transfer_bench.py [--reps 5]
"""
import argparse
import json
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def _sync(dev) -> None:
    import jax.numpy as jnp

    float(jnp.sum(dev.astype(jnp.float32).ravel()[::8192]))


def time_upload(fn, host_arr, reps):
    import jax

    ts = []
    dev = fn(host_arr)  # warmup: compile the decode program
    _sync(dev)
    for _ in range(reps):
        t0 = time.perf_counter()
        dev = fn(host_arr)
        _sync(dev)
        ts.append(time.perf_counter() - t0)
        del dev
    return ts


def time_download(fn, make_dev, reps):
    """`make_dev(i)` must return a FRESH device array per rep: np.asarray
    caches the host copy on the jax.Array instance, so re-downloading the
    same array is free after the first pull — the warmup+reuse version of
    this helper reported 0.000 s raw downloads and mis-calibrated the
    codec defaults (r5 session 1)."""
    ts = []
    out = fn(make_dev(0))  # warmup: compile the encode program
    for i in range(1, reps + 1):
        d = make_dev(i)
        _sync(d)
        t0 = time.perf_counter()
        out = fn(d)
        ts.append(time.perf_counter() - t0)
    return ts, out


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--slices", type=int, default=600)
    args = ap.parse_args()

    import jax.numpy as jnp

    from boa_tpu.ops import packing
    from boa_tpu.testing import anatomy

    # post-crop full-res canonical CT: ~384x320 in-plane after body crop
    print("building realistic payloads...", flush=True)
    ct_full = anatomy.synth_ct(shape=(512, 512, args.slices),
                               spacing=(1.5, 1.5, 1.0))
    ct = np.ascontiguousarray(ct_full[80:464, 104:424])  # 384x320
    fake = anatomy.fake_predict_factory()
    seg_full = np.asarray(
        fake(ct_full.astype(np.int32), (1.5, 1.5, 1.5), -1)).astype(np.uint8)
    seg = np.ascontiguousarray(
        seg_full[80:464, 104:424, : args.slices * 2 // 3])  # 1.5mm z grid
    print(f"CT {ct.shape} int16 = {ct.nbytes/1e6:.0f} MB; "
          f"seg {seg.shape} u8 = {seg.nbytes/1e6:.0f} MB, "
          f"{int(seg.max())} max label", flush=True)

    results = {}

    # ---- CT upload ----
    for codec in ("raw", "pack12", "delta16"):
        import os

        os.environ["BOA_CT_CODEC"] = codec
        ts = time_upload(lambda a: packing.upload_ct(a), ct, args.reps)
        results[f"upload_ct[{codec}]"] = ts
        print(f"upload_ct[{codec}]: med {statistics.median(ts):.3f}s  "
              f"{[round(t, 3) for t in ts]}", flush=True)

    # host codec pass cost alone
    t0 = time.perf_counter(); packing.pack12_host(ct)
    print(f"  pack12_host pass: {time.perf_counter()-t0:.3f}s", flush=True)
    t0 = time.perf_counter(); packing.delta16_enc_host(ct)
    print(f"  delta16_enc_host pass: {time.perf_counter()-t0:.3f}s", flush=True)

    # ---- seg download ----
    # force a DEVICE-computed buffer: an array uploaded with jnp.asarray
    # keeps an aliased host copy on this backend, making np.asarray free
    # and the raw-download baseline a lie
    import jax

    seg_base = jnp.asarray(seg)
    roll = jax.jit(lambda x, s: jnp.roll(x, s, axis=2))

    def make_dev(i):  # fresh device-computed buffer per rep (see helper)
        return roll(seg_base, i + 1)

    for codec, fn in (("raw", lambda d: np.asarray(d)),
                      ("xdelta", lambda d: packing.xordelta_dec_host(
                          np.asarray(packing.xordelta_enc_device(d))))):
        ts, out = time_download(fn, make_dev, args.reps)
        assert np.array_equal(out, np.roll(seg, args.reps + 1, axis=2)), codec
        results[f"download_seg[{codec}]"] = ts
        print(f"download_seg[{codec}]: med {statistics.median(ts):.3f}s  "
              f"{[round(t, 3) for t in ts]}", flush=True)

    # ---- seg upload (fake-total path) ----
    for codec, fn in (("raw", lambda a: jnp.asarray(a)),
                      ("xdelta", lambda a: packing.xordelta_dec_device(
                          jnp.asarray(packing.xordelta_enc_host(a))))):
        ts = time_upload(fn, seg, args.reps)
        results[f"upload_seg[{codec}]"] = ts
        print(f"upload_seg[{codec}]: med {statistics.median(ts):.3f}s  "
              f"{[round(t, 3) for t in ts]}", flush=True)

    t0 = time.perf_counter(); packing.xordelta_dec_host(
        packing.xordelta_enc_host(seg))
    print(f"  xordelta host enc+dec pass: {time.perf_counter()-t0:.3f}s",
          flush=True)

    print(json.dumps({k: round(statistics.median(v), 3)
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()
