"""4-bit label-volume packing for tunnel-bound transfers.

Label maps with <16 classes (BCA regions, tissues) move between host and
device as uint8 volumes; on a tunneled TPU the transfer cost is dominated
by the link's compression of the payload, and speckled label data (e.g.
HU-thresholded tissue maps) compresses poorly. Packing two voxels per
byte halves the bytes entering the compressor for ~0.1-0.3 s of
host/device arithmetic.

Packing pairs along axis 0 (the major dim): reshaping (x, y, z) to
(x//2, 2, y, z) splits the major dim, which is free on both numpy and
XLA (no data movement across the minor/lane dims — CLAUDE.md Mosaic
notes)."""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


def _native_lib():
    from boa_tpu import native

    return native.get_lib()


def packable(shape: tuple[int, ...], max_label: int) -> bool:
    return len(shape) >= 1 and shape[0] % 2 == 0 and 0 <= max_label < 16


def pack_host(a: np.ndarray) -> np.ndarray:
    """(x, y, z) uint8 labels < 16 -> (x//2, y, z) packed bytes."""
    lib = _native_lib()
    if lib is not None and hasattr(lib, "boa_pack4_axis0") and \
            a.dtype == np.uint8 and a.flags.c_contiguous and \
            a.shape[0] % 2 == 0:  # match the numpy reshape's odd-dim error
        out = np.empty((a.shape[0] // 2, *a.shape[1:]), np.uint8)
        plane = int(np.prod(a.shape[1:], dtype=np.int64)) if a.ndim > 1 else 1
        lib.boa_pack4_axis0(a.ctypes.data, a.shape[0] // 2, plane,
                            out.ctypes.data)
        return out
    r = a.reshape(a.shape[0] // 2, 2, *a.shape[1:])
    return (r[:, 0] << 4 | r[:, 1]).astype(np.uint8)


def unpack_host(p: np.ndarray) -> np.ndarray:
    """Inverse of pack_host / pack_device."""
    lib = _native_lib()
    out = np.empty((p.shape[0] * 2, *p.shape[1:]), np.uint8)
    if lib is not None and hasattr(lib, "boa_unpack4_axis0") and \
            p.dtype == np.uint8 and p.flags.c_contiguous:
        plane = int(np.prod(p.shape[1:], dtype=np.int64)) if p.ndim > 1 else 1
        lib.boa_unpack4_axis0(p.ctypes.data, p.shape[0], plane,
                              out.ctypes.data)
        return out
    out[0::2] = p >> 4
    out[1::2] = p & 0x0F
    return out


@jax.jit
def pack_device(a: jax.Array) -> jax.Array:
    r = a.astype(jnp.uint8).reshape(a.shape[0] // 2, 2, *a.shape[1:])
    return r[:, 0] << 4 | r[:, 1]


@jax.jit
def unpack_device(p: jax.Array) -> jax.Array:
    hi = p >> 4
    lo = p & 0x0F
    return jnp.stack([hi, lo], axis=1).reshape(p.shape[0] * 2, *p.shape[1:])


def upload_labels(a: np.ndarray, max_label: int | None = None) -> jax.Array:
    """Host->device upload of a label volume, packed when possible; wide
    label counts (>15) ride the XOR-delta codec instead."""
    if max_label is None:
        max_label = int(a.max()) if a.size else 0
    if a.dtype == np.uint8 and packable(a.shape, max_label):
        return unpack_device(jnp.asarray(pack_host(a)))
    if a.dtype == np.uint8:
        return upload_labels_wide(a)
    return jnp.asarray(a)


def download_labels(dev: jax.Array, max_label: int) -> np.ndarray:
    """Device->host download of a label volume, packed when possible; wide
    label counts (>15) ride the XOR-delta codec instead."""
    if dev.dtype == jnp.uint8 and packable(dev.shape, max_label):
        return unpack_host(np.asarray(pack_device(dev)))
    if dev.dtype == jnp.uint8:
        return download_labels_wide(dev)
    return np.asarray(dev)


def bit_packable(shape: tuple[int, ...]) -> bool:
    return len(shape) >= 1 and shape[0] % 8 == 0


# ---- wide-label codec: XOR-delta along the contiguous minor axis ---------
# Label volumes with >15 classes (the 117-class `total` model grid) don't
# fit the 4-bit packer, but they are piecewise-CONSTANT along every axis:
# XOR-ing each voxel with its minor-axis predecessor yields ~97% zero
# bytes, which the tunnel's link compressor moves nearly free. Same byte
# count, ~4-10x less post-compression payload (measured in
# tools/transfer_bench.py). Device side is one elementwise op (encode) or
# a log-depth associative scan (decode); host side is a single-pass C
# kernel (native/transfer.cpp, GIL-released via ctypes).


@jax.jit
def xordelta_enc_device(a: jax.Array) -> jax.Array:
    return jnp.concatenate([a[..., :1], a[..., 1:] ^ a[..., :-1]], axis=-1)


@jax.jit
def xordelta_dec_device(d: jax.Array) -> jax.Array:
    return jax.lax.associative_scan(jnp.bitwise_xor, d, axis=-1)


def xordelta_enc_host(a: np.ndarray) -> np.ndarray:
    a = np.ascontiguousarray(a, dtype=np.uint8)
    lib = _native_lib()
    n = a.shape[-1]
    rows = a.size // max(n, 1)
    if lib is not None and hasattr(lib, "boa_xordelta_enc_u8") and n:
        out = np.empty_like(a)
        lib.boa_xordelta_enc_u8(a.ctypes.data, rows, n, out.ctypes.data)
        return out
    out = a.copy()
    out[..., 1:] ^= a[..., :-1]
    return out


def xordelta_dec_host(d: np.ndarray) -> np.ndarray:
    d = np.ascontiguousarray(d, dtype=np.uint8)
    lib = _native_lib()
    n = d.shape[-1]
    rows = d.size // max(n, 1)
    if lib is not None and hasattr(lib, "boa_xordelta_dec_u8") and n:
        out = np.empty_like(d)
        lib.boa_xordelta_dec_u8(d.ctypes.data, rows, n, out.ctypes.data)
        return out
    return np.bitwise_xor.accumulate(d, axis=-1)


def download_labels_wide(dev: jax.Array) -> np.ndarray:
    """Device->host download of a uint8 label volume with any label count:
    device XOR-delta encode, download the (mostly-zero) delta volume,
    single-pass host decode. BOA_SEG_DOWN_CODEC ∈ {raw, xdelta}.

    Default raw, re-measured honestly in r5 after fixing the bench's
    cached-host-copy artifact (tools/transfer_bench.py time_download:
    np.asarray caches on the jax.Array, so re-downloading the same array
    was free and raw baselines read 0.000 s): 49 MB 117-label model-grid
    seg, raw 1.67 s vs xdelta 2.35 s at normal weather — the device
    encode pass + an extra materialized array cost more than the delta
    form saves. The knob stays for degraded-tunnel sessions, where the
    post-compression byte count dominates."""
    if dev.dtype != jnp.uint8 or \
            os.environ.get("BOA_SEG_DOWN_CODEC", "raw") != "xdelta":
        return np.asarray(dev)
    return xordelta_dec_host(np.asarray(xordelta_enc_device(dev)))


def upload_labels_wide(a: np.ndarray) -> jax.Array:
    """Host->device upload of a uint8 label volume with any label count
    (host XOR-delta encode, device prefix-XOR decode).
    BOA_SEG_UP_CODEC ∈ {raw, xdelta}.

    Default xdelta — the direction asymmetry is measured (honest bench,
    see download_labels_wide): the upload link compresses, and the
    ~97%-zero delta form compresses better still; 49 MB 117-label seg
    uploads raw 0.57 s vs xdelta 0.52 s at normal weather and 2.35 vs
    0.86 s on a degraded tunnel. The host encode is a 0.1-0.3 s native
    single pass; the device decode is a log-depth prefix-XOR scan."""
    if a.dtype != np.uint8 or \
            os.environ.get("BOA_SEG_UP_CODEC", "xdelta") != "xdelta":
        return jnp.asarray(a)
    return xordelta_dec_device(jnp.asarray(xordelta_enc_host(a)))


# ---- CT upload codec ------------------------------------------------------
# The int16 CT volume is the single largest tunnel payload of a study.
# Two lossless transforms (native/transfer.cpp) cut its cost:
#   pack12: HU in [-1024, 3071] fits 12 bits -> 25% fewer raw bytes
#     (plane-separated nibble layout so the link compressor still sees
#     coherent byte planes).
#   delta16: wrapping int16 difference along the contiguous z axis —
#     anatomy is smooth in z, so high bytes become ~0x00/0xFF and the
#     link compressor collapses them; device decode is a log-depth
#     wrapping-add scan.
# Which wins depends on tunnel weather; BOA_CT_CODEC ∈ {raw, pack12,
# delta16} selects (default measured in tools/transfer_bench.py).


@jax.jit
def unpack12_device(p: jax.Array) -> jax.Array:
    """(3k, ...) uint8 byte-planes -> (2k, ...) int16 HU (inverse of
    native boa_pack12_axis0)."""
    r = p.reshape(p.shape[0] // 3, 3, *p.shape[1:]).astype(jnp.int32)
    u0 = (r[:, 0] << 4) | (r[:, 1] >> 4)
    u1 = ((r[:, 1] & 0xF) << 8) | r[:, 2]
    out = jnp.stack([u0, u1], axis=1).reshape(-1, *p.shape[1:])
    return (out - 1024).astype(jnp.int16)


def pack12_host(a: np.ndarray) -> np.ndarray:
    """(2k, ...) int16 in [-1024, 3071] -> (3k, ...) uint8 byte-planes."""
    lib = _native_lib()
    assert a.dtype == np.int16 and a.shape[0] % 2 == 0
    a = np.ascontiguousarray(a)
    plane = int(np.prod(a.shape[1:], dtype=np.int64)) if a.ndim > 1 else 1
    out = np.empty((a.shape[0] // 2 * 3, *a.shape[1:]), np.uint8)
    if lib is not None and hasattr(lib, "boa_pack12_axis0"):
        lib.boa_pack12_axis0(a.ctypes.data, a.shape[0] // 2, plane,
                             out.ctypes.data)
        return out
    r = (a.reshape(a.shape[0] // 2, 2, *a.shape[1:]).astype(np.int32) + 1024)
    u0, u1 = r[:, 0], r[:, 1]
    pr = out.reshape(a.shape[0] // 2, 3, *a.shape[1:])
    pr[:, 0] = u0 >> 4
    pr[:, 1] = ((u0 & 0xF) << 4) | (u1 >> 8)
    pr[:, 2] = u1 & 0xFF
    return out


def pack12_host_checked(a: np.ndarray) -> np.ndarray | None:
    """Single-pass pack + range validation: returns the packed byte planes,
    or None if any value falls outside [-1024, 3071] (caller uploads raw).

    Fuses the gating min/max into the pack so upload paths that never ran
    the CT range check (serve/stream.py, python_api.predict_image) don't
    pay a separate full-volume pass on this 1-core host."""
    lib = _native_lib()
    assert a.dtype == np.int16 and a.shape[0] % 2 == 0
    a = np.ascontiguousarray(a)
    plane = int(np.prod(a.shape[1:], dtype=np.int64)) if a.ndim > 1 else 1
    if lib is not None and hasattr(lib, "boa_pack12_axis0_checked"):
        out = np.empty((a.shape[0] // 2 * 3, *a.shape[1:]), np.uint8)
        ok = lib.boa_pack12_axis0_checked(a.ctypes.data, a.shape[0] // 2,
                                          plane, out.ctypes.data)
        return out if ok else None
    from boa_tpu.ops.connected_components import minmax

    lo, hi = minmax(a)
    if lo < -1024 or hi > 3071:
        return None
    return pack12_host(a)


def unpack12_host(p: np.ndarray) -> np.ndarray:
    lib = _native_lib()
    p = np.ascontiguousarray(p, dtype=np.uint8)
    plane = int(np.prod(p.shape[1:], dtype=np.int64)) if p.ndim > 1 else 1
    out = np.empty((p.shape[0] // 3 * 2, *p.shape[1:]), np.int16)
    if lib is not None and hasattr(lib, "boa_unpack12_axis0"):
        lib.boa_unpack12_axis0(p.ctypes.data, p.shape[0] // 3, plane,
                               out.ctypes.data)
        return out
    r = p.reshape(p.shape[0] // 3, 3, *p.shape[1:]).astype(np.int32)
    o = out.reshape(p.shape[0] // 3, 2, *p.shape[1:])
    o[:, 0] = ((r[:, 0] << 4) | (r[:, 1] >> 4)) - 1024
    o[:, 1] = (((r[:, 1] & 0xF) << 8) | r[:, 2]) - 1024
    return out


@jax.jit
def delta16_dec_device(d: jax.Array) -> jax.Array:
    """Inverse of a wrapping int16 difference along the last axis."""
    return jax.lax.associative_scan(jnp.add, d, axis=-1)


def delta16_enc_host(a: np.ndarray) -> np.ndarray:
    a = np.ascontiguousarray(a, dtype=np.int16)
    out = a.copy()
    # wrapping int16 subtract (numpy wraps on overflow for same-dtype ops)
    np.subtract(a[..., 1:], a[..., :-1], out=out[..., 1:],
                casting="unsafe", dtype=np.int16)
    return out


def upload_ct(a: np.ndarray, known_range: tuple[int, int] | None = None) -> jax.Array:
    """Host->device upload of an int16 CT volume, transform-coded when the
    BOA_CT_CODEC knob and the data allow it. `known_range` skips the
    gating min/max pass when the caller already ran the CT range check
    (compute/inference.py).

    Default pack12: CT noise keeps the link compressor near 1:1, so the
    25% raw-byte cut shows up almost fully in transfer time (measured
    2.63 s vs 3.35 s raw for a 147 MB post-crop volume,
    tools/transfer_bench.py); the host pack pass costs ~40 ms. delta16
    LOST to raw (3.74 s) — the compressor can't use small-magnitude
    int16 deltas as well as pack12's dense nibble planes."""
    codec = os.environ.get("BOA_CT_CODEC", "pack12")
    if a.dtype != np.int16 or codec == "raw":
        return jnp.asarray(a)
    if codec == "delta16":
        return delta16_dec_device(jnp.asarray(delta16_enc_host(a)))
    if codec == "pack12" and a.shape[0] % 2 == 0:
        if known_range is not None:
            # caller already ran the CT range check on THIS buffer
            if known_range[0] >= -1024 and known_range[1] <= 3071:
                return unpack12_device(jnp.asarray(pack12_host(a)))
        else:
            packed = pack12_host_checked(a)  # one fused validate+pack pass
            if packed is not None:
                return unpack12_device(jnp.asarray(packed))
    return jnp.asarray(a)


@jax.jit
def packbits_device(m: jax.Array) -> jax.Array:
    """(x, ...) binary mask -> (x//8, ...) bytes in np.packbits(axis=0)
    layout (MSB = first voxel of each group of 8 along the major dim)."""
    r = (m > 0).astype(jnp.uint8).reshape(m.shape[0] // 8, 8, *m.shape[1:])
    out = r[:, 0]
    for i in range(1, 8):
        out = (out << 1) | r[:, i]
    return out


@jax.jit
def unpackbits_device(p: jax.Array) -> jax.Array:
    """Inverse of np.packbits(axis=0): (x//8, ...) bytes -> (x, ...) {0,1}."""
    bits = [(p >> (7 - i)) & 1 for i in range(8)]
    return jnp.stack(bits, axis=1).reshape(p.shape[0] * 8, *p.shape[1:])


def upload_mask(m: np.ndarray) -> jax.Array:
    """Host->device upload of a binary mask at 1 bit/voxel when the major
    dim allows it. A mostly-zero mask (e.g. the region-postprocess ignore
    fragments) additionally rides the tunnel compressor nearly free."""
    if bit_packable(m.shape):
        packed = np.packbits(np.ascontiguousarray(m) != 0, axis=0)
        return unpackbits_device(jnp.asarray(packed))
    return jnp.asarray((m != 0).astype(np.uint8))


def download_mask(dev: jax.Array) -> np.ndarray:
    """Device->host download of a binary mask at 1 bit/voxel when the
    major dim allows it (8x less tunnel payload than a uint8 volume)."""
    if bit_packable(dev.shape):
        return np.unpackbits(np.asarray(packbits_device(dev)), axis=0)
    return np.asarray((dev > 0).astype(jnp.uint8) if dev.dtype != jnp.uint8
                      else dev)
