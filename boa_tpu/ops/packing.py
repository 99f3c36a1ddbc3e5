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
    """Host->device upload of a label volume, packed when possible."""
    if max_label is None:
        max_label = int(a.max()) if a.size else 0
    if a.dtype == np.uint8 and packable(a.shape, max_label):
        return unpack_device(jnp.asarray(pack_host(a)))
    return jnp.asarray(a)


def download_labels(dev: jax.Array, max_label: int) -> np.ndarray:
    """Device->host download of a label volume, packed when possible."""
    if dev.dtype == jnp.uint8 and packable(dev.shape, max_label):
        return unpack_host(np.asarray(pack_device(dev)))
    return np.asarray(dev)


def bit_packable(shape: tuple[int, ...]) -> bool:
    return len(shape) >= 1 and shape[0] % 8 == 0


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
