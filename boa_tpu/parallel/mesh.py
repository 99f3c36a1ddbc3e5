"""Mesh construction and sharding rules for the U-Net model family.

Axes:
  dp — data parallel: batch axis of the training step / study stream.
       Equivalent of the reference's DDP rank split
       (`nnUNetTrainer.py:346-390` splits global batch across ranks).
  sp — spatial parallel: the z spatial axis of activations. GSPMD
       partitions convolutions spatially and inserts halo exchanges —
       the compiler-native version of the reference's manual z triple
       split + 20-slice margin (`totalsegmentator/nnunet.py:483-505`).
  tp — tensor parallel: output-channel axis of conv kernels / norm
       params. No analogue in the reference (NCCL DDP only); on TPU it
       rides ICI all-reduces after each channel-sharded conv.

All rules are plain NamedSharding pytrees usable as `in_shardings` of a
jitted train/infer step; laying dp outermost keeps its collectives on the
densest ICI dimension of a pod slice.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None,
              axes: Sequence[str] = ("dp", "sp", "tp"),
              shape: Sequence[int] | None = None) -> Mesh:
    """Build a mesh over the first `n_devices` devices.

    Default factorization puts all devices on dp and leaves sp/tp
    singleton; pass `shape` for real model sharding, e.g. (2, 2, 2) on 8
    chips.
    """
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    devs = devs[:n_devices]
    if shape is None:
        shape = [n_devices] + [1] * (len(axes) - 1)
    if math.prod(shape) != n_devices:
        raise ValueError(f"mesh shape {shape} != {n_devices} devices")
    return Mesh(np.asarray(devs).reshape(shape), tuple(axes))


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """Multi-host entry: `jax.distributed.initialize` (SURVEY §5 —
    the TPU-native replacement for the reference's NCCL
    `init_process_group`, `run/run_training.py:101-113`). On Cloud TPU
    pods the arguments are auto-detected; pass them explicitly for
    manual (e.g. CPU-simulated) multi-process runs. Safe to call twice.
    """
    import jax

    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError as e:  # already initialized
        if "already" not in str(e).lower():
            raise


def make_multihost_mesh(axes: Sequence[str] = ("dp", "sp", "tp"),
                        ici_shape: Sequence[int] | None = None,
                        n_hosts: int | None = None) -> Mesh:
    """Mesh over all global devices with hosts on the OUTER dp axis.

    Data-parallel gradient all-reduces ride DCN between hosts while
    sp/tp collectives stay on intra-host ICI — the layout the scaling
    recipe prescribes for multi-slice training. `n_hosts` can override
    `jax.process_count()` to simulate a multi-host layout on a single
    process's virtual devices (tests).
    """
    import jax

    devices = jax.devices()  # sorted process-major by construction
    n_hosts = n_hosts or jax.process_count()
    if len(devices) % n_hosts:
        raise ValueError(f"{len(devices)} devices not divisible by "
                         f"{n_hosts} hosts")
    per_host = len(devices) // n_hosts
    if ici_shape is None:
        dpl, sp, tp = default_mesh_shape(per_host)
        ici_shape = (dpl, sp, tp)
    if math.prod(ici_shape) != per_host:
        raise ValueError(f"ici shape {ici_shape} != {per_host} local devices")
    arr = np.asarray(devices).reshape((n_hosts, *ici_shape))
    # merge the host axis into the local dp axis: dp strides across hosts
    arr = arr.reshape((n_hosts * ici_shape[0], *ici_shape[1:]))
    return Mesh(arr, tuple(axes))


def default_mesh_shape(n_devices: int) -> tuple[int, int, int]:
    """(dp, sp, tp) factorization: prefer tp=2 then sp=2, rest on dp."""
    tp = 2 if n_devices % 2 == 0 else 1
    rem = n_devices // tp
    sp = 2 if rem % 2 == 0 and rem >= 2 else 1
    dp = rem // sp
    return dp, sp, tp


def batch_sharding(mesh: Mesh, spatial_axis: int | None = 3) -> NamedSharding:
    """(N, X, Y, Z, C) activations: batch over dp, z over sp."""
    spec = [None] * 5
    spec[0] = "dp"
    if spatial_axis is not None and "sp" in mesh.axis_names:
        spec[spatial_axis] = "sp"
    return NamedSharding(mesh, P(*spec))


def label_sharding(mesh: Mesh, spatial_axis: int | None = 3) -> NamedSharding:
    """(N, X, Y, Z) integer targets: batch over dp, z over sp."""
    spec = [None] * 4
    spec[0] = "dp"
    if spatial_axis is not None and "sp" in mesh.axis_names:
        spec[spatial_axis] = "sp"
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _param_spec(path: tuple, leaf, tp_size: int) -> P:
    """tp-shard the output-channel axis of conv kernels and the channel
    axis of norm scale/bias when divisible; replicate otherwise.

    Kernel layouts: conv XYZIO (O last), transpconv XYZOI is stored as
    XYZIO too in our init (see models/unet.py `_init_conv`) — the last
    axis is always the 'features out' axis.
    """
    shape = leaf.shape
    if tp_size <= 1 or not shape:
        return P()
    if shape[-1] % tp_size != 0:
        return P()
    # seg heads must stay replicated: their output axis is classes
    names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    if "seg_heads" in names or "seg_head" in names:
        return P()
    return P(*([None] * (len(shape) - 1) + ["tp"]))


def param_shardings(mesh: Mesh, params) -> object:
    """NamedSharding pytree for a U-Net parameter pytree."""
    tp_size = mesh.shape.get("tp", 1)
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _param_spec(path, leaf, tp_size)),
        params)


def spatial_sharding(mesh: Mesh, ndim: int, axis: int) -> NamedSharding:
    """Shard one spatial axis of an inference volume over sp (halo-exchange
    sharding for >HBM volumes, replacing the reference z-split)."""
    spec = [None] * ndim
    if "sp" in mesh.axis_names:
        spec[axis] = "sp"
    return NamedSharding(mesh, P(*spec))
