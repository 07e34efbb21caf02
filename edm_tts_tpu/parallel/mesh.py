"""Device mesh construction and sharding rules.

Replaces the reference's accelerate/DeepSpeed/NCCL distributed layer
(configs/acc_cfg.yaml, configs/ds_config.json — 8-process DDP and ZeRO-2)
with the TPU-native equivalent: a ``jax.sharding.Mesh`` with ``data`` and
``fsdp`` axes. ``pjit`` emits the XLA collectives (all-reduce over ICI for
gradients; all-gather/reduce-scatter for fsdp-sharded params/optimizer
state). ZeRO-2 == sharding the optimizer state (and optionally params)
along ``fsdp``; plain DDP == fsdp=1.

A ``sequence`` axis name is reserved for future context parallelism (the
reference has none and sequences are <= ~2.5k; see SURVEY.md §5).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
FSDP_AXIS = "fsdp"
SEQUENCE_AXIS = "sequence"  # reserved, unused (parity: no SP in reference)


def make_mesh(
    n_data: int | None = None, n_fsdp: int = 1, devices=None
) -> Mesh:
    """Create a (data, fsdp) mesh over all (or given) devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data is None:
        n_data = n // n_fsdp
    assert n_data * n_fsdp == n, f"{n_data}x{n_fsdp} != {n} devices"
    dev_array = np.asarray(devices).reshape(n_data, n_fsdp)
    return Mesh(dev_array, (DATA_AXIS, FSDP_AXIS))


def make_hybrid_mesh(
    n_slices: int, n_fsdp: int = 1, devices=None
) -> Mesh:
    """(data, fsdp) mesh laid out for a multi-slice pod (ICI within a slice,
    DCN across slices).

    The fsdp axis — whose all-gather/reduce-scatter collectives are
    latency-critical (they sit on the forward/backward critical path) — is
    kept entirely within a slice so it rides ICI; the data axis spans
    slices, so the once-per-step gradient all-reduce is the only collective
    crossing DCN, and XLA lowers it hierarchically (reduce inside each
    slice over ICI, then across slices over DCN) given the device order
    from ``mesh_utils.create_hybrid_device_mesh``.

    Falls back to a plain slice-major reshape when devices carry no slice
    topology (CPU/virtual meshes in tests), preserving the same axis
    semantics. The reference has no multi-node story at all (single node,
    8 procs — configs/acc_cfg.yaml); this is the pod-scale extension.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    assert n % n_slices == 0, f"{n} devices not divisible by {n_slices} slices"
    per_slice = n // n_slices
    assert per_slice % n_fsdp == 0, (
        f"fsdp={n_fsdp} must divide the {per_slice} devices of one slice"
    )
    data_per_slice = per_slice // n_fsdp
    if n_slices > 1 and getattr(devices[0], "slice_index", None) is not None:
        dev_array = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(data_per_slice, n_fsdp),
            dcn_mesh_shape=(n_slices, 1),
            devices=devices,
        )
    else:
        # virtual/CPU fallback: slice-major order so axis semantics match
        dev_array = np.asarray(devices).reshape(
            n_slices * data_per_slice, n_fsdp
        )
    return Mesh(dev_array, (DATA_AXIS, FSDP_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis, replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def fsdp_sharding_for(mesh: Mesh, x: Any, min_size: int = 2**16) -> NamedSharding:
    """Pick an fsdp sharding for one param: shard the largest dim divisible
    by the fsdp axis size; replicate small params."""
    n_fsdp = mesh.shape[FSDP_AXIS]
    if n_fsdp == 1 or not hasattr(x, "shape") or x.size < min_size:
        return replicated(mesh)
    dims = sorted(
        range(len(x.shape)), key=lambda d: x.shape[d], reverse=True
    )
    for d in dims:
        if x.shape[d] % n_fsdp == 0:
            spec = [None] * len(x.shape)
            spec[d] = FSDP_AXIS
            return NamedSharding(mesh, P(*spec))
    return replicated(mesh)


def param_shardings(mesh: Mesh, params, min_size: int = 2**16):
    """Pytree of NamedShardings for a parameter pytree (fsdp rule)."""
    return jax.tree_util.tree_map(
        lambda x: fsdp_sharding_for(mesh, x, min_size), params
    )


def shard_pytree(mesh: Mesh, tree, shardings=None):
    """Device-put a pytree with the given (or derived) shardings."""
    if shardings is None:
        shardings = param_shardings(mesh, tree)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), tree, shardings
    )
