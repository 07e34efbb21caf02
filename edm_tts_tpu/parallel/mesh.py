"""Device mesh construction and sharding rules.

Replaces the reference's accelerate/DeepSpeed/NCCL distributed layer
(configs/acc_cfg.yaml, configs/ds_config.json — 8-process DDP and ZeRO-2)
with the TPU-native equivalent: a ``jax.sharding.Mesh`` with ``data`` and
``fsdp`` axes. ``pjit`` emits the XLA collectives (all-reduce over ICI for
gradients; all-gather/reduce-scatter for fsdp-sharded params/optimizer
state). ZeRO-2 == sharding the optimizer state (and optionally params)
along ``fsdp``; plain DDP == fsdp=1.

The ``sequence`` axis (``make_mesh(..., n_seq>1)``) is the context-parallel
ring for ``attn_implementation="ring"`` (ops/ring_attention.py); the
reference has no SP at all — its sequences are <= ~2.5k (SURVEY.md §5).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
FSDP_AXIS = "fsdp"
MODEL_AXIS = "model"  # tensor parallelism (attention heads / FF hidden)
SEQUENCE_AXIS = "sequence"  # ring-attention axis (no SP in the reference)


def make_mesh(
    n_data: int | None = None,
    n_fsdp: int = 1,
    n_model: int = 1,
    devices=None,
    *,
    n_seq: int = 1,
) -> Mesh:
    """Create a (data, fsdp, model[, sequence]) mesh over all (or given)
    devices.

    ``model`` is the tensor-parallel axis and ``sequence`` (present only
    when ``n_seq > 1``) the ring-attention axis — both innermost, so their
    per-step collectives ride the shortest ICI hops. Sizes default to 1,
    which keeps every existing (data, fsdp) PartitionSpec valid unchanged;
    models opt into the ring with ``attn_implementation="ring"``
    (ops/ring_attention.py resolves this mesh from the ``with mesh:``
    context)."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data is None:
        n_data = n // (n_fsdp * n_model * n_seq)
    assert n_data * n_fsdp * n_model * n_seq == n, (
        f"{n_data}x{n_fsdp}x{n_model}x{n_seq} != {n} devices"
    )
    if n_seq > 1:
        dev_array = np.asarray(devices).reshape(n_data, n_fsdp, n_model, n_seq)
        return Mesh(
            dev_array, (DATA_AXIS, FSDP_AXIS, MODEL_AXIS, SEQUENCE_AXIS)
        )
    dev_array = np.asarray(devices).reshape(n_data, n_fsdp, n_model)
    return Mesh(dev_array, (DATA_AXIS, FSDP_AXIS, MODEL_AXIS))


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
            mesh_shape=(data_per_slice, n_fsdp, 1),
            dcn_mesh_shape=(n_slices, 1, 1),
            devices=devices,
        )
    else:
        # virtual/CPU fallback: slice-major order so axis semantics match
        dev_array = np.asarray(devices).reshape(
            n_slices * data_per_slice, n_fsdp, 1
        )
    return Mesh(dev_array, (DATA_AXIS, FSDP_AXIS, MODEL_AXIS))


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


# Megatron-style tensor-parallel rules for the conformer stacks
# (models/conformer/conformer.py). Column-parallel INTO each sublayer (QKV
# projections, FF + conv-module up-projections: output dim sharded over
# ``model``), row-parallel OUT of it (attention output, FF/conv
# down-projections: input dim sharded) — so the only per-sublayer collective
# GSPMD has to insert is one all-reduce of the row-parallel product, exactly
# the classical TP schedule. The reference has no TP at all (8-proc DDP,
# configs/acc_cfg.yaml); this is the pod-scale extension for models whose
# optimizer state outgrows fsdp alone.
#
# Matched on flax param-path suffixes, scoped to conformer blocks
# ("block_<i>/"). kernel shapes are (in, out). The GLU/to_kv halves-split and
# the conv module's cross-channel ChanLayerNorm sit between column- and
# row-parallel matmuls; GSPMD keeps them correct (it reshards around the
# split/reduction), at the price of extra collectives vs a pure Megatron
# block — acceptable because conv params are ~6% of block FLOPs.
_TP_COL = ("attn/to_q/kernel", "attn/to_kv/kernel",
           "ff1/Dense_0/kernel", "ff2/Dense_0/kernel", "conv/pw_in/kernel")
_TP_ROW = ("attn/to_out/kernel",
           "ff1/Dense_1/kernel", "ff2/Dense_1/kernel", "conv/pw_out/kernel")
_TP_CHAN = ("conv/dw_kernel",)  # depthwise (k, 1, channels): shard channels


def _tp_spec_for(path_str: str, x: Any, n_model: int, n_fsdp: int):
    """PartitionSpec for a tensor-parallel param, or None if no rule applies."""
    if "/block_" not in path_str or not hasattr(x, "shape"):
        return None

    def with_fsdp(spec: list, tp_dim: int):
        # layer fsdp onto the other (non-TP) dim when divisible, so ZeRO-2
        # and TP compose: each param is a (fsdp, model) 2-D shard.
        for d in range(len(spec)):
            if d != tp_dim and n_fsdp > 1 and x.shape[d] % n_fsdp == 0:
                spec[d] = FSDP_AXIS
                break
        return P(*spec)

    if path_str.endswith(_TP_COL) and x.shape[-1] % n_model == 0:
        spec = [None] * len(x.shape)
        spec[-1] = MODEL_AXIS
        return with_fsdp(spec, len(x.shape) - 1)
    if path_str.endswith(_TP_ROW) and x.shape[0] % n_model == 0:
        spec = [None] * len(x.shape)
        spec[0] = MODEL_AXIS
        return with_fsdp(spec, 0)
    if path_str.endswith(_TP_CHAN) and x.shape[-1] % n_model == 0:
        spec = [None] * len(x.shape)
        spec[-1] = MODEL_AXIS
        return P(*spec)
    return None


def _path_str(path) -> str:
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def param_shardings(mesh: Mesh, params, min_size: int = 2**16):
    """Pytree of NamedShardings for a parameter pytree.

    fsdp rule everywhere; when the mesh has a ``model`` axis of size > 1,
    conformer-block matmul params additionally get megatron-style tensor
    parallelism (see _tp_spec_for)."""
    n_model = mesh.shape.get(MODEL_AXIS, 1)
    n_fsdp = mesh.shape[FSDP_AXIS]

    def pick(path, x):
        if n_model > 1:
            spec = _tp_spec_for(_path_str(path), x, n_model, n_fsdp)
            if spec is not None:
                return NamedSharding(mesh, spec)
        return fsdp_sharding_for(mesh, x, min_size)

    return jax.tree_util.tree_map_with_path(pick, params)


def shard_pytree(mesh: Mesh, tree, shardings=None):
    """Device-put a pytree with the given (or derived) shardings."""
    if shardings is None:
        shardings = param_shardings(mesh, tree)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), tree, shardings
    )
