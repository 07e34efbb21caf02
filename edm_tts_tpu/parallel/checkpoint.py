"""Checkpoint save/restore (orbax) with training metadata.

Replaces the reference's two checkpoint mechanisms
(SURVEY.md §5 / gan_trainer.py:12-26,104-106,270-280 and the HF Trainer's
``checkpoint-*`` dirs with ``save_total_limit`` + resume precedence,
run_semantic_to_acoustic_training.py:211-220):

- full train-state checkpoints every N steps under
  ``<output_dir>/checkpoint_<step>`` with metadata (epoch, step,
  best_val_loss), bounded by ``save_total_limit``;
- best-model export (params + config json) — the ``save_pretrained``
  equivalent;
- ``detect_last_checkpoint`` resume autodetection with the same precedence
  (explicit resume path > latest checkpoint).

Orbax handles sharded arrays natively, so the same code path restores onto
any mesh (preemption-safe resume on pods).
"""

from __future__ import annotations

import json
import os
import re
from typing import Any

import jax
import orbax.checkpoint as ocp

CHECKPOINT_PREFIX = "checkpoint_"


def _to_host(tree: Any) -> Any:
    """Pull a pytree to host numpy before handing it to orbax.

    Orbax's async per-array device->host copies can DEADLOCK on the axon
    TPU backend at real state sizes (observed live: a 464M-param s2a
    train-state save wedged forever at step 800 — the plugin does not
    implement the synchronization its awaits rely on; CLAUDE.md documents
    the same gap for ``block_until_ready``). ``jax.device_get`` is the one
    D2H primitive known-good on this backend; after it, orbax is purely
    disk-bound. On CPU backends the pull is (near) zero-copy, so tests and
    exports pay nothing."""
    return jax.device_get(tree)


class CheckpointManager:
    """Step-indexed train-state checkpoints with metadata and retention."""

    def __init__(self, directory: str, save_total_limit: int | None = 2):
        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        self._mngr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=save_total_limit,
                step_prefix=CHECKPOINT_PREFIX.rstrip("_"),
                create=True,
            ),
        )

    def save(self, step: int, state: Any, metadata: dict | None = None) -> None:
        args = {"state": ocp.args.StandardSave(_to_host(state))}
        if metadata is not None:
            args["metadata"] = ocp.args.JsonSave(metadata)
        self._mngr.save(step, args=ocp.args.Composite(**args))
        self._mngr.wait_until_finished()

    def restore(
        self, step: int | None = None, template: Any | None = None
    ) -> tuple[Any, dict]:
        step = step if step is not None else self._mngr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self._dir}")
        args = {
            "state": (
                ocp.args.StandardRestore(template)
                if template is not None
                else ocp.args.StandardRestore()
            ),
            "metadata": ocp.args.JsonRestore(),
        }
        out = self._mngr.restore(step, args=ocp.args.Composite(**args))
        meta = out.get("metadata") or {}
        return out["state"], meta

    def latest_step(self) -> int | None:
        return self._mngr.latest_step()

    def close(self):
        self._mngr.close()


def export_model(path: str, params: Any, config_json: str | None = None) -> None:
    """Best-model export: params + config.json (``save_pretrained`` analog)."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(path, "params"), _to_host(params), force=True)
    ckptr.wait_until_finished()
    if config_json is not None:
        with open(os.path.join(path, "config.json"), "w") as f:
            f.write(config_json)


def load_model_params(path: str, template: Any | None = None) -> Any:
    """Restore an exported params pytree.

    ``template`` leaves from ``jax.eval_shape`` carry ``sharding=None``;
    orbax then falls back to the sharding recorded at save time, which
    breaks cross-platform restores (a CPU-exported model loaded on the TPU
    backend, or vice versa). Pin unsharded template leaves to the default
    device so exports are portable across backends."""
    item = os.path.join(os.path.abspath(path), "params")
    ckptr = ocp.StandardCheckpointer()
    sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])
    if template is None:
        # build the template from the checkpoint's own shape/dtype metadata
        template = jax.tree_util.tree_map(
            lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype),
            ckptr.metadata(item).item_metadata,
        )

    def _with_sharding(x):
        if isinstance(x, jax.ShapeDtypeStruct) and x.sharding is None:
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sharding)
        return x

    template = jax.tree_util.tree_map(_with_sharding, template)
    return ckptr.restore(item, template)


def detect_last_checkpoint(
    output_dir: str, overwrite_output_dir: bool = False
) -> int | None:
    """Return the latest checkpoint step in ``output_dir`` or None.

    Mirrors reference ``detect_last_checkpoint`` (utils.py:30-46) semantics:
    raises ValueError if the dir is non-empty but contains no checkpoints
    (protects against accidentally overwriting a previous run's artifacts),
    unless ``overwrite_output_dir`` is set."""
    if overwrite_output_dir or not os.path.isdir(output_dir):
        return None
    steps = []
    for name in os.listdir(output_dir):
        m = re.fullmatch(CHECKPOINT_PREFIX + r"(\d+)", name)
        if m:
            steps.append(int(m.group(1)))
    if steps:
        return max(steps)
    if len(os.listdir(output_dir)) > 0:
        raise ValueError(
            f"Output directory ({output_dir}) already exists and is not "
            "empty. Set overwrite_output_dir=True to overcome (reference "
            "utils.py:34-38)."
        )
    return None
