"""Checkpointing with resume.

The reference writes rank-0 ``state_dict`` pickles per epoch and cannot
resume optimizer/EMA/step state (common/CumulativeTrainer.py:80-86; SURVEY
§5). Here the *full* train state pytree (params + optimizer + EMA + step) is
serialized per epoch, plus a ``latest`` pointer for resumption.

Two interchangeable backends:

* ``msgpack`` (default) — one flax-msgpack file per epoch; synchronous,
  single-file, zero extra deps. Bit-exact round trip.
* ``orbax`` — Orbax ``StandardCheckpointer``: asynchronous (training
  continues while the previous epoch streams to disk) and per-array sharded
  on multi-host meshes. Saves land atomically (tmp dir + rename).

Loading auto-detects the backend from what exists on disk, so runs can
switch backends mid-training.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

from flax import serialization

_ORBAX = None


def _orbax():
    global _ORBAX
    if _ORBAX is None:
        import orbax.checkpoint as ocp
        _ORBAX = ocp.StandardCheckpointer()
    return _ORBAX


def wait_for_checkpoints():
    """Block until every scheduled async (orbax) save has committed."""
    if _ORBAX is not None:
        _ORBAX.wait_until_finished()


def _model_dir(output_path: str) -> str:
    d = os.path.join(output_path, "model")
    os.makedirs(d, exist_ok=True)
    return d


def save_checkpoint(output_path: str, epoch, state: Any,
                    process_index: int = 0, update_latest: bool = True,
                    backend: str = "msgpack"):
    """``update_latest=False`` writes a salvage checkpoint (e.g. mid-epoch)
    without marking the epoch complete for resume. ``state`` must already be
    host-resident (``jax.device_get``) — orbax saves are scheduled
    asynchronously, so donated/overwritten device buffers are unsafe."""
    if backend == "orbax":
        # our train states are host-resident replicated trees, so rank 0
        # writes (matching the msgpack semantics); pass device-sharded
        # jax.Arrays instead to get orbax's coordinated multi-host writes
        if process_index != 0:
            return
        d = _model_dir(output_path)
        path = os.path.abspath(os.path.join(d, f"{epoch}.orbax"))
        ck = _orbax()
        ck.wait_until_finished()   # one in-flight save at a time
        ck.save(path, state, force=True)
    else:
        if process_index != 0:
            return
        d = _model_dir(output_path)
        path = os.path.join(d, f"{epoch}.ckpt")
        with open(path, "wb") as f:
            f.write(serialization.to_bytes(state))
    if update_latest and process_index == 0:
        with open(os.path.join(d, "latest.json"), "w") as f:
            json.dump({"epoch": epoch}, f)


def latest_epoch(output_path: str) -> Optional[int]:
    p = os.path.join(output_path, "model", "latest.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)["epoch"]


def save_best(output_path: str, epoch: int, dev_total: float) -> None:
    """Record the best-dev-loss epoch (written by Trainer.fit whenever the
    per-epoch dev loss improves; consumed by ``--epoch best`` at serving
    and ``run --mode test --best_only``)."""
    d = os.path.join(output_path, "model")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "best.json"), "w") as f:
        json.dump({"epoch": epoch, "dev_total": dev_total}, f)


def best_epoch(output_path: str) -> Optional[int]:
    p = os.path.join(output_path, "model", "best.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)["epoch"]


def load_checkpoint(output_path: str, epoch: int, target: Any) -> Any:
    """Backend auto-detected: ``{epoch}.ckpt`` file (msgpack) or
    ``{epoch}.orbax`` directory."""
    path = os.path.join(output_path, "model", f"{epoch}.ckpt")
    if os.path.exists(path):
        with open(path, "rb") as f:
            return serialization.from_bytes(target, f.read())
    opath = os.path.abspath(os.path.join(output_path, "model",
                                         f"{epoch}.orbax"))
    return _orbax().restore(opath, target)


def checkpoint_exists(output_path: str, epoch: int) -> bool:
    d = os.path.join(output_path, "model")
    return os.path.exists(os.path.join(d, f"{epoch}.ckpt")) or \
        os.path.isdir(os.path.join(d, f"{epoch}.orbax"))
