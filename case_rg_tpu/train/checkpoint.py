"""Checkpointing with resume.

The reference writes rank-0 ``state_dict`` pickles per epoch and cannot
resume optimizer/EMA/step state (common/CumulativeTrainer.py:80-86; SURVEY
§5). Here the *full* train state pytree (params + optimizer + EMA + step) is
serialized with flax msgpack per epoch, plus a ``latest`` pointer for
resumption.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

from flax import serialization


def _model_dir(output_path: str) -> str:
    d = os.path.join(output_path, "model")
    os.makedirs(d, exist_ok=True)
    return d


def save_checkpoint(output_path: str, epoch, state: Any,
                    process_index: int = 0, update_latest: bool = True):
    """``update_latest=False`` writes a salvage checkpoint (e.g. mid-epoch)
    without marking the epoch complete for resume."""
    if process_index != 0:
        return
    d = _model_dir(output_path)
    path = os.path.join(d, f"{epoch}.ckpt")
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(state))
    if update_latest:
        with open(os.path.join(d, "latest.json"), "w") as f:
            json.dump({"epoch": epoch}, f)


def latest_epoch(output_path: str) -> Optional[int]:
    p = os.path.join(output_path, "model", "latest.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)["epoch"]


def load_checkpoint(output_path: str, epoch: int, target: Any) -> Any:
    path = os.path.join(output_path, "model", f"{epoch}.ckpt")
    with open(path, "rb") as f:
        return serialization.from_bytes(target, f.read())


def checkpoint_exists(output_path: str, epoch: int) -> bool:
    return os.path.exists(os.path.join(output_path, "model", f"{epoch}.ckpt"))
