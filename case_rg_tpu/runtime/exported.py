"""Load StableHLO serving artifacts written by cli/export_model.py.

The artifact is self-contained (checkpoint params baked in as constants):
calling it needs jax and the blob, nothing else — no model code, no
checkpoint, no vocab. Inputs/outputs are the predict program's batch dict
and output dict; the ``<artifact>.json`` sidecar documents the input spec.
"""

from __future__ import annotations


def load_exported(path: str):
    """Deserialized jax.export artifact; run it with ``.call(batch)``."""
    from jax import export

    with open(path, "rb") as f:
        return export.deserialize(bytearray(f.read()))
