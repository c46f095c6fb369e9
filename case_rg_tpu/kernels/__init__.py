import os

import jax

from .additive_attention import additive_scores


def pallas_spmd_ok() -> bool:
    """Whether Pallas kernels may be placed in (potentially) sharded
    programs. A Mosaic kernel is an opaque custom call with no GSPMD
    partitioning rule, so the auto-enabled kernel paths (fused encoder
    attention, candidate-argmax combine) stay off when the process drives
    more than one device — serving/offline predict shard batches over the
    local 'data' axis (runtime/mesh.py) and would otherwise hand the
    partitioner an unpartitionable op. Single chip (the measured config)
    is unaffected. Set CASE_RG_PALLAS_SPMD=1 to force-enable after
    verifying on your topology (e.g. with shard_map-wrapped call sites)."""
    return jax.local_device_count() == 1 or \
        os.environ.get("CASE_RG_PALLAS_SPMD", "") == "1"
