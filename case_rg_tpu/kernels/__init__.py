import os

import jax

from .additive_attention import additive_scores


def pallas_spmd_ok() -> bool:
    """Whether UNPARTITIONABLE Pallas kernels may be placed in
    (potentially) sharded programs. A bare Mosaic kernel is an opaque
    custom call with no GSPMD partitioning rule, so the fused encoder
    attention stays off when the process drives more than one device —
    serving/offline predict shard batches over the local 'data' axis
    (runtime/mesh.py) and would otherwise hand the partitioner an
    unpartitionable op. Single chip (the measured config) is unaffected.
    Set CASE_RG_PALLAS_SPMD=1 to force-enable after verifying your
    topology. (kernels/copy_argmax.py does NOT need this gate: its
    combine carries a custom_partitioning batch rule.)"""
    return jax.local_device_count() == 1 or \
        os.environ.get("CASE_RG_PALLAS_SPMD", "") == "1"
