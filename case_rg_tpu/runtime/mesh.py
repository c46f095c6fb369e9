"""Device mesh and sharding helpers.

The reference's only parallelism is 4-process NCCL data parallelism
(run.sh:21, common/CumulativeTrainer.py:47). Here parallelism is expressed
with a ``jax.sharding.Mesh`` over ('data', 'model') axes:

* batches are sharded over 'data' (gradient all-reduce is inserted by XLA
  over ICI — the NCCL-allreduce equivalent, SURVEY §2.5);
* optionally, vocabulary-dimension parameters (embeddings / generator heads)
  shard over 'model' (tensor parallelism; not required for parity at d=256
  but wired so the same code scales).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Optional[Tuple[int, ...]] = None,
              axis_names: Tuple[str, str] = ("data", "model")) -> Mesh:
    devices = jax.devices()
    n = len(devices)
    if not shape:
        shape = (n, 1)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    return Mesh(mesh_utils.create_device_mesh(shape), axis_names)


def batch_sharding(mesh: Mesh, ndim: int, data_axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(data_axis, *([None] * (ndim - 1))))


# [B, num_passage, ...] batch arrays whose passage-pool axis can shard over
# 'model' (pool parallelism): the ranking towers / per-passage encoders are
# independent along this axis until the cross-passage reductions (scorer
# softmax, Interaction max-pool, decode-memory concat), so GSPMD keeps the
# heavy per-passage compute local and inserts collectives only at those
# joins. An axis the reference cannot express (its only parallelism is DDP).
POOL_AXIS_KEYS = ("passage", "token_label", "token_weight")


def pool_sharding(mesh: Mesh, ndim: int, data_axis: str = "data",
                  model_axis: str = "model") -> NamedSharding:
    return NamedSharding(mesh, P(data_axis, model_axis,
                                 *([None] * (ndim - 2))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict, pool_axis: bool = False) -> dict:
    """Device-put every array in the batch sharded over the data axis.

    ``pool_axis=True`` additionally shards the passage-pool axis of
    POOL_AXIS_KEYS arrays over 'model' (pool parallelism — see
    POOL_AXIS_KEYS).

    Multi-process: each process holds its own (disjoint) per-process batch
    from the Batcher; the global array is assembled from those local shards
    (global batch = per-process batch x process_count, matching the
    reference's per-GPU batch semantics, CaSE/Run.py:78-79). A plain
    device_put would instead treat every process's local batch as the whole
    global array and silently drop rows."""
    multiprocess = jax.process_count() > 1
    out = {}
    for k, v in batch.items():
        if k.startswith("_"):
            continue
        if pool_axis and k in POOL_AXIS_KEYS and v.ndim >= 2:
            m = mesh.shape.get("model", 1)
            if v.shape[1] % m:
                raise ValueError(
                    f"pool sharding: '{k}' pool axis ({v.shape[1]}) is not "
                    f"divisible by the 'model' mesh axis ({m}); pick a mesh "
                    f"whose model axis divides num_passage (e.g. 2 or 5 "
                    f"for the 10-passage CAsT pool)")
            sharding = pool_sharding(mesh, v.ndim)
        else:
            sharding = batch_sharding(mesh, v.ndim)
        if multiprocess:
            out[k] = jax.make_array_from_process_local_data(
                sharding, np.asarray(v))
        else:
            out[k] = jax.device_put(v, sharding)
    return out


def local_mesh(batch_size: int,
               axis_names: Tuple[str, str] = ("data", "model"),
               model: int = 1) -> Mesh:
    """A mesh over THIS process's devices only (per-process independent
    execution, e.g. eval sharding that writes per-rank result files).

    ``model > 1`` reserves that many devices for the 'model' axis (pool
    parallelism at inference: per-passage tower compute stays local,
    collectives only at cross-passage joins); the remaining devices fill
    the data axis up to the largest divisor of ``batch_size``."""
    import math

    devices = jax.local_devices()
    n = len(devices)
    model = max(1, model)
    if n % model:
        raise ValueError(f"model axis {model} does not divide the "
                         f"{n} local devices")
    avail = n // model
    d = math.gcd(batch_size, avail) if batch_size else avail
    # Tell the fused decoder-stack kernel how many data shards programs
    # traced against this mesh will have, so its scoped-VMEM bound uses
    # per-device rows instead of the global batch (perf-only: an
    # undersized hint only makes the layer chunking conservative).
    from ..kernels import decoder_stack
    decoder_stack.set_data_shards(d)
    return Mesh(np.array(devices[:d * model]).reshape(d, model), axis_names)


def param_sharding_tree(params, mesh: Mesh, shard_vocab_dim: bool = False,
                        vocab_size: int = -1):
    """Replicate everything; optionally shard vocab-sized dims over 'model'."""
    def spec_for(path, leaf):
        if shard_vocab_dim and hasattr(leaf, "shape"):
            for i, d in enumerate(leaf.shape):
                if d == vocab_size and d > 1024:
                    spec = [None] * leaf.ndim
                    spec[i] = "model"
                    return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, params)
