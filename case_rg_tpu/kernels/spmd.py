"""Shared custom_partitioning scaffolding for batch-parallel Pallas kernels.

A bare Mosaic kernel is an opaque custom call XLA's partitioner cannot
split, but both shipped kernels (encoder_attention.fused_mha,
copy_argmax.combine_copy_mass) are embarrassingly parallel over their
leading batch/rows dim. ``batch_partitioned`` declares exactly that:
under a sharded program each shard runs the plain single-device kernel
on its local rows, with every non-leading axis forced replicated
(Shardy reshards e.g. an Ls-sharded operand before the kernel). This
keeps the auto kernel paths enabled in the data-parallel
serving/offline predict programs (runtime/mesh.py) on multi-chip hosts.
"""

from __future__ import annotations

from jax.sharding import NamedSharding, PartitionSpec


def _batch_axis(arg_infos):
    s = arg_infos[0].sharding
    spec = s.spec if s is not None else PartitionSpec()
    return spec[0] if len(spec) else None


def batch_partitioned(fn, static_argnums, sharding_rule):
    """Wrap ``fn`` (array operands first, static args trailing) in a
    custom_partitioning that shards ONLY the leading dim of every operand
    and of the (single) result, mirroring operand 0's leading-dim
    placement. ``sharding_rule`` must state the same contract for the
    Shardy partitioner (the default on this JAX): leading factor shared
    across all operands/result, every other factor independent, e.g.
    ``"b i, b j -> b k"``.
    """
    from jax.experimental.custom_partitioning import custom_partitioning

    def _result_sharding(mesh, arg_infos, result_infos):
        nd = len(result_infos.shape)
        return NamedSharding(
            mesh, PartitionSpec(_batch_axis(arg_infos), *([None] * (nd - 1))))

    def infer(*cb_args):
        mesh, arg_infos, result_infos = cb_args[-3:]
        return _result_sharding(mesh, arg_infos, result_infos)

    def partition(*cb_args):
        statics, (mesh, arg_infos, result_infos) = cb_args[:-3], cb_args[-3:]
        rs = _result_sharding(mesh, arg_infos, result_infos)
        b = rs.spec[0]
        arg_sh = tuple(
            NamedSharding(mesh,
                          PartitionSpec(b, *([None] * (len(a.shape) - 1))))
            for a in arg_infos)

        def lower(*operands):
            return fn(*operands, *statics)

        return mesh, lower, rs, arg_sh

    cp = custom_partitioning(fn, static_argnums=static_argnums)
    cp.def_partition(infer_sharding_from_operands=infer,
                     partition=partition, sharding_rule=sharding_rule)
    return cp
