"""Pallas TPU kernel: duplicate-id copy-mass combine for candidate argmax.

Greedy decoding over a copy-extended distribution only needs the ARGMAX of
``mix0*gen + scatter(copy_mass, src_ids)``; the scatter differs from zero at
(at most) the L_s source-token ids, so the argmax is either argmax(gen) or
the best source id after combining the copy mass of duplicate ids
(models/multimem.py ``fast_argmax``; ref: the reference materializes the
full [B, L_src, V] one-hot map instead — common/Utils.py:344-355).

The combine is ``comb[b, j] = sum_l cw[b, l] * [ids[b, l] == ids[b, j]]``.
XLA formulations all lose on the real decode step (docs/PERF.md rounds 4-6):
the [B, V] scatter serializes its 64k updates (0.43 ms/step), a hoisted
[B, Ls, Ls] one-hot einsum reads a 145 MB operand from HBM every step, and
re-deriving that matrix inside the scan body fuses into a slow VPU loop.
This kernel computes the comparison tiles ON THE FLY in VMEM — the only
HBM traffic is ids + weights in ([B, Ls] each, ~8 KB/row) and the combined
[B, Ls] out — and does the L_s^2 compare+MAC on the VPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu  # noqa: F401
    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

_LANES = 128
# j-tile width (one lane group) and l-chunk length of the in-kernel
# accumulation loop. Two kernel bodies (probe logs, docs/PERF.md round 6):
#
# * UNROLLED (all shipped shapes, Lp <= _MAX_UNROLL_CHUNKS chunks): the
#   [rb, Lp] ids/cw blocks are grid-index-map-invariant in j so Pallas
#   keeps them resident; the l loop is a Python loop over static value
#   slices that Mosaic software-pipelines to near VPU speed-of-light
#   (47 us/step at B=64 Ls=1060 vs the 509 us f32 scatter). Its
#   per-iteration temps STACK in scoped VMEM (~640 KB each at rb=8), so
#   it OOMs past ~10 chunks.
# * LOOPED (fallback for larger Lp): operands laid out [nc, rb, LT] so a
#   fori_loop body indexes the LEADING ref dim dynamically (``ids_ref[k]``)
#   — a fori_loop over value dynamic_slices does not lower
#   ("Unimplemented primitive ... dynamic_slice"), and putting the l-chunk
#   on the grid costs Lp^2/(rb*LT*JT) dispatches. Correct at any Lp but
#   ~10x off speed-of-light (2.2 ms/step at Ls=2000, i.e. SLOWER than the
#   1.0 ms scatter there — auto mode therefore caps Ls at MAX_FAST_LS).
_JT = 128
_LT = 128
_MAX_UNROLL_CHUNKS = 10
# largest source length for which the candidate-argmax path beats the
# dense scatter (the unrolled kernel's VMEM ceiling); auto fast_argmax
# falls back to the scatter beyond this. CaSE/Masque concat source is
# 1060, GLKS/GTTP backgrounds 1000 — all within.
MAX_FAST_LS = _MAX_UNROLL_CHUNKS * _LT


def _kernel_unrolled(ids_ref, idj_ref, cw_ref, out_ref):
    ids = ids_ref[...]                   # [rb, Lp] int32 (-1 = padding)
    cw = cw_ref[...]                     # [rb, Lp] f32 (0 at padding)
    idj = idj_ref[...]                   # [rb, JT] this step's j-tile
    rb, lp = ids.shape
    acc = jnp.zeros((rb, _JT), jnp.float32)
    for k in range(lp // _LT):
        idl = jax.lax.slice_in_dim(ids, k * _LT, (k + 1) * _LT, axis=1)
        cwl = jax.lax.slice_in_dim(cw, k * _LT, (k + 1) * _LT, axis=1)
        eq = idl[:, :, None] == idj[:, None, :]           # [rb, LT, JT]
        acc = acc + jnp.sum(jnp.where(eq, cwl[:, :, None], 0.0), axis=1)
    out_ref[...] = acc


def _kernel_looped(idj_ref, ids_ref, cw_ref, out_ref):
    idj = idj_ref[...]                   # [rb, JT] this step's j-tile
    nc = ids_ref.shape[0]
    rb = idj.shape[0]

    def body(k, acc):
        idl = ids_ref[k]                 # [rb, LT] leading-dim dynamic index
        cwl = cw_ref[k]
        eq = idl[:, :, None] == idj[:, None, :]           # [rb, LT, JT]
        return acc + jnp.sum(jnp.where(eq, cwl[:, :, None], 0.0), axis=1)

    out_ref[...] = jax.lax.fori_loop(
        0, nc, body, jnp.zeros((rb, _JT), jnp.float32))


def _combine_impl(cw: jnp.ndarray, src_ids: jnp.ndarray,
                  interpret: bool) -> jnp.ndarray:
    """Kernel dispatch (single-device view; see combine_copy_mass)."""
    b0, ls = cw.shape
    lp = int(np.ceil(ls / _JT)) * _JT
    # pad rows up to a multiple of 8 so the kernel always runs rb=8 row
    # blocks: an rb=b fallback would scale the unrolled body's stacked
    # [rb, LT, JT] temps with B and OOM scoped VMEM for ordinary odd batch
    # sizes (e.g. B=50). Padding rows are id=-1/weight=0 — inert.
    b = int(np.ceil(b0 / 8)) * 8
    idp = jnp.pad(src_ids.astype(jnp.int32), ((0, b - b0), (0, lp - ls)),
                  constant_values=-1)
    cwp = jnp.pad(cw.astype(jnp.float32), ((0, b - b0), (0, lp - ls)))
    rb = 8
    nc = lp // _LT
    if nc <= _MAX_UNROLL_CHUNKS:
        out = pl.pallas_call(
            _kernel_unrolled,
            out_shape=jax.ShapeDtypeStruct((b, lp), jnp.float32),
            grid=(b // rb, lp // _JT),
            in_specs=[pl.BlockSpec((rb, lp), lambda i, j: (i, 0)),
                      pl.BlockSpec((rb, _JT), lambda i, j: (i, j)),
                      pl.BlockSpec((rb, lp), lambda i, j: (i, 0))],
            out_specs=pl.BlockSpec((rb, _JT), lambda i, j: (i, j)),
            interpret=interpret,
        )(idp, idp, cwp)
        return out[:b0, :ls]
    ids3 = idp.reshape(b, nc, _LT).transpose(1, 0, 2)    # [nc, B, LT]
    cw3 = cwp.reshape(b, nc, _LT).transpose(1, 0, 2)
    out = pl.pallas_call(
        _kernel_looped,
        out_shape=jax.ShapeDtypeStruct((b, lp), jnp.float32),
        grid=(b // rb, lp // _JT),
        in_specs=[pl.BlockSpec((rb, _JT), lambda i, j: (i, j)),
                  pl.BlockSpec((nc, rb, _LT), lambda i, j: (0, i, 0)),
                  pl.BlockSpec((nc, rb, _LT), lambda i, j: (0, i, 0))],
        out_specs=pl.BlockSpec((rb, _JT), lambda i, j: (i, j)),
        interpret=interpret,
    )(idp, ids3, cw3)
    return out[:b0, :ls]


# --- SPMD partitioning (shared scaffolding, kernels/spmd.py) ----------
# The combine is embarrassingly parallel over batch rows: each shard runs
# the plain single-device kernel on its rows, source axis replicated.
# This keeps the candidate-argmax path enabled in the data-parallel
# serving/offline predict programs (runtime/mesh.py) instead of falling
# back to the XLA scatter on multi-chip hosts.

if HAVE_PALLAS:
    from .spmd import batch_partitioned
    # rule factors: only the batch dim is shared between operands/result —
    # the source axis must stay whole per shard (independent factors i/j/k
    # propagate nothing), matching the arg shardings the partition forces
    _combine_cp = batch_partitioned(_combine_impl, static_argnums=(2,),
                                    sharding_rule="b i, b j -> b k")
else:  # pragma: no cover
    _combine_cp = _combine_impl


@functools.partial(jax.jit, static_argnums=(2,))
def combine_copy_mass(cw: jnp.ndarray, src_ids: jnp.ndarray,
                      interpret: bool = False) -> jnp.ndarray:
    """comb[b, j] = sum_l cw[b, l] * [src_ids[b, l] == src_ids[b, j]].

    cw: [B, Ls] copy mass per source position (any float dtype; accumulated
    in f32). src_ids: [B, Ls] int32 vocab ids (>= 0). Returns [B, Ls] f32.
    Every member of a duplicate-id group receives the full group mass, so a
    subsequent argmax picks the group's first position (same selection as
    an explicit first-occurrence mask). Batch-dim SPMD-partitionable (see
    _cp_partition above).
    """
    return _combine_cp(cw, src_ids, interpret)


def combine_copy_mass_xla(cw: jnp.ndarray, src_ids: jnp.ndarray) -> jnp.ndarray:
    """Reference formulation (dense compare, f32 accumulation)."""
    eq = src_ids[:, :, None] == src_ids[:, None, :]
    return jnp.sum(jnp.where(eq, cw.astype(jnp.float32)[:, :, None], 0.0),
                   axis=1)


# test hook: route the kernel through the Pallas interpreter so the full
# candidate-argmax decode path can run on CPU (tests/test_models_advanced.py)
_FORCE_INTERPRET = False


def pallas_available() -> bool:
    """Single availability predicate for the auto fast_argmax paths
    (models/multimem.py decode, models/predict.py greedy_predict): Pallas
    importable AND (real TPU backend OR the interpreter test hook). No
    single-device requirement: combine_copy_mass carries a
    custom_partitioning rule, so sharded programs run the kernel
    per-shard."""
    if not HAVE_PALLAS:
        return False
    if _FORCE_INTERPRET:
        return True
    return jax.default_backend() == "tpu"


def candidate_argmax_from_logits(logits: jnp.ndarray, l_at: jnp.ndarray,
                                 gate: jnp.ndarray, cw: jnp.ndarray,
                                 src_ids: jnp.ndarray,
                                 interpret: bool | None = None) -> jnp.ndarray:
    """``argmax_v(gate * softmax(logits)[v] + scatter_add(cw, src_ids)[v])``
    with neither the [B, V] scatter nor a [B, V] gather.

    A per-step ``take_along_axis(base, src_ids)`` gather of ~1k ids/row
    from [B, V] serializes on TPU exactly like the scatter it replaces
    (xprof: 0.68 ms/step at B=64 — docs/PERF.md round 6). Instead the
    caller supplies ``l_at`` [B, Ls] — the pre-softmax logits at the
    source ids, computed as a small matvec against HOISTED gathered
    generator-weight columns (step-invariant, [B, Ls, d]) — and the
    softmax values are reconstructed here from the row max and partition
    sum, which are V-wide vector reduces, not gathers:
    ``base[id] = gate * exp(l_at - lmax) / Z``.

    logits: [B, V] pre-softmax scores; l_at: [B, Ls] logits at src_ids
    (any rounding difference vs the MXU full-logits row is ~1 ULP);
    gate: [B] or [B, 1] scale on the softmax branch; cw: [B, Ls]
    gate-scaled copy mass; src_ids: [B, Ls]. Returns idx [B] int32.
    Exact up to f32 rounding and tie-breaks (the dense path softmaxes in
    the compute dtype; this reconstructs in f32).
    """
    if interpret is None:
        interpret = _FORCE_INTERPRET
    lf = logits.astype(jnp.float32)
    lmax = jnp.max(lf, axis=-1, keepdims=True)                  # [B, 1]
    g_idx = jnp.argmax(lf, axis=-1)                             # [B]
    z = jnp.sum(jnp.exp(lf - lmax), axis=-1)                    # [B]
    gate = gate.reshape(gate.shape[0]).astype(jnp.float32)
    g_val = gate / z                                            # exp(0)=1
    b_at = (gate[:, None]
            * jnp.exp(l_at.astype(jnp.float32) - lmax) / z[:, None])
    comb = combine_copy_mass(cw, src_ids, interpret)            # [B, Ls] f32
    cand = b_at + comb
    c_pos = jnp.argmax(cand, axis=-1)
    c_val = jnp.take_along_axis(cand, c_pos[:, None], -1)[:, 0]
    c_idx = jnp.take_along_axis(src_ids, c_pos[:, None], -1)[:, 0]
    return jnp.where(c_val > g_val, c_idx, g_idx).astype(jnp.int32)


def gather_weight_columns(kernel_t: jnp.ndarray, src_ids: jnp.ndarray,
                          bias: jnp.ndarray | None = None):
    """Hoisted (once-per-batch) gather of generator weight columns at the
    copy source ids: kernel_t [V, d] (the Dense kernel transposed), src_ids
    [B, Ls] -> (w_at [B, Ls, d], b_at [B, Ls] or None). The per-step
    ``l_at`` is then ``einsum('bld,bd->bl', w_at, h) (+ b_at)``."""
    w_at = jnp.take(kernel_t, src_ids, axis=0)
    b_at = None if bias is None else jnp.take(bias, src_ids, axis=0)
    return w_at, b_at


def candidate_argmax(base: jnp.ndarray, cw: jnp.ndarray,
                     src_ids: jnp.ndarray,
                     interpret: bool | None = None) -> jnp.ndarray:
    """``argmax_v(base[v] + scatter_add(cw, src_ids)[v])`` without the
    [B, V] scatter.

    base: [B, V] non-negative mixture mass already scaled by its gate;
    cw: [B, Ls] copy mass per source position (gate-scaled); src_ids:
    [B, Ls] int vocab ids. The scatter only adds mass at source-token ids,
    so the argmax is either argmax(base) or the best source id after
    combining duplicate-id mass (Pallas kernel above). Exact up to f32
    rounding of the combine and tie-breaks.

    NOTE: this generic form still pays a [B, V] gather at the source ids
    (0.68 ms/step at B=64 Ls=1060 on TPU — as serialized as the scatter it
    replaces). The decode paths use ``candidate_argmax_from_logits``,
    which hoists that gather out of the loop; this form remains for call
    sites without access to pre-softmax logits.
    """
    if interpret is None:
        interpret = _FORCE_INTERPRET
    # materialize base: otherwise XLA fuses the producer into the argmax +
    # gather consumers as one serialized loop fusion (xprof: 0.68 ms/step
    # at B=64 V=30522 — docs/PERF.md round 6)
    base = jax.lax.optimization_barrier(base)
    b_idx = jnp.argmax(base, axis=-1)
    b_val = jnp.take_along_axis(base, b_idx[:, None], -1)[:, 0]
    comb = combine_copy_mass(cw, src_ids, interpret)          # [B, Ls] f32
    b_at = jnp.take_along_axis(base, src_ids, axis=-1)
    cand = b_at.astype(jnp.float32) + comb
    c_pos = jnp.argmax(cand, axis=-1)
    c_val = jnp.take_along_axis(cand, c_pos[:, None], -1)[:, 0]
    c_idx = jnp.take_along_axis(src_ids, c_pos[:, None], -1)[:, 0]
    return jnp.where(c_val > b_val.astype(jnp.float32),
                     c_idx, b_idx).astype(jnp.int32)
