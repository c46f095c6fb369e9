"""Continuous batching for greedy serving (CaSE/Masque + EncDec models).

The fixed-length batch decode wastes steps: a row that emits EOS at step
12 still rides the remaining ``max_len - 12`` steps (early-exit only stops
once EVERY row finished — the expected batch cost is the MAX of the rows'
answer lengths, ~max_len at B=64). Here rows progress independently:
finished rows are harvested between chunks of ``chunk_steps`` decode steps
and their slots refilled with newly arrived requests mid-flight, so batch
cost tracks the MEAN answer length instead.

TPU-native shape discipline: the decode state is a pytree of fixed-shape
[B, ...] arrays (per-row step indices, caches, cross K/V, copy operands —
models/multimem.py chunk_init/chunk_step); refilling is a row scatter of a
freshly encoded (smaller, fixed ``refill`` bucket) state into the live
one. Greedy decode math is row-independent, so per-request answers are
bit-identical to the one-shot ``predict`` path regardless of batch
composition (tests/test_continuous.py).

The reference has no serving path at all (its closest analogue is the
fixed-batch offline predict, common/CumulativeTrainer.py:134-156).

Layout: ``base`` (jitted program builders, request sources, the lazy rank
handle), ``single`` (the one-lane driver ``run_continuous``), ``multi``
(``Lane`` + the per-pool-bucket driver ``run_continuous_multi``),
``device_loop`` (the device-resident drivers ``run_continuous_device`` /
``run_continuous_device_multi`` — K chunks per dispatch with in-jit
harvest + ring refills).
"""

from .base import (_LazyRank, IterSource, QueueSource, make_continuous_fns,
                   refill_rows)
from .single import run_continuous
from .multi import Lane, run_continuous_multi
from .device_loop import (DeviceLane, make_device_loop_fns,
                          run_continuous_device,
                          run_continuous_device_multi)

__all__ = [
    "IterSource", "QueueSource", "Lane", "DeviceLane",
    "make_continuous_fns", "make_device_loop_fns", "refill_rows",
    "run_continuous", "run_continuous_multi", "run_continuous_device",
    "run_continuous_device_multi",
]
