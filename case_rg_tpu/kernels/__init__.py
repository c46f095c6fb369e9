# Both Pallas kernels (encoder_attention.fused_mha, copy_argmax.
# combine_copy_mass) carry custom_partitioning batch-dim rules, so they
# stay enabled inside data-parallel-sharded programs: each shard runs the
# plain single-device Mosaic kernel on its local rows. fused_mha remains
# auto-on for bf16 inference; combine_copy_mass became opt-in
# (--fast_argmax) in round 9 after this image's XLA update regressed it
# 8x (docs/PERF.md round 9). Kill switch: --no-fused_attn.
from .additive_attention import additive_scores
