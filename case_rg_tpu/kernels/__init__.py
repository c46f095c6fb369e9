# Both Pallas kernels (encoder_attention.fused_mha, copy_argmax.
# combine_copy_mass) carry custom_partitioning batch-dim rules, so they
# stay enabled inside data-parallel-sharded programs: each shard runs the
# plain single-device Mosaic kernel on its local rows. Per-feature CLI
# kill switches remain (--no-fused_attn, --no-fast_argmax).
from .additive_attention import additive_scores
