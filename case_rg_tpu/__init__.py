"""case_rg_tpu — TPU-native framework for SERP-based conversational response
generation (CaSE and baselines), rebuilt from scratch in JAX/Flax/Pallas.

Reference capability surface: PengjieRen/CaSE_RG (see SURVEY.md). The compute
path is jit-compiled XLA with static shapes; parallelism is expressed with
``jax.sharding.Mesh`` + NamedSharding; decoding is a ``lax.scan`` with KV
caches instead of the reference's per-step prefix recompute.
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy: `from case_rg_tpu import Pipeline` without importing jax at
    # package-import time (CLI entry points configure backends first)
    if name == "Pipeline":
        from .pipeline import Pipeline
        return Pipeline
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
