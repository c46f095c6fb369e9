"""Pool-size bucketed serving throughput: compact pools vs the padded 10.

``cli/serve.py --pool_buckets`` routes each request to the smallest static
pool size that fits its passage count. The CaSE decode cross-memory is
``60 + k*100`` tokens and the ranking towers run per passage, so both
scale with the bucket size k. This measures pipelined throughput of the
full predict (rank + 40-step decode) at k = 10 / 5 / 2, B=64 bf16 —
i.e. what a request with <=k passages costs in its bucket vs the padded
10-pool it would otherwise ride in.

Usage: python tools/exp_pool_buckets.py [B] [iters]
"""

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    v = 30522
    cache_dir = os.path.expanduser("~/.cache/case_rg_tpu_xla")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass
    from case_rg_tpu.config import ModelConfig
    from case_rg_tpu.models import create_model
    from case_rg_tpu.runtime.inference import make_predict_fn
    from case_rg_tpu.train.precision import cast_params

    cfg = ModelConfig(name="case", vocab_size=v, embedding_size=256,
                      hidden_size=256, num_heads=8, enc_layers=3, dec_layers=4,
                      max_dec_len=40, max_target_length=40)
    model = create_model("case", cfg)
    rng = np.random.RandomState(0)
    init_batch = {
        "query": jnp.asarray(rng.randint(4, v, size=(B, 1, 60)), jnp.int32),
        "passage": jnp.asarray(rng.randint(4, v, size=(B, 10, 100)), jnp.int32),
        "response": jnp.asarray(rng.randint(4, v, size=(B, 40)), jnp.int32),
        "passage_label": jnp.zeros((B,), jnp.int32),
        "token_label": jnp.zeros((B, 10, 100), jnp.float32),
        "token_weight": jnp.ones((B, 10, 100), jnp.float32)}
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           init_batch, method=type(model).train_losses)
    variables = cast_params(variables)
    predict = make_predict_fn(model, cfg, max_len=40)

    def fresh(i, k):
        r = np.random.RandomState(100 + i)
        return {"query": jnp.asarray(r.randint(4, v, size=(B, 1, 60)),
                                     jnp.int32),
                "passage": jnp.asarray(r.randint(4, v, size=(B, k, 100)),
                                       jnp.int32)}

    print(f"devices={jax.devices()} B={B} iters={iters}")
    for k in (10, 5, 2):
        batches = [fresh(1000 * k + i, k) for i in range(iters)]
        np.asarray(predict(variables, batches[0])["answer"])   # compile
        t0 = time.time()
        outs = [predict(variables, bt)["answer"] for bt in batches]
        for o in outs:
            np.asarray(o)
        pipe = (time.time() - t0) / iters
        print(f"k={k:>2}: {pipe*1e3:6.1f} ms/batch  {B/pipe:5.0f} qps "
              f"(memory {60 + k * 100} tokens)")


if __name__ == "__main__":
    main()
