"""Serving-throughput measurement: serial vs pipelined dispatch.

The relay adds ~34 ms per call (tools/exp_sq_attention.py calibration). A
serving deployment overlaps host fetches with device compute by dispatching
the next batch before fetching the previous result; this measures how much
of the roundtrip that recovers on the real chip.

Usage: python tools/exp_pipeline_serve.py [B] [iters] [depth]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    v = 30522
    import os
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

    def fresh(i):
        r = np.random.RandomState(100 + i)
        return {"query": jnp.asarray(r.randint(4, v, size=(B, 1, 60)),
                                     jnp.int32),
                "passage": jnp.asarray(r.randint(4, v, size=(B, 10, 100)),
                                       jnp.int32)}

    batches = [fresh(i) for i in range(iters)]
    np.asarray(predict(variables, batches[0])["answer"])   # compile

    # serial: dispatch -> fetch -> dispatch ...
    t0 = time.time()
    for bt in batches:
        np.asarray(predict(variables, bt)["answer"])
    serial = (time.time() - t0) / iters

    # pipelined: dispatch everything, then fetch in order
    batches2 = [fresh(1000 + i) for i in range(iters)]
    t0 = time.time()
    outs = [predict(variables, bt)["answer"] for bt in batches2]
    for o in outs:
        np.asarray(o)
    pipe = (time.time() - t0) / iters

    print(f"B={B} iters={iters}")
    print(f"serial   : {serial*1e3:.1f} ms/batch  {B/serial:.0f} qps")
    print(f"pipelined: {pipe*1e3:.1f} ms/batch  {B/pipe:.0f} qps")


if __name__ == "__main__":
    main()
