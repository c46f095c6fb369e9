"""Worker process for the 2-process jax.distributed multihost test.

Exercises the real ``--multihost`` code path semantics (cli/run.py:460:
``jax.distributed.initialize()``) the way the reference ran 4 NCCL
processes (run.sh:21): N processes x 4 virtual CPU devices each form one
global ('data','model') mesh, run ONE sharded train step on a tiny CaSE
(gradient all-reduce rides the cross-process gloo collectives), then each
process writes its own eval result shard and process 0 merges them
(runtime/io.merge_shards) after a global barrier — the reference's
Run_Evaluation shard-merge flow.

Launched by tests/test_sharding.py::test_multihost_two_process_train_and_merge
with JAX_PLATFORMS=cpu and XLA_FLAGS=--xla_force_host_platform_device_count=4.

Usage: python multihost_worker.py PORT PROCESS_ID NUM_PROCESSES OUT_DIR
"""

import os
import sys


def main():
    port, pid, nproc, out_dir = (sys.argv[1], int(sys.argv[2]),
                                 int(sys.argv[3]), sys.argv[4])
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()

    import numpy as np

    import jax.numpy as jnp
    import optax
    from jax.experimental import multihost_utils
    from jax.sharding import Mesh, PartitionSpec as P

    from case_rg_tpu.config import ModelConfig
    from case_rg_tpu.models import create_model

    devs = jax.devices()
    n = len(devs)
    local = len(jax.local_devices())
    print(f"[worker {pid}] global devices={n} local={local}", flush=True)
    assert n == nproc * local
    mesh = Mesh(np.array(devs).reshape(n, 1), ("data", "model"))

    v = 256
    cfg = ModelConfig(name="case", vocab_size=v, embedding_size=16,
                      hidden_size=16, num_heads=2, enc_layers=1,
                      dec_layers=1, max_dec_len=8)
    model = create_model("case", cfg)

    # identical global batch on every process (same seed); each process
    # contributes its OWN row range to the global sharded arrays
    rng = np.random.RandomState(0)
    b = n  # one row per global device
    batch_np = {
        "query": rng.randint(4, v, size=(b, 1, 12)).astype(np.int32),
        "passage": rng.randint(4, v, size=(b, 3, 10)).astype(np.int32),
        "response": rng.randint(4, v, size=(b, 8)).astype(np.int32),
        "passage_label": rng.randint(0, 3, size=(b,)).astype(np.int32),
        "token_label": (rng.rand(b, 3, 10) > 0.8).astype(np.float32),
        "token_weight": np.ones((b, 3, 10), np.float32),
        "sample_weight": np.ones((b,), np.float32),
    }
    rows = slice(pid * (b // nproc), (pid + 1) * (b // nproc))

    def to_global(x):
        spec = P(*(["data"] + [None] * (x.ndim - 1)))
        return multihost_utils.host_local_array_to_global_array(
            x[rows], mesh, spec)

    batch = {k: to_global(x) for k, x in batch_np.items()}

    params = model.init({"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(1)},
                        {k: jnp.asarray(x) for k, x in batch_np.items()},
                        method=type(model).train_losses)["params"]
    params = jax.tree_util.tree_map(
        lambda x: multihost_utils.host_local_array_to_global_array(
            np.asarray(x), mesh, P()), params)

    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    def train_step(params, opt_state, batch):
        def loss_fn(p):
            losses = model.apply({"params": p}, batch, deterministic=True,
                                 method=type(model).train_losses)
            return sum(losses.values())

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    step = jax.jit(train_step)
    params, opt_state, loss = step(params, opt_state, batch)
    # the loss is replicated over the global mesh: every process reads the
    # same value from its own addressable shard
    loss = float(np.asarray(loss.addressable_data(0)))
    assert np.isfinite(loss), loss
    print(f"LOSS {pid} {loss:.6f}", flush=True)

    # per-process eval shard write + rank-0 merge (Run_Evaluation.py:28-71)
    result_dir = os.path.join(out_dir, "result")
    os.makedirs(result_dir, exist_ok=True)
    with open(os.path.join(result_dir, f"test_0.{pid}.answer"), "w",
              encoding="utf-8") as f:
        for i in range(3):
            f.write(f"0\tq{pid}_{i}\tp0\tanswer from process {pid}\n")
    multihost_utils.sync_global_devices("shards_written")
    if pid == 0:
        from case_rg_tpu.runtime.io import merge_shards
        merged = merge_shards(result_dir)
        with open(merged["test_0"]["answer"], encoding="utf-8") as f:
            lines = [ln for ln in f.read().splitlines() if ln]
        assert len(lines) == nproc * 3, lines
        print(f"MERGED {len(lines)}", flush=True)
    print(f"OK {pid}", flush=True)


if __name__ == "__main__":
    main()
