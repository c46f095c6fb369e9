"""CaSE train-step cost breakdown (TODO 'profile CaSE train step').

K-iteration in-jit loops with carried data dependencies (relay-safe timing,
CLAUDE.md). Parts measured at bench shapes (B=64, CAsT):

  fwd/stages   encoder + towers forward (deterministic)
  fwd/decoder  teacher-forced decoder forward
  fwd/loss     full train_losses forward (dropout on, like training)
  fwd/loss-det same with dropout OFF (isolates RNG/dropout cost)
  grad         value_and_grad of the summed loss
  step         full optimizer step (grad + adam + EMA), donated state

Usage: python tools/exp_train_profile.py [B] [K]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def _fetch(out):
    # block_until_ready can return before remote completion on this relay
    # backend (CLAUDE.md); a host fetch is the only reliable sync
    return [np.asarray(x) for x in jax.tree_util.tree_leaves(out)]


def timed(name, fn, *args, reps=3):
    """Last positional arg must be a PRNG key: identical calls can be served
    from a relay cache, so each rep folds in a distinct key."""
    *rest, key = args
    _fetch(fn(*rest, key))
    times = []
    for r in range(reps):
        t0 = time.time()
        _fetch(fn(*rest, jax.random.fold_in(key, r + 1)))
        times.append(time.time() - t0)
    return float(np.median(times))


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    v = 30522
    from case_rg_tpu.config import ModelConfig, TrainConfig
    from case_rg_tpu.models import create_model
    from case_rg_tpu.train.trainer import Trainer

    cfg = ModelConfig(name="case", vocab_size=v, embedding_size=256,
                      hidden_size=256, num_heads=8, enc_layers=3,
                      dec_layers=4, max_dec_len=40, max_target_length=40)
    model = create_model("case", cfg)
    rng = np.random.RandomState(0)
    batch = {
        "query": jnp.asarray(rng.randint(4, v, size=(B, 1, 60)), jnp.int32),
        "passage": jnp.asarray(rng.randint(4, v, size=(B, 10, 100)), jnp.int32),
        "response": jnp.asarray(rng.randint(4, v, size=(B, 40)), jnp.int32),
        "passage_label": jnp.zeros((B,), jnp.int32),
        "token_label": jnp.zeros((B, 10, 100), jnp.float32),
        "token_weight": jnp.ones((B, 10, 100), jnp.float32),
    }
    print(f"devices={jax.devices()} B={B} K={K}")

    tc = TrainConfig(batch_size=B, learning_rate=2.5e-4, warmup_steps=2000)
    trainer = Trainer(model, tc, total_steps=10000)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)

    # --- full step, K iterations in jit (state carried) ---
    def build_full(k, bf16=False, dropout=True, remat=None):
        tx = trainer.tx

        @jax.jit
        def run(state, batch, rng):
            def body(carry, i):
                st, key = carry
                key, sub = jax.random.split(key)

                def loss_fn(p):
                    if bf16:
                        from case_rg_tpu.train.precision import cast_params
                        p = cast_params(p, jnp.bfloat16)
                    losses = model.apply({"params": p}, batch,
                                         deterministic=not dropout,
                                         rngs={"dropout": sub} if dropout
                                         else {},
                                         method=type(model).train_losses)
                    return sum(jnp.asarray(l, jnp.float32)
                               for l in losses.values())

                if remat == "dots":
                    loss_fn = jax.checkpoint(
                        loss_fn,
                        policy=jax.checkpoint_policies
                        .dots_with_no_batch_dims_saveable)
                elif remat == "full":
                    loss_fn = jax.checkpoint(loss_fn)
                loss, grads = jax.value_and_grad(loss_fn)(st.params)
                updates, opt_state = tx.update(grads, st.opt_state, st.params)
                import optax
                params = optax.apply_updates(st.params, updates)
                st = st.replace(params=params, opt_state=opt_state,
                                step=st.step + 1)
                return (st, key), loss
            (st, _), losses = jax.lax.scan(body, (state, rng), jnp.arange(k))
            return st.step, losses[-1]
        return run

    # --- forward-only loops (carry a scalar into the batch for dependency) ---
    def build_fwd(k, method_name, deterministic):
        @jax.jit
        def run(params, batch, rng):
            def body(carry, i):
                acc, key = carry
                key, sub = jax.random.split(key)
                # roll the ids by a carry-dependent shift: the heavy forward
                # can't be hoisted out of the scan (inputs differ per
                # iteration and depend on the previous result)
                shift = i + (acc * 1e-30).astype(jnp.int32)
                b2 = dict(batch)
                for name in ("query", "passage", "response"):
                    b2[name] = jnp.roll(batch[name], shift, axis=-1)
                kwargs = {"deterministic": deterministic}
                rngs = {} if deterministic else {"dropout": sub}
                if method_name == "stages":
                    out = model.apply({"params": params}, b2,
                                      method=type(model).stages,
                                      rngs=rngs, **kwargs)
                    val = out["passage_score"].astype(jnp.float32).mean()
                else:
                    losses = model.apply({"params": params}, b2,
                                         method=type(model).train_losses,
                                         rngs=rngs, **kwargs)
                    val = sum(jnp.asarray(l, jnp.float32)
                              for l in losses.values())
                return (val * 1e-9, key), val
            # consume the key even in deterministic mode so it stays a live
            # input (distinct per-rep args defeat the relay call cache)
            base = jax.random.randint(rng, (), 0, 7).astype(jnp.float32)
            (_, _), vals = jax.lax.scan(body, (base * 1e-9, rng),
                                        jnp.arange(k))
            return vals[-1]
        return run

    params = state.params
    rngk = jax.random.PRNGKey(7)

    import os as _os
    if _os.environ.get("CASE_RG_BF16_SCORES") == "1":
        from case_rg_tpu.ops.attention import set_bf16_scores
        set_bf16_scores(True)
        print("[profile] bf16 attention scores ON", flush=True)
    parts = _os.environ.get("PROFILE_PARTS", "fwd,full").split(",")
    if "fwd" in parts:
        t = timed("stages", build_fwd(K, "stages", True), params, batch, rngk)
        print(f"fwd/stages (det)      : {t/K*1e3:8.1f} ms", flush=True)
        t = timed("loss-det", build_fwd(K, "loss", True), params, batch, rngk)
        print(f"fwd/loss   (det)      : {t/K*1e3:8.1f} ms", flush=True)
        t = timed("loss", build_fwd(K, "loss", False), params, batch, rngk)
        print(f"fwd/loss   (dropout)  : {t/K*1e3:8.1f} ms", flush=True)
    if "full" in parts:
        t = timed("full", build_full(K), state, batch, rngk)
        print(f"full step (grad+adam) : {t/K*1e3:8.1f} ms", flush=True)
    if "det" in parts:
        t = timed("full-det", build_full(K, dropout=False), state, batch, rngk)
        print(f"full step, no dropout : {t/K*1e3:8.1f} ms", flush=True)
    if "bf16" in parts:
        t = timed("full-bf16", build_full(K, bf16=True), state, batch, rngk)
        print(f"full step, bf16       : {t/K*1e3:8.1f} ms", flush=True)
    if "bf16det" in parts:
        t = timed("fb", build_full(K, bf16=True, dropout=False), state,
                  batch, rngk)
        print(f"full step, bf16 nodrop: {t/K*1e3:8.1f} ms", flush=True)
    if "remat" in parts:
        t = timed("rd", build_full(K, remat="dots"), state, batch, rngk)
        print(f"full step, remat dots : {t/K*1e3:8.1f} ms", flush=True)
    if "rematbf16" in parts:
        t = timed("rb", build_full(K, bf16=True, remat="dots"), state,
                  batch, rngk)
        print(f"full step, remat+bf16 : {t/K*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
