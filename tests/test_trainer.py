"""Trainer tests: schedule, EMA, accumulation, multi-device mesh step,
checkpoint/resume."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from case_rg_tpu.config import ModelConfig, TrainConfig
from case_rg_tpu.models import create_model
from case_rg_tpu.runtime.mesh import make_mesh
from case_rg_tpu.train.checkpoint import (latest_epoch, load_checkpoint,
                                          save_checkpoint)
from case_rg_tpu.train.schedule import cosine_hard_restarts_with_warmup
from case_rg_tpu.train.trainer import Trainer

V = 30


def _batch(rng, b=8):
    return {
        "context": rng.randint(1, V, size=(b, 6)).astype(np.int32),
        "background": rng.randint(1, V, size=(b, 10)).astype(np.int32),
        "response": rng.randint(4, V, size=(b, 5)).astype(np.int32),
        "sample_weight": np.ones(b, np.float32),
    }


def _cfg():
    return ModelConfig(name="s2sa", vocab_size=V, embedding_size=8,
                       hidden_size=8, num_heads=2)


def test_schedule_matches_hf_formula():
    import math
    sched = cosine_hard_restarts_with_warmup(2.5e-4, warmup_steps=10,
                                             total_steps=100, num_cycles=1)
    for step in [0, 1, 5, 9, 10, 30, 55, 99, 120]:
        if step < 10:
            expected = 2.5e-4 * step / 10
        else:
            progress = (step - 10) / (100 - 10)
            if progress >= 1.0:
                expected = 0.0
            else:
                expected = 2.5e-4 * max(
                    0.0, 0.5 * (1 + math.cos(math.pi * ((1 * progress) % 1.0))))
        assert abs(float(sched(step)) - expected) < 1e-9, step


def test_train_step_on_8_device_mesh_decreases_loss():
    assert jax.device_count() == 8
    mesh = make_mesh((8, 1))
    model = create_model("s2sa", _cfg())
    tc = TrainConfig(batch_size=8, learning_rate=1e-2, warmup_steps=1,
                     grad_clip=1.0, accumulation_steps=1)
    trainer = Trainer(model, tc, total_steps=100, mesh=mesh)
    rng = np.random.RandomState(0)
    batch = _batch(rng)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    key = jax.random.PRNGKey(1)
    losses = []
    for i in range(12):
        key, k = jax.random.split(key)
        state, out = trainer.train_step(state, dict(batch), k)
        losses.append(float(out["total"]))
    assert losses[-1] < losses[0]
    assert int(state.step) == 12


def test_ema_update_math():
    mesh = make_mesh((8, 1))
    model = create_model("s2sa", _cfg())
    tc = TrainConfig(batch_size=8, learning_rate=1e-3, warmup_steps=1,
                     ema_decay=0.9)
    trainer = Trainer(model, tc, total_steps=50, mesh=mesh)
    batch = _batch(np.random.RandomState(1))
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    p0 = jax.device_get(state.params)
    new_state, _ = trainer.train_step(state, dict(batch), jax.random.PRNGKey(2))
    p1 = jax.device_get(new_state.params)
    ema1 = jax.device_get(new_state.ema)
    leaf = "encoders/enc2dec"

    def get(tree, path):
        cur = tree
        for part in path.split("/"):
            cur = cur[part]
        return np.asarray(cur["kernel"])

    expected = 0.1 * get(p1, leaf) + 0.9 * get(p0, leaf)
    np.testing.assert_allclose(get(ema1, leaf), expected, atol=1e-6)


def test_gradient_accumulation_equivalence():
    """k=2 accumulation over two half-batches must equal one step on the
    full batch (grad mean), matching the reference's loss/accum division
    (CumulativeTrainer.py:64-76)."""
    mesh = make_mesh((8, 1))
    model = create_model("s2sa", _cfg())
    rngs = np.random.RandomState(2)
    full = _batch(rngs, b=16)
    half1 = {k: v[:8] for k, v in full.items()}
    half2 = {k: v[8:] for k, v in full.items()}

    tc_full = TrainConfig(batch_size=16, learning_rate=1e-3, warmup_steps=1,
                          accumulation_steps=1)
    tc_accum = TrainConfig(batch_size=8, learning_rate=1e-3, warmup_steps=1,
                           accumulation_steps=2)
    t_full = Trainer(model, tc_full, total_steps=50, mesh=mesh)
    t_accum = Trainer(model, tc_accum, total_steps=50, mesh=mesh)

    s0 = t_full.init_state(jax.random.PRNGKey(0), full)
    p0 = jax.device_get(s0.params)   # fetch before donation invalidates s0
    e0 = jax.device_get(s0.ema)
    s_full, _ = t_full.train_step(s0, dict(full), jax.random.PRNGKey(9))

    a0 = t_accum.init_state(jax.random.PRNGKey(0), half1)
    a0 = a0.replace(params=p0, ema=e0)
    a1, _ = t_accum.train_step(a0, dict(half1), jax.random.PRNGKey(9))
    assert int(a1.step) == 0  # not yet applied
    a2, _ = t_accum.train_step(a1, dict(half2), jax.random.PRNGKey(9))
    assert int(a2.step) == 1

    pf = jax.device_get(s_full.params)["gen"]["kernel"]
    pa = jax.device_get(a2.params)["gen"]["kernel"]
    np.testing.assert_allclose(np.asarray(pf), np.asarray(pa), atol=2e-5)


def test_checkpoint_resume_roundtrip(tmp_path):
    mesh = make_mesh((8, 1))
    model = create_model("s2sa", _cfg())
    tc = TrainConfig(batch_size=8, learning_rate=1e-3, warmup_steps=1)
    trainer = Trainer(model, tc, total_steps=50, mesh=mesh)
    batch = _batch(np.random.RandomState(3))
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    state, _ = trainer.train_step(state, dict(batch), jax.random.PRNGKey(1))
    save_checkpoint(str(tmp_path), 0, jax.device_get(state))
    assert latest_epoch(str(tmp_path)) == 0

    fresh = trainer.init_state(jax.random.PRNGKey(42), batch)
    restored = load_checkpoint(str(tmp_path), 0, jax.device_get(fresh))
    np.testing.assert_allclose(
        np.asarray(jax.device_get(state.params)["gen"]["kernel"]),
        np.asarray(restored.params["gen"]["kernel"]), atol=0)
    assert int(restored.step) == 1

    st2, start = trainer.resume_or_init(jax.random.PRNGKey(5), batch, str(tmp_path))
    assert start == 1
    np.testing.assert_allclose(
        np.asarray(jax.device_get(st2.params)["gen"]["kernel"]),
        np.asarray(restored.params["gen"]["kernel"]), atol=0)


def test_bf16_mixed_precision_training():
    mesh = make_mesh((8, 1))
    model = create_model("s2sa", _cfg())
    tc = TrainConfig(batch_size=8, learning_rate=1e-2, warmup_steps=1,
                     compute_dtype="bfloat16")
    trainer = Trainer(model, tc, total_steps=50, mesh=mesh)
    batch = _batch(np.random.RandomState(5))
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    losses = []
    key = jax.random.PRNGKey(1)
    for _ in range(8):
        key, k = jax.random.split(key)
        state, out = trainer.train_step(state, dict(batch), k)
        losses.append(float(out["total"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    # master params stay f32
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert leaf.dtype == jnp.float32


def test_mid_epoch_salvage_checkpoint(tmp_path):
    from case_rg_tpu.data.batching import Batcher
    import os
    mesh = make_mesh((8, 1))
    model = create_model("s2sa", _cfg())
    tc = TrainConfig(batch_size=8, learning_rate=1e-3, warmup_steps=1,
                     checkpoint_every_steps=2)
    trainer = Trainer(model, tc, total_steps=50, mesh=mesh)
    rng = np.random.RandomState(6)
    arrays = {k: np.concatenate([v] * 5) for k, v in _batch(rng).items()}
    arrays["id"] = np.arange(len(arrays["response"]), dtype=np.int32)
    state = trainer.init_state(jax.random.PRNGKey(0),
                               {k: v[:8] for k, v in arrays.items()})
    state = trainer.fit(state, arrays, 1, str(tmp_path), seed=0)
    assert os.path.exists(os.path.join(str(tmp_path), "model", "0.mid.ckpt"))
    assert os.path.exists(os.path.join(str(tmp_path), "model", "0.ckpt"))
    assert latest_epoch(str(tmp_path)) == 0  # salvage did not mark complete


def test_preemption_salvage_checkpoint(tmp_path):
    """SIGTERM-style preemption: the guard flag triggers a salvage
    checkpoint at the batch boundary and a clean stop (fit returns)."""
    import os
    from case_rg_tpu.data.batching import Batcher
    from case_rg_tpu.train.trainer import PreemptionGuard

    mesh = make_mesh((8, 1))
    model = create_model("s2sa", _cfg())
    tc = TrainConfig(batch_size=8, learning_rate=1e-3, warmup_steps=1)
    trainer = Trainer(model, tc, total_steps=50, mesh=mesh)
    rng = np.random.RandomState(7)
    arrays = {k: np.concatenate([v] * 4) for k, v in _batch(rng).items()}
    arrays["id"] = np.arange(len(arrays["response"]), dtype=np.int32)
    state = trainer.init_state(jax.random.PRNGKey(0),
                               {k: v[:8] for k, v in arrays.items()})

    guard = PreemptionGuard()
    guard.requested = True   # as if SIGTERM already arrived
    batcher = Batcher(arrays, 8, shuffle=False)
    with pytest.raises(KeyboardInterrupt):
        trainer.train_epoch(state, batcher, 0, jax.random.PRNGKey(1),
                            output_path=str(tmp_path), guard=guard)
    assert os.path.exists(
        os.path.join(str(tmp_path), "model", "0.preempt.ckpt"))
    # the salvage checkpoint restores into the state template
    from case_rg_tpu.train.checkpoint import load_checkpoint
    restored = load_checkpoint(str(tmp_path), "0.preempt",
                               jax.device_get(state))
    assert int(np.asarray(restored.step)) == int(np.asarray(state.step))
    assert latest_epoch(str(tmp_path)) is None   # not marked complete


def test_eval_losses_weighted_batch_mean():
    """trainer.eval_losses: count-weighted mean of deterministic batch
    losses; the padded final batch contributes only its real rows."""
    rng = np.random.RandomState(5)
    n, bs = 6, 4
    arrays = {
        "id": np.arange(n),
        "context": rng.randint(1, V, size=(n, 6)).astype(np.int32),
        "background": rng.randint(1, V, size=(n, 10)).astype(np.int32),
        "response": rng.randint(4, V, size=(n, 5)).astype(np.int32),
    }
    model = create_model("s2sa", _cfg())
    tc = TrainConfig(batch_size=bs, learning_rate=1e-3, warmup_steps=1)
    trainer = Trainer(model, tc, total_steps=10)
    sample = {k: v[:bs] for k, v in arrays.items() if k != "id"}
    sample["sample_weight"] = np.ones(bs, np.float32)
    state = trainer.init_state(jax.random.PRNGKey(0), sample)

    got = trainer.eval_losses(state, arrays)

    # manual: per-batch deterministic losses, weighted 4 and 2
    def batch_loss(sl, w):
        bt = {k: jnp.asarray(v[sl]) for k, v in arrays.items() if k != "id"}
        bt = {k: jnp.concatenate([v, v[-1:].repeat(bs - v.shape[0], 0)])
              if v.shape[0] < bs else v for k, v in bt.items()}
        bt["sample_weight"] = jnp.asarray(w)
        losses = model.apply({"params": state.params}, bt,
                             deterministic=True,
                             method=type(model).train_losses)
        return {k: float(v) for k, v in losses.items()}

    l1 = batch_loss(slice(0, 4), np.ones(bs, np.float32))
    w2 = np.zeros(bs, np.float32)
    w2[:2] = 1.0
    l2 = batch_loss(slice(4, 6), w2)
    for k in l1:
        expected = (4 * l1[k] + 2 * l2[k]) / 6
        np.testing.assert_allclose(got[k], expected, rtol=1e-5,
                                   err_msg=k)
    assert np.isfinite(got["total"])
    # determinism: identical on repeat
    again = trainer.eval_losses(state, arrays)
    assert got == again


def test_fit_early_stop_and_best_json(tmp_path):
    """fit(early_stop=N): training stops after N non-improving dev epochs
    and model/best.json tracks the best epoch (scripted dev losses)."""
    import os

    from case_rg_tpu.data.batching import Batcher  # noqa: F401 (parity)
    from case_rg_tpu.train.checkpoint import best_epoch, checkpoint_exists

    rng = np.random.RandomState(11)
    n = 8
    arrays = {
        "id": np.arange(n),
        "context": rng.randint(1, V, size=(n, 6)).astype(np.int32),
        "background": rng.randint(1, V, size=(n, 10)).astype(np.int32),
        "response": rng.randint(4, V, size=(n, 5)).astype(np.int32),
    }
    model = create_model("s2sa", _cfg())
    tc = TrainConfig(batch_size=8, learning_rate=1e-3, warmup_steps=1)
    trainer = Trainer(model, tc, total_steps=50)
    sample = {k: v for k, v in arrays.items() if k != "id"}
    sample = dict(sample, sample_weight=np.ones(n, np.float32))
    state = trainer.init_state(jax.random.PRNGKey(0), sample)

    script = iter([1.0, 0.9, 0.95, 0.96, 0.97, 0.5])
    trainer.eval_losses = lambda st, arr: {"total": next(script)}

    out = str(tmp_path / "es")
    trainer.fit(state, arrays, epochs=6, output_path=out,
                eval_arrays=arrays, early_stop=2)
    # dev: 1.0, 0.9, 0.95, 0.96 -> stop after epoch 3 (2 stale epochs);
    # epochs 4/5 (dev 0.97/0.5) never run
    assert checkpoint_exists(out, 3)
    assert not checkpoint_exists(out, 4)
    assert best_epoch(out) == 1

    # early_stop=0: full run, best.json still tracks the minimum
    # (fresh state: the first fit's train steps donated the old buffers)
    state = trainer.init_state(jax.random.PRNGKey(0), sample)
    script2 = iter([1.0, 0.9, 0.95, 0.2])
    trainer.eval_losses = lambda st, arr: {"total": next(script2)}
    out2 = str(tmp_path / "full")
    trainer.fit(state, arrays, epochs=4, output_path=out2,
                eval_arrays=arrays)
    assert checkpoint_exists(out2, 3)
    assert best_epoch(out2) == 3


@pytest.mark.parametrize("policy", ["dots", "nothing"])
def test_remat_policies_match_baseline(policy):
    """TrainConfig.remat changes WHICH forward residuals reach the backward
    pass (HBM-traffic lever, docs/PERF.md round 11) — never the math. Same
    seeds, same batches: losses and updated params must match the no-remat
    step to f32 tolerance over several steps."""
    model = create_model("s2sa", _cfg())
    rng = np.random.RandomState(3)
    batch = _batch(rng)

    def run(remat):
        tc = TrainConfig(batch_size=8, learning_rate=1e-2, warmup_steps=1,
                         remat=remat)
        trainer = Trainer(model, tc, total_steps=100)
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        key = jax.random.PRNGKey(1)
        losses = []
        for _ in range(3):
            key, k = jax.random.split(key)
            state, out = trainer.train_step(state, dict(batch), k)
            losses.append(float(out["total"]))
        return losses, jax.device_get(state.params)

    base_losses, base_params = run("")
    rem_losses, rem_params = run(policy)
    np.testing.assert_allclose(rem_losses, base_losses, rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6),
        base_params, rem_params)


def test_seeded_dropout_matches_default_bitwise():
    """Seeded-recompute dropout (ops/dropout.py): identical masks (same
    make_rng folds) and identical arithmetic mean the custom-vjp path
    reproduces the default flax path's loss BITWISE and its gradients to
    f32 fusion tolerance (the custom-vjp boundary changes how XLA fuses
    the backward, so surrounding sums may re-associate by an ulp — adam
    would amplify that on near-zero gradients, so the check is on the
    gradients themselves, not on optimizer output). CaSE exercises both
    the module Dropout sites and the attention-probs dropout_apply
    site."""
    from case_rg_tpu.ops.dropout import set_seeded_dropout

    cfg = ModelConfig(name="case", vocab_size=V, embedding_size=8,
                      hidden_size=8, num_heads=2, enc_layers=1,
                      dec_layers=1, max_dec_len=5, max_target_length=5)
    model = create_model("case", cfg)
    rng = np.random.RandomState(5)
    b = 4
    batch = {
        "query": jnp.asarray(rng.randint(4, V, size=(b, 1, 6)), jnp.int32),
        "passage": jnp.asarray(rng.randint(4, V, size=(b, 2, 8)),
                               jnp.int32),
        "response": jnp.asarray(rng.randint(4, V, size=(b, 5)), jnp.int32),
        "passage_label": jnp.zeros((b,), jnp.int32),
        "token_label": jnp.asarray(
            (rng.rand(b, 2, 8) > 0.7).astype(np.float32)),
        "token_weight": jnp.ones((b, 2, 8), jnp.float32),
    }
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           batch, method=type(model).train_losses)

    def loss_fn(params, d_rng):
        losses = model.apply({"params": params}, batch,
                             deterministic=False, rngs={"dropout": d_rng},
                             method=type(model).train_losses)
        return sum(losses.values())

    def run(seeded):
        set_seeded_dropout(seeded)
        try:
            # fresh jit per mode: the flag is trace-time
            fn = jax.jit(jax.value_and_grad(loss_fn))
            loss, grads = fn(variables["params"], jax.random.PRNGKey(7))
            return float(loss), jax.device_get(grads)
        finally:
            set_seeded_dropout(False)

    base_loss, base_grads = run(False)
    seed_loss, seed_grads = run(True)
    assert base_loss == seed_loss, (base_loss, seed_loss)
    jax.tree_util.tree_map(
        lambda a, b_: np.testing.assert_allclose(a, b_, rtol=1e-5,
                                                 atol=5e-7),
        base_grads, seed_grads)
