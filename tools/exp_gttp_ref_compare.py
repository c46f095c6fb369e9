"""Equal-steps GTTP: our trainer vs the actual reference, same data.

VERDICT r4 item 5: the round-13 32-epoch overfit measured OUR GTTP
plateauing at ROUGE-L 10.0 (vs GLKS 20.0) and asserted — without a
reference-side run — that this matches the reference architecture's
behavior. This tool produces the measurement: train the REFERENCE
``GTTP.Model.GTTP`` (imported from /root/reference with the same dep
stubs the parity suite uses) and OUR ``GTTPModel`` side by side on the
SAME 149 prepared CAsT samples (tensor-identical featurization —
tests/test_reference_parity_data.py), with the same optimizer recipe
(Adam 2.5e-4, clip 1.0, cosine-hard-restarts warmup 2000 —
GTTP/Run.py:28-30, common/CumulativeTrainer.py:64-76), same batch
order (seeded permutation, full batches), equal steps. Logged per
step: total mle loss and the mean copy gate sigma(linear_copy(.))
(GTTP/Model.py:29-30) — the mechanism whose slow convergence is the
claim under test.

Both runs are CPU (torch has no accelerator here; ours uses the
JAX CPU backend so the comparison shares one device class).

Usage:
  python tools/exp_gttp_ref_compare.py --steps 200 [--b 16] \
      [--data /tmp/gttp_cmp/cast/prepared] [--side ref|ours|both]

Writes /tmp/gttp_cmp/{ref,ours}_log.json and prints a side-by-side
table on --report (or at the end of --side both).
"""

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

DATA = "/tmp/gttp_cmp/cast/prepared"
OUT = "/tmp/gttp_cmp"


def load_corpus(data_dir, model="gttp"):
    arrs = dict(np.load(os.path.join(data_dir, f"test.{model}.npz")))
    vocab_path = os.path.join(data_dir, "vocab.txt")
    words = [w.rstrip("\n") for w in open(vocab_path, encoding="utf-8")]
    vocab2id = {w: i for i, w in enumerate(words)}
    id2vocab = {i: w for i, w in enumerate(words)}
    return arrs, vocab2id, id2vocab


def batch_order(n, b, steps, seed=123456):
    """Deterministic epoch-permuted full batches, shared by both sides."""
    rng = np.random.RandomState(seed)
    order = []
    while len(order) < steps:
        perm = rng.permutation(n)
        for i in range(0, n - b + 1, b):
            order.append(perm[i:i + b])
            if len(order) == steps:
                break
    return order


def run_reference(arrs, vocab2id, id2vocab, steps, b, log_path,
                  mname="gttp"):
    import torch
    from reference_loader import load_reference
    load_reference()
    from common.CumulativeTrainer import init_params
    from transformers.optimization import \
        get_cosine_with_hard_restarts_schedule_with_warmup

    torch.manual_seed(123456)
    if mname == "gttp":
        from GTTP.Model import GTTP as RefGTTP
        model = RefGTTP(256, 256, vocab2id, id2vocab, max_dec_len=40,
                        beam_width=1)
        gate_mod, method = None, "train"
    else:
        from GLKS.Model import GLKS as RefGLKS
        model = RefGLKS(4, 1, 256, 256, vocab2id, id2vocab,
                        max_dec_len=40, beam_width=1)
        gate_mod, method = model.mixture.linear1, "ds_mle_mce_train"
    init_params(model)   # xavier, as every reference Run.py does
    model.train()
    opt = torch.optim.Adam(model.parameters(), lr=2.5e-4)
    sched = get_cosine_with_hard_restarts_schedule_with_warmup(
        opt, 2000, steps + 100)

    gate_vals = []

    def hook(mod, inp, out):
        gate_vals.append(float(torch.sigmoid(out).mean().detach()))

    (gate_mod if gate_mod is not None
     else model.gen.linear_copy).register_forward_hook(hook)

    order = batch_order(arrs["context"].shape[0], b, steps)
    log = []
    import time
    for s, idx in enumerate(order):
        data = {
            "id": torch.arange(len(idx)),
            "context": torch.tensor(arrs["context"][idx], dtype=torch.long),
            "background": torch.tensor(arrs["background"][idx],
                                       dtype=torch.long),
            "background_map": torch.tensor(arrs["background"][idx],
                                           dtype=torch.long),
            "response": torch.tensor(arrs["response"][idx],
                                     dtype=torch.long),
        }
        if "selection" in arrs:
            data["selection"] = torch.tensor(
                arrs["selection"][idx], dtype=torch.float32)
        gate_vals.clear()
        t0 = time.time()
        loss = model(data, method=method)
        # multi-loss models return a list/cat — sum the means exactly as
        # CumulativeTrainer.train_batch:56-58 does
        loss = (sum(l.mean() for l in loss)
                if isinstance(loss, (list, tuple)) else
                loss.sum() if loss.ndim else loss.mean())
        opt.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
        opt.step()
        sched.step()
        log.append({"step": s, "loss": float(loss.detach()),
                    "gate": float(np.mean(gate_vals)),
                    "s": time.time() - t0})
        if s % 10 == 0 or s == steps - 1:
            print(f"[ref] step {s:4d} loss {log[-1]['loss']:.4f} "
                  f"gate {log[-1]['gate']:.4f} "
                  f"({log[-1]['s']:.1f}s/step)", flush=True)
            with open(log_path, "w") as f:
                json.dump(log, f)
    with open(log_path, "w") as f:
        json.dump(log, f)
    return log


def run_ours(arrs, vocab_size, steps, b, log_path, mname="gttp"):
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from case_rg_tpu.config import ModelConfig, TrainConfig
    from case_rg_tpu.models import create_model
    from case_rg_tpu.train.trainer import Trainer

    cfg = ModelConfig(name=mname, vocab_size=vocab_size,
                      embedding_size=256, hidden_size=256, num_heads=8,
                      max_dec_len=40, max_target_length=40,
                      min_window_size=4, num_windows=1)
    model = create_model(mname, cfg)
    lk = ({"mode": "ds_mle_mce_train"} if mname == "glks" else None)
    tc = TrainConfig(batch_size=b, learning_rate=2.5e-4, warmup_steps=2000,
                     compute_dtype="float32")
    trainer = Trainer(model, tc, total_steps=steps + 100,
                      loss_method_kwargs=lk)

    def mk(idx):
        out = {"context": jnp.asarray(arrs["context"][idx].astype(np.int32)),
               "background": jnp.asarray(
                   arrs["background"][idx].astype(np.int32)),
               "response": jnp.asarray(
                   arrs["response"][idx].astype(np.int32))}
        if "selection" in arrs:
            out["selection"] = jnp.asarray(
                arrs["selection"][idx].astype(np.float32))
        return out

    order = batch_order(arrs["context"].shape[0], b, steps)
    state = trainer.init_state(jax.random.PRNGKey(123456), mk(order[0]))

    # gate probe: same math as train_losses' scan, returning mean
    # sigma(gate linear) over steps x batch (jitted once, run per log
    # step). GTTP: p_copy (copy share). GLKS: p_mix (VOCAB share —
    # matches the reference Mixturer's p_k_v, GLKS/Model.py:140-147).
    def gate_probe(mdl, batch):
        resp = batch["response"]
        bb, t = resp.shape
        bos = jnp.full((bb, 1), mdl.cfg.bos_id, resp.dtype)
        inputs = jnp.concatenate([bos, resp[:, :-1]], axis=1)
        if mname == "glks":
            embs = mdl.emb_drop(mdl.embedding(inputs), deterministic=True)
            enc = mdl.encode(batch, deterministic=True)

            def body(state, emb_t):
                _, state = mdl.st_gru.step(emb_t, state)
                _, _, _, p_mix = mdl._generate_core(emb_t[:, None], state,
                                                    enc)
                return state, jnp.mean(p_mix)

            _, gates = jax.lax.scan(body, enc["init_state"],
                                    jnp.swapaxes(embs, 0, 1))
            return jnp.mean(gates)
        embs = mdl.dec.embed(inputs, True)
        enc = mdl.encode(batch, deterministic=True)

        def body(state, emb_t):
            feature, state, _, bg_attn = mdl.dec.step(
                emb_t, state, enc["c_out"], enc["b_out"], enc["c_keep"],
                enc["b_keep"], enc.get("src_uh"), enc.get("bg_uh"))
            _, p_copy = mdl._gen_logits_and_gate(feature)
            return state, jnp.mean(p_copy)

        _, gates = jax.lax.scan(body, enc["init_state"],
                                jnp.swapaxes(embs, 0, 1))
        return jnp.mean(gates)

    import functools
    gate_fn = jax.jit(functools.partial(
        lambda p, bt: model.apply({"params": p}, bt, method=gate_probe)))

    import time
    key = jax.random.PRNGKey(7)
    log = []
    for s, idx in enumerate(order):
        bt = mk(idx)
        key, sub = jax.random.split(key)
        t0 = time.time()
        state, losses = trainer.train_step(state, bt, sub)
        loss = float(losses["total"])
        gate = float(gate_fn(state.params, bt))
        log.append({"step": s, "loss": loss, "gate": gate,
                    "s": time.time() - t0})
        if s % 10 == 0 or s == steps - 1:
            print(f"[ours] step {s:4d} loss {loss:.4f} gate {gate:.4f} "
                  f"({log[-1]['s']:.1f}s/step)", flush=True)
            with open(log_path, "w") as f:
                json.dump(log, f)
    with open(log_path, "w") as f:
        json.dump(log, f)
    return log


def report(ref_path, ours_path):
    ref = json.load(open(ref_path)) if os.path.exists(ref_path) else []
    ours = json.load(open(ours_path)) if os.path.exists(ours_path) else []
    n = min(len(ref), len(ours))
    if not n:
        print("logs missing:", ref_path, ours_path)
        return
    print(f"\n== GTTP equal-steps: reference (torch CPU) vs ours (JAX) ==")
    print(f"{'step':>5}{'ref loss':>10}{'our loss':>10}{'d':>7}"
          f"{'ref gate':>10}{'our gate':>10}")
    for s in list(range(0, n, 10)) + ([n - 1] if (n - 1) % 10 else []):
        r, o = ref[s], ours[s]
        print(f"{s:>5}{r['loss']:>10.4f}{o['loss']:>10.4f}"
              f"{o['loss']-r['loss']:>7.3f}{r['gate']:>10.4f}"
              f"{o['gate']:>10.4f}")
    # trajectory agreement: mean |delta| over the shared window
    d = [abs(ref[s]["loss"] - ours[s]["loss"]) for s in range(n)]
    print(f"\nmean |loss delta| over {n} steps: {np.mean(d):.4f} "
          f"(ref {ref[0]['loss']:.2f}->{ref[n-1]['loss']:.2f}, "
          f"ours {ours[0]['loss']:.2f}->{ours[n-1]['loss']:.2f})")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--b", type=int, default=16)
    p.add_argument("--data", type=str, default=DATA)
    p.add_argument("--side", type=str, default="both",
                   choices=["ref", "ours", "both", "report"])
    p.add_argument("--model", type=str, default="gttp",
                   choices=["gttp", "glks"])
    args = p.parse_args()

    os.makedirs(OUT, exist_ok=True)
    tag = "" if args.model == "gttp" else f"_{args.model}"
    ref_log = os.path.join(OUT, f"ref{tag}_log.json")
    ours_log = os.path.join(OUT, f"ours{tag}_log.json")
    if args.side == "report":
        report(ref_log, ours_log)
        sys.exit(0)
    arrs, vocab2id, id2vocab = load_corpus(args.data, args.model)
    print(f"corpus n={arrs['context'].shape[0]} V={len(vocab2id)} "
          f"steps={args.steps} b={args.b} model={args.model}", flush=True)
    if args.side in ("ours", "both"):
        run_ours(arrs, len(vocab2id), args.steps, args.b, ours_log,
                 args.model)
    if args.side in ("ref", "both"):
        run_reference(arrs, vocab2id, id2vocab, args.steps, args.b,
                      ref_log, args.model)
    report(ref_log, ours_log)
