"""CLI: train / test any of the six models.

Replaces the reference's per-model Run.py entry points (e.g. CaSE/Run.py;
all six duplicated the same argparse + train/test scaffolding, several with
latent path bugs — SURVEY §4):

    python -m case_rg_tpu.cli.run --model case --mode train \
        --data_path ./dataset/ --dataset cast
    python -m case_rg_tpu.cli.run --model case --mode test ...

Training resumes from the last checkpoint automatically; testing iterates
every saved epoch checkpoint and writes per-process .answer/.run shards
(ref: CaSE/Run.py:49-62).
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from ..config import DataConfig, ModelConfig, TrainConfig
from ..data.prepare import load_prepared
from ..models import build_model_cfg, create_model
from ..runtime.inference import make_predict_fn
from ..runtime.io import save_results
from ..runtime.mesh import make_mesh
from ..train.checkpoint import checkpoint_exists, load_checkpoint
from ..train.trainer import Trainer


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--model", type=str, required=True,
                   choices=["case", "masque", "glks", "tmemnet", "gttp", "s2sa"])
    p.add_argument("--mode", type=str, required=True,
                   choices=["train", "test", "ps_train", "avg"])
    p.add_argument("--data_path", type=str, default="./dataset/")
    p.add_argument("--dataset", type=str, default="cast")
    p.add_argument("--prepared_dir", type=str, default=None)
    p.add_argument("--output_path", type=str, default=None)
    p.add_argument("--embedding_size", type=int, default=256)
    p.add_argument("--hidden_size", type=int, default=256)
    p.add_argument("--num_heads", type=int, default=8)
    p.add_argument("--max_span_size", type=int, default=4)
    p.add_argument("--max_target_length", type=int, default=40)
    p.add_argument("--accumulation_steps", type=int, default=1)
    p.add_argument("--epoch", type=int, default=20)
    # reference: 16 per GPU x 4 GPUs (CaSE/Run.py:78-79); ours is global.
    # Default resolves in main(): 64, except --mode test --rank_only which
    # uses the measured B=128 knee (docs/PERF.md round 12) like serve.
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--learning_rate", type=float, default=2.5e-4)
    p.add_argument("--warmup_steps", type=int, default=2000)
    p.add_argument("--beam_width", type=int, default=1)
    p.add_argument("--decoding", type=str, default="greedy",
                   choices=["greedy", "sample"],
                   help="test-time decoding; with the default 'greedy', "
                        "beam_width>1 selects beam search; 'sample' draws "
                        "from the model distribution (seeded by --seed) and "
                        "is incompatible with beam_width>1")
    p.add_argument("--ckpt_backend", type=str, default="msgpack",
                   choices=["msgpack", "orbax"],
                   help="orbax: async + sharded checkpoints")
    from .flags import add_fast_argmax_flag
    add_fast_argmax_flag(p)
    p.add_argument("--fused_stack", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="fused Pallas decoder-stack decode step (folds the "
                        "cross K/V caches into raw-memory dots; one Mosaic "
                        "program per stack per step). Default: auto — on "
                        "for bf16 TPU inference on long-memory stacks "
                        "(docs/PERF.md round 10). --fused_stack forces it "
                        "everywhere, --no-fused_stack restores the XLA "
                        "per-layer chain")
    p.add_argument("--rank_only", action="store_true",
                   help="--mode test: write only the .run ranking files, "
                        "skipping answer generation (case/masque/tmemnet; "
                        "the sequential decode dominates predict cost)")
    p.add_argument("--fused_train_attn",
                   action=argparse.BooleanOptionalAction, default=None,
                   help="training: fused fwd+bwd Pallas attention with "
                        "prob dropout for the encoder/tower self-attn "
                        "sites (kernels/train_attention.py — probs never "
                        "reach HBM in either direction; identical "
                        "dropout mask stream). 251 -> 221 ms/step at "
                        "B=64 (-12%%, docs/PERF.md round 13). Default: "
                        "ON for --bf16_train training after the metric-"
                        "equivalence smoke, OFF for f32 (parity dtype)")
    p.add_argument("--kernel_rng_dropout",
                   action=argparse.BooleanOptionalAction, default=None,
                   help="training: draw the fused-attention prob-dropout "
                        "masks INSIDE the Pallas kernel (Mosaic per-core "
                        "PRNG, regenerated bit-identically in the "
                        "backward) instead of passing caller-drawn "
                        "masks — no [R,H,Lq,Lk] mask tensor exists in "
                        "HBM; 174.4 -> 167.8 ms/step (-3.8%%, docs/"
                        "PERF.md round 15). Different-but-valid "
                        "bernoulli stream vs nn.Dropout (same standard "
                        "as the rbg default: smoke showed identical "
                        "ranking metrics, generation within overfit "
                        "noise). Default: auto-ON when the fused "
                        "training attention is active for --bf16_train "
                        "on a real TPU; --no-kernel_rng_dropout "
                        "restores the nn.Dropout-stream masks")
    p.add_argument("--seeded_dropout", action=argparse.BooleanOptionalAction,
                   default=False,
                   help="training: regenerate dropout masks in the "
                        "backward pass from their PRNG keys instead of "
                        "storing them (ops/dropout.py custom_vjp) — same "
                        "losses/gradients bitwise, less HBM traffic on "
                        "the bandwidth-bound train step")
    p.add_argument("--temperature", type=float, default=1.0,
                   help="sampling temperature (--decoding sample); 1.0 "
                        "keeps the reference-parity sampler")
    p.add_argument("--top_k", type=int, default=0,
                   help="top-k sampling cutoff (0 = off)")
    p.add_argument("--top_p", type=float, default=1.0,
                   help="nucleus sampling mass (1.0 = off)")
    p.add_argument("--early_exit", action="store_true",
                   help="stop decoding once every row emitted EOS "
                        "(sentence-identical, faster)")
    p.add_argument("--bf16_eval", action="store_true",
                   help="cast parameters to bfloat16 for inference "
                        "(MXU-native; softmax stays f32)")
    p.add_argument("--bf16_scores", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="with bf16 compute: keep attention scores in bf16 "
                        "instead of f32 (+16%% CaSE serving qps; generation "
                        "metrics unchanged, ranking can flip near-ties — "
                        "docs/PERF.md round 4). Default: ON for "
                        "--bf16_train training (-5%% step time, metric-"
                        "equivalent on the demo smoke — round 13), OFF "
                        "elsewhere (inference keeps the f32-scored "
                        "metric-identity contract)")
    p.add_argument("--fused_attn", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="Pallas fused encoder attention for bf16 inference "
                        "on TPU (scores stay in VMEM; ~1-ULP bf16 rounding "
                        "differences vs the einsum path — docs/PERF.md "
                        "round 5; --no-fused_attn restores the einsum path)")
    p.add_argument("--ema_eval", action="store_true")
    p.add_argument("--no_resume", action="store_true")
    p.add_argument("--seed", type=int, default=123456)
    p.add_argument("--min_window_size", type=int, default=4)
    p.add_argument("--num_windows", type=int, default=1)
    p.add_argument("--multihost", action="store_true",
                   help="initialize jax.distributed for multi-host meshes "
                        "(replaces torch.distributed.launch; ref run.sh:21)")
    p.add_argument("--profile_dir", type=str, default=None)
    p.add_argument("--early_stop", type=int, default=0,
                   help="stop training once the per-epoch dev loss "
                        "(--dev_eval) hasn't improved for this many "
                        "consecutive epochs; 0 = train the full --epoch "
                        "count (the reference always does). The best "
                        "epoch is recorded in model/best.json either way")
    p.add_argument("--best_only", action="store_true",
                   help="--mode test: decode only the best-dev-loss epoch "
                        "(model/best.json, written by --dev_eval training) "
                        "instead of every checkpoint")
    p.add_argument("--avg_epochs", type=str, default="",
                   help="--mode avg: comma-separated epochs to average "
                        "(default: the last 3 existing checkpoints)")
    p.add_argument("--avg_only", action="store_true",
                   help="--mode test: decode only the averaged checkpoint "
                        "(model/avg.ckpt, written by --mode avg)")
    p.add_argument("--dev_eval", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="deterministic dev loss after every training epoch "
                        "(logged as dev_* in metrics.jsonl; picks epochs "
                        "without decoding every checkpoint)")
    p.add_argument("--continuous", action="store_true",
                   help="--mode test: continuous-batching offline predict "
                        "(per-row decode progress + row refill; batch cost "
                        "tracks the mean answer length). Answers identical "
                        "to the batch path; rank scores within ~1 f32 ulp")
    p.add_argument("--chunk_steps", type=int, default=8,
                   help="--continuous: decode steps between harvest/refill")
    p.add_argument("--refill", type=int, default=0,
                   help="--continuous: refill bucket size (0 = batch/4)")
    p.add_argument("--refill_min", type=int, default=1,
                   help="--continuous: coalesce refills — wait for this "
                        "many free rows before a mid-flight refill")
    p.add_argument("--lookahead", action="store_true",
                   help="--continuous: keep one chunk dispatched ahead "
                        "(harvest fetch overlaps the next chunk's compute)")
    p.add_argument("--device_loop", type=int, default=0, metavar="K",
                   help="--continuous: device-resident loop — K chunks "
                        "per dispatch with in-jit harvest + refills from "
                        "a pre-staged on-device ring (runtime/continuous/"
                        "device_loop; beats the fixed path where the "
                        "per-chunk loop loses — docs/PERF.md round 11). "
                        "Composes with --lookahead (double-dispatch). "
                        "0 = the per-chunk host loop")
    p.add_argument("--stage_rows", type=int, default=0,
                   help="--device_loop: on-device ring size in rows "
                        "(0 = auto: ~batch*K*chunk_steps/10 — two megas' "
                        "expected consumption, covering the lookahead "
                        "harvest lag)")
    p.add_argument("--async_harvest", action="store_true",
                   help="--continuous: pipelined flag fetch — done/out "
                        "ride a copy_to_host_async read one round later; "
                        "no blocking roundtrip between chunks. With "
                        "--lookahead: dispatch-first order (device "
                        "computes through host refill work — best on "
                        "relay-attached chips, 591 vs 316 qps at "
                        "chunk=8); without: harvest-first order "
                        "(1-chunk lag — best at sub-ms RTT)")
    p.add_argument("--checkpoint_every_steps", type=int, default=0,
                   help="mid-epoch salvage checkpoints every N steps")
    p.add_argument("--bf16_train", action="store_true",
                   help="mixed-precision training (bf16 compute, f32 master)")
    p.add_argument("--remat", type=str, default="",
                   choices=["", "dots", "dots_batch", "nothing"],
                   help="rematerialize the forward in the backward pass: "
                        "'dots' keeps only matmul outputs (elementwise "
                        "chains recomputed — an HBM-traffic lever on the "
                        "bandwidth-bound train step, docs/PERF.md r11), "
                        "'nothing' recomputes everything (minimum memory). "
                        "Gradients are bitwise-identical either way")
    p.add_argument("--mesh_shape", type=str, default="",
                   help="device mesh as 'data,model' (e.g. 4,2); default: "
                        "all local devices on the data axis")
    p.add_argument("--pool_shard", action="store_true",
                   help="shard the passage-pool axis over the 'model' mesh "
                        "axis (pool parallelism: per-passage tower compute "
                        "stays local, collectives only at the cross-passage "
                        "joins; needs --mesh_shape with model>1)")
    p.add_argument("--fast_rng", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="hardware RNG (rbg) for dropout masks: ~14%% faster "
                        "train step (dropout mask generation is ~25%% of the "
                        "CaSE step with threefry — docs/PERF.md), "
                        "metric-equivalent on the CAsT-sample smoke train "
                        "(docs/PERF.md round 10). Default on; "
                        "--no-fast_rng restores the threefry stream for "
                        "reproducible comparisons against older runs")
    return p


def setup(args, need_train: bool = True):
    prepared = args.prepared_dir or os.path.join(args.data_path, args.dataset,
                                                 "prepared")
    output = args.output_path or os.path.join("./output", args.model)
    arrays = None
    if need_train:
        arrays, _meta, vocab, _ = load_prepared(prepared, "train", args.model)
    else:
        from ..data.vocab import Vocabulary
        vocab = Vocabulary.load(os.path.join(prepared, "vocab.txt"))
    base = ModelConfig(embedding_size=args.embedding_size,
                       hidden_size=args.hidden_size, num_heads=args.num_heads,
                       max_span_size=args.max_span_size,
                       max_target_length=args.max_target_length,
                       max_dec_len=args.max_target_length,
                       beam_width=args.beam_width,
                       min_window_size=args.min_window_size,
                       num_windows=args.num_windows)
    mcfg = build_model_cfg(base, args.model, vocab)
    model = create_model(args.model, mcfg)
    return prepared, output, arrays, vocab, mcfg, model


def train(args):
    prepared, output, arrays, vocab, mcfg, model = setup(args)
    n = len(arrays["id"])
    total_steps = int(args.epoch * n / (args.batch_size *
                                        args.accumulation_steps)) + 100
    tc = TrainConfig(batch_size=args.batch_size, epochs=args.epoch,
                     learning_rate=args.learning_rate,
                     warmup_steps=args.warmup_steps,
                     accumulation_steps=args.accumulation_steps,
                     seed=args.seed, output_path=output,
                     resume=not args.no_resume,
                     checkpoint_every_steps=args.checkpoint_every_steps,
                     ckpt_backend=args.ckpt_backend,
                     compute_dtype="bfloat16" if args.bf16_train else "float32",
                     remat=args.remat,
                     mesh_shape=tuple(int(x) for x in
                                      args.mesh_shape.split(",") if x),
                     pool_shard=args.pool_shard)
    loss_kwargs = {}
    if args.mode == "ps_train":
        if args.model not in ("masque", "tmemnet"):
            raise SystemExit("ps_train is only defined for masque/tmemnet "
                             "(ref: Masque/Model.py:244-258, TMemNet/Model.py:176-183)")
        loss_kwargs = {"mode": "ps_train"}
    elif args.model == "glks":
        loss_kwargs = {"mode": "ds_mle_mce_train"}
    trainer = Trainer(model, tc, total_steps, loss_method_kwargs=loss_kwargs)
    from ..data.batching import Batcher
    sample = next(Batcher(arrays, args.batch_size, shuffle=False).epoch(0))
    sample = {k: v for k, v in sample.items() if not k.startswith("_")}
    state, start_epoch = trainer.resume_or_init(
        jax.random.PRNGKey(args.seed), sample, output)
    print(f"[run] {args.model} train: {n} samples, {total_steps} steps, "
          f"start epoch {start_epoch}", flush=True)
    # per-epoch dev loss (epoch selection without decoding every
    # checkpoint — trainer.eval_losses); logged as dev_* in metrics.jsonl
    eval_arrays = None
    if args.dev_eval:
        dev_path = os.path.join(prepared, f"dev.{args.model}.npz")
        if os.path.exists(dev_path):
            eval_arrays, _, _, _ = load_prepared(prepared, "dev", args.model)
            if len(eval_arrays["id"]) == 0:
                eval_arrays = None
    if args.early_stop and eval_arrays is None:
        raise SystemExit("--early_stop needs --dev_eval and a prepared dev "
                         "split")
    trainer.fit(state, arrays, args.epoch, output, seed=args.seed,
                start_epoch=start_epoch, profile_dir=args.profile_dir,
                eval_arrays=eval_arrays, early_stop=args.early_stop)


def test(args):
    prepared, output, _unused, vocab, mcfg, model = setup(args, need_train=False)
    tc = TrainConfig(batch_size=args.batch_size, output_path=output)
    trainer = Trainer(model, tc, total_steps=100)
    # --pool_shard at test time: shard the passage-pool axis over the
    # 'model' axis of the process-local predict mesh (size from
    # --mesh_shape's second entry, same contract as training)
    mesh_shape = tuple(int(x) for x in args.mesh_shape.split(",") if x)
    pool_devices = mesh_shape[1] if args.pool_shard and len(mesh_shape) > 1 \
        else 1
    if args.pool_shard and pool_devices <= 1:
        raise SystemExit("--pool_shard needs --mesh_shape with model>1 "
                         "(e.g. --mesh_shape 4,2)")
    try:
        predict_fn = make_predict_fn(model, mcfg, args.max_target_length,
                                     args.beam_width,
                                     early_exit=args.early_exit,
                                     fast_argmax=args.fast_argmax,
                                     decoding=args.decoding,
                                     sample_seed=args.seed,
                                     temperature=args.temperature,
                                     top_k=args.top_k, top_p=args.top_p,
                                     rank_only=args.rank_only)
    except ValueError as e:   # --rank_only on a model without a rank head
        raise SystemExit(str(e))

    splits = []
    for split in ("dev", "test"):
        path = os.path.join(prepared, f"{split}.{args.model}.npz")
        if os.path.exists(path):
            arrays, meta, _, _ = load_prepared(prepared, split, args.model)
            if len(meta) > 0:
                splits.append((split, arrays, meta))
    if not splits:
        print("[run] no dev/test splits prepared; nothing to do", flush=True)
        return

    epochs_to_test = range(args.epoch)
    if args.avg_only:
        if not checkpoint_exists(output, "avg"):
            raise SystemExit("--avg_only: no model/avg.ckpt under "
                             f"{output} (run --mode avg first)")
        print("[run] test averaged checkpoint only (model/avg.ckpt)",
              flush=True)
        epochs_to_test = ["avg"]
    elif args.best_only:
        from ..train.checkpoint import best_epoch
        be = best_epoch(output)
        if be is None:
            raise SystemExit("--best_only: no model/best.json under "
                             f"{output} (train with --dev_eval first)")
        print(f"[run] test best epoch only: {be} (model/best.json)",
              flush=True)
        epochs_to_test = [be]

    sample = None
    for epoch in epochs_to_test:
        if not checkpoint_exists(output, epoch):
            continue
        if sample is None:
            from ..data.batching import Batcher
            sample = next(Batcher(splits[0][1], args.batch_size,
                                  shuffle=False).epoch(0))
            sample = {k: v for k, v in sample.items() if not k.startswith("_")}
            # compute-free restore template (restore only needs tree
            # structure + shapes) — skips the full init compile that
            # dominated serving cold-start (docs/PERF.md round 3)
            template = jax.eval_shape(
                lambda: trainer.init_state(jax.random.PRNGKey(0), sample))
        state = load_checkpoint(output, epoch, template)
        if args.bf16_eval:
            from ..train.precision import cast_params
            state = state.replace(params=cast_params(state.params),
                                  ema=cast_params(state.ema))
        print(f"[run] test epoch {epoch}", flush=True)
        for split, arrays, meta in splits:
            if args.continuous:
                preds = _predict_continuous(args, model, state, arrays)
            else:
                preds = trainer.predict(state, arrays, predict_fn,
                                        args.batch_size,
                                        ema_eval=args.ema_eval,
                                        pool_devices=pool_devices)
            save_results(preds, meta, vocab, output, jax.process_index(),
                         epoch, f"{args.dataset}_{split}")


def _predict_continuous(args, model, state, arrays):
    """Offline continuous-batching predict (--mode test --continuous):
    rows decode at their own pace, freed slots refill from the remaining
    dataset rows — batch cost tracks the mean answer length instead of
    max_target_length (runtime/continuous.py). Answers are byte-identical
    to the batch path and rank ORDER matches; rank scores can move ~1 f32
    ulp (decode_init is a different XLA program than predict, so encoder
    reductions fuse differently). Yields (host_batch, outputs) rows for
    save_results, in dataset order."""
    import jax.numpy as jnp

    from ..runtime.continuous import make_continuous_fns, run_continuous

    if args.rank_only or args.beam_width > 1 or args.decoding != "greedy":
        raise SystemExit("--continuous is greedy full predict; it composes "
                         "with none of --rank_only/--beam_width>1/"
                         "--decoding sample")
    refill = args.refill or max(args.batch_size // 4, 1)
    if not 1 <= refill <= args.batch_size or args.chunk_steps < 1:
        raise SystemExit(f"--refill must be in [1, batch_size] and "
                         f"--chunk_steps >= 1; got refill {refill}, "
                         f"chunk_steps {args.chunk_steps}")
    params = state.ema if args.ema_eval else state.params
    variables = {"params": jax.device_put(params)}
    feed = {k: v for k, v in arrays.items()
            if k not in ("passage_labels",) and not k.startswith("_")}
    idx_all = np.arange(len(arrays["id"]))[
        jax.process_index()::jax.process_count()]

    def make_batch(reqs, k):
        sel = [r["i"] for r in reqs]
        sel = sel + [sel[-1]] * (k - len(sel))
        return {kk: jnp.asarray(vv[sel]) for kk, vv in feed.items()}

    collected = []
    if args.device_loop:
        from ..runtime.continuous.device_loop import (make_device_loop_fns,
                                                      run_continuous_device)
        stage = args.stage_rows or max(
            refill, args.batch_size * args.device_loop
            * args.chunk_steps // 10)
        dfns = make_device_loop_fns(
            model, args.max_target_length, args.chunk_steps,
            n_chunks=args.device_loop, stage_rows=stage,
            refill_bound=refill, fast_argmax=args.fast_argmax)
        run_continuous_device(
            ({"i": int(i)} for i in idx_all), make_batch, dfns, variables,
            args.batch_size, refill,
            emit=lambda r, ids, rk: collected.append((r["i"], ids, rk)),
            max_len=args.max_target_length, lookahead=args.lookahead)
    else:
        init_fn, chunk_fn, refill_fn = make_continuous_fns(
            model, args.max_target_length, args.chunk_steps,
            fast_argmax=args.fast_argmax, donate_state=not args.lookahead)
        run_continuous(({"i": int(i)} for i in idx_all), make_batch,
                       lambda _, bt: init_fn(variables, bt),
                       lambda _, st: chunk_fn(variables, st),
                       refill_fn, None, args.batch_size, refill,
                       emit=lambda r, ids, rk:
                       collected.append((r["i"], ids, rk)),
                       max_len=args.max_target_length,
                       lookahead=args.lookahead,
                       refill_min=max(1, min(args.refill_min, refill)),
                       async_harvest=args.async_harvest)
    for i, ids, rk in collected:
        out = {"answer": ids[None]}
        if rk is not None:
            out["rank"] = rk[None]
        yield {"id": [i], "_indices": [i]}, out


def average(args):
    """--mode avg: write model/avg.ckpt — the uniform average of several
    epoch checkpoints' params and EMA shadows. A classic eval-quality
    lever the reference lacks (it only writes per-epoch raw checkpoints
    and never applies even its EMA at eval —
    common/CumulativeTrainer.py:80-86). Decode it with
    ``--mode test --avg_only``; serve it with ``--epoch avg``."""
    prepared, output, _unused, vocab, mcfg, model = setup(args,
                                                          need_train=False)
    if args.avg_epochs:
        epochs = [int(x) for x in args.avg_epochs.split(",") if x]
    else:
        epochs = [e for e in range(args.epoch)
                  if checkpoint_exists(output, e)][-3:]
    missing = [e for e in epochs if not checkpoint_exists(output, e)]
    if not epochs or missing:
        raise SystemExit(f"--mode avg: no checkpoints to average "
                         f"(epochs {epochs}, missing {missing})")
    # compute-free restore template from any prepared split (shapes only)
    sample = None
    for split in ("train", "dev", "test"):
        path = os.path.join(prepared, f"{split}.{args.model}.npz")
        if os.path.exists(path):
            arrays, _m, _v, _ = load_prepared(prepared, split, args.model)
            if len(arrays["id"]):
                from ..data.batching import Batcher
                sample = next(Batcher(arrays, args.batch_size,
                                      shuffle=False).epoch(0))
                sample = {k: v for k, v in sample.items()
                          if not k.startswith("_")}
                break
    if sample is None:
        raise SystemExit("--mode avg: no prepared split to build the "
                         "restore template from")
    trainer = Trainer(model, TrainConfig(batch_size=args.batch_size,
                                         output_path=output),
                      total_steps=100)
    template = jax.eval_shape(
        lambda: trainer.init_state(jax.random.PRNGKey(0), sample))
    states = [load_checkpoint(output, e, template) for e in epochs]

    def mean_leaf(*xs):
        x0 = np.asarray(xs[0])
        if not np.issubdtype(x0.dtype, np.floating):
            return np.asarray(xs[-1])   # counters keep the last epoch's
        return np.mean(np.stack([np.asarray(x) for x in xs], 0),
                       0).astype(x0.dtype)

    tm = jax.tree_util.tree_map
    state = states[-1].replace(
        params=tm(mean_leaf, *[s.params for s in states]),
        ema=tm(mean_leaf, *[s.ema for s in states]))
    from ..train.checkpoint import save_checkpoint
    save_checkpoint(output, "avg", state, jax.process_index(),
                    update_latest=False)
    print(f"[run] averaged epochs {epochs} -> {output}/model/avg.ckpt",
          flush=True)


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.batch_size is None:
        # same knee defaults as serve (cli/serve.resolve_batch_size):
        # rank-only test mode has no sequential decode and peaks at B=128
        args.batch_size = (128 if args.mode == "test" and args.rank_only
                           else 64)
    np.random.seed(args.seed)
    # set both ways: main() is called repeatedly in-process by the e2e
    # suite, so the impl must not leak from one invocation to the next
    jax.config.update("jax_default_prng_impl",
                      "rbg" if args.fast_rng else "threefry2x32")
    from ..ops.attention import set_bf16_scores
    if args.bf16_scores is None:
        # auto: bf16 TRAINING defaults to bf16 scores (-5% step time,
        # metric-equivalent — docs/PERF.md round 13); every other mode
        # keeps f32 scores (the bf16-inference metric-identity contract)
        set_bf16_scores(args.mode in ("train", "ps_train")
                        and args.bf16_train)
    else:
        set_bf16_scores(args.bf16_scores)
    from ..ops.dropout import set_seeded_dropout
    set_seeded_dropout(args.seeded_dropout)   # set both ways: main() is
    # re-entered in-process by the e2e suite (see fast_rng above)
    from ..ops.attention import set_fused_train_attention
    if args.fused_train_attn is None:
        # auto mirrors bf16_scores: bf16 TRAINING gets the fused kernel
        # (-12% step time, metric-equivalent — docs/PERF.md round 13);
        # f32 keeps the parity-dtype XLA path
        set_fused_train_attention(args.mode in ("train", "ps_train")
                                  and args.bf16_train)
    else:
        set_fused_train_attention(args.fused_train_attn)
    from ..ops.attention import set_fused_train_attn_rng
    if args.kernel_rng_dropout is None:
        # auto mirrors the fused-train-attn gate: bf16 TRAINING only
        # (the kernel itself additionally requires a real TPU backend
        # and falls back to caller-drawn masks elsewhere)
        set_fused_train_attn_rng(args.mode in ("train", "ps_train")
                                 and args.bf16_train)
    else:
        set_fused_train_attn_rng(args.kernel_rng_dropout)
    from ..models.multimem import set_fused_stack
    set_fused_stack(args.fused_stack)
    if not args.fused_attn:
        from ..ops.attention import set_fused_attention
        set_fused_attention(False)
    # persistent XLA compilation cache: first CaSE compile is 200-500 s on
    # TPU; subsequent runs hit the cache
    cache_dir = os.environ.get("CASE_RG_COMPILE_CACHE",
                               os.path.expanduser("~/.cache/case_rg_tpu_xla"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass
    if args.multihost:
        jax.distributed.initialize()
    if args.mode in ("train", "ps_train"):
        train(args)
    elif args.mode == "avg":
        average(args)
    else:
        test(args)


if __name__ == "__main__":
    main()
