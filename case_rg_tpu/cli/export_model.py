"""Export the serving predict program as a self-contained StableHLO
artifact (jax.export): checkpoint params are baked in as constants, so the
artifact runs with nothing but jax + the blob — no model code, no vocab,
no flax. Deployment story the reference lacks entirely (its inference is
"load the pickle into the live torch module" — CaSE/Run.py:54-58).

The artifact is shape-specialized (one per batch_size x pool size, like
every serving program here) and platform-tagged by jax.export; exporting
on the TPU host yields a TPU artifact, on CPU a CPU one.

Usage:
    python -m case_rg_tpu.cli.export_model --model case \\
        --prepared_dir ./dataset/cast/prepared --output_path ./output/case \\
        --out case_b64.shlo [--epoch best|avg|N] [--batch_size 64] \\
        [--bf16] [--rank_only] [--check]

Writes ``--out`` (serialized StableHLO) plus a ``.json`` sidecar with the
input spec (key -> shape/dtype) and provenance. ``--check`` deserializes
the artifact and verifies its outputs equal the live predict program on a
synthetic batch. Load and call later with::

    from case_rg_tpu.runtime.exported import load_exported
    fn = load_exported("case_b64.shlo")      # .call(batch_dict)
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--model", type=str, required=True,
                   choices=["case", "masque", "glks", "tmemnet", "gttp",
                            "s2sa"])
    p.add_argument("--prepared_dir", type=str, required=True)
    p.add_argument("--output_path", type=str, required=True)
    p.add_argument("--out", type=str, required=True,
                   help="artifact path (sidecar lands at <out>.json)")
    p.add_argument("--epoch", type=str, default=None,
                   help="int, 'best', or 'avg' (default: latest)")
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--embedding_size", type=int, default=256)
    p.add_argument("--hidden_size", type=int, default=256)
    p.add_argument("--num_heads", type=int, default=8)
    p.add_argument("--max_target_length", type=int, default=40)
    p.add_argument("--beam_width", type=int, default=1)
    p.add_argument("--early_exit", action=argparse.BooleanOptionalAction,
                   default=False,
                   help="early-exit greedy decode (data-dependent loop "
                        "trip count; default off for a fixed-cost artifact)")
    from .flags import add_fast_argmax_flag
    add_fast_argmax_flag(p)
    p.add_argument("--rank_only", action="store_true")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--ema", action="store_true")
    p.add_argument("--query_len", type=int, default=60)
    p.add_argument("--passage_len", type=int, default=100)
    p.add_argument("--num_passage", type=int, default=10)
    p.add_argument("--min_window_size", type=int, default=4)
    p.add_argument("--num_windows", type=int, default=1)
    p.add_argument("--check", action="store_true",
                   help="deserialize the artifact and verify it matches "
                        "the live predict program on a synthetic batch")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    import jax
    from jax import export as jax_export

    from ..config import DataConfig, ModelConfig, TrainConfig
    from ..data.vocab import Vocabulary
    from ..models import build_model_cfg, create_model
    from ..runtime.inference import make_predict_fn
    from ..train.checkpoint import (best_epoch, checkpoint_exists,
                                    latest_epoch, load_checkpoint)
    from ..train.trainer import Trainer
    from ..serving.featurize import chunk_to_batch as _chunk_to_batch

    vocab = Vocabulary.load(os.path.join(args.prepared_dir, "vocab.txt"))
    dcfg = DataConfig(query_len=args.query_len, passage_len=args.passage_len,
                      num_passage=args.num_passage,
                      answer_len=args.max_target_length,
                      min_window_size=args.min_window_size,
                      num_windows=args.num_windows)
    base = ModelConfig(embedding_size=args.embedding_size,
                       hidden_size=args.hidden_size, num_heads=args.num_heads,
                       max_target_length=args.max_target_length,
                       max_dec_len=args.max_target_length,
                       beam_width=args.beam_width,
                       min_window_size=args.min_window_size,
                       num_windows=args.num_windows)
    mcfg = build_model_cfg(base, args.model, vocab)
    model = create_model(args.model, mcfg)

    if args.epoch is None:
        epoch = latest_epoch(args.output_path)
    elif args.epoch == "best":
        epoch = best_epoch(args.output_path)
    elif args.epoch == "avg":
        epoch = "avg"
    else:
        epoch = int(args.epoch)
    if epoch is None or not checkpoint_exists(args.output_path, epoch):
        raise SystemExit(f"no checkpoint for epoch {epoch!r} under "
                         f"{args.output_path}/model")

    # synthetic batch fixes the artifact's shapes (same featurizer serving
    # uses, so the artifact and serve agree on the input spec)
    warm = {"query": "export shape probe",
            "passages": ["export shape probe ."] * dcfg.num_passage}
    batch = _chunk_to_batch([warm], args.model, vocab, dcfg,
                            args.batch_size)

    trainer = Trainer(model, TrainConfig(batch_size=args.batch_size,
                                         output_path=args.output_path),
                      total_steps=100)
    template = jax.eval_shape(
        lambda: trainer.init_state(jax.random.PRNGKey(0), batch))
    state = load_checkpoint(args.output_path, epoch, template)
    params = state.ema if args.ema else state.params
    if args.bf16:
        from ..train.precision import cast_params
        params = cast_params(params)

    try:
        predict_fn = make_predict_fn(model, mcfg, args.max_target_length,
                                     args.beam_width,
                                     early_exit=args.early_exit,
                                     fast_argmax=args.fast_argmax,
                                     rank_only=args.rank_only)
    except ValueError as e:
        raise SystemExit(str(e))

    # params baked in as constants -> self-contained artifact
    fn = jax.jit(lambda bt: predict_fn({"params": params}, bt))
    spec = {k: jax.ShapeDtypeStruct(np.asarray(v).shape,
                                    np.asarray(v).dtype)
            for k, v in batch.items()}
    exported = jax_export.export(fn)(spec)
    blob = exported.serialize()
    with open(args.out, "wb") as f:
        f.write(blob)
    sidecar = {
        "model": args.model, "epoch": str(epoch),
        "platforms": list(exported.platforms),
        "batch_size": args.batch_size,
        "dtype": "bfloat16" if args.bf16 else "float32",
        "rank_only": args.rank_only, "beam_width": args.beam_width,
        "max_target_length": args.max_target_length,
        "data": {"query_len": dcfg.query_len,
                 "passage_len": dcfg.passage_len,
                 "num_passage": dcfg.num_passage},
        "inputs": {k: {"shape": list(s.shape), "dtype": str(s.dtype)}
                   for k, s in spec.items()},
    }
    with open(args.out + ".json", "w") as f:
        json.dump(sidecar, f, indent=1)
    print(f"[export] {args.out}: {len(blob)/1e6:.1f} MB, platforms "
          f"{exported.platforms}, inputs {sorted(spec)}", file=sys.stderr)

    if args.check:
        from ..runtime.exported import load_exported
        art = load_exported(args.out)
        got = jax.device_get(art.call(batch))
        want = jax.device_get(fn(batch))
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                       np.asarray(b)),
            got, want)
        print("[export] check OK: artifact output == live predict",
              file=sys.stderr)


if __name__ == "__main__":
    main()
