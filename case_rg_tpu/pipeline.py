"""High-level in-process inference API.

The reference has no library surface at all — inference means editing one
of the six ``Run.py`` scripts (CaSE/Run.py:35-62). Here, a ``Pipeline``
wraps featurization + the jitted predict program + detokenization behind
one object, so notebooks / host apps embed the models without the CLI:

    from case_rg_tpu.pipeline import Pipeline

    p = Pipeline.from_checkpoint("case", output_path="./output/case",
                                 prepared_dir="./dataset/cast/prepared",
                                 epoch="best", batch_size=8)
    out = p(query="what is kinetic energy ?",
            passages=["kinetic energy is the energy of motion ."])
    out["answer"], out.get("ranking")

    # or a whole batch of request dicts (the serving JSONL schema):
    outs = p.batch([{"query": ..., "passages": [...],
                     "history": [...], "max_tokens": 20}, ...])

    # or from a StableHLO artifact (cli/export_model.py) — no checkpoint:
    p = Pipeline.from_export("case_b64.shlo",
                             prepared_dir="./dataset/cast/prepared")

Requests use the serving schema (``cli/serve.py`` docstring): ``query``,
``passages``, optional ``history`` / ``max_tokens``. Outputs match serving:
``answer`` (generative models) and best-first ``ranking`` indices (models
with a rank head). Featurization is the same code path as the offline
pipeline and the servers (``cli/serve.featurize_requests``), so library,
batch, and serving results agree.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np


class Pipeline:
    """Featurize -> predict -> detokenize for one model.

    Build via :meth:`from_checkpoint` or :meth:`from_export`. Thread-safe
    for concurrent calls only at the JAX dispatch level — wrap calls in a
    lock if sharing one Pipeline across threads (or use ``cli/serve.py``,
    whose dispatcher owns all device work).
    """

    def __init__(self, *, model_name, vocab, dcfg, run_predict, batch_size,
                 provenance):
        self._model_name = model_name
        self._vocab = vocab
        self._detok = vocab.detokenizer()
        self._dcfg = dcfg
        self._run_predict = run_predict
        self._batch_size = int(batch_size)
        self.provenance = dict(provenance)   # model/epoch/dtype/source

    # ------------------------------------------------------------------
    @classmethod
    def from_checkpoint(cls, model: str, *, output_path: str,
                        prepared_dir: str, epoch=None, batch_size: int = 8,
                        bf16: bool = False, ema: bool = False,
                        rank_only: bool = False, beam_width: int = 1,
                        decoding: str = "greedy", sample_seed: int = 123456,
                        temperature: float = 1.0, top_k: int = 0,
                        top_p: float = 1.0, early_exit: bool = True,
                        fast_argmax: Optional[bool] = None,
                        embedding_size: int = 256, hidden_size: int = 256,
                        num_heads: int = 8, max_target_length: int = 40,
                        query_len: int = 60, passage_len: int = 100,
                        num_passage: int = 10, min_window_size: int = 4,
                        num_windows: int = 1) -> "Pipeline":
        """Load a trained checkpoint and build the jitted predict program.

        ``epoch``: int, ``"best"`` (model/best.json from --dev_eval
        training), ``"avg"`` (run --mode avg), or None for the latest.
        Model/data dims must match training (same flags as cli/serve.py).
        """
        import jax

        from .config import DataConfig, ModelConfig, TrainConfig
        from .data.vocab import Vocabulary
        from .models import build_model_cfg, create_model
        from .runtime.inference import make_predict_fn
        from .runtime.mesh import local_mesh, replicated, shard_batch
        from .train.checkpoint import (best_epoch, checkpoint_exists,
                                       latest_epoch, load_checkpoint)
        from .train.trainer import Trainer

        vocab = Vocabulary.load(os.path.join(prepared_dir, "vocab.txt"))
        dcfg = DataConfig(query_len=query_len, passage_len=passage_len,
                          num_passage=num_passage,
                          answer_len=max_target_length,
                          min_window_size=min_window_size,
                          num_windows=num_windows)
        base = ModelConfig(embedding_size=embedding_size,
                           hidden_size=hidden_size, num_heads=num_heads,
                           max_target_length=max_target_length,
                           max_dec_len=max_target_length,
                           beam_width=beam_width,
                           min_window_size=min_window_size,
                           num_windows=num_windows)
        mcfg = build_model_cfg(base, model, vocab)
        net = create_model(model, mcfg)

        if epoch is None:
            epoch = latest_epoch(output_path)
        elif epoch == "best":
            epoch = best_epoch(output_path)
            if epoch is None:
                raise FileNotFoundError(
                    f"epoch='best': no model/best.json under {output_path} "
                    "(train with --dev_eval)")
        elif epoch != "avg":
            epoch = int(epoch)
        if epoch is None or not checkpoint_exists(output_path, epoch):
            raise FileNotFoundError(f"no checkpoint for epoch {epoch!r} "
                                    f"under {output_path}/model")

        predict_fn = make_predict_fn(net, mcfg, max_target_length,
                                     beam_width, early_exit=early_exit,
                                     fast_argmax=fast_argmax,
                                     decoding=decoding,
                                     sample_seed=sample_seed,
                                     temperature=temperature, top_k=top_k,
                                     top_p=top_p, rank_only=rank_only)

        # params restore via the abstract template (no init compile) and
        # one device_put, exactly like serving (cli/serve.py ensure_params)
        mesh = local_mesh(batch_size)
        trainer = Trainer(net, TrainConfig(batch_size=batch_size,
                                           output_path=output_path),
                          total_steps=100)
        from .serving.featurize import chunk_to_batch as _chunk_to_batch
        probe = _chunk_to_batch(
            [{"query": "shape probe",
              "passages": ["shape probe ."] * dcfg.num_passage}],
            model, vocab, dcfg, batch_size)
        template = jax.eval_shape(
            lambda: trainer.init_state(jax.random.PRNGKey(0), probe))
        state = load_checkpoint(output_path, epoch, template)
        params = state.ema if ema else state.params
        if bf16:
            from .train.precision import cast_params
            params = cast_params(params)
        params = jax.device_put(params, replicated(mesh))

        def run_predict(batch):
            return predict_fn({"params": params},
                              shard_batch(mesh, batch))

        return cls(model_name=model, vocab=vocab, dcfg=dcfg,
                   run_predict=run_predict, batch_size=batch_size,
                   provenance={"source": "checkpoint", "model": model,
                               "epoch": str(epoch),
                               "dtype": "bfloat16" if bf16 else "float32"})

    # ------------------------------------------------------------------
    @classmethod
    def from_export(cls, artifact: str, *, prepared_dir: str) -> "Pipeline":
        """Serve a StableHLO artifact written by ``cli/export_model.py``:
        params are baked in, so no model code or checkpoint is touched.
        Model name, batch size, and data shapes come from the
        ``<artifact>.json`` sidecar; the artifact is platform-tagged."""
        import json

        import jax

        from .config import DataConfig
        from .data.vocab import Vocabulary
        from .runtime.exported import load_exported

        with open(artifact + ".json", encoding="utf-8") as f:
            sidecar = json.load(f)
        plats = [p.lower() for p in sidecar.get("platforms", [])]
        backend = jax.default_backend().lower()
        if plats and backend not in plats:
            raise RuntimeError(f"artifact was exported for platform(s) "
                               f"{plats}, this host runs {backend!r} — "
                               "re-export on the target platform")
        vocab = Vocabulary.load(os.path.join(prepared_dir, "vocab.txt"))
        d = sidecar["data"]
        dcfg = DataConfig(query_len=int(d["query_len"]),
                          passage_len=int(d["passage_len"]),
                          num_passage=int(d["num_passage"]),
                          answer_len=int(sidecar["max_target_length"]))
        art = load_exported(artifact)
        return cls(model_name=sidecar["model"], vocab=vocab, dcfg=dcfg,
                   run_predict=art.call,
                   batch_size=int(sidecar["batch_size"]),
                   provenance={"source": "export", "model": sidecar["model"],
                               "epoch": str(sidecar.get("epoch")),
                               "dtype": sidecar.get("dtype", "float32")})

    # ------------------------------------------------------------------
    @property
    def model(self) -> str:
        return self._model_name

    @property
    def batch_size(self) -> int:
        return self._batch_size

    def __call__(self, query: str, passages: Sequence[str], *,
                 history: Sequence[str] = (),
                 max_tokens: Optional[int] = None) -> dict:
        """One request -> ``{"answer": ..., "ranking": [...]}`` (keys per
        model capability)."""
        req: Dict = {"query": query, "passages": list(passages),
                     "history": list(history)}
        if max_tokens is not None:
            req["max_tokens"] = int(max_tokens)
        return self.batch([req])[0]

    def batch(self, requests: List[dict]) -> List[dict]:
        """Run request dicts (serving JSONL schema) through the model in
        ``batch_size`` chunks; returns one output dict per request, in
        input order."""
        import jax

        from .serving.featurize import chunk_to_batch as _chunk_to_batch
        from .runtime.io import ids_to_sentence, remove_duplicate

        outs: List[dict] = []
        for start in range(0, len(requests), self._batch_size):
            chunk = requests[start:start + self._batch_size]
            batch = _chunk_to_batch(chunk, self._model_name, self._vocab,
                                    self._dcfg, self._batch_size)
            out = jax.device_get(self._run_predict(batch))
            sents = None
            if "answer" in out:
                ids = np.asarray(out["answer"])
                caps = [min(int(r["max_tokens"]), ids.shape[1])
                        if "max_tokens" in r else ids.shape[1]
                        for r in chunk]
                sents = [ids_to_sentence(row[:max(c, 1)], self._vocab)
                         for row, c in zip(ids, caps)]
                remove_duplicate(sents)
            for i, req in enumerate(chunk):
                resp: Dict = {}
                if sents is not None:
                    resp["answer"] = self._detok(sents[i])
                if "rank" in out:
                    scores = np.asarray(out["rank"][i])
                    n_real = min(len(req.get("passages", [])),
                                 self._dcfg.num_passage)
                    order = np.argsort(-scores[:max(n_real, 1)],
                                       kind="stable")
                    resp["ranking"] = [int(j) for j in order[:n_real]]
                outs.append(resp)
        return outs
