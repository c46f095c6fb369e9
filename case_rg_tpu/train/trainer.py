"""The trainer: one jit'd train step, sharded over the device mesh.

TPU-native rebuild of common/CumulativeTrainer.py:26-156:

* multi-loss sum, gradient accumulation, global-norm clip 1.0, Adam 2.5e-4
  with cosine-hard-restarts warmup, EMA shadow weights at 0.995 — same
  order of operations (clip -> step -> EMA -> schedule; CumulativeTrainer.py:64-76);
* DDP/NCCL is replaced by sharding the batch over the mesh 'data' axis and
  letting XLA insert the gradient all-reduce (SURVEY §2.5);
* checkpoints carry the full train state and support resume (unlike the
  reference's weight-only pickles);
* EMA weights can be applied at eval (``ema_eval``) — the reference maintains
  the shadow but never applies it (common/CumulativeTrainer.py:49-50).
"""

from __future__ import annotations

import os
import sys
import time
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import Mesh

from ..config import TrainConfig
from ..data.batching import Batcher
from ..runtime.mesh import make_mesh, replicated, shard_batch
from .checkpoint import (checkpoint_exists, latest_epoch, load_checkpoint,
                         save_best, save_checkpoint, wait_for_checkpoints)
from .schedule import cosine_hard_restarts_with_warmup


class TrainState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    ema: Any
    step: jnp.ndarray  # effective (post-accumulation) step count


def make_optimizer(tc: TrainConfig, total_steps: int):
    sched = cosine_hard_restarts_with_warmup(tc.learning_rate, tc.warmup_steps,
                                             total_steps, tc.num_cycles)
    tx = optax.chain(optax.clip_by_global_norm(tc.grad_clip),
                     optax.adam(sched, b1=0.9, b2=0.999, eps=1e-8))
    if tc.accumulation_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=tc.accumulation_steps)
    return tx


class PreemptionGuard:
    """Graceful-preemption handling: SIGTERM/SIGINT set a flag; the train
    loop saves a salvage checkpoint at the next batch boundary and stops
    cleanly. The reference loses the epoch in progress on any signal
    (SURVEY §5 — SLURM owns retries, no in-process handling)."""

    def __init__(self):
        self.requested = False
        self._prev = {}

    def __enter__(self):
        import signal

        def handler(signum, frame):
            self.requested = True
            print(f"[train] signal {signum}: will checkpoint and stop at the "
                  "next batch boundary", flush=True)

        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                self._prev[sig] = signal.signal(sig, handler)
            except ValueError:   # non-main thread (tests)
                pass
        return self

    def __exit__(self, *exc):
        import signal
        for sig, prev in self._prev.items():
            signal.signal(sig, prev)
        return False


class Trainer:
    def __init__(self, model, train_cfg: TrainConfig, total_steps: int,
                 mesh=None, loss_method_kwargs: Optional[dict] = None):
        self.model = model
        self.tc = train_cfg
        if mesh is None:
            if train_cfg.mesh_shape:
                mesh = make_mesh(train_cfg.mesh_shape)
            else:
                # the data axis must divide the global batch; unused devices
                # are left out rather than failing (e.g. tiny smoke runs)
                import math as _math
                n = jax.device_count()
                d = _math.gcd(train_cfg.batch_size, n) if train_cfg.batch_size else n
                mesh = make_mesh() if d == n else Mesh(
                    np.array(jax.devices()[:d]).reshape(d, 1), ("data", "model"))
        self.mesh = mesh
        self.tx = make_optimizer(train_cfg, total_steps)
        self.loss_kwargs = loss_method_kwargs or {}
        self._train_step = None
        self._eval_step = None

    # ---- state ----

    def init_state(self, rng, sample_batch: Dict[str, np.ndarray]) -> TrainState:
        batch = {k: jnp.asarray(v) for k, v in sample_batch.items()
                 if not k.startswith("_")}

        # The whole init runs under ONE jit: flax's ``init`` is eager by
        # default, and an eager full-forward trace at CAsT scale is
        # thousands of tiny dispatches — pathological on a remote-attached
        # chip (~30-50 ms roundtrip each made init_state hang for tens of
        # minutes on this relay; one compiled program takes seconds).
        def _init(p_rng, d_rng, batch):
            variables = self.model.init(
                {"params": p_rng, "dropout": d_rng}, batch,
                method=type(self.model).train_losses, **self.loss_kwargs)
            params = variables["params"]
            # EMA must not alias params: the train step donates the whole
            # state and XLA rejects donating one buffer twice. An
            # optimization_barrier guarantees distinct buffers under jit —
            # a bare ``x + 0`` could legally be folded away by XLA's
            # algebraic simplifier, re-aliasing the outputs.
            ema = jax.lax.optimization_barrier(
                jax.tree_util.tree_map(lambda x: x + 0, params))
            return TrainState(params=params, opt_state=self.tx.init(params),
                              ema=ema, step=jnp.zeros((), jnp.int32))

        p_rng, d_rng = jax.random.split(rng)
        state = jax.jit(_init)(p_rng, d_rng, batch)
        return jax.device_put(state, replicated(self.mesh))

    # ---- the jit'd step ----

    def _build_step(self):
        model, tx, tc = self.model, self.tx, self.tc
        loss_kwargs = self.loss_kwargs
        accum = tc.accumulation_steps

        bf16 = tc.compute_dtype == "bfloat16"

        # Remat policy (TrainConfig.remat): which forward residuals survive
        # to the backward pass. "dots" keeps only matmul outputs (elementwise
        # chains — LN, softmax, gelu, dropout masks — are recomputed in bwd
        # instead of round-tripping through HBM); "nothing" recomputes the
        # whole forward. The step is bandwidth-bound with ~6% MXU busy
        # (docs/PERF.md round 2), so recompute FLOPs are nearly free —
        # gradients are bitwise the same either way.
        remat_policy = {
            "": None,
            "dots": jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
            "dots_batch": jax.checkpoint_policies.dots_saveable,
            "nothing": jax.checkpoint_policies.nothing_saveable,
        }[tc.remat]

        def step_fn(state: TrainState, batch, rng):
            def loss_fn(params):
                if bf16:  # mixed precision: f32 master, bf16 compute
                    from .precision import cast_params_auto
                    params = cast_params_auto(params, jnp.bfloat16)
                losses = model.apply({"params": params}, batch,
                                     deterministic=False,
                                     rngs={"dropout": rng},
                                     method=type(model).train_losses,
                                     **loss_kwargs)
                losses = {k: v.astype(jnp.float32) for k, v in losses.items()}
                return sum(losses.values()), losses

            if tc.remat:
                loss_fn = jax.checkpoint(loss_fn, policy=remat_policy)
            (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)

            if accum > 1:
                applied = tx.has_updated(opt_state)
            else:
                applied = jnp.asarray(True)
            decay = tc.ema_decay
            ema = jax.tree_util.tree_map(
                lambda e, p: jnp.where(applied,
                                       (1.0 - decay) * p + decay * e, e),
                state.ema, params)
            step = state.step + applied.astype(jnp.int32)
            new_state = TrainState(params=params, opt_state=opt_state,
                                   ema=ema, step=step)
            losses["total"] = total
            return new_state, losses

        self._train_step = jax.jit(step_fn, donate_argnums=(0,))

    def train_step(self, state, batch, rng):
        if self._train_step is None:
            self._build_step()
        batch = shard_batch(self.mesh, batch, pool_axis=self.tc.pool_shard)
        return self._train_step(state, batch, rng)

    # ---- epoch loops ----

    def train_epoch(self, state: TrainState, batcher: Batcher, epoch: int,
                    rng, metrics_logger=None, output_path: str = "",
                    checkpoint_every: int = 0, guard=None) -> TrainState:
        from ..runtime.profiling import StepMeter

        start = time.time()
        meter = StepMeter()
        last_losses = {}
        for j, batch in enumerate(batcher.epoch(epoch)):
            if guard is not None and guard.requested:
                if output_path:
                    save_checkpoint(output_path, f"{epoch}.preempt",
                                    jax.device_get(state),
                                    jax.process_index(),
                                    update_latest=False,
                                    backend=self.tc.ckpt_backend)
                    wait_for_checkpoints()
                    print(f"[train] preempted at epoch {epoch} batch {j}; "
                          f"salvage checkpoint {epoch}.preempt written",
                          flush=True)
                raise KeyboardInterrupt("preempted")
            rng, step_rng = jax.random.split(rng)
            meter.start()
            state, losses = self.train_step(state, batch, step_rng)
            last_losses = losses
            if checkpoint_every and output_path and j > 0 and \
                    j % checkpoint_every == 0:
                # mid-epoch salvage checkpoint: does not mark the epoch
                # complete (resume stays epoch-granular; the reference loses
                # the whole epoch on a crash — SURVEY §5)
                save_checkpoint(output_path, f"{epoch}.mid",
                                jax.device_get(state), jax.process_index(),
                                update_latest=False,
                                backend=self.tc.ckpt_backend)
            if j > 0 and j % self.tc.log_every == 0:
                jax.block_until_ready(losses)
                meter.stop()
                vals = {k: float(v) for k, v in losses.items()}
                print(f"[train] epoch {epoch} batch {j} loss {vals} "
                      f"time {time.time() - start:.1f}s "
                      f"({meter.steps_per_sec():.2f} steps/s)", flush=True)
                if metrics_logger is not None:
                    metrics_logger.log(int(jax.device_get(state.step)), vals)
        vals = {k: float(v) for k, v in last_losses.items()}
        print(f"[train] epoch {epoch} done ({batcher.num_batches(epoch)} "
              f"batches) loss {vals} time {time.time() - start:.1f}s", flush=True)
        sys.stdout.flush()
        return state

    def fit(self, state: TrainState, arrays: Dict[str, np.ndarray],
            epochs: int, output_path: str, seed: int = 0,
            start_epoch: int = 0, profile_dir: Optional[str] = None,
            eval_arrays: Optional[Dict[str, np.ndarray]] = None,
            early_stop: int = 0) -> TrainState:
        """``early_stop`` > 0 (needs ``eval_arrays``): stop once the dev
        total loss hasn't improved for that many consecutive epochs. The
        best epoch is recorded in model/best.json whenever the dev loss
        improves (also with early_stop off) — serving's ``--epoch best``
        and ``run --mode test --best_only`` read it. The reference always
        trains the full 20 epochs and decodes every checkpoint to pick
        one (CaSE/Run.py:31-62); dev-loss selection is ours."""
        from ..runtime.profiling import MetricsLogger, trace

        batcher = Batcher(arrays, self.tc.batch_size, shuffle=True, seed=seed,
                          process_index=jax.process_index(),
                          process_count=jax.process_count())
        rng = jax.random.PRNGKey(seed)
        logger = MetricsLogger(os.path.join(output_path, "metrics.jsonl")
                               if output_path else None)
        best: Optional[tuple] = None   # (dev_total, epoch)
        stale = 0
        try:
            with trace(profile_dir), PreemptionGuard() as guard:
                for epoch in range(start_epoch, epochs):
                    rng, epoch_rng = jax.random.split(rng)
                    state = self.train_epoch(
                        state, batcher, epoch, epoch_rng,
                        metrics_logger=logger, output_path=output_path,
                        checkpoint_every=self.tc.checkpoint_every_steps,
                        guard=guard)
                    save_checkpoint(output_path, epoch, jax.device_get(state),
                                    jax.process_index(),
                                    backend=self.tc.ckpt_backend)
                    if eval_arrays is not None:
                        dev = self.eval_losses(state, eval_arrays)
                        vals = {k: round(v, 6) for k, v in dev.items()}
                        print(f"[train] epoch {epoch} dev loss {vals}",
                              flush=True)
                        logger.log(int(jax.device_get(state.step)),
                                   {f"dev_{k}": v for k, v in dev.items()})
                        total = float(dev.get("total",
                                              next(iter(dev.values()))))
                        if best is None or total < best[0]:
                            best = (total, epoch)
                            stale = 0
                            if output_path and jax.process_index() == 0:
                                save_best(output_path, epoch, total)
                        else:
                            stale += 1
                            if early_stop and stale >= early_stop:
                                print(f"[train] early stop after epoch "
                                      f"{epoch}: no dev improvement for "
                                      f"{early_stop} epochs (best epoch "
                                      f"{best[1]}, dev {best[0]:.6f})",
                                      flush=True)
                                break
        except KeyboardInterrupt:
            # preemption (or ctrl-c routed through the guard): state salvaged
            # by train_epoch; exit the loop cleanly
            pass
        wait_for_checkpoints()
        logger.close()
        return state

    def resume_or_init(self, rng, sample_batch, output_path: str):
        """Returns (state, start_epoch).

        The latest pointer may outrun an asynchronous (orbax) save that
        never committed — e.g. a hard kill between scheduling the write and
        its atomic rename. Resume therefore walks back to the newest epoch
        whose checkpoint actually exists on disk."""
        state = self.init_state(rng, sample_batch)
        last = latest_epoch(output_path)
        if self.tc.resume and last is not None:
            while last >= 0 and not checkpoint_exists(output_path, last):
                print(f"[train] checkpoint for epoch {last} missing "
                      "(uncommitted async save?); falling back", flush=True)
                last -= 1
            if last >= 0:
                state = load_checkpoint(output_path, last,
                                        jax.device_get(state))
                state = jax.device_put(state, replicated(self.mesh))
                return state, last + 1
        return state, 0

    # ---- per-epoch dev evaluation ----

    def eval_losses(self, state: TrainState, arrays: Dict[str, np.ndarray],
                    batch_size: int = 0, ema_eval: bool = False
                    ) -> Dict[str, float]:
        """Deterministic losses over an eval split (no dropout, no grads):
        mean of batch losses weighted by each batch's real-sample count
        (sample_weight masks the padded final batch; exact for
        per-sample-mean losses, and the same averaging the reference's
        printed losses use). Cheap epoch-selection signal during
        training — the reference can only rank epochs by decoding every
        checkpoint offline (CaSE/Run.py:35-62); dev loss needs no
        decode."""
        if self._eval_step is None:
            model, loss_kwargs = self.model, self.loss_kwargs

            def eval_fn(params, batch):
                losses = model.apply({"params": params}, batch,
                                     deterministic=True,
                                     method=type(model).train_losses,
                                     **loss_kwargs)
                return {k: v.astype(jnp.float32) for k, v in losses.items()}

            self._eval_step = jax.jit(eval_fn)
        bs = batch_size or self.tc.batch_size
        params = state.ema if ema_eval else state.params
        batcher = Batcher(arrays, bs, shuffle=False,
                          process_index=jax.process_index(),
                          process_count=jax.process_count())
        totals: Dict[str, float] = {}
        weight = 0.0
        for batch in batcher.epoch(0):
            w = float(np.asarray(batch["sample_weight"]).sum()) \
                if "sample_weight" in batch else float(len(batch["id"]))
            dev = shard_batch(self.mesh, batch)
            losses = jax.device_get(self._eval_step(params, dev))
            for k, v in losses.items():
                totals[k] = totals.get(k, 0.0) + float(v) * w
            weight += w
        out = {k: v / max(weight, 1.0) for k, v in totals.items()}
        out["total"] = sum(out.values())
        return out

    # ---- inference ----

    def predict(self, state: TrainState, arrays: Dict[str, np.ndarray],
                predict_fn: Callable[[Any, Dict], Dict], batch_size: int,
                ema_eval: bool = False,
                pipeline_depth: int = 4,
                pool_devices: int = 1) -> Iterable[tuple]:
        """Yields (host_batch, outputs) pairs
        (ref: CumulativeTrainer.predict:134-156, without its shuffle quirk).

        Runs on a process-local mesh: each process evaluates its own shard
        independently and writes its own result files (the reference's
        per-rank shard pattern), so outputs are always addressable.

        ``pool_devices > 1`` reserves that many local devices for the
        'model' mesh axis and shards the passage-pool axis over it (pool
        parallelism at inference — per-passage tower compute stays
        device-local, collectives only at the cross-passage joins; the
        same layout --pool_shard uses for training). Single-process only:
        multi-process predict keeps its per-process dp layout.

        Dispatch is pipelined: up to ``pipeline_depth`` batches are in
        flight before the oldest result is fetched, overlapping the host
        roundtrip + result handling with device compute (the same change
        bought ~18% serving throughput — docs/PERF.md). Yield order is
        the batcher's order."""
        from collections import deque

        from ..runtime.mesh import local_mesh

        params = state.ema if ema_eval else state.params
        params = jax.device_get(params)
        mesh = local_mesh(batch_size, model=pool_devices)
        # re-home the tree onto the local mesh ONCE (replicated): passing
        # host-numpy params into predict_fn would re-upload the whole tree
        # on every batch (tools/exp_http_load.py measured the equivalent
        # serving path at 30x slower before the single device_put)
        from ..runtime.mesh import replicated as _replicated
        params = jax.device_put(params, _replicated(mesh))
        batcher = Batcher(arrays, batch_size, shuffle=False,
                          process_index=jax.process_index(),
                          process_count=jax.process_count())
        inflight: deque = deque()
        for batch in batcher.epoch(0):
            dev_batch = shard_batch(mesh, batch, pool_axis=pool_devices > 1) \
                if jax.process_count() == 1 \
                else {k: jax.device_put(v, None) for k, v in batch.items()
                      if not k.startswith("_")}
            inflight.append((batch, predict_fn({"params": params}, dev_batch)))
            if len(inflight) >= max(pipeline_depth, 1):
                b, o = inflight.popleft()
                yield b, jax.device_get(o)
        while inflight:
            b, o = inflight.popleft()
            yield b, jax.device_get(o)
