"""Continuous batching vs fixed-batch decode at full CaSE scale.

Fixed-length batch decode pays max_len steps for every batch; early-exit
pays the MAX emitted length over the batch; continuous batching pays
~the MEAN length (finished rows are refilled mid-flight). The win is
therefore a function of the answer-length distribution, which random
weights do not produce. Two ways to get a length mix:

* ``--caps lo-hi`` (recommended at full scale): per-request ``max_tokens``
  drawn uniformly, riding the decode state as ``response_cap``. Round 8
  found the EOS retag below degenerates at full scale (greedy decode of
  full-size random weights collapses to one repeated token, so the retag
  yields length mean=1); caps give the same economics, controllably.
* default (kept for ``--small`` smokes): re-tag the most frequently
  decoded token as EOS (greedy token choice ignores eos_id, so emitted
  ids are unchanged; only the stop bookkeeping reads it).

Mean/percentile lengths are printed so the speedup can be read against
the distribution.

Usage: python tools/exp_continuous.py [B] [--n N] [--chunk C] [--refill R]
       [--caps lo-hi] [--sweep c1,c2,...] [--refill_min M] [--lookahead]
       [--no_refill_cond]
       [--async_harvest]
       [--skip_batch] [--lanes 5,10] [--pingpong P] [--small]

``--sweep``: chunk-size sweep in one process; ``--skip_batch``: skip the
fixed/early-exit baselines (their programs never change; they cost ~6 min
of relay compiles per invocation); ``--refill_min M``: coalesce refills
until M rows are free.

``--lanes k1,k2,...``: additionally measure a pool-size-MIXED stream,
served single-lane at the full pool vs one continuous lane per bucket
(serve --pool_buckets x --continuous); the compact lanes stream a
fraction of the cross-attention K/V bytes.
"""

import dataclasses
import os
import random
import sys
import time

import numpy as np


def main(argv):
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.expanduser("~/.cache/case_rg_tpu_xla")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    from case_rg_tpu.config import DataConfig, ModelConfig
    from case_rg_tpu.data.featurize import featurize
    from case_rg_tpu.data.vocab import Vocabulary
    from case_rg_tpu.models import build_model_cfg, create_model
    from case_rg_tpu.runtime.continuous import (make_continuous_fns,
                                                run_continuous)
    from case_rg_tpu.train.precision import cast_params
    from exp_all_models_qps import synth_samples

    B = int(argv[0]) if argv and not argv[0].startswith("-") else 64
    n_req = 512
    chunk_steps, refill = 8, max(B // 4, 1)
    if "--n" in argv:
        n_req = int(argv[argv.index("--n") + 1])
    if "--chunk" in argv:
        chunk_steps = int(argv[argv.index("--chunk") + 1])
    if "--refill" in argv:
        refill = int(argv[argv.index("--refill") + 1])
    caps_spec = None          # --caps lo-hi: per-request max_tokens mix
    if "--caps" in argv:
        lo, hi = argv[argv.index("--caps") + 1].split("-")
        caps_spec = (int(lo), int(hi))

    small = "--small" in argv   # CPU smoke: tiny shapes, same code path
    vocab = Vocabulary.load("/tmp/http_bench/prepared/vocab.txt")
    dcfg = DataConfig(query_len=60, passage_len=100, num_passage=10,
                      answer_len=40) if not small else \
        DataConfig(query_len=12, passage_len=16, num_passage=3, answer_len=8)
    base = ModelConfig(embedding_size=256, hidden_size=256, num_heads=8,
                       max_target_length=40, max_dec_len=40) if not small \
        else ModelConfig(embedding_size=16, hidden_size=16, num_heads=2,
                         enc_layers=1, dec_layers=1, max_target_length=8,
                         max_dec_len=8)
    mcfg = build_model_cfg(base, "case", vocab)
    max_len = mcfg.max_dec_len
    print(f"devices={jax.devices()} B={B} n={n_req} chunk={chunk_steps} "
          f"refill={refill}", flush=True)

    # full-size random params (same recipe as exp_xprof_decode)
    model = create_model("case", mcfg)
    rng = random.Random(0)
    samples, query, passage = synth_samples(B, rng)
    arrays0 = featurize("case", samples, query, passage, vocab, {}, dcfg)
    init_batch = {k: jnp.asarray(v) for k, v in arrays0.items() if k != "id"}
    if "passage_labels" in init_batch:
        init_batch["passage_label"] = init_batch.pop("passage_labels")[:, 0]
    init_batch["sample_weight"] = jnp.ones((B,), jnp.float32)
    shapes = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           init_batch, method=type(model).train_losses))
    nrng = np.random.RandomState(0)
    variables = jax.tree_util.tree_map(
        lambda s: jnp.asarray(
            nrng.standard_normal(s.shape).astype(np.float32) * 0.02), shapes)
    if not small:   # serving dtype; the CPU smoke backend has no bf16 dot
        variables = cast_params(variables)

    # request pool: n_req distinct featurized rows
    def fresh_arrays(i, count):
        s, q, p = synth_samples(count, random.Random(7000 + i))
        arr = featurize("case", s, q, p, vocab, {}, dcfg)
        return {k: arr[k] for k in ("query", "passage")}

    pool = []
    for i in range(0, n_req, B):
        a = fresh_arrays(i, B)
        for j in range(min(B, n_req - i)):
            pool.append({k: v[j] for k, v in a.items()})
    master = {k: np.stack([r[k] for r in pool]) for k in ("query", "passage")}

    skip_batch = ("--skip_batch" in argv or "--dl_only" in argv)   # caps-mode sweeps: skip the
    # probe + fixed/early-exit measurements (they cost ~6 min of compiles
    # per invocation through the relay and their numbers don't change)
    if skip_batch and caps_spec is None:
        raise SystemExit("--skip_batch requires --caps (the probe decode "
                         "is what picks the retagged EOS)")
    probe = None
    predict = jax.jit(lambda vs, bt: model.apply(
        vs, bt, max_len=max_len, method=type(model).predict))
    if not skip_batch:
        probe_batch = {k: jnp.asarray(master[k][:B]) for k in master}
        t0 = time.time()
        probe = np.asarray(predict(variables, probe_batch)["answer"])
        print(f"probe decode (compile) {time.time()-t0:.0f}s", flush=True)
    caps_arr = None
    if caps_spec is None:
        vals, counts = np.unique(probe[probe != 0], return_counts=True)
        eos = int(vals[np.argmax(counts)])
        model = create_model("case", dataclasses.replace(mcfg, eos_id=eos))
        predict = jax.jit(lambda vs, bt: model.apply(
            vs, bt, max_len=max_len, method=type(model).predict))
        predict_ee = jax.jit(lambda vs, bt: model.apply(
            vs, bt, max_len=max_len, early_exit=True,
            method=type(model).predict))
    else:
        # per-request max_tokens mix (the shipped response_cap feature):
        # random weights rarely emit the real EOS, so fixed/early-exit pay
        # the full max_len while continuous pays ~the mean cap — the same
        # economics a trained model's EOS length mix produces, but
        # controllable. eos stays the real (never-emitted) id.
        eos = mcfg.eos_id
        crng = np.random.RandomState(11)
        caps_arr = crng.randint(caps_spec[0], caps_spec[1] + 1,
                                size=n_req).astype(np.int32)
        predict_ee = jax.jit(lambda vs, bt: model.apply(
            vs, bt, max_len=max_len, early_exit=True,
            method=type(model).predict))
        print(f"caps mix {caps_spec[0]}-{caps_spec[1]}: "
              f"mean={caps_arr.mean():.1f} "
              f"p50={np.percentile(caps_arr, 50):.0f} "
              f"p90={np.percentile(caps_arr, 90):.0f} "
              f"max={caps_arr.max()}", flush=True)

    # emitted-length distribution under the chosen EOS
    def lens(ids):
        hit = ids == eos
        first = np.where(hit.any(1), hit.argmax(1) + 1, ids.shape[1])
        return first
    if probe is not None:
        ld = lens(probe)
        print(f"eos={eos} len mean={ld.mean():.1f} "
              f"p50={np.percentile(ld,50):.0f} "
              f"p90={np.percentile(ld,90):.0f} max={ld.max()}", flush=True)

    def batches():
        for i in range(0, n_req, B):
            idx = np.arange(i, min(i + B, n_req))
            idx = np.concatenate([idx, np.repeat(idx[-1:], B - len(idx))])
            yield {k: jnp.asarray(master[k][idx]) for k in master}

    if not skip_batch:
        # fixed batch (no early exit)
        for name, fn in (("fixed", predict), ("early_exit", predict_ee)):
            list_b = list(batches())
            np.asarray(fn(variables, list_b[0])["answer"])  # compile
            t0 = time.time()
            outs = [fn(variables, bt)["answer"] for bt in list_b]
            for o in outs:
                np.asarray(o)
            dt = time.time() - t0
            print(f"{name}: {n_req/dt:.0f} qps ({dt*1000/len(list_b):.1f} "
                  f"ms/batch)", flush=True)

    # continuous
    reqs = [{"i": i} for i in range(n_req)]

    def make_batch(chunkreqs, bs):
        idx = [r["i"] for r in chunkreqs]
        idx = idx + [idx[-1]] * (bs - len(idx))
        out = {k: jnp.asarray(master[k][idx]) for k in master}
        if caps_arr is not None:
            out["response_cap"] = jnp.asarray(caps_arr[idx])
        return out

    if "--no_fused_stack" in argv:
        from case_rg_tpu.models.multimem import set_fused_stack
        set_fused_stack(False)
        argv.remove("--no_fused_stack")
    lookahead = "--lookahead" in argv
    async_harvest = "--async_harvest" in argv
    refill_min = 1
    if "--refill_min" in argv:
        refill_min = int(argv[argv.index("--refill_min") + 1])
    sweep = [chunk_steps]
    if "--sweep" in argv:   # chunk-size sweep in ONE process (shared
        # init/refill programs; only the chunk program recompiles)
        sweep = [int(x) for x in argv[argv.index("--sweep") + 1].split(",")]

    def _emit(r, ids, rk):
        got.append(r["i"])
        row = np.asarray(ids)
        # caps mode: the forced stop at a row's cap doesn't write EOS into
        # ``out`` (reference cap semantics) — count emitted tokens instead
        out_lens.append(int((row != 0).sum()) if caps_arr is not None
                        else int(lens(row[None])[0]))

    dl_only = "--dl_only" in argv   # skip the fixed + host chunk-loop
    # controls (each costs minutes of compile+run) when only the
    # --device_loop section is being swept
    for cs in ([] if dl_only else sweep):
        init_fn, chunk_fn, refill_fn = make_continuous_fns(
            model, max_len, cs, donate_state=not lookahead)
        # compile ALL programs before timing — init (both widths), chunk,
        # and the refill scatter (its first-call compile otherwise lands
        # inside the first timed refill)
        # (real host fetches, not block_until_ready: through the relay
        # block_until_ready can return BEFORE remote completion — CLAUDE.md
        # — which used to leak the chunk compile into the first timed entry)
        st, _ = init_fn(variables, make_batch(reqs[:B], B))
        st = chunk_fn(variables, st)
        np.asarray(jax.device_get(st["done"]))
        sw2, _ = init_fn(variables, make_batch(reqs[:1], refill))
        sw3 = refill_fn(st, sw2, jnp.arange(refill, dtype=jnp.int32))
        np.asarray(jax.device_get(sw3["done"]))
        del st, sw2, sw3
        # throwaway mini-loop: exercises the exact driver path (lookahead
        # double-buffering, async harvest, emit) end to end before timing
        warm = []
        run_continuous(iter(reqs[:2 * B]), make_batch, init_fn, chunk_fn,
                       refill_fn, variables, B, refill,
                       emit=lambda r, ids, rk: warm.append(r["i"]),
                       max_len=max_len, lookahead=lookahead,
                       refill_min=refill_min, async_harvest=async_harvest)
        assert len(warm) == 2 * B
        got, out_lens = [], []
        t0 = time.time()
        stats = run_continuous(iter(reqs), make_batch, init_fn, chunk_fn,
                               refill_fn, variables, B, refill,
                               emit=_emit, max_len=max_len,
                               lookahead=lookahead, refill_min=refill_min,
                               async_harvest=async_harvest)
        dt = time.time() - t0
        print(f"continuous[chunk={cs} refill={refill} min={refill_min} "
              f"la={int(lookahead)} ah={int(async_harvest)}]: "
              f"{n_req/dt:.0f} qps "
              f"({stats['chunks']} chunks, {stats['refills']} refills; "
              f"emitted len mean={np.mean(out_lens):.1f})", flush=True)
        assert len(got) == n_req

    # ---- device-resident loop (--device_loop [K]): K chunks per
    #      dispatch with in-jit harvest + refills from a pre-staged
    #      device ring (runtime/continuous/device_loop). Slot dead time
    #      drops to <= one in-device chunk; the host pays one roundtrip
    #      per K chunks. --stage S sets the ring size (default 2x
    #      refill). Prints qps + true occupancy (served row-steps over
    #      dispatched batch-steps) ----
    if "--device_loop" in argv:
        from case_rg_tpu.runtime.continuous.device_loop import (
            make_device_loop_fns, run_continuous_device)
        di = argv.index("--device_loop")
        n_chunks = (int(argv[di + 1]) if di + 1 < len(argv)
                    and not argv[di + 1].startswith("-") else 8)
        stage_rows = 2 * refill
        if "--stage" in argv:
            stage_rows = int(argv[argv.index("--stage") + 1])
        dl_look = "--dl_lookahead" in argv
        # --rbound decouples the per-boundary refill bound (in-jit ring
        # gather width = boundary traffic) from the host encode width
        # (--refill). The lax.cond-gated refill is the SHIPPED default
        # (library + bench.py); --no_refill_cond selects the refuted
        # ~4%-slower unconditional drop-mode scatter (docs/PERF.md r14)
        rbound = refill
        if "--rbound" in argv:
            rbound = int(argv[argv.index("--rbound") + 1])
        refill_cond = "--no_refill_cond" not in argv
        dl_sweep = sweep   # device-loop wants SHORT chunks (in-device
        # refill every cs steps); --dl_sweep decouples it from the
        # chunk-loop control's sweep. Ring sizing rule: rows consumed
        # per mega ~ B*K*cs/mean_len must fit in stage_rows.
        # each entry is cs, cs:K, or cs:K:rb (per-entry n_chunks and
        # refill bound, so mixed-cs same-process A/Bs can hold
        # steps-per-mega = K*cs constant AND give each cs its own
        # boundary-gather width — e.g. 4:8:16,2:16:8,1:32:4)
        if "--dl_sweep" in argv:
            dl_sweep = [int(x.partition(":")[0]) if ":" not in x else x
                        for x in
                        argv[argv.index("--dl_sweep") + 1].split(",")]
        # --dl_refills r:rb,r:rb,... — interleaved (refill, rbound)
        # sweep in ONE process, so session drift (±15% across ~30 min,
        # docs/PERF.md) can't masquerade as a config effect; repeat
        # pairs to bracket the drift (e.g. 64:64,16:16,64:64,16:16)
        dl_refills = [(refill, rbound)]
        if "--dl_refills" in argv:
            dl_refills = []
            for pair in argv[argv.index("--dl_refills") + 1].split(","):
                r, _, rb = pair.partition(":")
                dl_refills.append((int(r), int(rb or r)))
        for cs in dl_sweep:
          cs_k, cs_rb = n_chunks, None
          if isinstance(cs, str):
              parts = cs.split(":")
              cs, cs_k = int(parts[0]), int(parts[1])
              if len(parts) > 2:
                  cs_rb = int(parts[2])
          for rf, rb in dl_refills:
            if cs_rb is not None:
                rb = cs_rb
            dfns = make_device_loop_fns(model, max_len, chunk_steps=cs,
                                        n_chunks=cs_k,
                                        stage_rows=stage_rows,
                                        refill_bound=rb,
                                        refill_cond=refill_cond)
            # compile every program off the clock: init at both widths,
            # wrap, stage seed, push, and the mega itself (real host
            # fetches — relay block_until_ready lies, CLAUDE.md)
            stw, _ = dfns.init_fn(variables, make_batch(reqs[:B], B))
            uidw = np.arange(B, dtype=np.int64)
            wrapw = dfns.wrap_fn(stw, uidw, uidw >= 0)
            bkt, _ = dfns.init_fn(variables, make_batch(reqs[:1], rf))
            stgw = dfns.stage_fn(bkt, jnp.arange(rf, dtype=jnp.int32))
            stgw = dfns.push_fn(stgw, {"m": bkt, "uid": jnp.arange(
                rf, dtype=jnp.int32)}, jnp.arange(rf,
                                                  dtype=jnp.int32))
            wrapw, hv = dfns.mega_fn(variables, wrapw, stgw,
                                     np.int32(rf))
            np.asarray(jax.device_get(hv["count"]))
            del stw, wrapw, bkt, stgw, hv
            # throwaway mini-loop: the exact driver path end to end
            warm = []
            run_continuous_device(iter(reqs[:2 * B]), make_batch, dfns,
                                  variables, B, rf,
                                  emit=lambda r, ids, rk:
                                  warm.append(r["i"]), max_len=max_len,
                                  lookahead=dl_look)
            assert len(warm) == 2 * B
            got, out_lens = [], []
            t0 = time.time()
            stats = run_continuous_device(iter(reqs), make_batch, dfns,
                                          variables, B, rf,
                                          emit=_emit, max_len=max_len,
                                          lookahead=dl_look)
            dt = time.time() - t0
            occ = (stats["steps_served"]
                   / max(stats["chunks"] * cs * B, 1))
            print(f"device_loop[chunk={cs} K={cs_k} refill={rf} "
                  f"rbound={rb} cond={int(refill_cond)} "
                  f"stage={stage_rows} la={int(dl_look)}]: "
                  f"{n_req/dt:.0f} qps "
                  f"({stats['megas']} megas, {stats['chunks']} chunks, "
                  f"{stats['refills']} pushes; occupancy {occ:.2f}; "
                  f"emitted len mean={np.mean(out_lens):.1f})", flush=True)
            assert len(got) == n_req

    # ---- ping-pong (--pingpong P): split B into P same-pool lanes of
    #      width B/P, driven by run_continuous_multi (+ async_harvest if
    #      set). Tests the occupancy hypothesis: each lane harvests and
    #      refills while the OTHER lanes' chunks compute, so slot
    #      turnaround lag (detection + refill, 2-3 chunks on a ~22-step
    #      row lifetime — docs/PERF.md round 10) hides behind device work
    #      instead of idling rows ----
    if "--pingpong" in argv:
        from case_rg_tpu.runtime.continuous import (Lane,
                                                    run_continuous_multi)
        P = int(argv[argv.index("--pingpong") + 1])
        bl = max(1, B // P)
        rl = min(refill, bl)
        lanes_pp = [Lane(j, make_batch, init_fn, chunk_fn, refill_fn,
                         bl, rl, refill_min=min(refill_min, rl))
                    for j in range(P)]
        ctr = {"n": -1}

        def rr(req):   # round-robin arrival routing
            ctr["n"] += 1
            return lanes_pp[ctr["n"] % P]

        # compile the lane-width programs (init at bl and rl, chunk, and
        # the rl-wide refill scatter). chunk_fn donates its input state
        # when --lookahead is absent, so warm the refill against the CHUNK
        # OUTPUT — refilling the donated stw raises 'Array has been
        # deleted' on TPU whenever rl < bl (advisor round 2). The refill
        # program is warmed unconditionally: at rl == bl it otherwise
        # compiled inside the timed region and skewed the pingpong qps.
        stw, _ = init_fn(variables, make_batch(reqs[:1], bl))
        st2 = chunk_fn(variables, stw)
        np.asarray(jax.device_get(st2["done"]))
        sw2, _ = init_fn(variables, make_batch(reqs[:1], rl))
        sw3 = refill_fn(st2, sw2, jnp.arange(rl, dtype=jnp.int32))
        np.asarray(jax.device_get(sw3["done"]))
        del stw, st2, sw2, sw3
        got = []
        t0 = time.time()
        stats = run_continuous_multi(
            iter(reqs), lanes_pp, rr, variables,
            emit=lambda r, ids, rk: got.append(r["i"]),
            async_harvest=async_harvest)
        dt = time.time() - t0
        print(f"pingpong P={P} (lane B={bl} refill={rl} "
              f"ah={int(async_harvest)}): {n_req/dt:.0f} qps "
              f"({stats['chunks']} chunks, {stats['refills']} refills)",
              flush=True)
        assert sorted(got) == list(range(n_req))

    # ---- multi-lane (--lanes 5,10): pool-size-mixed request stream,
    #      served single-lane at the full pool vs one continuous lane per
    #      bucket (Lane/run_continuous_multi). The compact lanes stream a
    #      fraction of the cross-attention K/V bytes (the decode is
    #      bandwidth-bound there), so the multi-lane win compounds with
    #      the mean-length win. Requests route to the smallest bucket
    #      that fits their pool size ----
    if "--lanes" in argv:
        from case_rg_tpu.runtime.continuous import (Lane,
                                                    run_continuous_multi)
        lane_sizes = sorted(int(x) for x in
                            argv[argv.index("--lanes") + 1].split(","))
        np_pool = dcfg.num_passage
        if lane_sizes[-1] != np_pool:
            lane_sizes.append(np_pool)
        srng = np.random.RandomState(42)
        sizes = srng.choice(lane_sizes, size=n_req)
        reqs_mix = [{"i": i, "k": int(sizes[i])} for i in range(n_req)]
        print(f"lane mix: {dict(zip(*np.unique(sizes, return_counts=True)))}",
              flush=True)

        def mb_for(k):
            def mb(chunkreqs, bs):
                idx = [r["i"] for r in chunkreqs]
                idx = idx + [idx[-1]] * (bs - len(idx))
                out = {"query": jnp.asarray(master["query"][idx]),
                       "passage": jnp.asarray(master["passage"][idx][:, :k])}
                if caps_arr is not None:  # same per-request caps as the
                    # single-lane baseline, else the two timed runs decode
                    # different amounts of work
                    out["response_cap"] = jnp.asarray(caps_arr[idx])
                return out
            return mb

        # single-lane baseline: the same mixed stream, every request
        # served at the full pool size
        got = []
        t0 = time.time()
        stats = run_continuous(iter(reqs_mix), make_batch, init_fn,
                               chunk_fn, refill_fn, variables, B, refill,
                               emit=lambda r, ids, rk: got.append(r["i"]),
                               max_len=max_len, lookahead=lookahead,
                               refill_min=refill_min,
                               async_harvest=async_harvest)
        dt = time.time() - t0
        print(f"mixed single-lane (pool {np_pool}): {n_req/dt:.0f} qps "
              f"({stats['chunks']} chunks)", flush=True)

        lanes = {k: Lane(k, mb_for(k), init_fn, chunk_fn, refill_fn,
                         B, refill) for k in lane_sizes}
        # compile each lane's programs (init at B and refill widths, chunk)
        for k in lane_sizes:
            stw, _ = init_fn(variables, mb_for(k)(reqs_mix[:1], B))
            jax.block_until_ready(chunk_fn(variables, stw))
            if refill != B:
                jax.block_until_ready(
                    init_fn(variables, mb_for(k)(reqs_mix[:1], refill)))
        got = []
        t0 = time.time()
        stats = run_continuous_multi(
            iter(reqs_mix), list(lanes.values()),
            lambda r: lanes[r["k"]], variables,
            emit=lambda r, ids, rk: got.append(r["i"]),
            async_harvest=async_harvest)
        dt = time.time() - t0
        print(f"mixed multi-lane {lane_sizes} ah={int(async_harvest)}: "
              f"{n_req/dt:.0f} qps "
              f"({stats['chunks']} chunks, {stats['refills']} refills)",
              flush=True)
        assert sorted(got) == list(range(n_req))


if __name__ == "__main__":
    main(sys.argv[1:])
