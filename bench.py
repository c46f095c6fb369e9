"""Benchmark: CaSE end-to-end inference (passage ranking + 40-step decode)
queries/sec/chip at TREC-CAsT shapes.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

``vs_baseline`` compares against the self-generated PyTorch-reference
baseline recorded in BASELINE.md (the reference publishes no numbers —
SURVEY.md §6). The baseline constant below is the reference implementation's
measured throughput on this host (see BASELINE.md "Self-generated baselines"
for methodology); the north-star target is >=5x the PyTorch baseline
(BASELINE.json).
"""

from __future__ import annotations

import json
import time

import numpy as np

# Reference PyTorch CaSE do_test() queries/sec measured on this host's CPU
# (tools/bench_reference_torch.py; recorded in BASELINE.md). Updated whenever
# the baseline is re-measured.
TORCH_REFERENCE_QPS = None  # filled from BASELINE.md if available


def _read_baseline():
    try:
        with open("BASELINE.md") as f:
            for line in f:
                if line.startswith("<!--torch_reference_case_qps="):
                    return float(line.split("=")[1].split("-->")[0])
    except OSError:
        pass
    return None


def main():
    import os

    import jax
    import jax.numpy as jnp

    # persistent compilation cache: the CaSE B=64 program compiles in
    # 200-500 s; repeat runs on unchanged code hit the cache
    cache_dir = os.environ.get("CASE_RG_COMPILE_CACHE",
                               os.path.expanduser("~/.cache/case_rg_tpu_xla"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    from case_rg_tpu.config import ModelConfig
    from case_rg_tpu.models import create_model
    from case_rg_tpu.runtime.inference import make_predict_fn

    v, b = 30522, 64
    cfg = ModelConfig(name="case", vocab_size=v, embedding_size=256,
                      hidden_size=256, num_heads=8, enc_layers=3, dec_layers=4,
                      max_dec_len=40, max_target_length=40)
    model = create_model("case", cfg)
    rng = np.random.RandomState(0)
    batch = {
        "query": jnp.asarray(rng.randint(4, v, size=(b, 1, 60)), jnp.int32),
        "passage": jnp.asarray(rng.randint(4, v, size=(b, 10, 100)), jnp.int32),
    }
    init_batch = dict(batch)
    init_batch.update(
        response=jnp.asarray(rng.randint(4, v, size=(b, 40)), jnp.int32),
        passage_label=jnp.zeros((b,), jnp.int32),
        token_label=jnp.zeros((b, 10, 100), jnp.float32),
        token_weight=jnp.ones((b, 10, 100), jnp.float32))
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           init_batch, method=type(model).train_losses)
    # Serving config: bfloat16 parameters (MXU-native). Metric-identical to
    # f32 on the trained real-data checkpoint (BASELINE.md).
    from case_rg_tpu.train.precision import cast_params
    variables = cast_params(variables)

    predict = make_predict_fn(model, cfg, max_len=40)

    # Guard: the measured program must match the shipped serving
    # configuration. The fused encoder attention Pallas kernel must be
    # active (>=1 tpu_custom_call), and the candidate-argmax kernel must
    # NOT be (its auto gate flipped off in round 9: 741 us/step vs 78 us
    # for the dense compare after this image's XLA update — multimem.
    # _resolve_fast_argmax, docs/PERF.md round 9). A silent mismatch
    # would produce a wrong-config but plausible-looking number — fail
    # loudly instead.
    backend = jax.default_backend()
    if backend == "tpu" or os.environ.get("CASE_RG_BENCH_REQUIRE_PALLAS"):
        hlo = predict.lower(variables, batch).as_text()
        n_custom = hlo.count("tpu_custom_call")
        if n_custom < 1:
            raise SystemExit(
                "bench.py: expected the fused encoder attention Pallas "
                "kernel (tpu_custom_call) in the lowered predict program, "
                "found none — fast path inactive")
        if "combine_copy_mass" in hlo:
            raise SystemExit(
                "bench.py: the candidate-argmax kernel (combine_copy_mass) "
                "appears in the lowered program despite its auto gate being "
                "off (see multimem._resolve_fast_argmax)")
        if backend == "tpu" and "_decoder_stack_kernel" not in hlo:
            raise SystemExit(
                "bench.py: the fused decoder-stack kernel "
                "(_decoder_stack_kernel) is missing from the lowered "
                "predict program — the round-10 auto gate (bf16 TPU, "
                "long-memory stacks) should have enabled it "
                "(multimem._fused_stack; case 735 -> 818 qps)")

    # Analytic FLOP accounting for MFU/roofline reporting: XLA's own cost
    # model over the compiled predict program (counts every dot/conv at
    # static shapes, scans multiplied by trip count). v5e peak: 197 TFLOPS
    # bf16, 819 GB/s HBM (public spec). MFU here is hardware-relative —
    # the answer to "what fraction of the chip does a query use", vs the
    # CPU-relative vs_baseline field.
    flops_per_batch = bytes_per_batch = None
    try:
        ca = predict.lower(variables, batch).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops_per_batch = float(ca.get("flops", 0.0)) or None
        bytes_per_batch = float(ca.get("bytes accessed", 0.0)) or None
    except Exception:
        pass

    np.asarray(predict(variables, batch)["answer"])  # compile + full sync
    # NOTE: distinct batches per iteration and a real host fetch per result —
    # on this image's relay-backed TPU backend, block_until_ready can return
    # before remote completion and identical calls may be served from cache;
    # fetching the answer ids is the only reliable synchronization.
    # Throughput is measured with pipelined dispatch (all batches submitted,
    # results fetched in order) — how a serving deployment drives the chip;
    # serial dispatch-fetch loses ~18% to the per-call host roundtrip
    # (tools/exp_pipeline_serve.py). The relay adds run-to-run variance
    # (BENCH_r01 610 vs a same-code 827 in a different session), so the
    # headline is the MEDIAN of `windows` independent pipelined windows,
    # with the per-window values reported alongside.
    iters = int(os.environ.get("CASE_RG_BENCH_ITERS", "12"))
    windows = int(os.environ.get("CASE_RG_BENCH_WINDOWS", "3"))

    def fresh_batch():
        return {
            "query": jnp.asarray(rng.randint(4, v, size=(b, 1, 60)),
                                 jnp.int32),
            "passage": jnp.asarray(rng.randint(4, v, size=(b, 10, 100)),
                                   jnp.int32),
        }

    window_qps = []
    for _ in range(windows):
        batches = [fresh_batch() for _ in range(iters)]
        t0 = time.time()
        outs = [predict(variables, bt)["answer"] for bt in batches]
        for o in outs:
            np.asarray(o)
        window_qps.append(b * iters / (time.time() - t0))
    qps = float(np.median(window_qps))

    # ---- best shipped serving config: the device-resident continuous
    # loop (serve --continuous --device_loop) on a caps-mix workload
    # (per-request max_tokens 4-40 — the length economics a trained
    # model's EOS mix produces; docs/PERF.md round 11: 958 vs 836 fixed
    # same-session). The fixed-path number above stays the headline
    # metric for round-over-round continuity; this measures what the
    # framework actually ships as its fastest serving mode.
    cont = None
    try:
        cont = _measure_continuous(jax, jnp, model, variables, v, b,
                                   flops_per_batch, bytes_per_batch)
    except Exception as e:   # never let the extra metric kill the bench
        cont = {"error": repr(e)}

    baseline = _read_baseline()
    vs = qps / baseline if baseline else 0.0
    out = {
        "metric": "case_rank_decode_qps_per_chip",
        "value": round(qps, 2), "unit": "queries/sec/chip",
        "vs_baseline": round(vs, 2),
        "windows": [round(w, 1) for w in window_qps],
        "baseline_note": ("PyTorch reference CaSE do_test on this host's "
                          "CPU (no GPU present; see BASELINE.md) — NOT a "
                          "GPU-vs-TPU comparison"),
        # The relay-attached chip's throughput varies BETWEEN sessions far
        # more than within one (same program measured 629-836 qps across
        # rounds; windows above spread <4%). Round-over-round deltas within
        # this band are weather, not regressions — compare same-session
        # controls (docs/PERF.md round 8/11 methodology).
        "session_variance_note": "cross-session spread observed up to ±15%; "
                                 "within-session window spread <4%",
    }
    if flops_per_batch:
        # achieved TFLOPS at the measured qps; MFU vs v5e bf16 peak
        # (197 TFLOPS). The wall measurement includes host dispatch and
        # relay overheads, so this is a deployment-honest (lower-bound)
        # utilization number; docs/PERF.md carries the roofline analysis.
        tflops = flops_per_batch * qps / b / 1e12
        out["gflop_per_query"] = round(flops_per_batch / b / 1e9, 2)
        out["tflops"] = round(tflops, 2)
        out["mfu"] = round(tflops / 197.0, 4)
        if bytes_per_batch:
            out["hbm_gb_per_query"] = round(bytes_per_batch / b / 1e9, 3)
            out["hbm_util"] = round(
                bytes_per_batch * qps / b / 819e9, 4)
    if cont is not None:
        out["continuous"] = cont
    print(json.dumps(out))


def _measure_continuous(jax, jnp, model, variables, v, b,
                        fixed_flops_per_batch, fixed_bytes_per_batch):
    """Device-loop continuous qps on a caps-mix workload (one dict of
    sub-fields for the bench JSON). Config = the round-14 knee: chunk=4,
    K=8, stage=256, refill=B/4 (=16 at B=64 — the interleaved A/B's
    +12% winner over 64-wide), lookahead."""
    import os

    from case_rg_tpu.runtime.continuous.device_loop import (
        make_device_loop_fns, run_continuous_device)

    n_req = int(os.environ.get("CASE_RG_BENCH_CONT_N", "1024"))
    # refill=16 (= the serve CLI's B/4 default), NOT B: the round-14
    # interleaved same-session A/B measured 16-wide refill encodes +12%
    # over 64-wide (1076 vs 957 qps median of 3 alternating runs) —
    # docs/PERF.md round 14
    cs, n_chunks, stage_rows, refill = 4, 8, 256, max(b // 4, 1)
    max_len = 40
    rng = np.random.RandomState(7)
    master = {
        "query": rng.randint(4, v, size=(n_req, 1, 60)).astype(np.int32),
        "passage": rng.randint(4, v, size=(n_req, 10, 100)).astype(np.int32),
    }
    caps = rng.randint(4, max_len + 1, size=n_req).astype(np.int32)
    mean_cap = float(caps.mean())

    def make_batch(chunkreqs, bs):
        idx = [r["i"] for r in chunkreqs]
        idx = idx + [idx[-1]] * (bs - len(idx))
        out = {k: jnp.asarray(vv[idx]) for k, vv in master.items()}
        out["response_cap"] = jnp.asarray(caps[idx])
        return out

    dfns = make_device_loop_fns(model, max_len, chunk_steps=cs,
                                n_chunks=n_chunks, stage_rows=stage_rows,
                                refill_bound=refill)
    reqs = [{"i": i} for i in range(n_req)]
    # compile off the clock: init at both widths, wrap/stage/push, mega
    # (real host fetches — relay block_until_ready lies, CLAUDE.md)
    stw, _ = dfns.init_fn(variables, make_batch(reqs[:b], b))
    uidw = np.arange(b, dtype=np.int64)
    wrapw = dfns.wrap_fn(stw, uidw, uidw >= 0)
    bkt, _ = dfns.init_fn(variables, make_batch(reqs[:1], refill))
    stgw = dfns.stage_fn(bkt, jnp.arange(refill, dtype=jnp.int32))
    stgw = dfns.push_fn(stgw, {"m": bkt, "uid": jnp.arange(
        refill, dtype=jnp.int32)}, jnp.arange(refill, dtype=jnp.int32))
    wrapw, hv = dfns.mega_fn(variables, wrapw, stgw, np.int32(refill))
    np.asarray(jax.device_get(hv["count"]))
    del stw, wrapw, bkt, stgw, hv
    # throwaway mini-loop: the exact driver path end to end
    warm = []
    run_continuous_device(iter(reqs[: 2 * b]), make_batch, dfns, variables,
                          b, refill, emit=lambda r, ids, rk:
                          warm.append(r["i"]), max_len=max_len,
                          lookahead=True)
    assert len(warm) == 2 * b

    got = []
    t0 = time.time()
    stats = run_continuous_device(
        iter(reqs), make_batch, dfns, variables, b, refill,
        emit=lambda r, ids, rk: got.append(r["i"]), max_len=max_len,
        lookahead=True)
    dt = time.time() - t0
    assert len(got) == n_req
    qps = n_req / dt
    occ = stats["steps_served"] / max(stats["chunks"] * cs * b, 1)
    out = {
        "metric": "case_continuous_device_loop_qps_per_chip",
        "value": round(qps, 2), "unit": "queries/sec/chip",
        "workload": f"caps 4-{max_len} (mean {mean_cap:.1f}), n={n_req}, "
                    f"B={b} chunk={cs} K={n_chunks} stage={stage_rows} "
                    f"refill={refill} rbound={refill} cond lookahead",
        "occupancy": round(occ, 3),
    }
    # MFU/HBM for the continuous path, ESTIMATED from the fixed program's
    # cost analysis: the fixed predict pays max_len decode steps/query;
    # continuous pays ~steps_served/n_req. Scaling the per-query decode
    # share by that ratio (encode share unchanged) bounds the continuous
    # program's arithmetic honestly without cost-analyzing the while-loop
    # mega program (XLA cannot attribute trip counts there). Decode share
    # of the fixed program ~ its serialized-phase share (docs/PERF.md
    # round 11 roofline: encode/towers ~1/3 of device time at B=64).
    if fixed_flops_per_batch:
        steps_ratio = (stats["steps_served"] / n_req) / max_len
        decode_share = 0.55   # decode FLOPs share of the fixed program
        # (xprof round 4: decode while-loop = 55 ms of ~117 ms/batch)
        scale = (1 - decode_share) + decode_share * steps_ratio
        fq = fixed_flops_per_batch / b * scale
        out["gflop_per_query_est"] = round(fq / 1e9, 2)
        out["tflops_est"] = round(fq * qps / 1e12, 2)
        out["mfu_est"] = round(fq * qps / 1e12 / 197.0, 4)
        if fixed_bytes_per_batch:
            bq = fixed_bytes_per_batch / b * scale
            out["hbm_gb_per_query_est"] = round(bq / 1e9, 3)
            out["hbm_util_est"] = round(bq * qps / 819e9, 4)
        out["est_note"] = ("flops/bytes scaled from the fixed program's "
                           "cost analysis by served decode steps "
                           f"({stats['steps_served']}/{n_req * max_len})")
    return out


if __name__ == "__main__":
    main()
