"""End-to-end: prepare -> train -> test -> evaluate on the synthetic dataset,
through the CLI entry points (SURVEY §7 step 4: the minimum full slice)."""

import json
import os

import numpy as np
import pytest

from fixtures import make_dataset


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("e2e"))
    make_dataset(root, "toy", n_queries=12, n_passages=20)
    from case_rg_tpu.cli.prepare import main as prepare_main
    prepare_main(["--data_path", root, "--dataset", "toy",
                  "--query_len", "24", "--passage_len", "24",
                  "--num_passage", "4", "--answer_len", "10"])
    return root


def _run_args(root, out, model, mode, extra=()):
    return ["--model", model, "--mode", mode, "--data_path", root,
            "--dataset", "toy", "--output_path", out,
            "--embedding_size", "16", "--hidden_size", "16",
            "--num_heads", "2", "--batch_size", "4", "--epoch", "2",
            "--max_target_length", "8", "--warmup_steps", "4",
            "--learning_rate", "1e-3"] + list(extra)


def test_s2sa_full_pipeline(workspace, tmp_path):
    from case_rg_tpu.cli.run import main as run_main
    from case_rg_tpu.cli.evaluate import main as eval_main
    root = workspace
    out = str(tmp_path / "out_s2sa")

    run_main(_run_args(root, out, "s2sa", "train"))
    assert os.path.exists(os.path.join(out, "model", "0.ckpt"))
    assert os.path.exists(os.path.join(out, "model", "1.ckpt"))
    # per-epoch dev loss logged (default --dev_eval)
    metrics = [json.loads(l) for l in open(os.path.join(out,
                                                        "metrics.jsonl"))]
    dev_rows = [m for m in metrics if any(k.startswith("dev_") for k in m)]
    assert len(dev_rows) == 2, "expected one dev-loss row per epoch"
    assert all(np.isfinite(m["dev_total"]) for m in dev_rows)

    run_main(_run_args(root, out, "s2sa", "test"))
    result_dir = os.path.join(out, "result")
    files = os.listdir(result_dir)
    assert any(f.endswith(".answer") for f in files)

    report = eval_main(["--model", "s2sa", "--data_path", root,
                        "--datasets", "toy", "--output_path", out])
    toy = report["toy"]
    assert toy, "no result prefixes evaluated"
    some = next(iter(toy.values()))
    assert "ROUGE_L_F1" in some and "BLEU" in some and "METEOR" in some
    assert np.isfinite(some["ROUGE_L_F1"])

    # best-epoch selection: best.json written by --dev_eval, --best_only
    # decodes exactly that epoch
    from case_rg_tpu.train.checkpoint import best_epoch
    be = best_epoch(out)
    assert be in (0, 1)
    run_main(_run_args(root, out, "s2sa", "test", ["--best_only"]))
    assert os.path.exists(os.path.join(
        out, "result", f"toy_test_{be}.0.answer"))

    # --mode avg: averaged checkpoint holds the mean of the epoch params;
    # --avg_only decodes only it
    run_main(_run_args(root, out, "s2sa", "avg", ["--avg_epochs", "0,1"]))
    from flax import serialization

    def params_of(tag):
        with open(os.path.join(out, "model", f"{tag}.ckpt"), "rb") as f:
            return serialization.msgpack_restore(f.read())["params"]

    p0, p1, pa = params_of(0), params_of(1), params_of("avg")

    def leaf(p):
        return p["encoders"]["embedding"]["embedding"]

    np.testing.assert_allclose(leaf(pa), (leaf(p0) + leaf(p1)) / 2.0,
                               rtol=1e-6)
    run_main(_run_args(root, out, "s2sa", "test", ["--avg_only"]))
    assert os.path.exists(os.path.join(out, "result",
                                       "toy_test_avg.0.answer"))


def test_case_full_pipeline(workspace, tmp_path):
    from case_rg_tpu.cli.run import main as run_main
    from case_rg_tpu.cli.evaluate import main as eval_main
    root = workspace
    out = str(tmp_path / "out_case")

    run_main(_run_args(root, out, "case", "train", ["--epoch", "1"]))
    run_main(_run_args(root, out, "case", "test", ["--epoch", "1"]))
    report = eval_main(["--model", "case", "--data_path", root,
                        "--datasets", "toy", "--output_path", out])
    toy = report["toy"]
    some = next(iter(toy.values()))
    # CaSE emits both rank and answer outputs
    assert "map" in some and "ndcg" in some
    assert "ROUGE_L_F1" in some
    # multimem sampling with controls (CaSE decoder path) — after eval so
    # the evaluated result files stay the greedy ones
    run_main(_run_args(root, out, "case", "test",
                       ["--epoch", "1", "--decoding", "sample",
                        "--temperature", "0.8", "--top_p", "0.9"]))

    # StableHLO export: self-contained artifact (params baked in) whose
    # outputs --check verifies equal the live predict program; the loader
    # needs only jax + the blob
    from case_rg_tpu.cli.export_model import main as export_main
    from case_rg_tpu.runtime.exported import load_exported
    art = str(tmp_path / "case_b4.shlo")
    export_main(["--model", "case",
                 "--prepared_dir", os.path.join(root, "toy", "prepared"),
                 "--output_path", out, "--epoch", "0",
                 "--embedding_size", "16", "--hidden_size", "16",
                 "--num_heads", "2", "--max_target_length", "8",
                 "--query_len", "24", "--passage_len", "24",
                 "--num_passage", "4", "--batch_size", "4",
                 "--out", art, "--check"])
    assert os.path.exists(art) and os.path.exists(art + ".json")
    sidecar = json.load(open(art + ".json"))
    assert sidecar["model"] == "case" and "query" in sidecar["inputs"]
    assert load_exported(art).platforms == ("cpu",)

    # serve --from_export: the artifact serves without model code or a
    # checkpoint (model/shapes from the sidecar); answers + rankings match
    # checkpoint serving with the same fixed-cost decode
    from case_rg_tpu.cli.serve import main as serve_main
    prep = os.path.join(root, "toy", "prepared")
    reqs = [{"id": "q1", "query": "what is kinetic energy ?",
             "passages": ["kinetic energy is the energy of motion .",
                          "whales are large ocean mammals ."]},
            {"id": "q2", "query": "where do whales live ?",
             "passages": ["whales are large ocean mammals ."],
             "max_tokens": 4}]
    rin = str(tmp_path / "reqs.jsonl")
    with open(rin, "w") as f:
        f.writelines(json.dumps(r) + "\n" for r in reqs)
    r_exp = str(tmp_path / "resp_export.jsonl")
    serve_main(["--prepared_dir", prep, "--from_export", art,
                "--input", rin, "--output", r_exp])
    r_live = str(tmp_path / "resp_live.jsonl")
    serve_main(["--model", "case", "--prepared_dir", prep,
                "--output_path", out, "--epoch", "0",
                "--embedding_size", "16", "--hidden_size", "16",
                "--num_heads", "2", "--max_target_length", "8",
                "--query_len", "24", "--passage_len", "24",
                "--num_passage", "4", "--batch_size", "4",
                "--no-early_exit", "--input", rin, "--output", r_live])
    got = [json.loads(l) for l in open(r_exp)]
    want = [json.loads(l) for l in open(r_live)]
    assert got == want
    assert got[0]["id"] == "q1" and got[0]["answer"]
    assert got[0]["ranking"] and len(got[1]["ranking"]) == 1

    # flags fixed by the artifact are rejected, as is a missing --model
    # without --from_export
    for extra in (["--continuous"], ["--bf16"], ["--epoch", "1"],
                  ["--model", "case"]):
        with pytest.raises(SystemExit):
            serve_main(["--prepared_dir", prep, "--from_export", art,
                        "--input", rin, "--output", os.devnull] + extra)
    with pytest.raises(SystemExit):
        serve_main(["--prepared_dir", prep, "--input", rin,
                    "--output", os.devnull])

    # offline continuous predict: result files identical to the batch path
    # (compare per-rank shards only — eval_main wrote merged .all.* files)
    import re
    shard = re.compile(r"\.\d+\.(answer|run)$")
    rd = os.path.join(out, "result")
    run_main(_run_args(root, out, "case", "test", ["--epoch", "1"]))
    plain = {f: open(os.path.join(rd, f)).read()
             for f in sorted(os.listdir(rd)) if shard.search(f)}
    import shutil
    shutil.rmtree(rd)
    run_main(_run_args(root, out, "case", "test",
                       ["--epoch", "1", "--continuous", "--chunk_steps", "3",
                        "--refill", "2"]))
    cont = {f: open(os.path.join(rd, f)).read()
            for f in sorted(os.listdir(rd)) if shard.search(f)}
    assert set(cont) == set(plain)
    for f in plain:
        if f.endswith(".answer"):
            assert cont[f] == plain[f], f"answers differ in {f}"
        else:
            # scores move ~1 f32 ulp (decode_init is a different XLA
            # program than predict; encoder reductions fuse differently);
            # rank ORDER and every id field must match exactly
            pl = [l.split() for l in plain[f].splitlines()]
            cl = [l.split() for l in cont[f].splitlines()]
            assert [l[:4] for l in pl] == [l[:4] for l in cl], f
            for a, b in zip(pl, cl):
                np.testing.assert_allclose(float(b[4]), float(a[4]),
                                           rtol=1e-5, atol=1e-6)

    # device-resident loop (--device_loop): same contract as the chunk
    # loop — answers byte-identical, rank order identical, scores within
    # fusion ulp of the plain path
    shutil.rmtree(rd)
    run_main(_run_args(root, out, "case", "test",
                       ["--epoch", "1", "--continuous", "--chunk_steps",
                        "3", "--refill", "2", "--device_loop", "2",
                        "--stage_rows", "4", "--lookahead"]))
    dev = {f: open(os.path.join(rd, f)).read()
           for f in sorted(os.listdir(rd)) if shard.search(f)}
    assert set(dev) == set(plain)
    for f in plain:
        if f.endswith(".answer"):
            assert dev[f] == plain[f], f"device-loop answers differ in {f}"
        else:
            pl = [l.split() for l in plain[f].splitlines()]
            cl = [l.split() for l in dev[f].splitlines()]
            assert [l[:4] for l in pl] == [l[:4] for l in cl], f
            for a, b in zip(pl, cl):
                np.testing.assert_allclose(float(b[4]), float(a[4]),
                                           rtol=1e-5, atol=1e-6)


def test_serve_cli(workspace, tmp_path):
    """Online serving: JSONL requests -> answers (+ ranking for case),
    featurized on the fly with the offline code path."""
    from case_rg_tpu.cli.run import main as run_main
    from case_rg_tpu.cli.serve import main as serve_main
    root = workspace
    out = str(tmp_path / "out_serve")
    run_main(_run_args(root, out, "case", "train", ["--epoch", "1"]))

    reqs = [
        {"id": "r1", "query": "what is kinetic energy ?",
         "history": ["tell me about energy"],
         "passages": ["kinetic energy is the energy of motion. objects in "
                      "motion have it.", "whales are large ocean mammals."]},
        {"id": "r2", "query": "how big are whales ?",
         "passages": ["whales are large ocean mammals. the blue whale is "
                      "the largest."]},
    ]
    req_path = str(tmp_path / "reqs.jsonl")
    out_path = str(tmp_path / "resp.jsonl")
    with open(req_path, "w") as f:
        for r in reqs:
            f.write(json.dumps(r) + "\n")
    serve_main(["--model", "case",
                "--prepared_dir", os.path.join(root, "toy", "prepared"),
                "--output_path", out, "--input", req_path,
                "--output", out_path, "--batch_size", "4",
                "--embedding_size", "16", "--hidden_size", "16",
                "--num_heads", "2", "--max_target_length", "8",
                "--query_len", "24", "--passage_len", "24",
                "--num_passage", "4"])
    lines = [json.loads(l) for l in open(out_path)]
    assert [l["id"] for l in lines] == ["r1", "r2"]
    assert all(isinstance(l["answer"], str) and l["answer"] for l in lines)
    assert sorted(lines[0]["ranking"]) == [0, 1]
    assert lines[1]["ranking"] == [0]

    # --rank_only: same rankings as the full run, no answers, decode skipped
    ro_path = str(tmp_path / "resp_rank_only.jsonl")
    serve_main(["--model", "case",
                "--prepared_dir", os.path.join(root, "toy", "prepared"),
                "--output_path", out, "--input", req_path,
                "--output", ro_path, "--batch_size", "4",
                "--embedding_size", "16", "--hidden_size", "16",
                "--num_heads", "2", "--max_target_length", "8",
                "--query_len", "24", "--passage_len", "24",
                "--num_passage", "4", "--rank_only"])
    rlines = [json.loads(l) for l in open(ro_path)]
    assert [l["ranking"] for l in rlines] == [l["ranking"] for l in lines]
    assert all("answer" not in l for l in rlines)

    # --pool_buckets: r1 (2 passages) -> bucket 2, r2 (1 passage) -> bucket
    # 2, so one batch serves both at the compact pool size; order preserved
    common = ["--model", "case",
              "--prepared_dir", os.path.join(root, "toy", "prepared"),
              "--output_path", out, "--batch_size", "4",
              "--embedding_size", "16", "--hidden_size", "16",
              "--num_heads", "2", "--max_target_length", "8",
              "--query_len", "24", "--passage_len", "24"]
    # --batch_buckets: the 2-request chunk runs in the batch-2 program;
    # per-row results are independent of batch padding, so output is
    # byte-identical to the padded batch-4 run
    bb_path = str(tmp_path / "resp_bb.jsonl")
    serve_main(common + ["--input", req_path, "--output", bb_path,
                         "--num_passage", "4", "--batch_buckets", "2,4"])
    assert [json.loads(l) for l in open(bb_path)] == lines

    bucket_path = str(tmp_path / "resp_bucket.jsonl")
    serve_main(common + ["--input", req_path, "--output", bucket_path,
                         "--num_passage", "4", "--pool_buckets", "2,4"])
    blines = [json.loads(l) for l in open(bucket_path)]
    assert [l["id"] for l in blines] == ["r1", "r2"]
    assert sorted(blines[0]["ranking"]) == [0, 1]
    assert blines[1]["ranking"] == [0]
    # bucket-2 results must equal an unbucketed run at num_passage=2
    # (identical featurized arrays -> identical answers/rankings)
    compact_path = str(tmp_path / "resp_np2.jsonl")
    serve_main(common + ["--input", req_path, "--output", compact_path,
                         "--num_passage", "2"])
    clines = [json.loads(l) for l in open(compact_path)]
    assert blines == clines

    # reorder buffer: rA (3 passages -> bucket 4) arrives first but its
    # bucket only dispatches at EOF, while rB/rC fill bucket 2 and complete
    # earlier — output must still come back in input order
    p = ["kinetic energy is the energy of motion.",
         "whales are large ocean mammals.",
         "the blue whale is the largest animal.",
         "energy is conserved in a closed system."]
    reqs2 = [{"id": "rA", "query": "what is energy ?", "passages": p[:3]},
             {"id": "rB", "query": "how big are whales ?", "passages": p[:1]},
             {"id": "rC", "query": "what is kinetic energy ?",
              "passages": p[:2]}]
    req2_path = str(tmp_path / "reqs2.jsonl")
    with open(req2_path, "w") as f:
        for r in reqs2:
            f.write(json.dumps(r) + "\n")
    order_path = str(tmp_path / "resp_order.jsonl")
    serve_main(common + ["--input", req2_path, "--output", order_path,
                         "--batch_size", "2", "--num_passage", "4",
                         "--pool_buckets", "2,4"])
    olines = [json.loads(l) for l in open(order_path)]
    assert [l["id"] for l in olines] == ["rA", "rB", "rC"]
    assert len(olines[0]["ranking"]) == 3
    assert len(olines[1]["ranking"]) == 1
    assert len(olines[2]["ranking"]) == 2

    # --bucket_flush_after: part-filled buckets age out early; per-request
    # results are independent of chunk grouping, so output is identical
    flush_path = str(tmp_path / "resp_flush.jsonl")
    serve_main(common + ["--input", req2_path, "--output", flush_path,
                         "--batch_size", "2", "--num_passage", "4",
                         "--pool_buckets", "2,4",
                         "--bucket_flush_after", "1"])
    assert [json.loads(l) for l in open(flush_path)] == olines

    # --continuous: per-request answers/rankings are independent of batch
    # composition, so continuous batching (5 requests through a 2-slot
    # state, refill bucket 1, 2-step chunks — forces mid-flight refills)
    # must reproduce the plain batch run byte-identically, in input order
    reqs3 = reqs2 + [
        {"id": "rD", "query": "what is motion ?", "passages": p[2:4]},
        {"id": "rE", "query": "is energy conserved ?", "passages": p[3:4]}]
    req3_path = str(tmp_path / "reqs3.jsonl")
    with open(req3_path, "w") as f:
        for r in reqs3:
            f.write(json.dumps(r) + "\n")
    plain3_path = str(tmp_path / "resp_plain3.jsonl")
    serve_main(common + ["--input", req3_path, "--output", plain3_path,
                         "--num_passage", "4"])
    cont_path = str(tmp_path / "resp_cont.jsonl")
    serve_main(common + ["--input", req3_path, "--output", cont_path,
                         "--num_passage", "4", "--continuous",
                         "--batch_size", "2", "--chunk_steps", "2",
                         "--refill", "1"])
    assert [json.loads(l) for l in open(cont_path)] == \
        [json.loads(l) for l in open(plain3_path)]

    # --device_loop: the device-resident loop through the same serving
    # surface — identical responses in input order
    dev_path = str(tmp_path / "resp_dev.jsonl")
    serve_main(common + ["--input", req3_path, "--output", dev_path,
                         "--num_passage", "4", "--continuous",
                         "--batch_size", "2", "--chunk_steps", "2",
                         "--refill", "1", "--device_loop", "2",
                         "--stage_rows", "3"])
    assert [json.loads(l) for l in open(dev_path)] == \
        [json.loads(l) for l in open(plain3_path)]
    # --device_loop x --pool_buckets: one device ring per bucket
    # (VERDICT r3 item 2). Answers/rankings must be byte-identical to the
    # plain bucketed run (asserted further below against resp_bucket3
    # once it exists — see devb_path check after the bucketed runs)

    # per-request max_tokens: plain (host truncation) and continuous
    # (row stops at its cap) agree; capped answer is a prefix
    reqm = [dict(reqs2[0], id="m1", max_tokens=2), dict(reqs2[1], id="m2")]
    reqm_path = str(tmp_path / "reqs_m.jsonl")
    with open(reqm_path, "w") as f:
        for r in reqm:
            f.write(json.dumps(r) + "\n")
    mp, mc = str(tmp_path / "m_plain.jsonl"), str(tmp_path / "m_cont.jsonl")
    serve_main(common + ["--input", reqm_path, "--output", mp,
                         "--num_passage", "4"])
    serve_main(common + ["--input", reqm_path, "--output", mc,
                         "--num_passage", "4", "--continuous",
                         "--batch_size", "2", "--chunk_steps", "2",
                         "--refill", "1"])
    ml = [json.loads(l) for l in open(mp)]
    assert ml == [json.loads(l) for l in open(mc)]
    full = next(l for l in olines if l["id"] == "rA")  # same request uncapped
    assert full["answer"].startswith(ml[0]["answer"])

    # sampled continuous serving: top_k=1 makes the categorical
    # deterministic (all mass on the argmax), so --continuous
    # --decoding sample must equal plain sampled serving byte-for-byte
    sp = str(tmp_path / "s_plain.jsonl")
    sc = str(tmp_path / "s_cont.jsonl")
    serve_main(common + ["--input", req3_path, "--output", sp,
                         "--num_passage", "4", "--decoding", "sample",
                         "--top_k", "1"])
    serve_main(common + ["--input", req3_path, "--output", sc,
                         "--num_passage", "4", "--decoding", "sample",
                         "--top_k", "1", "--continuous",
                         "--batch_size", "2", "--chunk_steps", "2",
                         "--refill", "1"])
    assert [json.loads(l) for l in open(sc)] == \
        [json.loads(l) for l in open(sp)]

    # true sampling (no controls): per-request keys make reruns of the
    # same stream reproducible end-to-end
    s1 = str(tmp_path / "s_run1.jsonl")
    s2 = str(tmp_path / "s_run2.jsonl")
    for p_out in (s1, s2):
        serve_main(common + ["--input", req3_path, "--output", p_out,
                             "--num_passage", "4", "--decoding", "sample",
                             "--continuous", "--batch_size", "2",
                             "--chunk_steps", "2", "--refill", "1"])
    assert [json.loads(l) for l in open(s1)] == \
        [json.loads(l) for l in open(s2)]

    # --continuous x --pool_buckets: one continuous lane per bucket
    # (rA -> lane 4; rB/rC/rD/rE -> lane 2, refilling mid-flight through
    # a 2-slot state); answers/rankings byte-identical to the plain
    # bucketed run, emitted in input order
    # (--warmup on both: precompiling the serving programs up front must
    # not change any output)
    bucket3_path = str(tmp_path / "resp_bucket3.jsonl")
    serve_main(common + ["--input", req3_path, "--output", bucket3_path,
                         "--num_passage", "4", "--pool_buckets", "2,4",
                         "--warmup"])
    contb_path = str(tmp_path / "resp_cont_bucket.jsonl")
    serve_main(common + ["--input", req3_path, "--output", contb_path,
                         "--num_passage", "4", "--pool_buckets", "2,4",
                         "--continuous", "--batch_size", "2",
                         "--chunk_steps", "2", "--refill", "1", "--warmup"])
    assert [json.loads(l) for l in open(contb_path)] == \
        [json.loads(l) for l in open(bucket3_path)]

    # multi-lane + --async_harvest: per-lane pipelined flag fetch (flags
    # ride a copy_to_host_async read one round later) must not change a
    # byte of the emitted stream
    contab_path = str(tmp_path / "resp_cont_bucket_ah.jsonl")
    serve_main(common + ["--input", req3_path, "--output", contab_path,
                         "--num_passage", "4", "--pool_buckets", "2,4",
                         "--continuous", "--batch_size", "2",
                         "--chunk_steps", "2", "--refill", "1",
                         "--async_harvest"])
    assert [json.loads(l) for l in open(contab_path)] == \
        [json.loads(l) for l in open(bucket3_path)]

    # --device_loop x --pool_buckets (+ --lookahead): one device-resident
    # ring per bucket; responses byte-identical to the plain bucketed run,
    # in input order (VERDICT r3 item 2)
    devb_path = str(tmp_path / "resp_dev_bucket.jsonl")
    serve_main(common + ["--input", req3_path, "--output", devb_path,
                         "--num_passage", "4", "--pool_buckets", "2,4",
                         "--continuous", "--batch_size", "2",
                         "--chunk_steps", "2", "--refill", "1",
                         "--device_loop", "2", "--stage_rows", "3",
                         "--lookahead", "--warmup"])
    assert [json.loads(l) for l in open(devb_path)] == \
        [json.loads(l) for l in open(bucket3_path)]


def test_serve_http(workspace, tmp_path):
    """--listen: HTTP micro-batching server — health check, concurrent
    JSONL POSTs coalesced into device batches, clean shutdown."""
    import threading
    import urllib.error
    import urllib.request
    from case_rg_tpu.cli.run import main as run_main
    from case_rg_tpu.cli.serve import main as serve_main
    root = workspace
    out = str(tmp_path / "out_http")
    run_main(_run_args(root, out, "case", "train", ["--epoch", "1"]))

    holder = {}
    ready = threading.Event()

    def on_ready(server):
        holder["server"] = server
        ready.set()

    argv = ["--model", "case",
            "--prepared_dir", os.path.join(root, "toy", "prepared"),
            "--output_path", out, "--batch_size", "4",
            "--embedding_size", "16", "--hidden_size", "16",
            "--num_heads", "2", "--max_target_length", "8",
            "--query_len", "24", "--passage_len", "24", "--num_passage", "4",
            "--pool_buckets", "2,4",
            "--listen", "127.0.0.1:0", "--max_wait_ms", "50"]
    t = threading.Thread(target=serve_main, args=(argv,),
                         kwargs={"_server_ready": on_ready}, daemon=True)
    t.start()
    assert ready.wait(timeout=60), "server did not come up"
    host, port = holder["server"].server_address[:2]
    base = f"http://{host}:{port}"

    with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
        assert r.read() == b"ok\n"

    def post(lines):
        data = "".join(json.dumps(x) + "\n" for x in lines).encode()
        req = urllib.request.Request(base + "/", data=data, method="POST")
        with urllib.request.urlopen(req, timeout=600) as r:
            assert r.status == 200
            return [json.loads(l) for l in r.read().decode().splitlines()]

    ra = {"id": "a1", "query": "what is kinetic energy ?",
          "passages": ["kinetic energy is the energy of motion .",
                       "whales are large ocean mammals ."]}
    rb = {"id": "b1", "query": "how big are whales ?",
          "passages": ["whales are large ocean mammals ."]}
    results = {}

    def worker(name, lines):
        results[name] = post(lines)

    threads = [threading.Thread(target=worker, args=("a", [ra])),
               threading.Thread(target=worker, args=("b", [rb]))]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=600)
    assert [x["id"] for x in results["a"]] == ["a1"]
    assert [x["id"] for x in results["b"]] == ["b1"]
    assert sorted(results["a"][0]["ranking"]) == [0, 1]
    assert results["b"][0]["ranking"] == [0]
    assert all(isinstance(x["answer"], str) for x in results["a"] + results["b"])

    # malformed request -> 400, server stays healthy
    bad = urllib.request.Request(base + "/", data=b"{not json}\n",
                                 method="POST")
    try:
        urllib.request.urlopen(bad, timeout=30)
        assert False, "expected HTTP 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400
    # non-object line -> 400 before it reaches the dispatcher
    bad2 = urllib.request.Request(base + "/", data=b"42\n", method="POST")
    try:
        urllib.request.urlopen(bad2, timeout=30)
        assert False, "expected HTTP 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400
    # structurally-bad but valid-JSON object: error payload, not a wedged
    # dispatcher — and the server still answers real requests afterwards
    errs = post([{"id": "x1", "passages": 42}])
    assert errs[0]["id"] == "x1" and "error" in errs[0]
    again = post([rb])
    assert again[0]["id"] == "b1" and again[0]["ranking"] == [0]
    with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
        assert r.read() == b"ok\n"
    with urllib.request.urlopen(base + "/varz", timeout=30) as r:
        varz = json.loads(r.read().decode())
    assert varz["requests_served"] >= 3
    assert varz["errors"] >= 1
    assert varz["batches"] >= 2
    assert varz["mean_batch_occupancy"] >= 1

    holder["server"].shutdown()
    t.join(timeout=60)
    assert not t.is_alive()


def test_serve_continuous_protocol_model(workspace, tmp_path):
    """--continuous with an EncDec-protocol model (s2sa: GRU state, no
    rank head) — output identical to plain batch serving."""
    from case_rg_tpu.cli.run import main as run_main
    from case_rg_tpu.cli.serve import main as serve_main
    root = workspace
    out = str(tmp_path / "out_cont_s2sa")
    run_main(_run_args(root, out, "s2sa", "train", ["--epoch", "1"]))

    reqs = [{"id": f"r{i}", "query": f"what is energy {i} ?",
             "passages": ["kinetic energy is the energy of motion .",
                          "whales are large ocean mammals ."]}
            for i in range(5)]
    rp = str(tmp_path / "s2sa_reqs.jsonl")
    with open(rp, "w") as f:
        for r in reqs:
            f.write(json.dumps(r) + "\n")
    common = ["--model", "s2sa",
              "--prepared_dir", os.path.join(root, "toy", "prepared"),
              "--output_path", out, "--embedding_size", "16",
              "--hidden_size", "16", "--num_heads", "2",
              "--max_target_length", "8", "--query_len", "24",
              "--passage_len", "24", "--num_passage", "4", "--input", rp]
    p1 = str(tmp_path / "s2sa_plain.jsonl")
    p2 = str(tmp_path / "s2sa_cont.jsonl")
    serve_main(common + ["--output", p1, "--batch_size", "4"])
    serve_main(common + ["--output", p2, "--batch_size", "2",
                         "--continuous", "--chunk_steps", "3",
                         "--refill", "1"])
    a = [json.loads(l) for l in open(p1)]
    b = [json.loads(l) for l in open(p2)]
    assert a == b
    assert all("ranking" not in r and r["answer"] is not None for r in b)


def test_serve_http_continuous(workspace, tmp_path):
    """--listen --continuous: the continuous worker owns the device; each
    HTTP waiter is released the moment its row finishes, and responses
    match the plain offline serve byte-for-byte per request."""
    import threading
    import urllib.error
    import urllib.request
    from case_rg_tpu.cli.run import main as run_main
    from case_rg_tpu.cli.serve import main as serve_main
    root = workspace
    out = str(tmp_path / "out_http_cont")
    run_main(_run_args(root, out, "case", "train", ["--epoch", "1"]))

    ra = {"id": "a1", "query": "what is kinetic energy ?",
          "passages": ["kinetic energy is the energy of motion .",
                       "whales are large ocean mammals ."]}
    rb = {"id": "b1", "query": "how big are whales ?",
          "passages": ["whales are large ocean mammals ."]}

    # offline plain-batch reference responses
    req_path = str(tmp_path / "chttp_reqs.jsonl")
    ref_path = str(tmp_path / "chttp_ref.jsonl")
    with open(req_path, "w") as f:
        for r in (ra, rb):
            f.write(json.dumps(r) + "\n")
    common = ["--model", "case",
              "--prepared_dir", os.path.join(root, "toy", "prepared"),
              "--output_path", out, "--batch_size", "4",
              "--embedding_size", "16", "--hidden_size", "16",
              "--num_heads", "2", "--max_target_length", "8",
              "--query_len", "24", "--passage_len", "24",
              "--num_passage", "4"]
    serve_main(common + ["--input", req_path, "--output", ref_path])
    ref = {r["id"]: r for r in map(json.loads, open(ref_path))}

    holder = {}
    ready = threading.Event()

    def on_ready(server):
        holder["server"] = server
        ready.set()

    argv = common + ["--continuous", "--chunk_steps", "2", "--refill", "2",
                     "--listen", "127.0.0.1:0"]
    t = threading.Thread(target=serve_main, args=(argv,),
                         kwargs={"_server_ready": on_ready}, daemon=True)
    t.start()
    assert ready.wait(timeout=60), "server did not come up"
    host, port = holder["server"].server_address[:2]
    base = f"http://{host}:{port}"

    def post(lines):
        data = "".join(json.dumps(x) + "\n" for x in lines).encode()
        req = urllib.request.Request(base + "/", data=data, method="POST")
        with urllib.request.urlopen(req, timeout=600) as r:
            assert r.status == 200
            return [json.loads(l) for l in r.read().decode().splitlines()]

    results = {}
    threads = [threading.Thread(target=lambda: results.update(a=post([ra]))),
               threading.Thread(target=lambda: results.update(b=post([rb])))]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=600)
    assert results["a"][0] == ref["a1"]
    assert results["b"][0] == ref["b1"]

    # bad request inside a refill chunk fails cleanly; server keeps serving
    errs = post([{"id": "x1", "passages": 42}])
    assert errs[0]["id"] == "x1" and "error" in errs[0]
    again = post([rb])
    assert again[0] == ref["b1"]
    with urllib.request.urlopen(base + "/varz", timeout=30) as r:
        varz = json.loads(r.read().decode())
    assert varz["continuous"] is True
    assert varz["requests_served"] >= 3
    assert varz["errors"] >= 1

    # token streaming: "stream": true returns JSONL delta lines while the
    # row decodes, then the authoritative final line — identical payload
    # to the non-streaming response for the same request
    sreq = dict(ra, id="s1", stream=True)
    sdata = (json.dumps(sreq) + "\n").encode()
    with urllib.request.urlopen(
            urllib.request.Request(base + "/", data=sdata, method="POST"),
            timeout=600) as r:
        assert r.status == 200
        slines = [json.loads(l) for l in r.read().decode().splitlines()]
    assert slines[-1].get("done") is True
    final = {k: v for k, v in slines[-1].items() if k != "done"}
    assert final == dict(ref["a1"], id="s1")
    deltas = [l for l in slines[:-1] if "delta" in l]
    if final["answer"] != "[UNK]":   # non-empty answer -> at least 1 delta
        assert deltas, f"no streamed deltas before the final line: {slines}"
    assert all(isinstance(d["delta"], str) and d["delta"] for d in deltas)
    # streaming on a non-continuous server / multi-request POST is a 400
    try:
        urllib.request.urlopen(urllib.request.Request(
            base + "/", data=sdata + sdata, method="POST"), timeout=60)
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400
    holder["server"].shutdown()

    # --continuous x --pool_buckets over HTTP: multi-lane worker; compare
    # against the plain offline BUCKETED run (bucketed pools score the
    # exact pool — no dummy pad rows — so the padded-pool ref above does
    # not apply)
    rc = {"id": "c1", "query": "what is energy ?",
          "passages": ["kinetic energy is the energy of motion .",
                       "whales are large ocean mammals .",
                       "the blue whale is the largest animal ."]}
    req3_path = str(tmp_path / "chttp_reqs3.jsonl")
    ref3_path = str(tmp_path / "chttp_ref3.jsonl")
    with open(req3_path, "w") as f:
        for r in (ra, rb, rc):
            f.write(json.dumps(r) + "\n")
    serve_main(common + ["--input", req3_path, "--output", ref3_path,
                         "--pool_buckets", "2,4"])
    ref3 = {r["id"]: r for r in map(json.loads, open(ref3_path))}

    ready2 = threading.Event()
    holder2 = {}

    def on_ready2(server):
        holder2["server"] = server
        ready2.set()

    argv2 = common + ["--continuous", "--chunk_steps", "2", "--refill", "1",
                      "--batch_size", "2", "--pool_buckets", "2,4",
                      "--listen", "127.0.0.1:0"]
    t2 = threading.Thread(target=serve_main, args=(argv2,),
                          kwargs={"_server_ready": on_ready2}, daemon=True)
    t2.start()
    assert ready2.wait(timeout=60), "bucketed server did not come up"
    host2, port2 = holder2["server"].server_address[:2]
    base = f"http://{host2}:{port2}"
    results2 = {}
    threads = [threading.Thread(
        target=lambda r=r, k=k: results2.update({k: post([r])}))
        for k, r in (("a", ra), ("b", rb), ("c", rc))]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=600)
    for k, rid in (("a", "a1"), ("b", "b1"), ("c", "c1")):
        assert results2[k][0] == ref3[rid], f"lane result differs for {rid}"
    with urllib.request.urlopen(base + "/varz", timeout=30) as r:
        varz2 = json.loads(r.read().decode())
    assert set(varz2["lanes"]) == {"2", "4"}   # per-lane occupancy stats
    assert all(v["occupied"] == 0 and v["queued"] == 0
               for v in varz2["lanes"].values())
    holder2["server"].shutdown()

    # --device_loop x --pool_buckets over HTTP (VERDICT r3 item 2): the
    # device-resident multi-lane worker serves the same requests with
    # byte-identical payloads; a streaming request gets per-mega deltas
    # (the harvest's live-row snapshot) plus the authoritative final line
    ready3 = threading.Event()
    holder3 = {}

    def on_ready3(server):
        holder3["server"] = server
        ready3.set()

    argv3 = common + ["--continuous", "--chunk_steps", "2", "--refill", "1",
                      "--batch_size", "2", "--pool_buckets", "2,4",
                      "--device_loop", "2", "--stage_rows", "3",
                      "--listen", "127.0.0.1:0"]
    t3 = threading.Thread(target=serve_main, args=(argv3,),
                          kwargs={"_server_ready": on_ready3}, daemon=True)
    t3.start()
    assert ready3.wait(timeout=120), "device-loop server did not come up"
    host3, port3 = holder3["server"].server_address[:2]
    base = f"http://{host3}:{port3}"
    results3 = {}
    threads = [threading.Thread(
        target=lambda r=r, k=k: results3.update({k: post([r])}))
        for k, r in (("a", ra), ("b", rb), ("c", rc))]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=600)
    for k, rid in (("a", "a1"), ("b", "b1"), ("c", "c1")):
        assert results3[k][0] == ref3[rid], \
            f"device-lane result differs for {rid}"
    with urllib.request.urlopen(base + "/varz", timeout=30) as r:
        varz3 = json.loads(r.read().decode())
    assert set(varz3["lanes"]) == {"2", "4"}
    # streaming through the device loop: final line authoritative; any
    # deltas are string fragments (per-mega granularity can legitimately
    # deliver the whole answer in the final line on tiny decodes)
    sreq3 = dict(rc, id="s3", stream=True)
    sdata3 = (json.dumps(sreq3) + "\n").encode()
    with urllib.request.urlopen(
            urllib.request.Request(base + "/", data=sdata3, method="POST"),
            timeout=600) as r:
        assert r.status == 200
        slines3 = [json.loads(l) for l in r.read().decode().splitlines()]
    assert slines3[-1].get("done") is True
    final3 = {k: v for k, v in slines3[-1].items() if k != "done"}
    assert final3 == dict(ref3["c1"], id="s3")
    assert all(isinstance(d["delta"], str) and d["delta"]
               for d in slines3[:-1] if "delta" in d)
    holder3["server"].shutdown()


def test_orbax_sampling_fastrng_pipeline(workspace, tmp_path):
    """New CLI surfaces: --ckpt_backend orbax (train + auto-detect at test),
    --decoding sample, --fast_rng (hardware RNG for dropout)."""
    import jax
    from case_rg_tpu.cli.run import main as run_main
    root = workspace
    out = str(tmp_path / "out_orbax")
    try:
        run_main(_run_args(root, out, "s2sa", "train",
                           ["--epoch", "1", "--ckpt_backend", "orbax",
                            "--fast_rng"]))
    finally:
        jax.config.update("jax_default_prng_impl", "threefry2x32")
    assert os.path.isdir(os.path.join(out, "model", "0.orbax"))
    # resume from the orbax checkpoint, then sample-decode from it
    run_main(_run_args(root, out, "s2sa", "train",
                       ["--epoch", "2", "--ckpt_backend", "orbax"]))
    run_main(_run_args(root, out, "s2sa", "test",
                       ["--decoding", "sample"]))
    files = os.listdir(os.path.join(out, "result"))
    assert any(f.endswith(".answer") for f in files)
    # sampling controls (temperature / top-k / nucleus) through the CLI
    run_main(_run_args(root, out, "s2sa", "test",
                       ["--decoding", "sample", "--temperature", "0.7",
                        "--top_k", "5", "--top_p", "0.9"]))


def test_train_resume(workspace, tmp_path):
    from case_rg_tpu.cli.run import main as run_main
    root = workspace
    out = str(tmp_path / "out_resume")
    run_main(_run_args(root, out, "s2sa", "train", ["--epoch", "1"]))
    assert os.path.exists(os.path.join(out, "model", "0.ckpt"))
    # second invocation with 2 epochs resumes from epoch 1
    run_main(_run_args(root, out, "s2sa", "train", ["--epoch", "2"]))
    assert os.path.exists(os.path.join(out, "model", "1.ckpt"))


def test_serve_multi(workspace, tmp_path):
    """Multi-model router (cli/serve_multi.py): two single-model backends
    in one process; requests route by their "model" field, responses merge
    in input order and match single-model serving; streaming passes
    through; /varz aggregates per backend."""
    import threading
    import urllib.request
    from case_rg_tpu.cli.run import main as run_main
    from case_rg_tpu.cli.serve_multi import main as multi_main
    root = workspace
    out_case = str(tmp_path / "mm_case")
    out_s2sa = str(tmp_path / "mm_s2sa")
    run_main(_run_args(root, out_case, "case", "train", ["--epoch", "1"]))
    run_main(_run_args(root, out_s2sa, "s2sa", "train", ["--epoch", "1"]))

    dims = ["--embedding_size", "16", "--hidden_size", "16",
            "--num_heads", "2", "--max_target_length", "8",
            "--query_len", "24", "--passage_len", "24",
            "--num_passage", "4", "--continuous", "--batch_size", "2",
            "--chunk_steps", "2", "--refill", "1"]
    holder, ready = {}, threading.Event()

    def on_ready(server):
        holder["server"] = server
        ready.set()

    argv = ["--listen", "127.0.0.1:0",
            "--prepared_dir", os.path.join(root, "toy", "prepared"),
            "--backend", f"case={out_case}",
            "--backend", f"s2sa={out_s2sa}", "--"] + dims
    t = threading.Thread(target=multi_main, args=(argv,),
                         kwargs={"_server_ready": on_ready}, daemon=True)
    t.start()
    assert ready.wait(timeout=300), "router did not come up"
    base = "http://%s:%d" % holder["server"].server_address[:2]

    ra = {"id": "rA", "query": "what is kinetic energy ?",
          "passages": ["kinetic energy is the energy of motion .",
                       "whales are large ocean mammals ."]}
    rb = dict(ra, id="rB", model="s2sa")
    data = "".join(json.dumps(r) + "\n" for r in (ra, rb)).encode()
    req = urllib.request.Request(base + "/", data=data, method="POST")
    with urllib.request.urlopen(req, timeout=600) as r:
        lines = [json.loads(l) for l in r.read().decode().splitlines()]
    assert [l["id"] for l in lines] == ["rA", "rB"]
    assert "ranking" in lines[0]          # case has a rank head
    assert "ranking" not in lines[1]      # s2sa has none
    assert all(l["answer"] for l in lines)

    # streaming passes through the router chunk-by-chunk
    sreq = dict(ra, id="sA", stream=True)
    sdata = (json.dumps(sreq) + "\n").encode()
    with urllib.request.urlopen(
            urllib.request.Request(base + "/", data=sdata, method="POST"),
            timeout=600) as r:
        slines = [json.loads(l) for l in r.read().decode().splitlines()]
    assert slines[-1].get("done") is True
    assert slines[-1]["answer"] == lines[0]["answer"]

    with urllib.request.urlopen(base + "/varz", timeout=60) as r:
        varz = json.loads(r.read().decode())
    assert set(varz) == {"case", "s2sa"}
    assert varz["case"]["continuous"] is True
    with urllib.request.urlopen(base + "/healthz", timeout=60) as r:
        assert r.status == 200
    holder["server"].shutdown()
