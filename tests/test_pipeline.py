"""High-level Python API (case_rg_tpu.pipeline.Pipeline): in-process
inference equal to the serving CLI, from a checkpoint or a StableHLO
export artifact."""

import json
import os

import pytest
from fixtures import make_dataset

DIMS = dict(embedding_size=16, hidden_size=16, num_heads=2,
            max_target_length=8, query_len=24, passage_len=24,
            num_passage=4)


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("pipe"))
    make_dataset(root, "toy", n_queries=12, n_passages=20)
    from case_rg_tpu.cli.prepare import main as prepare_main
    from case_rg_tpu.cli.run import main as run_main
    prepare_main(["--data_path", root, "--dataset", "toy",
                  "--query_len", "24", "--passage_len", "24",
                  "--num_passage", "4", "--answer_len", "10"])
    out = os.path.join(root, "out_case")
    run_main(["--model", "case", "--mode", "train", "--data_path", root,
              "--dataset", "toy", "--output_path", out,
              "--embedding_size", "16", "--hidden_size", "16",
              "--num_heads", "2", "--batch_size", "4", "--epoch", "1",
              "--max_target_length", "8", "--warmup_steps", "4",
              "--learning_rate", "1e-3"])
    return root, out


REQS = [
    {"id": "a", "query": "what is kinetic energy ?",
     "passages": ["kinetic energy is the energy of motion .",
                  "whales are large ocean mammals ."]},
    {"id": "b", "query": "where do whales live ?",
     "history": ["tell me about whales ."],
     "passages": ["whales are large ocean mammals .",
                  "kinetic energy is the energy of motion .",
                  "the capital of france is paris ."]},
    {"id": "c", "query": "what is the capital of france ?",
     "passages": ["the capital of france is paris ."], "max_tokens": 3},
]


def test_pipeline_matches_serving(trained, tmp_path):
    """Pipeline.from_checkpoint answers/rankings == cli/serve.py on the
    same requests; chunking (len(requests) > batch_size) preserves
    order; __call__ sugar == batch of one; max_tokens caps the answer."""
    root, out = trained
    prep = os.path.join(root, "toy", "prepared")
    from case_rg_tpu.cli.serve import main as serve_main
    from case_rg_tpu.pipeline import Pipeline

    p = Pipeline.from_checkpoint("case", output_path=out,
                                 prepared_dir=prep, batch_size=2, **DIMS)
    assert p.model == "case" and p.batch_size == 2
    assert p.provenance["source"] == "checkpoint"
    got = p.batch(REQS)   # 3 requests -> two chunks of batch_size 2
    assert len(got) == 3
    for g, r in zip(got, REQS):
        assert g["answer"], r
        assert len(g["ranking"]) == len(r["passages"])

    # serving CLI agreement (same batch width so pad rows match)
    rin = str(tmp_path / "reqs.jsonl")
    with open(rin, "w") as f:
        f.writelines(json.dumps(r) + "\n" for r in REQS)
    rout = str(tmp_path / "resp.jsonl")
    serve_main(["--model", "case", "--prepared_dir", prep,
                "--output_path", out, "--batch_size", "2",
                "--input", rin, "--output", rout]
               + sum((["--" + k, str(v)] for k, v in DIMS.items()), []))
    served = [json.loads(l) for l in open(rout)]
    for g, s in zip(got, served):
        assert g["answer"] == s["answer"]
        assert g["ranking"] == s["ranking"]

    one = p(REQS[0]["query"], REQS[0]["passages"])
    assert one == got[0]

    # max_tokens: request c capped at 3 tokens
    assert len(got[2]["answer"].split()) <= 3


def test_pipeline_from_export(trained, tmp_path):
    """Pipeline.from_export serves the artifact (config from the sidecar,
    no checkpoint) and matches the checkpoint pipeline's fixed-cost
    decode."""
    root, out = trained
    prep = os.path.join(root, "toy", "prepared")
    from case_rg_tpu.cli.export_model import main as export_main
    from case_rg_tpu.pipeline import Pipeline

    art = str(tmp_path / "case.shlo")
    export_main(["--model", "case", "--prepared_dir", prep,
                 "--output_path", out, "--batch_size", "2",
                 "--out", art]
                + sum((["--" + k, str(v)] for k, v in DIMS.items()), []))
    pe = Pipeline.from_export(art, prepared_dir=prep)
    assert pe.model == "case" and pe.batch_size == 2
    assert pe.provenance["source"] == "export"

    pc = Pipeline.from_checkpoint("case", output_path=out,
                                  prepared_dir=prep, batch_size=2,
                                  early_exit=False, **DIMS)
    assert pe.batch(REQS) == pc.batch(REQS)

    # package-level lazy export
    import case_rg_tpu
    assert case_rg_tpu.Pipeline is Pipeline
