"""CLI parity surface (ui/WayebCLI.scala:56-345): compile -> mle ->
recognition -> learnSPST -> forecasting over a file stream, driven
through the argparse entry point exactly as a shell user would."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from flink_rtcef_spark.cli import main
from flink_rtcef_spark.operators.cep import BatchCEP

SEQ_AB = ";(IsEventTypePredicate(A),IsEventTypePredicate(B)){partitionBy:k}"
DECLS_AB = "~(IsEventTypePredicate(A),IsEventTypePredicate(B))"


@pytest.fixture(scope="module")
def stream_path(spark, tmp_path_factory):
    rng = np.random.default_rng(7)
    rows = []
    i = 0
    for k in ("u1", "u2", "u3"):
        for t in range(400):
            rows.append((k, t + 1, i, rng.choice(["A", "B", "C"]).item()))
            i += 1
    pdf = pd.DataFrame(rows, columns=["k", "timestamp", "id", "event_type"])
    path = str(tmp_path_factory.mktemp("cli") / "stream.parquet")
    spark.createDataFrame(pdf).write.parquet(path)
    return path


@pytest.fixture(scope="module")
def artifacts(tmp_path_factory, stream_path):
    d = tmp_path_factory.mktemp("cli_artifacts")
    patterns = d / "pattern.sre"
    patterns.write_text(SEQ_AB)
    decls = d / "declarations.sre"
    decls.write_text(DECLS_AB)
    fsm = str(d / "fsm.pkl")
    main([
        "compile", "--patterns", str(patterns), "--declarations", str(decls),
        "--outputFsm", fsm,
    ])
    return {"dir": d, "patterns": patterns, "decls": decls, "fsm": fsm}


def test_compile_artifact(artifacts):
    import pickle

    with open(artifacts["fsm"], "rb") as fh:
        compiled = pickle.load(fh)
    assert isinstance(compiled, list) and len(compiled) == 1
    assert compiled[0].partition_by == "k"
    assert compiled[0].sdfa.n_states >= 2


def test_mle_row_stochastic(artifacts, stream_path):
    import pickle

    out = str(artifacts["dir"] / "mc.pkl")
    main(["mle", "--fsm", artifacts["fsm"], "--stream", stream_path,
          "--outputMc", out])
    with open(out, "rb") as fh:
        mc = pickle.load(fh)
    sums = mc.matrix.sum(axis=1)
    visited = mc.counts.sum(axis=1) > 0
    assert visited.any()
    np.testing.assert_allclose(sums[visited], 1.0, atol=1e-12)
    # 3 keys x 400 events, every event is one observed transition
    assert int(mc.counts.sum()) == 1200


def test_recognition_matches_operator(artifacts, stream_path, spark):
    import pickle

    stats = str(artifacts["dir"] / "rec_stats.csv")
    matches = str(artifacts["dir"] / "matches.parquet")
    main(["recognition", "--fsm", artifacts["fsm"], "--stream", stream_path,
          "--statsFile", stats, "--outputMatches", matches])
    with open(artifacts["fsm"], "rb") as fh:
        compiled = pickle.load(fh)[0]
    df = spark.read.parquet(stream_path)
    direct = BatchCEP(compiled, ts_col="timestamp", id_col="id").detections(df)
    cli_out = spark.read.parquet(matches)
    assert sorted(r["detection_event_id"] for r in cli_out.collect()) == sorted(
        r["detection_event_id"] for r in direct.collect()
    )
    header, row = open(stats).read().strip().split("\n")
    assert header.split(",")[:2] == ["n_events", "n_matches"]
    assert int(row.split(",")[0]) == 1200


def test_forecasting_vmm_and_fmm(artifacts, stream_path):
    d = artifacts["dir"]
    spst = str(d / "model.spst.pkl")
    main(["learnSPST", "--patterns", str(artifacts["patterns"]),
          "--declarations", str(artifacts["decls"]),
          "--stream", stream_path, "--order", "2", "--outputSpst", spst])
    vmm_stats = str(d / "fore_vmm.csv")
    main(["forecasting", "--fsm", spst, "--modelType", "vmm",
          "--stream", stream_path, "--statsFile", vmm_stats,
          "--threshold", "0.3", "--horizon", "20",
          "--foreMethod", "classify-nextk"])
    mc = str(d / "mc2.pkl")
    main(["mle", "--fsm", artifacts["fsm"], "--stream", stream_path,
          "--outputMc", mc])
    fmm_stats = str(d / "fore_fmm.csv")
    main(["forecasting", "--fsm", artifacts["fsm"], "--mc", mc,
          "--modelType", "fmm", "--stream", stream_path,
          "--statsFile", fmm_stats, "--threshold", "0.3", "--horizon", "20",
          "--foreMethod", "classify-nextk"])
    for stats in (vmm_stats, fmm_stats):
        lines = open(stats).read().strip().split("\n")
        assert lines[0] == "window_start,tp,tn,fp,fn,batch_mcc,runtime_mcc"
        assert len(lines) >= 2


def test_fmm_wt_matches_ground_truth():
    """Phase-type recursion sanity: on a 2-state chain with
    P(stay)=0.7 / P(to final)=0.3 the waiting time from state 0 is
    geometric(0.3)."""
    from flink_rtcef_spark.models.mc import FMM, MarkovChain
    from flink_rtcef_spark.plans.compiler import compile_pattern

    compiled = compile_pattern(
        ";(IsEventTypePredicate(A),IsEventTypePredicate(B)){partitionBy:k}",
        DECLS_AB,
    )
    n = compiled.sdfa.n_states
    final = next(iter(compiled.sdfa.finals))
    matrix = np.zeros((n, n))
    matrix[0, 0] = 0.7
    matrix[0, final] = 0.3
    matrix[final, 0] = 1.0
    fmm = FMM(compiled=compiled, mc=MarkovChain(counts=np.zeros((n, n), dtype=np.int64), matrix=matrix))
    fmm.compute_wt_dists(horizon=6)
    wt = fmm.wt[0]
    for t in range(1, 7):
        assert wt.wt[t] == pytest.approx(0.7 ** (t - 1) * 0.3)


def test_module_entrypoint_compile(tmp_path):
    """python -m flink_rtcef_spark works from the repo root (no Spark
    session needed for compile)."""
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    pat = tmp_path / "p.sre"
    pat.write_text(SEQ_AB)
    out = tmp_path / "fsm.pkl"
    res = subprocess.run(
        [sys.executable, "-m", "flink_rtcef_spark", "compile",
         "--patterns", str(pat), "--outputFsm", str(out)],
        cwd=repo, capture_output=True, text=True, timeout=120,
    )
    assert res.returncode == 0, res.stderr
    assert out.exists() and "# pattern 0" in res.stdout
