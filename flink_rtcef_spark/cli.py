"""Command-line parity surface for the reference's WayebCLI.

Subcommands and flag names mirror ui/WayebCLI.scala:56-345:

- ``compile``      patterns file -> pickled compiled FSM(s)
- ``mle``          FSM + training stream -> pickled Markov chain
- ``learnSPST``    patterns + training stream -> pickled SPST
- ``recognition``  FSM + stream -> detections + stats file
- ``forecasting``  FSM (+ MC for fmm) + stream -> forecasts + stats

Dispatch parity: BeepBeep.runCompile2FSM / runMatrixEstimation /
runRecognition / runForecasting / runLearnSPST (WayebCLI.scala:336-345).

Stream inputs are file-based: ``.parquet``, ``.csv`` (header row),
``.jsonl``/``.json``, or ``--domainSpecificStream maritime`` for the
reference's AIS CSV layout (timestamp,mmsi,lon,lat,speed,cog,trh,
critical_bitstring).  ``--streamArgs "key=mmsi,ts=timestamp,id=id"``
maps the key/event-time/id columns (comma-separated, like the
reference's streamArgs).  Model artifacts are pickle files.

Run as ``python -m flink_rtcef_spark <cmd> ...``.
"""

from __future__ import annotations

import argparse
import pickle
import sys
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

OVERLAP, NONOVERLAP = "OVERLAP", "NONOVERLAP"


# ------------------------------------------------------------------ helpers
def _get_spark(app: str) -> SparkSession:
    from flink_rtcef_spark.session import get_spark

    return get_spark(app)


def _parse_stream_args(text: str | None) -> dict[str, str]:
    out: dict[str, str] = {}
    for part in (text or "").split(","):
        part = part.strip()
        if part:
            k, _, v = part.partition("=")
            out[k.strip()] = v.strip()
    return out


def _load_stream(spark: SparkSession, args) -> DataFrame:
    domain = getattr(args, "domainSpecificStream", None) or ""
    path = args.stream
    if domain == "maritime":
        from flink_rtcef_spark.sources.io import read_maritime_csv

        return read_maritime_csv(spark, path)
    suffix = Path(path).suffix.lower()
    if suffix == ".parquet" or Path(path).is_dir():
        return spark.read.parquet(path)
    if suffix in (".jsonl", ".json"):
        return spark.read.json(path)
    if suffix == ".csv":
        return spark.read.csv(path, header=True, inferSchema=True)
    raise SystemExit(f"unsupported stream format: {path}")


def _stream_cols(df: DataFrame, compiled, sargs: dict[str, str]):
    """(df, key, ts, id) with an id column guaranteed to exist."""
    key = sargs.get("key") or getattr(compiled, "partition_by", None)
    if not key:
        raise SystemExit("no partition key: pattern has no {partitionBy} and "
                         "--streamArgs gave no key=")
    ts = sargs.get("ts", "timestamp")
    id_col = sargs.get("id", "id")
    if id_col not in df.columns:
        df = df.withColumn(id_col, F.monotonically_increasing_id())
    return df, key, ts, id_col


def _read_pickle(path: str):
    with open(path, "rb") as fh:
        return pickle.load(fh)


def _write_pickle(obj, path: str) -> None:
    with open(path, "wb") as fh:
        pickle.dump(obj, fh)


def _first_compiled(fsm_obj):
    """compile writes a list (multi-pattern files); single-FSM tasks
    take the first, like the reference's one-FSM-per-run engines."""
    return fsm_obj[0] if isinstance(fsm_obj, list) else fsm_obj


def _write_stats(path: str, rows: list[dict]) -> None:
    cols = list(rows[0].keys())
    with open(path, "w") as fh:
        fh.write(",".join(cols) + "\n")
        for r in rows:
            fh.write(",".join(str(r[c]) for c in cols) + "\n")


# ------------------------------------------------------------------ commands
def cmd_compile(args) -> None:
    from flink_rtcef_spark.plans.compiler import compile_patterns

    patterns_text = Path(args.patterns).read_text()
    decls_text = Path(args.declarations).read_text() if args.declarations else None
    compiled = compile_patterns(patterns_text, decls_text, policy=args.countPolicy)
    _write_pickle(compiled, args.outputFsm)
    for i, cp in enumerate(compiled):
        print(
            f"# pattern {i}: {len(cp.atoms)} atoms, {len(cp.minterms)} minterms, "
            f"{cp.sdfa.n_states} states, order {cp.order}, policy {cp.policy}"
        )
    print(f"# wrote {args.outputFsm}")


def cmd_mle(args) -> None:
    from flink_rtcef_spark.models.mc import estimate_mc
    from flink_rtcef_spark.operators.cep import BatchCEP

    spark = _get_spark("wayeb_mle")
    compiled = _first_compiled(_read_pickle(args.fsm))
    sargs = _parse_stream_args(args.streamArgs)
    df, key, ts, id_col = _stream_cols(_load_stream(spark, args), compiled, sargs)
    cep = BatchCEP(compiled, key_col=key, ts_col=ts, id_col=id_col)
    mc = estimate_mc(cep.symbolized(df), compiled)
    _write_pickle(mc, args.outputMc)
    print(
        f"# mc: {mc.n_states} states, {int(mc.counts.sum())} transitions observed"
    )
    print(f"# wrote {args.outputMc}")


def cmd_learn_spst(args) -> None:
    from flink_rtcef_spark.models.spst import train_spst
    from flink_rtcef_spark.operators.cep import BatchCEP
    from flink_rtcef_spark.plans.compiler import compile_pattern

    spark = _get_spark("wayeb_learn_spst")
    patterns_text = Path(args.patterns).read_text()
    decls_text = Path(args.declarations).read_text() if args.declarations else None
    compiled = compile_pattern(patterns_text, decls_text)
    sargs = _parse_stream_args(args.streamArgs)
    df, key, ts, id_col = _stream_cols(_load_stream(spark, args), compiled, sargs)
    cep = BatchCEP(compiled, key_col=key, ts_col=ts, id_col=id_col)
    spst = train_spst(
        cep.symbolized(df),
        compiled,
        max_order=args.order,
        pmin=args.pMin,
        alpha=args.alpha,
        gamma_min=args.gammaMin,
        r=args.r,
    )
    _write_pickle(spst, args.outputSpst)
    print(
        f"# spst: {spst.n_virtual} virtual states, "
        f"{len(spst.pst.nodes())} PST nodes, order {args.order}"
    )
    print(f"# wrote {args.outputSpst}")


def cmd_recognition(args) -> None:
    from flink_rtcef_spark.operators.cep import BatchCEP

    spark = _get_spark("wayeb_recognition")
    compiled = _first_compiled(_read_pickle(args.fsm))
    sargs = _parse_stream_args(args.streamArgs)
    df, key, ts, id_col = _stream_cols(_load_stream(spark, args), compiled, sargs)
    # count events OUTSIDE the timed region: the timed wall_sec must
    # reflect recognition alone, not an extra full scan
    n_events = df.count()
    t0 = time.time()
    cep = BatchCEP(compiled, key_col=key, ts_col=ts, id_col=id_col)
    detections = cep.detections(df)
    if args.outputMatches:
        detections.write.mode("overwrite").parquet(args.outputMatches)
        detections = spark.read.parquet(args.outputMatches)
    n_matches = detections.count()
    wall = time.time() - t0
    _write_stats(
        args.statsFile,
        [{
            "n_events": n_events,
            "n_matches": n_matches,
            "wall_sec": round(wall, 3),
            "events_per_sec": round(n_events / wall, 1) if wall > 0 else -1,
        }],
    )
    print(f"# {n_matches} matches over {n_events} events in {wall:.1f}s")
    print(f"# wrote {args.statsFile}")


def cmd_forecasting(args) -> None:
    from flink_rtcef_spark.operators.forecast import (
        ForecastCEP,
        evaluate_forecasts_windowed,
    )

    spark = _get_spark("wayeb_forecasting")
    method = args.foreMethod.lower().replace("-", "_")
    if args.modelType == "vmm":
        model = _read_pickle(args.fsm)  # an SPST pickle (learnSPST output)
        compiled = model.compiled
    else:  # fmm: compiled FSM + MC estimated by `mle`
        from flink_rtcef_spark.models.mc import FMM

        compiled = _first_compiled(_read_pickle(args.fsm))
        if not args.mc:
            raise SystemExit("--modelType fmm requires --mc (output of `mle`)")
        model = FMM(compiled=compiled, mc=_read_pickle(args.mc))
    model.compute_wt_dists(args.horizon)
    sargs = _parse_stream_args(args.streamArgs)
    df, key, ts, id_col = _stream_cols(_load_stream(spark, args), compiled, sargs)
    t0 = time.time()
    fcep = ForecastCEP(
        model,
        key_col=key,
        ts_col=ts,
        id_col=id_col,
        method=method,
        confidence_threshold=args.threshold,
        spread=args.maxSpread,
    )
    results = fcep.forecasts(df).cache()
    n_detections = results.filter("is_detection").count()
    n_forecasts = results.filter("NOT is_detection AND prob >= 0").count()
    trajectory = evaluate_forecasts_windowed(results).collect()
    wall = time.time() - t0
    if args.outputForecasts:
        results.write.mode("overwrite").parquet(args.outputForecasts)
    rows = [
        {
            "window_start": r["window_start"],
            "tp": r["tp"], "tn": r["tn"], "fp": r["fp"], "fn": r["fn"],
            "batch_mcc": r["batch_mcc"], "runtime_mcc": r["runtime_mcc"],
        }
        for r in trajectory
    ]
    _write_stats(args.statsFile, rows or [{"window_start": -1, "tp": 0, "tn": 0,
                                           "fp": 0, "fn": 0, "batch_mcc": 0.0,
                                           "runtime_mcc": 0.0}])
    final = rows[-1]["runtime_mcc"] if rows else float("nan")
    print(
        f"# {n_forecasts} forecasts, {n_detections} detections, "
        f"final runtime MCC {final} in {wall:.1f}s"
    )
    print(f"# wrote {args.statsFile}")


# ------------------------------------------------------------------ parser
def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="flink_rtcef_spark",
        description="Wayeb-compatible CEP/forecasting CLI on Spark",
    )
    sub = p.add_subparsers(dest="task", required=True)

    def add_stream_opts(sp):
        sp.add_argument("--stream", required=True)
        sp.add_argument("--domainSpecificStream", default="")
        sp.add_argument("--streamArgs", default="")

    c = sub.add_parser("compile", help="compile + disambiguate FSM")
    c.add_argument("--patterns", required=True)
    c.add_argument("--declarations", default="")
    c.add_argument("--countPolicy", default=OVERLAP, choices=[OVERLAP, NONOVERLAP])
    c.add_argument("--outputFsm", required=True)
    c.set_defaults(fn=cmd_compile)

    m = sub.add_parser("mle", help="estimate PMC transition matrix")
    m.add_argument("--fsm", required=True)
    m.add_argument("--outputMc", required=True)
    add_stream_opts(m)
    m.set_defaults(fn=cmd_mle)

    s = sub.add_parser("learnSPST", help="learn an SPST from a training stream")
    s.add_argument("--patterns", required=True)
    s.add_argument("--declarations", default="")
    s.add_argument("--order", type=int, default=1)
    s.add_argument("--pMin", type=float, default=0.001)
    s.add_argument("--alpha", type=float, default=0.0)
    s.add_argument("--gammaMin", type=float, default=0.001)
    s.add_argument("--r", type=float, default=1.05)
    s.add_argument("--outputSpst", required=True)
    add_stream_opts(s)
    s.set_defaults(fn=cmd_learn_spst)

    r = sub.add_parser("recognition", help="recognition only")
    r.add_argument("--fsm", required=True)
    r.add_argument("--statsFile", required=True)
    r.add_argument("--outputMatches", default="")
    add_stream_opts(r)
    r.set_defaults(fn=cmd_recognition)

    f = sub.add_parser("forecasting", help="recognition + forecasting")
    f.add_argument("--fsm", required=True)
    f.add_argument("--mc", default="")
    f.add_argument("--modelType", default="vmm", choices=["vmm", "fmm"])
    f.add_argument("--threshold", type=float, default=0.5)
    f.add_argument("--maxSpread", type=int, default=5)
    f.add_argument("--horizon", type=int, default=200)
    f.add_argument("--foreMethod", default="argmax")
    f.add_argument("--statsFile", required=True)
    f.add_argument("--outputForecasts", default="")
    add_stream_opts(f)
    f.set_defaults(fn=cmd_forecasting)
    return p


def main(argv: list[str] | None = None) -> None:
    args = build_parser().parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
