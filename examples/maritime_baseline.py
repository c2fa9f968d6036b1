"""Maritime quality-parity replay (BASELINE.md): the Brest port-entry
pattern over the reference's committed 30,193-row AIS sample
(/root/reference/data/maritime.csv) with the reference hyperparameters
(Makefile:53-69 + 229-231): order=2, gamma=0.001, r=1.05, horizon=600 s,
threshold=0.1, maxSpread=5, CLASSIFY_NEXTK, reportingDistance=3600 s,
partition key mmsi.

Prints the runtime/batch MCC trajectory in the reference's metrics.csv
shape (timestamp, runtime_mcc, batch_mcc) for comparison against
data/baseline_metrics.csv (≈0.51 runtime MCC).

Run: python examples/maritime_baseline.py [--train-frac 0.5]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from flink_rtcef_spark.models.spst import train_spst
from flink_rtcef_spark.operators.cep import BatchCEP
from flink_rtcef_spark.operators.forecast import ForecastCEP, evaluate_forecasts_windowed
from flink_rtcef_spark.plans.compiler import compile_pattern
from flink_rtcef_spark.session import get_spark
from flink_rtcef_spark.sources.io import read_maritime_csv

MARITIME_CSV = "/root/reference/data/maritime.csv"
PATTERN = Path("/root/reference/data/pattern.sre").read_text().strip()
DECLARATIONS = Path("/root/reference/data/declarations.sre").read_text()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--train-frac", type=float, default=0.5)
    ap.add_argument("--horizon-events", type=int, default=10)
    ap.add_argument("--limit", type=int, default=0, help="row cap for quick runs")
    args = ap.parse_args()

    spark = get_spark("maritime_baseline")
    t0 = time.time()
    events = read_maritime_csv(spark, MARITIME_CSV)
    if args.limit:
        events = events.orderBy("timestamp").limit(args.limit)
    events = events.withColumn("id", F.monotonically_increasing_id()).cache()
    n = events.count()

    # the committed pattern has no partitionBy modifier — the Flink job
    # hardcodes keyBy(mmsi) (InferenceJob.java:215); we do the same
    compiled = compile_pattern(PATTERN + "{partitionBy:mmsi}", DECLARATIONS)
    print(
        f"# compiled: {len(compiled.atoms)} atoms, {len(compiled.minterms)} minterms, "
        f"{compiled.sdfa.n_states} SDFA states ({time.time() - t0:.1f}s)"
    )

    # train on the earliest train_frac of the stream (the reference
    # trains offline on a separate slice of the same distribution)
    ts_split = events.approxQuantile("timestamp", [args.train_frac], 0.01)[0]
    train = events.filter(F.col("timestamp") <= ts_split)
    cep = BatchCEP(compiled, key_col="mmsi", ts_col="timestamp", id_col="id")
    spst = train_spst(
        cep.symbolized(train),
        compiled,
        max_order=2,
        pmin=1e-6,  # reference trains with pMin:0.0; exact 0 admits all contexts
        alpha=0.0,
        gamma_min=0.001,
        r=1.05,
        horizon=args.horizon_events,  # 600 s at ~60 s/event ≈ 10 events
        cutoff=1e-3,
    )
    print(
        f"# trained: {spst.n_virtual} virtual states, {len(spst.wt)} wt dists, "
        f"{len(spst.pst.nodes())} PST nodes ({time.time() - t0:.1f}s)"
    )

    fcep = ForecastCEP(
        spst,
        key_col="mmsi",
        ts_col="timestamp",
        id_col="id",
        method="classify_nextk",
        confidence_threshold=0.1,
        spread=5,
    )
    results = fcep.forecasts(events).cache()
    n_det = results.filter("is_detection").count()
    n_fc = results.filter("not is_detection").count()
    print(f"# replay: {n} events, {n_det} detections, {n_fc} forecasts ({time.time() - t0:.1f}s)")

    trajectory = evaluate_forecasts_windowed(
        results, window_seconds=3600, ts_unit="seconds"
    ).toPandas()
    print("timestamp,runtime_mcc,batch_mcc,tp,tn,fp,fn")
    for _, r in trajectory.iterrows():
        print(
            f"{int(r.window_start)},{r.runtime_mcc},{r.batch_mcc},"
            f"{int(r.tp)},{int(r.tn)},{int(r.fp)},{int(r.fn)}"
        )
    final = trajectory.iloc[-1]
    print(
        f"# final runtime MCC: {final.runtime_mcc} over {len(trajectory)} report "
        f"windows (baseline_metrics.csv ≈ 0.511); wall {time.time() - t0:.1f}s"
    )


if __name__ == "__main__":
    main()
