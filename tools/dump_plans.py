"""Dump .explain("formatted") for registry queries to plans/<tag>/.

Usage: python tools/dump_plans.py <tag> [suffix] [query ...]

Writes plans/<tag>/<query>_<suffix>.txt (suffix defaults to "before")
for each named query, or for every registry query when none are named.
Driver-only work (plan compilation, no execution) — safe to run while
other jobs hold the cores.
"""

from __future__ import annotations

import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def main() -> None:
    from flink_rtcef_spark.queries import QUERIES, load_all
    from flink_rtcef_spark.session import get_spark

    tag = sys.argv[1] if len(sys.argv) > 1 else "r09"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:]
    load_all()
    spark = get_spark("dump_plans")
    sf_dir = "/root/testdata/sf0.01"
    out_dir = ROOT / "plans" / tag
    out_dir.mkdir(parents=True, exist_ok=True)

    targets = names or list(QUERIES)
    for name in targets:
        fn = QUERIES.get(name)
        if fn is None:
            print(f"SKIP {name}: not in registry", file=sys.stderr)
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:
            print(f"ERROR {name}: {e}", file=sys.stderr)
            continue
        (out_dir / f"{name}_{suffix}.txt").write_text(plan)
        print(f"wrote {name}_{suffix}.txt ({len(plan)} chars)")


if __name__ == "__main__":
    main()
