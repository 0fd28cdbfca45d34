#!/usr/bin/env python
"""Profile registry queries: wall time (noop sink, min-of-N) + formatted plan.

Usage:
  python tools/profile_queries.py [--runs N] [--plans-dir DIR] [--suffix TAG] q1 q2 ...
  python tools/profile_queries.py --list          # names + last bench secs

Writes plans/r15/<name>_<suffix>.txt when --plans-dir/--suffix given
(the optimization-round deliverable), prints one line per query with
wall seconds and plan-shape counters (Exchange / BatchEvalPython /
ArrowEvalPython / Sort / WholeStageCodegen spans / join strategies).
"""

from __future__ import annotations

import argparse
import os
import re
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def plan_shape(plan: str) -> str:
    counters = {
        "Exchange": len(re.findall(r"\bExchange\b", plan)),
        "SMJ": len(re.findall(r"\bSortMergeJoin\b", plan)),
        "BHJ": len(re.findall(r"\bBroadcastHashJoin\b", plan)),
        "SHJ": len(re.findall(r"\bShuffledHashJoin\b", plan)),
        "BNLJ": len(re.findall(r"\bBroadcastNestedLoopJoin\b", plan)),
        "Sort": len(re.findall(r"^\s*[+:*-]*\s*\(?\d*\)?\s*Sort\b", plan, re.M)),
        "Py": len(re.findall(r"BatchEvalPython|ArrowEvalPython", plan)),
        "MapPy": len(re.findall(r"MapInPandas|MapInArrow|FlatMapGroupsInPandas", plan)),
        "Window": len(re.findall(r"\bWindow\b", plan)),
        "Scan": len(re.findall(r"Scan parquet", plan)),
    }
    return " ".join(f"{k}={v}" for k, v in counters.items() if v)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--suffix", default=None)
    ap.add_argument("--list", action="store_true")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from kcidb_spark.queries import REGISTRY

    if args.list:
        import json
        detail = {}
        p = REPO / "BENCH_DETAIL_r15.json"
        if p.exists():
            detail = json.loads(p.read_text()).get("queries", {})
        for name in REGISTRY:
            print(f"{detail.get(name, float('nan')):8.3f}  {name}")
        return

    from kcidb_spark.cache import release_persisted
    from kcidb_spark.session import get_spark
    from kcidb_spark.tables import TABLES, table

    spark = get_spark(app_name="kcidb_profile")
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, schema="id: long"
    ).write.format("noop").mode("overwrite").save()
    for t in TABLES:
        table(spark, args.sf_dir, t).schema

    for name in args.names:
        q = REGISTRY[name]
        runs = []
        plan = None
        for _ in range(args.runs):
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.perf_counter()
            df = q.spark(spark, args.sf_dir)
            df.write.mode("overwrite").format("noop").save()
            runs.append(time.perf_counter() - t0)
            if plan is None:
                try:
                    plan = df._jdf.queryExecution().explainString(
                        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                            "formatted"
                        )
                    )
                except Exception as exc:  # noqa: BLE001
                    plan = f"(explain failed: {exc})"
            release_persisted()
        if args.plans_dir and args.suffix:
            out = Path(args.plans_dir)
            out.mkdir(parents=True, exist_ok=True)
            (out / f"{name}_{args.suffix}.txt").write_text(plan)
        print(
            f"{min(runs):8.3f}s  (runs: {', '.join(f'{r:.3f}' for r in runs)})"
            f"  {name}  [{plan_shape(plan)}]"
        )
        sys.stdout.flush()


if __name__ == "__main__":
    main()
