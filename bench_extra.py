#!/usr/bin/env python
"""Per-query isolation bench + plan capture (guide §1.4/§1.5/§7.2).

NOT part of the driver contract — bench.py is the frozen measurement
harness. This tool exists for the optimization loop:

  python bench_extra.py q <name> [reps]   time one query (noop sink, median)
  python bench_extra.py explain <name>    write plans/r06/<name>_<tag>.txt
  python bench_extra.py all [reps]        time every bench query

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0 — the driver's r05
measurement scale), SPARK_GRAFT_CPUS, PLAN_TAG (before/after).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import BENCH_QUERIES  # noqa: E402


def _spark(cpus: int):
    from entity_deduplication_hack_main_spark import get_spark

    return get_spark(parallelism=cpus, app_name="spark-dedup-bench-extra")


def time_query(spark, qs, name: str, sf_dir: str, reps: int) -> list[float]:
    legs = []
    for _ in range(reps):
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        t0 = time.monotonic()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        legs.append(round(time.monotonic() - t0, 3))
        spark.sparkContext.setJobDescription(None)
    return legs


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")

    from entity_deduplication_hack_main_spark import entry_queries

    qs = entry_queries.queries()
    spark = _spark(cpus)

    if mode == "q":
        name = sys.argv[2]
        reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
        legs = time_query(spark, qs, name, sf_dir, reps)
        print(json.dumps({"query": name, "sf_dir": sf_dir,
                          "legs": legs, "median": statistics.median(legs),
                          "loadavg": round(os.getloadavg()[0], 2)}))
    elif mode == "explain":
        name = sys.argv[2]
        tag = os.environ.get("PLAN_TAG", "before")
        out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "plans", "r06")
        os.makedirs(out_dir, exist_ok=True)
        plan = qs[name](spark, sf_dir)._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    elif mode == "all":
        reps = int(sys.argv[2]) if len(sys.argv) > 2 else 1
        out = {}
        for name in BENCH_QUERIES:
            legs = time_query(spark, qs, name, sf_dir, reps)
            out[name] = statistics.median(legs)
            print(f"{name}: {legs}", flush=True)
        print(json.dumps({"sf_dir": sf_dir, "queries": out,
                          "total": round(sum(out.values()), 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
