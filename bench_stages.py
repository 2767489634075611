"""Stage-breakdown timer for the headline pipeline (guide §1.1/§1.4).

NOT the official bench (bench.py is frozen for measurement).  Times
cumulative prefixes of the parse→repair→assemble→filter→merge pipeline
with a noop sink so the per-stage increment is the difference between
adjacent rows.  Interleaved rounds + median, same estimator as
bench.py, so numbers are comparable.

Usage: python bench_stages.py [repl]   (default 50 → 5M turns at sf0.1)
Env:   SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, S4SPARK_BENCH_REPS
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from bench import DT_AFTER, DT_BEFORE, replicated_transcripts  # noqa: E402
from super_speedy_syslog_searcher_spark import pipeline as P  # noqa: E402
from super_speedy_syslog_searcher_spark.operators.merge import (  # noqa: E402
    dt_filter,
)
from super_speedy_syslog_searcher_spark.operators.parse import (  # noqa: E402
    learn_winners,
    parse_stage,
)
from super_speedy_syslog_searcher_spark.session import get_spark  # noqa: E402


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repl = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    reps = int(os.environ.get("S4SPARK_BENCH_REPS", "3"))
    spark = get_spark(app_name="s4spark-stages")
    sc = spark.sparkContext
    t = replicated_transcripts(spark, sf_dir, repl).cache()
    n = t.count()
    # warm UDF workers (same as bench.py)
    from pyspark.sql.functions import pandas_udf
    import pandas as pd  # noqa: F401

    @pandas_udf("long")
    def _warm(s):  # noqa: ANN001
        return s

    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    _noop(spark.range(0, cores * 10, 1, cores).select(_warm("id")))
    _noop(P.parse_repair(t.limit(2000)))

    def _full_merge():
        stg: list = []
        _noop(P.full_merge(t, DT_AFTER, DT_BEFORE, staging=stg))
        for s in stg:
            s.unpersist(blocking=True)

    def _full_merge_frozen():
        stg: list = []
        _noop(
            P.full_merge(t, DT_AFTER, DT_BEFORE, staging=stg, freeze=True)
        )
        for s in stg:
            s.unpersist(blocking=True)

    suite = {
        # cache scan + noop materialization floor
        "0_cache_scan": lambda: _noop(t),
        # scatter exchange alone (hash on the unique key, as parse_stage does)
        "1_scatter": lambda: _noop(
            t.repartition(
                sc.defaultParallelism, F.xxhash64("conv_id", "turn_idx")
            )
        ),
        # scatter + parse UDF
        "2_parse": lambda: _noop(parse_stage(t)),
        # + repair windows (conv exchange + sort + 2 window nodes)
        "3_parse_repair": lambda: _noop(P.parse_repair(t)),
        # + assemble window
        "4_assembled": lambda: _noop(P.assembled(t)),
        # + projection + dt filter (no persist, no sort)
        "5_filtered": lambda: _noop(
            dt_filter(
                P.assembled(t).select(
                    "conv_id", "turn_idx", "role", "tool", "text", "ts",
                    "ts_eff", "sink_eff", "msg_turn_idx",
                ),
                DT_AFTER,
                DT_BEFORE,
            )
        ),
        # full merge (persist + range sample + range shuffle + sort)
        "6_full_merge": _full_merge,
        # learning job alone (broadcast-build side of the frozen path)
        "7_learn_winners": lambda: _noop(learn_winners(t)),
        "8_full_merge_frozen": _full_merge_frozen,
    }
    for fn in suite.values():  # warmup round (JIT)
        fn()
    rounds: dict[str, list[float]] = {k: [] for k in suite}
    for _ in range(reps):
        for name, fn in suite.items():
            sc.setJobDescription(f"stages: {name}")
            t0 = time.perf_counter()
            fn()
            rounds[name].append(round(time.perf_counter() - t0, 3))
    sc.setJobDescription(None)
    med = {k: round(statistics.median(v), 3) for k, v in rounds.items()}
    t.unpersist()
    spark.stop()
    print(
        json.dumps(
            {
                "sf": sf_dir,
                "repl": repl,
                "n_turns": n,
                "stages": med,
                "rounds": rounds,
                "loadavg": [round(x, 2) for x in os.getloadavg()],
            }
        )
    )


if __name__ == "__main__":
    main()
