"""Per-partition checkpoint/resume with lineage + metrics
(north_rule: "checkpoints per-Iceberg-partition progress with lineage
and metrics so a killed run resumes without reprocessing").

Protocol (write-then-record, idempotent):
 1. split the input by a partition key.  The key is a conv_id hash
    bucket (the analogue of an Iceberg bucket(conv_id) partition), NOT
    the event date: sysline assembly is a per-conversation window, so
    a conv-complete bucket assembles correctly in isolation, whereas a
    date split would cut conversations at midnight and orphan the
    first continuation lines of each day (their anchor lives in the
    previous day's partition).
 2. for each partition not yet recorded DONE: overwrite its output
    subdirectory, then atomically record a manifest entry with
    lineage (run_id) and metrics (rows_parsed, per-sink counts)
 3. a killed run leaves at most one partition half-written; its
    manifest entry is absent, so resume re-overwrites exactly that
    partition (overwrite => idempotent) and continues.

The manifest is a JSON-lines directory (one file per partition so
concurrent writers never clobber); on a cluster the same records live
in an Iceberg metadata table and the output write is a partition
overwrite commit.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import pipeline as P

MANIFEST_DIR = "_manifest"


def partition_keys(df: DataFrame, key_col) -> list[str]:
    rows = df.select(key_col.alias("k")).distinct().collect()
    return sorted(str(r["k"]) for r in rows)


def done_partitions(out_dir: str) -> dict[str, dict]:
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return {}
    out = {}
    for fn in os.listdir(mdir):
        if fn.endswith(".json"):
            with open(os.path.join(mdir, fn)) as f:
                rec = json.load(f)
            if rec.get("status") == "done":
                out[rec["partition_key"]] = rec
    return out


def _record(out_dir: str, rec: dict) -> None:
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    os.makedirs(mdir, exist_ok=True)
    path = os.path.join(mdir, f"{rec['partition_key']}.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(rec, f)
    os.replace(tmp, path)  # atomic commit of the manifest entry


N_BUCKETS = 8


def run_partitioned(
    df: DataFrame,
    out_dir: str,
    run_id: str | None = None,
    max_partitions: int | None = None,
    n_buckets: int = N_BUCKETS,
) -> list[str]:
    """Parse+assemble each conv-bucket partition to parquet,
    checkpointed.  Buckets are conv-complete (pmod(xxhash64(conv_id))),
    so per-bucket assembly equals the single-shot run value-for-value
    — a date split would not (conversations span midnight).

    max_partitions simulates a kill after k partitions (tests).
    Returns the partition keys processed in this call.
    """
    run_id = run_id or uuid.uuid4().hex
    key = F.pmod(F.xxhash64(F.col("conv_id")), F.lit(n_buckets)).cast("int")
    done = done_partitions(out_dir)
    # bucket k under 8 buckets holds different convs than under 16 —
    # resuming across an n_buckets change would silently mark stale
    # buckets done, so the manifest records it and mismatches fail
    for rec in done.values():
        if rec.get("n_buckets") != n_buckets:
            raise ValueError(
                f"manifest at {out_dir} was written with "
                f"n_buckets={rec.get('n_buckets')}, cannot resume with "
                f"n_buckets={n_buckets}; use a fresh out_dir (or the "
                "original bucket count)"
            )
    todo = [k for k in partition_keys(df, key) if k not in done]
    if max_partitions is not None:
        todo = todo[:max_partitions]
    processed = []
    for k in todo:
        part = df.filter(key == int(k))
        result = P.assembled(part)
        out_path = os.path.join(out_dir, f"bucket={k}")
        result.write.mode("overwrite").parquet(out_path)  # idempotent
        # metrics from the WRITTEN files, not the logical plan: a
        # second action on `result` would re-run the whole parse for
        # this bucket (2× compute per partition at 100 TB); the
        # read-back is a columnar scan of one column and also verifies
        # the output is readable before the manifest commits
        sink_counts = {
            r["sink_eff"]: r["cnt"]
            for r in df.sparkSession.read.parquet(out_path)
            .groupBy("sink_eff")
            .agg(F.count("*").alias("cnt"))
            .collect()
        }
        _record(
            out_dir,
            {
                "partition_key": k,
                "n_buckets": n_buckets,
                "status": "done",
                "rows_parsed": int(sum(sink_counts.values())),
                "patterns_matched": int(
                    sum(
                        v
                        for s, v in sink_counts.items()
                        if s != "continuation"
                    )
                ),
                "sink_counts": sink_counts,
                "lineage_run_id": run_id,
                "updated_at": time.strftime(
                    "%Y-%m-%dT%H:%M:%SZ", time.gmtime()
                ),
            },
        )
        processed.append(k)
    return processed
