"""Raw log-file source: the reference's actual input shape.

s4 walks paths, routes by file type (text/gz/bz2/…,
src/readers/filepreprocessor.rs:1462,1188), splits files into lines
(src/readers/linereader.rs) and assembles syslines.  Spark equivalents:

 * path walk           → spark.read glob expansion
 * gz/bz2 codecs       → built-in text-source codec handling
 * per-file identity   → input_file_name()
 * line splitting      → text source (one row per line)
 * line numbers        → per-file window over the text source's
                         preserved intra-file order

After this source, rows have exactly the transcripts shape
(conv_id=file, turn_idx=line number, text=line, ts=file mtime
stand-in), so the entire pipeline (parse → repair → assemble →
merge) runs unchanged on real log files — `s4 <paths>` parity.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def read_log_files(
    spark: SparkSession, paths: list[str] | str, mtime_map: dict | None = None
) -> DataFrame:
    """paths (files/globs; .gz/.bz2 transparently decompressed) →
    DataFrame(conv_id, turn_idx, role, text, tool, ts).

    ts carries the file mtime (s4 seeds no-year formats and uptime
    anchors from mtime, src/readers/syslogprocessor.rs:628,740); pass
    mtime_map={path: datetime} to override (tests / object stores).

    Line numbering: the text source emits rows in file order within
    each split; for exact global per-file numbering we order by the
    block-offset-monotonic ``monotonically_increasing_id()`` inside
    the per-file window — correct while each file maps to one split
    (true for gz — non-splittable — and for text files below
    maxPartitionBytes; larger splittable files should come in via the
    transcripts table instead).
    """
    if isinstance(paths, str):
        paths = [paths]
    df = (
        spark.read.text(paths)
        .withColumn("conv_id", F.input_file_name())
        .withColumn("_mid", F.monotonically_increasing_id())
    )
    w = Window.partitionBy("conv_id").orderBy("_mid")
    out = (
        df.withColumn("turn_idx", (F.row_number().over(w) - 1).cast("int"))
        .withColumnRenamed("value", "text")
        .drop("_mid")
    )
    if mtime_map:
        mt = F.create_map(
            *[
                x
                for path, ts in mtime_map.items()
                for x in (F.lit(path), F.lit(ts))
            ]
        )
        ts_col = mt[F.col("conv_id")].cast("timestamp")
    else:
        local = {}
        for p in paths:
            if os.path.isfile(p):
                local[f"file://{os.path.abspath(p)}"] = int(
                    os.path.getmtime(p)
                )
        if local:
            mt = F.create_map(
                *[
                    x
                    for path, ts in local.items()
                    for x in (F.lit(path), F.lit(ts))
                ]
            )
            ts_col = F.timestamp_seconds(mt[F.col("conv_id")])
        else:
            ts_col = F.lit(None).cast("timestamp")
    return out.select(
        "conv_id",
        "turn_idx",
        F.lit("log").alias("role"),
        "text",
        F.lit("none").alias("tool"),
        ts_col.alias("ts"),
    )
