"""Line-level cleaning operators (C4 rules, CCNet line dedup):
planted-fixture semantics beyond the driver-oracle hash equality."""

from __future__ import annotations

from pyspark.sql import functions as F

from super_speedy_syslog_searcher_spark.operators import lines as L


def _lines_df(spark, rows):
    """rows: list of (doc_id, line_pos, line)."""
    return spark.createDataFrame(
        rows, "doc_id bigint, line_pos int, line string"
    )


GOOD = "this line has at least five words."


def test_c4_line_rules(spark):
    rows = [
        # doc 1: three good lines -> kept, clean text in order
        (1, 0, GOOD),
        (1, 1, "another perfectly ordinary sentence right here!"),
        (1, 2, "short one."),  # < 5 words -> line dropped
        (1, 3, 'a closing quote also counts as terminal punctuation"'),
        # doc 2: javascript line + only 2 good lines -> doc dropped
        (2, 0, GOOD),
        (2, 1, "please enable javascript to view this content."),
        (2, 2, "no terminal punctuation on this line"),
        (2, 3, GOOD),
        # doc 3: brace anywhere kills the whole doc
        (3, 0, GOOD),
        (3, 1, GOOD),
        (3, 2, GOOD),
        (3, 3, "function f() { return 1; }."),
        # doc 4: lorem ipsum kills the whole doc
        (4, 0, GOOD),
        (4, 1, GOOD),
        (4, 2, GOOD),
        (4, 3, "Lorem Ipsum dolor sit amet is filler text."),
    ]
    out = {
        r["doc_id"]: r
        for r in L.c4_line_filter(_lines_df(spark, rows)).collect()
    }
    assert out[1]["kept_doc"] == 1 and out[1]["n_kept"] == 3
    assert out[1]["clean_text"].split("\n") == [
        GOOD,
        "another perfectly ordinary sentence right here!",
        'a closing quote also counts as terminal punctuation"',
    ]
    assert out[2]["kept_doc"] == 0 and out[2]["n_kept"] == 2
    assert out[2]["clean_text"] is None
    assert out[3]["kept_doc"] == 0  # brace rule is doc-level
    assert out[3]["n_kept"] == 4  # ...even though every line passes
    assert out[4]["kept_doc"] == 0  # lorem ipsum, case-insensitive


def test_line_dedup_keeps_first_occurrence_only(spark):
    banner = "subscribe to our newsletter today."
    rows = [
        (1, 0, banner),
        (1, 1, "unique first doc line."),
        (2, 0, banner),  # dup of (1, 0) -> removed
        (2, 1, "unique second doc line."),
        (2, 2, banner),  # second copy in same doc -> removed too
        (3, 0, "unique third doc line."),
    ]
    out = {
        r["doc_id"]: r
        for r in L.line_dedup(_lines_df(spark, rows)).collect()
    }
    assert out[1]["n_removed"] == 0
    assert out[1]["clean_text"].startswith(banner)
    assert out[2]["n_removed"] == 2
    assert out[2]["clean_text"] == "unique second doc line."
    assert out[3]["n_removed"] == 0


def test_line_dedup_within_doc_duplicate(spark):
    # the FIRST occurrence inside one doc survives, later ones go
    rows = [
        (7, 0, "repeated line in one document."),
        (7, 1, "middle line stays."),
        (7, 2, "repeated line in one document."),
    ]
    out = L.line_dedup(_lines_df(spark, rows)).collect()[0]
    assert out["n_removed"] == 1
    assert out["clean_text"] == (
        "repeated line in one document.\nmiddle line stays."
    )


def test_synth_lines_dialects_agree(spark):
    """The Spark and DuckDB derivations of the multi-line corpus are
    the same relation (the premise of the driver oracle)."""
    import duckdb

    from tests.conftest import SF_SMOKE

    spark.read.parquet(f"{SF_SMOKE}/documents.parquet") \
        .createOrReplaceTempView("documents_l")
    sdf = (
        spark.sql(L.synth_lines_sql("spark", "documents_l"))
        .orderBy("doc_id", "line_pos")
        .toPandas()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{SF_SMOKE}/documents.parquet'"
    )
    ddf = con.execute(
        L.synth_lines_sql("duckdb")
        + " ORDER BY doc_id, line_pos"
    ).fetchdf()
    assert len(sdf) == len(ddf)
    assert (sdf["line"].values == ddf["line"].values).all()


def test_c4_plan_has_no_join_or_window(spark):
    from tests.conftest import SF_SMOKE

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    plan = L.c4_line_filter(
        L.split_lines(docs.withColumn("text", F.col("text")))
    )._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "Window" not in plan
