"""Line-level corpus cleaning: C4 rule filtering and CCNet
cross-corpus duplicated-line removal.

Not in the reference (s4 filters nothing below the sysline level),
but first-class for a training-data pipeline: the two canonical
line-granularity cleanups published for web-scale corpora are

 * C4 (Raffel et al. 2020, "Exploring the Limits of Transfer
   Learning", appendix) — per-LINE rules (terminal punctuation,
   >= 5 words, no "javascript") plus per-DOCUMENT rules (no curly
   brace, no "lorem ipsum", >= 3 surviving lines);
 * CCNet (Wenzek et al. 2020) — drop every repeated occurrence of a
   line across the WHOLE corpus, keeping only its first appearance
   (kills boilerplate: nav bars, cookie banners, footers).

Scale shape (the part that must survive 10^12 lines):

 * ``c4_line_filter`` is a narrow per-line projection followed by ONE
   doc_id-keyed hash aggregate (collect_list is partial-aggregated
   per map task) — no join, no window, no second corpus pass.
 * ``line_dedup`` never windows over the line key: boilerplate lines
   are precisely the HOT keys (a cookie banner can appear in 10^9
   docs), so a ``row_number() OVER (PARTITION BY line)`` would hand
   one task the whole banner.  Instead the first occurrence per line
   is computed with a map-side-combinable ``min(struct(doc_id,pos))``
   groupBy (hot keys collapse to one row per map task BEFORE the
   shuffle), and only line-hash + first-occurrence — vocabulary-sized,
   not corpus-sized — joins back to the exploded lines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# C4's terminal punctuation set (., !, ?, closing quote).
_TERMINALS = (".", "!", "?", '"')


def synth_lines_sql(engine: str, docs_rel: str = "documents") -> str:
    """Dual-dialect SQL deriving a deterministic MULTI-LINE corpus
    from the single-line synthetic ``documents`` table, exploded as
    (doc_id, line_pos, line) — the same derivation runs on Spark and
    on the DuckDB oracle, so both engines filter identical inputs.

    Construction: tokens are chunked 8 per line; line j of doc d is
      * a corpus-wide boilerplate banner (3 variants) when
        (d + j) % 6 = 0 — the CCNet dedup target;
      * suffixed " javascript required." when (3d + j) % 7 = 0 — the
        C4 javascript-line target;
      * left without terminal punctuation when (d + j) % 5 = 0;
      * otherwise terminated with " more.".
    Docs with d % 13 = 0 gain a trailing "config {" line (C4 whole-doc
    brace drop); docs with d % 97 = 0 gain a "lorem ipsum" line."""
    assert engine in ("spark", "duckdb")
    sp = engine == "spark"
    ws = (
        "filter(split(text, ' '), w -> w <> '')"
        if sp
        else "list_filter(string_split(text, ' '), w -> w <> '')"
    )
    nw = "size(ws)" if sp else "len(ws)"
    idiv = "DIV" if sp else "//"
    explode_j = (
        "explode(sequence(0, n_total - 1))"
        if sp
        else "unnest(generate_series(0, n_total - 1))"
    )
    seg = (
        "array_join(slice(ws, j * 8 + 1, 8), ' ')"
        if sp
        else "array_to_string(list_slice(ws, j * 8 + 1, j * 8 + 8), ' ')"
    )
    s = (lambda x: f"CAST({x} AS STRING)") if sp else (
        lambda x: f"CAST({x} AS VARCHAR)"
    )
    line_case = f"""CASE
      WHEN j < n_base THEN CASE
        WHEN (doc_id + j) % 6 = 0 THEN
          'subscribe to our newsletter for updates ' ||
          {s('(doc_id + j) % 3')} || ' today.'
        WHEN (doc_id * 3 + j) % 7 = 0 THEN {seg} || ' javascript required.'
        WHEN (doc_id + j) % 5 = 0 THEN {seg}
        ELSE {seg} || ' more.'
      END
      WHEN j = n_base AND doc_id % 13 = 0 THEN 'config {{'
      ELSE 'lorem ipsum dolor sit amet.'
    END"""
    return f"""
WITH dw AS (
  SELECT doc_id, {ws} AS ws FROM {docs_rel}
), dn AS (
  SELECT doc_id, ws, (({nw} + 7) {idiv} 8) AS n_base,
         (({nw} + 7) {idiv} 8)
           + (CASE WHEN doc_id % 13 = 0 THEN 1 ELSE 0 END)
           + (CASE WHEN doc_id % 97 = 0 THEN 1 ELSE 0 END) AS n_total
  FROM dw
), ex AS (
  SELECT doc_id, ws, n_base, {explode_j} AS j FROM dn
)
SELECT doc_id, CAST(j AS INT) AS line_pos, ({line_case}) AS line
FROM ex
"""


def split_lines(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Explode documents into (doc_id, line_pos, line) on newlines.

    Narrow: one Generate per doc, no shuffle."""
    return docs.select(
        "doc_id",
        F.posexplode(F.split(F.col(text_col), "\n")).alias(
            "line_pos", "line"
        ),
    )


def _line_keep(line: F.Column) -> F.Column:
    """C4 per-line keep rule: >= 5 words, ends in terminal
    punctuation, does not mention javascript."""
    words = F.filter(F.split(line, " "), lambda w: w != "")
    ends_ok = F.substring(F.trim(line), -1, 1).isin(*_TERMINALS)
    has_js = F.lower(line).contains("javascript")
    return (F.size(words) >= 5) & ends_ok & ~has_js


def c4_line_filter(lines: DataFrame) -> DataFrame:
    """C4 cleaning over exploded (doc_id, line_pos, line).

    Per line: keep iff >= 5 words AND terminal punctuation AND no
    "javascript".  Per document: drop the whole doc iff it contains
    a curly brace anywhere, contains "lorem ipsum", or fewer than 3
    lines survive the line rules.

    Returns one row per input document:
      doc_id, n_lines, n_kept, kept_doc (int 0/1),
      clean_text (surviving lines joined by \\n; NULL when dropped).

    One doc_id-keyed hash aggregate; clean_text is rebuilt in line
    order by sorting the collected (pos, line) structs — no window,
    no join."""
    flagged = lines.select(
        "doc_id",
        "line_pos",
        "line",
        _line_keep(F.col("line")).alias("keep_line"),
        (
            F.col("line").contains("{") | F.col("line").contains("}")
        ).alias("has_brace"),
        F.lower(F.col("line")).contains("lorem ipsum").alias("has_lorem"),
    )
    agg = flagged.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_lines"),
        F.sum(F.col("keep_line").cast("bigint"))
        .cast("bigint")
        .alias("n_kept"),
        F.max(F.col("has_brace").cast("int")).alias("any_brace"),
        F.max(F.col("has_lorem").cast("int")).alias("any_lorem"),
        F.array_sort(
            F.collect_list(
                F.when(
                    F.col("keep_line"),
                    F.struct("line_pos", "line"),
                )
            )
        ).alias("kept"),
    )
    kept_doc = (
        (F.col("any_brace") == 0)
        & (F.col("any_lorem") == 0)
        & (F.col("n_kept") >= 3)
    )
    return agg.select(
        "doc_id",
        "n_lines",
        "n_kept",
        kept_doc.cast("int").alias("kept_doc"),
        F.when(
            kept_doc,
            F.array_join(F.col("kept.line"), "\n"),
        ).alias("clean_text"),
    )


def line_dedup(lines: DataFrame) -> DataFrame:
    """CCNet corpus-wide duplicated-line removal over exploded
    (doc_id, line_pos, line): every occurrence of a line EXCEPT its
    first (smallest (doc_id, line_pos) corpus-wide) is dropped.

    Returns one row per document:
      doc_id, n_lines, n_removed, clean_text (survivors joined \\n).

    Two corpus passes but only one corpus SHUFFLE each and no hot-key
    window: pass 1 groups by the line text with a map-side-combinable
    min(struct(doc_id, line_pos)) — a banner repeated 10^9 times
    arrives at the reducer as one row per map task, not 10^9 rows;
    the resulting first-occurrence table (distinct-line-sized) joins
    back to the lines on the line key (AQE handles residual skew),
    then one doc_id aggregate rebuilds the text."""
    firsts = lines.groupBy("line").agg(
        F.min(F.struct("doc_id", "line_pos")).alias("first_occ"),
        F.count("*").cast("bigint").alias("n_occ"),
    )
    tagged = lines.join(firsts, "line").select(
        "doc_id",
        "line_pos",
        "line",
        (
            (F.col("n_occ") == 1)
            | (
                (F.col("first_occ.doc_id") == F.col("doc_id"))
                & (F.col("first_occ.line_pos") == F.col("line_pos"))
            )
        ).alias("keep"),
    )
    agg = tagged.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_lines"),
        F.sum((~F.col("keep")).cast("bigint"))
        .cast("bigint")
        .alias("n_removed"),
        F.array_sort(
            F.collect_list(
                F.when(F.col("keep"), F.struct("line_pos", "line"))
            )
        ).alias("kept"),
    )
    return agg.select(
        "doc_id",
        "n_lines",
        "n_removed",
        F.array_join(F.col("kept.line"), "\n").alias("clean_text"),
    )
