"""Deterministic transcripts derivation (the unit-under-test input).

BASELINE.json input_hint mandates an Iceberg/parquet table of
conversation turns ``(conv_id, turn_idx, role, text, tool, ts)`` whose
``text`` embeds a datetime in one of the reference's format families
(s4's DTPD table, subprojects/ere/ere_datetimes_impl/src/
ere_datetimes_impl.rs:2317-6439).  No such table ships in
/root/testdata, so we derive one *deterministically* from the driver's
``events`` parquet with a transformation expressible **identically** in
Spark SQL and DuckDB SQL.  That gives every pipeline stage a real
DuckDB oracle: the oracle knows the expected parse result *by
construction* (it never regex-parses), while the Spark pipeline
genuinely regex-parses with the pandas-UDF pattern bank — a
differential test in the spirit of the reference's
tools/compare-current-and-expected/compare.sh.

Engine portability rules used throughout:
  * all datetime arithmetic in bigint microseconds
    (Spark unix_micros/timestamp_micros ↔ DuckDB epoch_us/make_timestamp)
  * month / weekday names via CASE, never locale-dependent strftime
  * doubles never formatted into strings (cents via floor(x*100+0.5))

Format families (pattern_id = position in the parse bank,
patterns.py):

  id  sink              example prefix                              s4 fixture
  0   iso8601_tz        2024-01-05T03:04:05 -0800                   ere_datetimes_impl.rs:2317
  1   iso8601_notz      2024-01-05T03:04:05                         ere_datetimes_impl.rs:4146
  2   rfc2822           Fri, 05 Jan 2024 03:04:05 PST               ere_datetimes_impl.rs:3250
  3   rfc3164_noyear    Jan  5 03:04:05                             ere_datetimes_impl.rs:2603
  4   apache_access     [05/Jan/2024:03:04:05 -0800]                ere_datetimes_impl.rs:3454
  5   tomcat            05-Jan-2024 03:04:05.123                    ere_datetimes_impl.rs:3690
  6   rh_audit_epoch    type=USER_ACCT msg=audit(1704423845.123:7): ere_datetimes_impl.rs:4661
  7   strace_epoch      1704423845.123456                           ere_datetimes_impl.rs:4680
  8   dmesg_uptime      [12345.123456]                              ere_datetimes_impl.rs:5849
  9   (continuation)    no datetime — attaches to previous message  src/data/mod.rs:34-44

Skew fixture: conv-00000 receives every 5th event (~20% of rows) —
the "hot conversation" the merge stage must salt around.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

N_FAMS = 9  # datetime-bearing families; fam 9 = continuation
ANCHOR_YEAR = 2024  # year-fill for no-year formats (s4: file mtime year)

SINKS = [
    "iso8601_tz",
    "iso8601_notz",
    "rfc2822",
    "rfc3164_noyear",
    "apache_access",
    "tomcat",
    "rh_audit_epoch",
    "strace_epoch",
    "dmesg_uptime",
]

_MONTHS = [
    "Jan", "Feb", "Mar", "Apr", "May", "Jun",
    "Jul", "Aug", "Sep", "Oct", "Nov", "Dec",
]
_DOWS = ["Sun", "Mon", "Tue", "Wed", "Thu", "Fri", "Sat"]  # 1970-01-01 = Thu


class _Dialect:
    """The tiny set of syntax differences between Spark SQL and DuckDB."""

    def __init__(self, engine: str):
        assert engine in ("spark", "duckdb")
        self.engine = engine
        self.str_t = "STRING" if engine == "spark" else "VARCHAR"

    def eus(self, ts: str) -> str:  # timestamp -> bigint micros
        return (
            f"unix_micros({ts})" if self.engine == "spark" else f"epoch_us({ts})"
        )

    def from_us(self, x: str) -> str:  # bigint micros -> timestamp
        return (
            f"timestamp_micros({x})"
            if self.engine == "spark"
            else f"make_timestamp({x})"
        )

    def idiv(self, a: str, b: str) -> str:  # floor integer division (args >= 0)
        return f"({a} DIV {b})" if self.engine == "spark" else f"({a} // {b})"

    def s(self, x: str) -> str:  # cast to string
        return f"CAST({x} AS {self.str_t})"


def _pieces(d: _Dialect):
    """SQL snippet factories shared by every family prefix."""

    def p2(x: str, pad: str = "'0'") -> str:
        return f"lpad({d.s(x)}, 2, {pad})"

    def t(us: str) -> str:  # micros expr -> timestamp expr
        return d.from_us(us)

    def date_iso(us: str) -> str:  # YYYY-MM-DD
        ts = t(us)
        return (
            f"{d.s(f'year({ts})')} || '-' || {p2(f'month({ts})')}"
            f" || '-' || {p2(f'day({ts})')}"
        )

    def time8(us: str) -> str:  # HH:MM:SS
        ts = t(us)
        return (
            f"{p2(f'hour({ts})')} || ':' || {p2(f'minute({ts})')}"
            f" || ':' || {p2(f'second({ts})')}"
        )

    def mon(us: str) -> str:  # Jan..Dec via CASE (locale-proof)
        whens = " ".join(
            f"WHEN {i + 1} THEN '{m}'" for i, m in enumerate(_MONTHS)
        )
        return f"(CASE month({t(us)}) {whens} END)"

    def dow(us: str) -> str:  # Sun..Sat from epoch-day arithmetic
        day_idx = f"(({d.idiv(us, '86400000000')} + 4) % 7)"
        whens = " ".join(f"WHEN {i} THEN '{w}'" for i, w in enumerate(_DOWS))
        return f"(CASE CAST({day_idx} AS INT) {whens} END)"

    def day_s(us: str) -> str:
        return d.s(f"day({t(us)})")

    def year_s(us: str) -> str:
        return d.s(f"year({t(us)})")

    return p2, date_iso, time8, mon, dow, day_s, year_s


def _derivation_sql(engine: str, events_rel: str = "events") -> str:
    """Extended derivation: canonical 6 columns + by-construction
    expected parse results (fam, sink, pattern_id, ts_parsed_exp,
    dt_beg_exp, dt_end_exp).  The transcripts view projects the 6."""
    d = _Dialect(engine)
    p2, date_iso, time8, mon, dow, day_s, year_s = _pieces(d)

    # -- per-conv datetime-format assignment ---------------------------
    # conv number: every 5th event lands in the hot conv 0 (skew);
    # others spread over 1..99 by user.
    cnum = "(CASE WHEN e % 5 = 0 THEN 0 ELSE 1 + CAST(u % 99 AS INT) END)"
    # dominant family per conv + ~10% noise family + ~9% continuations
    fam = (
        "(CASE WHEN e % 11 = 3 THEN 9 "
        " WHEN e % 10 = 7 THEN CAST((cnum + 1) % 9 AS INT) "
        " ELSE CAST(cnum % 9 AS INT) END)"
    )
    # numeric-offset tz per conv (families 0/4) and named tz (family 2)
    offmin = "(CASE CAST(cnum % 4 AS INT) WHEN 0 THEN 0 WHEN 1 THEN -480 WHEN 2 THEN 330 ELSE -660 END)"
    offstr = "(CASE CAST(cnum % 4 AS INT) WHEN 0 THEN '+0000' WHEN 1 THEN '-0800' WHEN 2 THEN '+0530' ELSE '-1100' END)"
    tzname = "(CASE CAST(cnum % 4 AS INT) WHEN 0 THEN 'UTC' WHEN 1 THEN 'PST' WHEN 2 THEN 'IST' ELSE 'CET' END)"
    tznameoff = "(CASE CAST(cnum % 4 AS INT) WHEN 0 THEN 0 WHEN 1 THEN -480 WHEN 2 THEN 330 ELSE 60 END)"

    # -- family prefixes (all ASCII => char offsets == byte offsets) ---
    l0 = "(t0us + CAST(offmin AS BIGINT) * 60000000)"  # local wall-clock, fams 0/4
    l3 = "(t0us + CAST(tznameoff AS BIGINT) * 60000000)"  # local wall-clock, fam 2
    sec10 = d.s(d.idiv("eus", "1000000"))
    frac6 = f"lpad({d.s('eus % 1000000')}, 6, '0')"
    ms3 = f"lpad({d.s(d.idiv('eus % 1000000', '1000'))}, 3, '0')"
    upsec = d.s(d.idiv("up_us", "1000000"))
    upfrac = f"lpad({d.s('up_us % 1000000')}, 6, '0')"
    day_l0 = f"day({d.from_us(l0)})"
    day_l3 = f"day({d.from_us(l3)})"
    day_t0 = "day(" + d.from_us("t0us") + ")"

    prefixes = {
        0: f"{date_iso(l0)} || 'T' || {time8(l0)} || ' ' || offstr",
        1: f"{date_iso('t0us')} || 'T' || {time8('t0us')}",
        2: (
            f"{dow(l3)} || ', ' || {p2(day_l3)} || ' ' || {mon(l3)}"
            f" || ' ' || {year_s(l3)} || ' ' || {time8(l3)} || ' ' || tzname"
        ),
        3: f"{mon('t0us')} || ' ' || lpad({day_s('t0us')}, 2, ' ') || ' ' || {time8('t0us')}",
        4: (
            f"'[' || {p2(day_l0)} || '/' || {mon(l0)} || '/' || {year_s(l0)}"
            f" || ':' || {time8(l0)} || ' ' || offstr || ']'"
        ),
        5: f"{p2(day_t0)} || '-' || {mon('t0us')} || '-' || {year_s('t0us')} || ' ' || {time8('t0us')} || '.' || {ms3}",
        6: f"'type=USER_ACCT msg=audit(' || {sec10} || '.' || {ms3} || ':' || {d.s('e')} || '):'",
        7: f"{sec10} || '.' || {frac6}",
        8: f"'[' || {upsec} || '.' || {upfrac} || ']'",
    }
    prefix_case = "CASE fam " + " ".join(
        f"WHEN {k} THEN {v}" for k, v in prefixes.items()
    ) + " ELSE 'stack frame detail' END"

    # payload: event fields, integer cents (never format doubles),
    # high-plane unicode sprinkle (compare-log-mergers faces fixture)
    payload = (
        f"' host-' || {d.s('u % 10')} || ' ' || event_type || '[' || {d.s('e')}"
        f" || ']: metric=' || {d.s('CAST(floor(value * 100 + 0.5) AS BIGINT)')}"
        f" || (CASE WHEN e % 13 = 0 THEN ' \U0001F600\U0001F680' ELSE '' END)"
    )

    # -- expected parse results (by construction) ----------------------
    ms_trunc = d.from_us(f"({d.idiv('eus', '1000')} * 1000)")
    ts_parsed_exp = (
        "CASE WHEN fam = 9 THEN NULL "
        f"WHEN fam = 7 OR fam = 8 THEN {d.from_us('eus')} "
        f"WHEN fam = 5 OR fam = 6 THEN {ms_trunc} "
        f"ELSE {d.from_us('t0us')} END"
    )
    dt_beg_exp = (
        "CASE WHEN fam = 9 THEN NULL WHEN fam = 4 OR fam = 8 THEN 1 "
        "WHEN fam = 6 THEN 25 ELSE 0 END"
    )
    dt_end_exp = (
        "CASE fam WHEN 0 THEN 25 WHEN 1 THEN 19 WHEN 2 THEN 29 WHEN 3 THEN 15 "
        "WHEN 4 THEN 27 WHEN 5 THEN 24 WHEN 6 THEN 39 WHEN 7 THEN 17 "
        f"WHEN 8 THEN 2 + length({upsec}) + 6 ELSE NULL END"
    )
    sink_case = "CASE fam " + " ".join(
        f"WHEN {i} THEN '{s}'" for i, s in enumerate(SINKS)
    ) + " ELSE 'continuation' END"

    return f"""
WITH base AS (
  -- CAST: Spark 4 infers parquet naive timestamps as TIMESTAMP_NTZ;
  -- we work in TIMESTAMP with session tz pinned to UTC (session.prep),
  -- which matches DuckDB's UTC-naive semantics byte-for-byte.
  SELECT event_id AS e, user_id AS u, CAST(ts AS TIMESTAMP) AS ts,
         event_type, value,
         {d.eus('CAST(ts AS TIMESTAMP)')} AS eus,
         {d.eus(f"date_trunc('second', CAST(ts AS TIMESTAMP))")} AS t0us
  FROM {events_rel}
), conv AS (
  SELECT *, {cnum} AS cnum FROM base
), fam AS (
  SELECT *, {fam} AS fam, {offmin} AS offmin, {offstr} AS offstr,
         {tzname} AS tzname, {tznameoff} AS tznameoff
  FROM conv
), boot AS (
  SELECT *,
         eus - min(CASE WHEN fam = 8 THEN eus END)
                 OVER (PARTITION BY cnum) AS up_us
  FROM fam
), txt AS (
  SELECT *, ({prefix_case}) || ({payload}) AS text FROM boot
)
SELECT
  'conv-' || lpad({d.s('cnum')}, 5, '0') AS conv_id,
  CAST(row_number() OVER (PARTITION BY cnum ORDER BY ts, e) - 1 AS INT) AS turn_idx,
  (CASE CAST(e % 4 AS INT) WHEN 0 THEN 'user' WHEN 1 THEN 'assistant'
        WHEN 2 THEN 'system' ELSE 'tool' END) AS role,
  text,
  (CASE CAST(e % 8 AS INT) WHEN 0 THEN 'bash' WHEN 1 THEN 'search'
        WHEN 2 THEN 'edit' WHEN 4 THEN 'python' WHEN 5 THEN 'browser'
        ELSE 'none' END) AS tool,
  ts,
  fam AS _fam,
  ({sink_case}) AS _sink,
  CAST((CASE WHEN fam = 9 THEN NULL ELSE fam END) AS INT) AS _pattern_id,
  CAST(({ts_parsed_exp}) AS TIMESTAMP) AS _ts_parsed,
  CAST(({dt_beg_exp}) AS INT) AS _dt_beg,
  CAST(({dt_end_exp}) AS INT) AS _dt_end
FROM txt
"""


def transcripts_sql(engine: str, events_rel: str = "events") -> str:
    """The 6-column transcripts relation (input_hint shape)."""
    return (
        "SELECT conv_id, turn_idx, role, text, tool, ts FROM ("
        + _derivation_sql(engine, events_rel)
        + ")"
    )


def expected_sql(engine: str, events_rel: str = "events") -> str:
    """Transcripts + by-construction expected parse columns (oracle)."""
    return _derivation_sql(engine, events_rel)


def transcripts_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical transcripts DataFrame for an sf dir."""
    spark.read.parquet(f"{sf_dir}/events.parquet").createOrReplaceTempView(
        "events"
    )
    return spark.sql(transcripts_sql("spark"))


def expected_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transcripts + expected-parse columns (for tests; the pipeline
    itself never reads the _-prefixed columns)."""
    spark.read.parquet(f"{sf_dir}/events.parquet").createOrReplaceTempView(
        "events"
    )
    return spark.sql(expected_sql("spark"))
