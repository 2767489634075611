"""The datetime-pattern bank — s4's DTPD table re-expressed as data.

The reference keeps an ordered table of 188 "datetime parse data"
instructions, each a regex plus a transcription recipe
(subprojects/ere/ere_datetimes_impl/src/ere_datetimes_impl.rs:2317-6439,
struct at :2096-2131).  Matching is first-match-wins in table order
(src/readers/syslinereader.rs:1782-1830) over a bounded prefix of the
line (range_regex, ere_datetimes_impl.rs:2106-2119), and every entry
carries embedded test cases validated by a dedicated test
(ere_datetimes_impl.rs:2078-2087).

We keep all three properties: an ordered list of pattern dicts,
prefix-bounded anchored regexes, and per-pattern ``tests`` consumed by
tests/test_patterns.py.  Canonicalization (month-name → number,
named-tz → offset, epoch split, year fill) mirrors
src/data/datetime.rs:1368-1890 ``captures_to_buffer_bytes`` but runs
vectorized in pandas (functions/datetime_parse.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field

MAX_SCAN = 64  # chars of line prefix the bank inspects (range_regex analogue)
ANCHOR_YEAR_DEFAULT = 2024  # year fill for no-year formats (s4: file mtime)

MONTHS = {
    "Jan": "01", "Feb": "02", "Mar": "03", "Apr": "04",
    "May": "05", "Jun": "06", "Jul": "07", "Aug": "08",
    "Sep": "09", "Oct": "10", "Nov": "11", "Dec": "12",
}

# named-tz → offset minutes (s4: tz alternation in patterns,
# ere_datetimes_impl.rs:589; mapping applied in captures_to_buffer_bytes)
TZ_OFFSET_MIN = {
    "UTC": 0, "GMT": 0, "UT": 0, "Z": 0,
    "PST": -480, "PDT": -420,
    "MST": -420, "MDT": -360,
    "CST": -360, "CDT": -300,
    "EST": -300, "EDT": -240,
    "CET": 60, "CEST": 120,
    "IST": 330, "JST": 540, "AEST": 600,
}

_MON_ALT = "|".join(MONTHS)
_DOW_ALT = "Mon|Tue|Wed|Thu|Fri|Sat|Sun"
_TZN_ALT = "|".join(sorted(TZ_OFFSET_MIN, key=len, reverse=True))


@dataclass
class Pattern:
    """One bank entry.

    kind drives canonicalization in the parse UDF:
      ymd      — Y/M(digit)/D/h/mi/s (+optional f, +optional tz/tzn)
      mon_name — month name group 'b' instead of digit month
      epoch    — 'es' seconds + 'f' fractional digits
      uptime   — 'us_' seconds + 'f' micros, relative (repair anchors it)
    dt_beg: fixed char offset of the datetime inside text, or None
    → derived from the 'pre' capture group length.
    tests: (text, expected_iso_utc_or_None, dt_beg, dt_end); uptime
    entries assert uptime_us instead of a timestamp.
    """

    pid: int
    name: str
    regex: str
    kind: str
    dt_beg: int | None = 0
    noyear: bool = False
    tests: list = field(default_factory=list)


PATTERNS: list[Pattern] = [
    Pattern(
        0, "iso8601_tz",
        r"^(?P<dt>(?P<Y>\d{4})-(?P<M>\d{2})-(?P<D>\d{2})[T ]"
        r"(?P<h>\d{2}):(?P<mi>\d{2}):(?P<s>\d{2})(?:\.(?P<f>\d{3,6}))?"
        r" ?(?P<tz>[+-]\d{4}))",
        "ymd",
        tests=[
            ("2024-01-05T03:04:05 -0800 host x", "2024-01-05 11:04:05", 0, 25),
            ("2000-01-01T00:00:02.123 -1100 a", "2000-01-01 11:00:02.123000", 0, 29),
            ("2024-01-05 03:04:05+0530 y", "2024-01-04 21:34:05", 0, 24),
        ],
    ),
    Pattern(
        1, "iso8601_notz",
        r"^(?P<dt>(?P<Y>\d{4})-(?P<M>\d{2})-(?P<D>\d{2})[T ]"
        r"(?P<h>\d{2}):(?P<mi>\d{2}):(?P<s>\d{2})(?:\.(?P<f>\d{3,6}))?)"
        r"(?![.\d+,-])",
        "ymd",
        tests=[
            ("2020-01-02T03:04:05 rest", "2020-01-02 03:04:05", 0, 19),
            ("2020-01-02 03:04:05.123456 x", "2020-01-02 03:04:05.123456", 0, 26),
        ],
    ),
    Pattern(
        2, "rfc2822",
        rf"^(?P<dt>(?:{_DOW_ALT}), (?P<D>\d{{2}}) (?P<b>{_MON_ALT}) "
        rf"(?P<Y>\d{{4}}) (?P<h>\d{{2}}):(?P<mi>\d{{2}}):(?P<s>\d{{2}}) "
        rf"(?P<tzn>{_TZN_ALT}))\b",
        "mon_name",
        tests=[
            ("Fri, 05 Jan 2024 03:04:05 PST x", "2024-01-05 11:04:05", 0, 29),
            ("Mon, 01 Jan 2024 18:00:44 CET y", "2024-01-01 17:00:44", 0, 29),
        ],
    ),
    Pattern(
        3, "rfc3164_noyear",
        rf"^(?P<dt>(?P<b>{_MON_ALT}) (?P<D>[ \d]\d) "
        rf"(?P<h>\d{{2}}):(?P<mi>\d{{2}}):(?P<s>\d{{2}}))(?! \d{{4}})",
        "mon_name",
        noyear=True,
        tests=[
            ("Jan  2 03:04:39 host app: m", "2024-01-02 03:04:39", 0, 15),
            ("Dec 31 23:59:59 host app: m", "2024-12-31 23:59:59", 0, 15),
        ],
    ),
    Pattern(
        4, "apache_access",
        rf"^\[(?P<dt>(?P<D>\d{{2}})/(?P<b>{_MON_ALT})/(?P<Y>\d{{4}}):"
        rf"(?P<h>\d{{2}}):(?P<mi>\d{{2}}):(?P<s>\d{{2}}) (?P<tz>[+-]\d{{4}}))\]",
        "mon_name",
        dt_beg=1,
        tests=[
            ("[12/Jan/2024:07:34:47 +0000] GET /", "2024-01-12 07:34:47", 1, 27),
            ("[01/Jan/2020:00:00:01 -0800] GET /", "2020-01-01 08:00:01", 1, 27),
        ],
    ),
    Pattern(
        5, "tomcat",
        rf"^(?P<dt>(?P<D>\d{{2}})-(?P<b>{_MON_ALT})-(?P<Y>\d{{4}}) "
        rf"(?P<h>\d{{2}}):(?P<mi>\d{{2}}):(?P<s>\d{{2}})\.(?P<f>\d{{3}}))",
        "mon_name",
        tests=[
            ("01-Jan-2024 17:27:00.875 INFO x", "2024-01-01 17:27:00.875000", 0, 24),
            ("08-Feb-2023 12:12:09.827 WARN y", "2023-02-08 12:12:09.827000", 0, 24),
        ],
    ),
    Pattern(
        6, "rh_audit_epoch",
        r"^(?P<pre>type=\w+ msg=audit\()(?P<dt>(?P<es>\d{9,11})\.(?P<f>\d{3})):\d+\):",
        "epoch",
        dt_beg=None,
        tests=[
            (
                "type=USER_ACCT msg=audit(1704527904.202:177): op=x",
                "2024-01-06 07:58:24.202000", 25, 39,
            ),
            (
                "type=DAEMON_START msg=audit(1681160194.260:3932): ok",
                "2023-04-10 20:56:34.260000", 28, 42,
            ),
        ],
    ),
    Pattern(
        7, "strace_epoch",
        r"^(?P<dt>(?P<es>\d{9,11})\.(?P<f>\d{6}))\b",
        "epoch",
        tests=[
            ("1704112402.016549 read(3, ...)", "2024-01-01 12:33:22.016549", 0, 17),
            ("1681160194.260123 write(1)", "2023-04-10 20:56:34.260123", 0, 17),
        ],
    ),
    Pattern(
        8, "dmesg_uptime",
        r"^(?P<pre>\[ *)(?P<dt>(?P<us_>\d{1,9})\.(?P<f>\d{6}))\]",
        "uptime",
        dt_beg=None,
        tests=[
            ("[0.000000] boot", 0, 1, 9),
            ("[12345.123456] usb 1-1: new device", 12345123456, 1, 13),
            ("[    1.000043] kernel: cmdline", 1000043, 5, 13),
        ],
    ),
    # ---- extended families (appended: pattern ids 0-8 stay stable;
    # the synthetic corpus generates only 0-8, these carry their own
    # embedded tests like every other bank entry) -------------------
    Pattern(
        9, "iso_comma_frac",  # log4j/java style (ere_datetimes 2435-area)
        r"^(?P<dt>(?P<Y>\d{4})-(?P<M>\d{2})-(?P<D>\d{2})[T ]"
        r"(?P<h>\d{2}):(?P<mi>\d{2}):(?P<s>\d{2}),(?P<f>\d{3}))",
        "ymd",
        tests=[
            ("2020-01-02 03:04:05,123 INFO main", "2020-01-02 03:04:05.123000", 0, 23),
        ],
    ),
    Pattern(
        10, "slash_ymd",  # nginx-error style YYYY/MM/DD
        r"^(?P<dt>(?P<Y>\d{4})/(?P<M>\d{2})/(?P<D>\d{2}) "
        r"(?P<h>\d{2}):(?P<mi>\d{2}):(?P<s>\d{2}))",
        "ymd",
        tests=[
            ("2020/01/02 03:04:05 [error] 1#1", "2020-01-02 03:04:05", 0, 19),
        ],
    ),
    Pattern(
        11, "us_mdy_12h",  # Windows-ish MM/DD/YYYY hh:mm:ss AM/PM
        r"^(?P<dt>(?P<M>\d{2})/(?P<D>\d{2})/(?P<Y>\d{4}) "
        r"(?P<h12>\d{2}):(?P<mi>\d{2}):(?P<s>\d{2}) (?P<ampm>AM|PM))",
        "mdy12",
        tests=[
            ("01/02/2020 03:04:05 PM event", "2020-01-02 15:04:05", 0, 22),
            ("01/02/2020 12:04:05 AM event", "2020-01-02 00:04:05", 0, 22),
            ("01/02/2020 12:04:05 PM event", "2020-01-02 12:04:05", 0, 22),
        ],
    ),
    Pattern(
        12, "compact_ymdhms",  # 20200102T030405 / _-separated
        r"^(?P<dt>(?P<Y>\d{4})(?P<M>\d{2})(?P<D>\d{2})[T_]"
        r"(?P<h>\d{2})(?P<mi>\d{2})(?P<s>\d{2}))(?!\d)",
        "ymd",
        tests=[
            ("20200102T030405 backup done", "2020-01-02 03:04:05", 0, 15),
            ("20200102_030405 snapshot", "2020-01-02 03:04:05", 0, 15),
        ],
    ),
    Pattern(
        13, "iso8601_tz_colon",  # RFC3339 with ±hh:mm offset
        r"^(?P<dt>(?P<Y>\d{4})-(?P<M>\d{2})-(?P<D>\d{2})[T ]"
        r"(?P<h>\d{2}):(?P<mi>\d{2}):(?P<s>\d{2})(?:\.(?P<f>\d{3,6}))?"
        r"(?P<tz>[+-]\d{2}:\d{2}))",
        "ymd",
        tests=[
            ("2020-01-01T22:00:00-08:00 host app: m", "2020-01-02 06:00:00", 0, 25),
            ("2020-01-01T22:00:00.500+05:30 x", "2020-01-01 16:30:00.500000", 0, 29),
        ],
    ),
]

CONTINUATION_SINK = "continuation"
SINK_NAMES = [p.name for p in PATTERNS] + [CONTINUATION_SINK]
