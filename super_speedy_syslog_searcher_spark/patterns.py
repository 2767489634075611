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
# ere_datetimes_impl.rs:589; mapping applied in captures_to_buffer_bytes).
# Round 2 extends the table toward the reference's full alternation:
# the complete Western set plus the common APAC/African abbreviations.
# Ambiguous names (CST, IST, AST…) take the most common reading, the
# same pragmatic choice the reference makes.
TZ_OFFSET_MIN = {
    "UTC": 0, "GMT": 0, "UT": 0, "Z": 0, "WET": 0,
    "PST": -480, "PDT": -420,
    "MST": -420, "MDT": -360,
    "CST": -360, "CDT": -300,
    "EST": -300, "EDT": -240,
    "AKST": -540, "AKDT": -480,
    "HST": -600, "HDT": -540,
    "AST": -240, "ADT": -180,
    "NST": -210, "NDT": -150,
    "BRT": -180, "ART": -180, "CLT": -240, "COT": -300, "PET": -300,
    "CET": 60, "CEST": 120, "BST": 60, "WEST": 60, "WAT": 60,
    "EET": 120, "EEST": 180, "SAST": 120, "CAT": 120,
    "MSK": 180, "EAT": 180,
    "IST": 330, "PKT": 300,
    "WIB": 420,
    "HKT": 480, "SGT": 480, "AWST": 480,
    "JST": 540, "KST": 540,
    "ACST": 570, "ACDT": 630,
    "AEST": 600, "AEDT": 660,
    "NZST": 720, "NZDT": 780,
}

MONTHS_FULL = {
    "January": "01", "February": "02", "March": "03", "April": "04",
    "May": "05", "June": "06", "July": "07", "August": "08",
    "September": "09", "October": "10", "November": "11", "December": "12",
}

_MON_ALT = "|".join(MONTHS)
# 'May' is excluded: it is both the full and the abbreviated spelling,
# so a 'DD May YYYY' line is *indistinguishable* from dd_mon_yyyy (32)
# and first-match-wins must give it to 32 (disjointness invariant).
_MON_FULL_ALT = "|".join(
    sorted((m for m in MONTHS_FULL if m != "May"), key=len, reverse=True)
)
_DOW_ALT = "Mon|Tue|Wed|Thu|Fri|Sat|Sun"
_TZN_ALT = "|".join(sorted(TZ_OFFSET_MIN, key=len, reverse=True))
# lowercase/UPPERCASE month spellings ONLY — exact Title-case is
# pattern 3's; keeping 17 disjoint from 3 makes the winner-first
# frozen parse (s4's per-file DTPD freeze, syslinereader.rs:920)
# output-identical to strict bank order.
_MON_CI_ALT = "|".join(
    [m.lower() for m in MONTHS] + [m.upper() for m in MONTHS]
)


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
        r"(?P<h>\d{2}):(?P<mi>\d{2}):(?P<s>\d{2})(?:\.(?P<f>\d{1,9}))?"
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
        # frac 1-9 digits (%f parity, ere_datetimes_impl.rs:520-525);
        # the trailing lookaheads keep this catch-all disjoint from
        # space-separated numeric-tz (0), AM/PM 12-hour (25), Zulu
        # (29) and named-tz (20) lines, so the frozen winner-first
        # parse is equivalent to strict bank order.
        r"^(?P<dt>(?P<Y>\d{4})-(?P<M>\d{2})-(?P<D>\d{2})[T ]"
        r"(?P<h>\d{2}):(?P<mi>\d{2}):(?P<s>\d{2})(?:\.(?P<f>\d{1,9}))?)"
        rf"(?![.\dZ+,-])(?! ?[+-]\d{{2}})(?! [AP]M\b)(?! (?:{_TZN_ALT})\b)",
        "ymd",
        tests=[
            ("2020-01-02T03:04:05 rest", "2020-01-02 03:04:05", 0, 19),
            ("2020-01-02 03:04:05.123456 x", "2020-01-02 03:04:05.123456", 0, 26),
            ("2020-01-02T03:04:05.123456789 ns", "2020-01-02 03:04:05.123456", 0, 29),
            ("2020-01-02T03:04:05.1 short", "2020-01-02 03:04:05.100000", 0, 21),
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
        10, "slash_ymd",  # nginx-error style YYYY/MM/DD (+opt frac)
        # trailing lookaheads: tz-suffixed slash dates belong to the
        # appended 45 (numeric) / 46 (named) — parsing them here would
        # silently drop the offset (wrong instant, s4 applies it)
        r"^(?P<dt>(?P<Y>\d{4})/(?P<M>\d{2})/(?P<D>\d{2}) "
        r"(?P<h>\d{2}):(?P<mi>\d{2}):(?P<s>\d{2})(?:\.(?P<f>\d{1,9}))?)"
        # (?![.\d]) first: without it the greedy frac backtracks one
        # digit to slip past the tz lookaheads (dt would end mid-frac)
        rf"(?![.\d])(?! ?[+-]\d{{2}})(?! (?:{_TZN_ALT})\b)",
        "ymd",
        tests=[
            ("2020/01/02 03:04:05 [error] 1#1", "2020-01-02 03:04:05", 0, 19),
            ("2020/01/02 03:04:05.500 squid", "2020-01-02 03:04:05.500000", 0, 23),
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
        r"(?P<h>\d{2}):(?P<mi>\d{2}):(?P<s>\d{2})(?:\.(?P<f>\d{1,9}))?"
        r"(?P<tz>[+-]\d{2}:\d{2}))",
        "ymd",
        tests=[
            ("2020-01-01T22:00:00-08:00 host app: m", "2020-01-02 06:00:00", 0, 25),
            ("2020-01-01T22:00:00.500+05:30 x", "2020-01-01 16:30:00.500000", 0, 29),
        ],
    ),
    # ---- round-2 families (ids stable, append-only) ----------------
    Pattern(
        14, "epoch_bare",
        # bare epoch seconds, frac 0-5 or 7-9 digits; exactly-6 is
        # pattern 7's (strace) — excluding it keeps the two disjoint
        # so the frozen winner-first pass is order-equivalent.
        # s4: squid/plain-epoch DTPDs, ere_datetimes_impl.rs:4661-4739.
        r"^(?P<dt>(?P<es>\d{9,11})(?:\.(?P<f>\d{7,9}|\d{1,5}))?)(?![\d.])",
        "epoch",
        tests=[
            ("1704112402.016 TCP_MISS/200", "2024-01-01 12:33:22.016000", 0, 14),
            ("1704112402 bare-epoch msg", "2024-01-01 12:33:22", 0, 10),
            ("1681160194.2601234 x", "2023-04-10 20:56:34.260123", 0, 18),
        ],
    ),
    Pattern(
        15, "epoch_ms13",  # 13-digit epoch milliseconds
        r"^(?P<dt>(?P<ems>\d{13}))(?!\d)",
        "epoch_ms",
        tests=[
            ("1704112402016 GET /index", "2024-01-01 12:33:22.016000", 0, 13),
        ],
    ),
    Pattern(
        16, "ctime_year",  # asctime(3): Mon Jan  2 15:04:05 2006
        rf"^(?P<dt>(?:{_DOW_ALT}) (?P<b>{_MON_ALT}) (?P<D>[ \d]\d) "
        rf"(?P<h>\d{{2}}):(?P<mi>\d{{2}}):(?P<s>\d{{2}}) (?P<Y>\d{{4}}))\b",
        "mon_name",
        tests=[
            ("Fri Jan  5 03:04:05 2024 kernel: up", "2024-01-05 03:04:05", 0, 24),
        ],
    ),
    Pattern(
        17, "syslog_lc_month",  # case-insensitive month (non-Title only)
        rf"^(?P<dt>(?P<b>{_MON_CI_ALT}) (?P<D>[ \d]\d) "
        rf"(?P<h>\d{{2}}):(?P<mi>\d{{2}}):(?P<s>\d{{2}}))(?! \d{{4}})",
        "mon_name",
        noyear=True,
        tests=[
            ("jan  5 03:04:05 host app: m", "2024-01-05 03:04:05", 0, 15),
            ("DEC 31 23:59:59 host x", "2024-12-31 23:59:59", 0, 15),
        ],
    ),
    Pattern(
        18, "dmy_slash",  # European day-first DD/MM/YYYY
        r"^(?P<dt>(?P<D>\d{2})/(?P<M>\d{2})/(?P<Y>\d{4}) "
        r"(?P<h>\d{2}):(?P<mi>\d{2}):(?P<s>\d{2}))(?! [AP]M\b)",
        "ymd",
        tests=[
            ("05/01/2024 03:04:05 info", "2024-01-05 03:04:05", 0, 19),
        ],
    ),
    Pattern(
        19, "dmy_dot",  # German-style DD.MM.YYYY
        r"^(?P<dt>(?P<D>\d{2})\.(?P<M>\d{2})\.(?P<Y>\d{4}) "
        r"(?P<h>\d{2}):(?P<mi>\d{2}):(?P<s>\d{2}))",
        "ymd",
        tests=[
            ("05.01.2024 03:04:05 fein", "2024-01-05 03:04:05", 0, 19),
        ],
    ),
    Pattern(
        20, "iso_named_tz",  # YYYY-MM-DD HH:MM:SS TZNAME
        rf"^(?P<dt>(?P<Y>\d{{4}})-(?P<M>\d{{2}})-(?P<D>\d{{2}})[T ]"
        rf"(?P<h>\d{{2}}):(?P<mi>\d{{2}}):(?P<s>\d{{2}})(?:\.(?P<f>\d{{1,9}}))?"
        rf" (?P<tzn>{_TZN_ALT}))\b",
        "ymd",
        tests=[
            ("2024-01-05 03:04:05 PST event", "2024-01-05 11:04:05", 0, 23),
            ("2024-01-05 03:04:05.123 IST x", "2024-01-04 21:34:05.123000", 0, 27),
        ],
    ),
    Pattern(
        21, "rfc5424_pri",  # syslog protocol: <pri>ver ISO±tz|Z
        r"^(?P<pre><\d{1,3}>\d{0,2} )"
        r"(?P<dt>(?P<Y>\d{4})-(?P<M>\d{2})-(?P<D>\d{2})T"
        r"(?P<h>\d{2}):(?P<mi>\d{2}):(?P<s>\d{2})(?:\.(?P<f>\d{1,9}))?"
        r"(?P<tz>Z|[+-]\d{2}:?\d{2}))",
        "ymd",
        dt_beg=None,
        tests=[
            ("<14>1 2024-01-05T03:04:05+05:30 host app - - - m", "2024-01-04 21:34:05", 6, 31),
            ("<165>1 2003-10-11T22:14:15.003Z mymachine", "2003-10-11 22:14:15.003000", 7, 31),
        ],
    ),
    Pattern(
        22, "mon_dy_year",  # Jan 02 2024 03:04:05
        rf"^(?P<dt>(?P<b>{_MON_ALT}) (?P<D>[ \d]\d) (?P<Y>\d{{4}}) "
        rf"(?P<h>\d{{2}}):(?P<mi>\d{{2}}):(?P<s>\d{{2}}))",
        "mon_name",
        tests=[
            ("Jan 05 2024 03:04:05 server x", "2024-01-05 03:04:05", 0, 20),
        ],
    ),
    Pattern(
        23, "android_logcat",  # MM-DD HH:MM:SS(.fff) — no year
        r"^(?P<dt>(?P<M>\d{2})-(?P<D>\d{2}) "
        r"(?P<h>\d{2}):(?P<mi>\d{2}):(?P<s>\d{2})(?:\.(?P<f>\d{1,9}))?)",
        "ymd",
        noyear=True,
        tests=[
            ("01-05 03:04:05.123 1234 5678 I tag: m", "2024-01-05 03:04:05.123000", 0, 18),
            ("12-31 23:59:59 x", "2024-12-31 23:59:59", 0, 14),
        ],
    ),
    Pattern(
        24, "apache_error",  # [Dow Mon DD HH:MM:SS(.ffffff) YYYY]
        rf"^(?P<pre>\[)(?P<dt>(?:{_DOW_ALT}) (?P<b>{_MON_ALT}) (?P<D>\d{{2}}) "
        rf"(?P<h>\d{{2}}):(?P<mi>\d{{2}}):(?P<s>\d{{2}})(?:\.(?P<f>\d{{1,9}}))?"
        rf" (?P<Y>\d{{4}}))\]",
        "mon_name",
        dt_beg=None,
        tests=[
            ("[Fri Jan 05 03:04:05.123456 2024] [core:notice] x", "2024-01-05 03:04:05.123456", 1, 32),
            ("[Fri Jan 05 03:04:05 2024] [mpm] y", "2024-01-05 03:04:05", 1, 25),
        ],
    ),
    Pattern(
        25, "win_iso_12h",  # YYYY-MM-DD hh:mm:ss AM/PM
        r"^(?P<dt>(?P<Y>\d{4})-(?P<M>\d{2})-(?P<D>\d{2}) "
        r"(?P<h12>\d{2}):(?P<mi>\d{2}):(?P<s>\d{2}) (?P<ampm>AM|PM))\b",
        "mdy12",
        tests=[
            ("2024-01-05 03:04:05 PM event", "2024-01-05 15:04:05", 0, 22),
            ("2024-01-05 12:04:05 AM event", "2024-01-05 00:04:05", 0, 22),
        ],
    ),
    Pattern(
        26, "epoch_us16",  # 16-digit epoch microseconds
        r"^(?P<dt>(?P<eu>\d{16}))(?!\d)",
        "epoch_us",
        tests=[
            ("1704112402016549 syscall enter", "2024-01-01 12:33:22.016549", 0, 16),
        ],
    ),
    Pattern(
        27, "ctime_noyear",  # Mon Jan  2 15:04:05 (no trailing year)
        # second lookahead keeps this disjoint from unix_date_tz (37):
        # 'Fri Jan  5 03:04:05 UTC 2024' must fall through
        rf"^(?P<dt>(?:{_DOW_ALT}) (?P<b>{_MON_ALT}) (?P<D>[ \d]\d) "
        rf"(?P<h>\d{{2}}):(?P<mi>\d{{2}}):(?P<s>\d{{2}}))(?! \d{{4}})"
        rf"(?! (?:{_TZN_ALT}) \d{{4}})",
        "mon_name",
        noyear=True,
        tests=[
            ("Fri Jan  5 03:04:05 host x", "2024-01-05 03:04:05", 0, 19),
        ],
    ),
    Pattern(
        28, "bracketed_iso",  # [YYYY-MM-DD HH:MM:SS(.f)]
        r"^(?P<pre>\[)(?P<dt>(?P<Y>\d{4})-(?P<M>\d{2})-(?P<D>\d{2})[T ]"
        r"(?P<h>\d{2}):(?P<mi>\d{2}):(?P<s>\d{2})(?:\.(?P<f>\d{1,9}))?)\]",
        "ymd",
        dt_beg=None,
        tests=[
            ("[2024-01-05 03:04:05] INFO x", "2024-01-05 03:04:05", 1, 20),
            ("[2024-01-05T03:04:05.123] DEBUG", "2024-01-05 03:04:05.123000", 1, 24),
        ],
    ),
    # ---- round-2 second batch (ids stable, append-only) -------------
    Pattern(
        29, "iso8601_zulu",  # RFC3339 Zulu: ...THH:MM:SS(.f)Z
        # pattern 1 excludes a trailing Z (lookahead), so Zulu lines
        # fall through to here and the Z is part of the matched span —
        # s4 treats Z as an explicit +00:00 (ere_datetimes_impl.rs:589).
        r"^(?P<dt>(?P<Y>\d{4})-(?P<M>\d{2})-(?P<D>\d{2})[T ]"
        r"(?P<h>\d{2}):(?P<mi>\d{2}):(?P<s>\d{2})(?:\.(?P<f>\d{1,9}))?"
        r"(?P<tz>Z))",
        "ymd",
        tests=[
            ("2024-01-05T03:04:05Z host x", "2024-01-05 03:04:05", 0, 20),
            ("2024-01-05T03:04:05.123Z y", "2024-01-05 03:04:05.123000", 0, 24),
        ],
    ),
    Pattern(
        30, "nagios_epoch",  # [1704112402] SERVICE ALERT: ...
        r"^(?P<pre>\[)(?P<dt>(?P<es>\d{9,11}))\]",
        "epoch",
        dt_beg=None,
        tests=[
            ("[1704112402] SERVICE ALERT: h;s", "2024-01-01 12:33:22", 1, 11),
        ],
    ),
    Pattern(
        31, "bash_history",  # HISTTIMEFORMAT marker: #<epoch>
        r"^(?P<pre>#)(?P<dt>(?P<es>\d{9,11}))(?![\d.])",
        "epoch",
        dt_beg=None,
        tests=[
            ("#1704112402", "2024-01-01 12:33:22", 1, 11),
        ],
    ),
    Pattern(
        32, "dd_mon_yyyy",  # 05 Jan 2024 03:04:05 (proftpd-ish)
        rf"^(?P<dt>(?P<D>\d{{2}}) (?P<b>{_MON_ALT}) (?P<Y>\d{{4}}) "
        rf"(?P<h>\d{{2}}):(?P<mi>\d{{2}}):(?P<s>\d{{2}}))",
        "mon_name",
        tests=[
            ("05 Jan 2024 03:04:05 info m", "2024-01-05 03:04:05", 0, 20),
        ],
    ),
    Pattern(
        33, "java_util_log",  # JUL SimpleFormatter: Jan 05, 2024 3:04:05 AM
        rf"^(?P<dt>(?P<b>{_MON_ALT}) (?P<D>\d{{2}}), (?P<Y>\d{{4}}) "
        rf"(?P<h12>\d{{1,2}}):(?P<mi>\d{{2}}):(?P<s>\d{{2}}) (?P<ampm>AM|PM))\b",
        "mon12",
        tests=[
            ("Jan 05, 2024 03:04:05 AM m", "2024-01-05 03:04:05", 0, 24),
            ("Jan 05, 2024 11:04:05 PM m", "2024-01-05 23:04:05", 0, 24),
            ("Jan 05, 2024 3:04:05 PM m", "2024-01-05 15:04:05", 0, 23),
        ],
    ),
    Pattern(
        34, "bracketed_iso_tz",  # JVM GC-log style: [ISO±tz|Z]
        # bracketed_iso (28) requires ']' right after secs/frac, so
        # tz-suffixed brackets fall through to here.
        r"^(?P<pre>\[)(?P<dt>(?P<Y>\d{4})-(?P<M>\d{2})-(?P<D>\d{2})[T ]"
        r"(?P<h>\d{2}):(?P<mi>\d{2}):(?P<s>\d{2})(?:\.(?P<f>\d{1,9}))?"
        r"(?P<tz>Z|[+-]\d{2}:?\d{2}))\]",
        "ymd",
        dt_beg=None,
        tests=[
            ("[2024-01-05T03:04:05+0000] GC pause", "2024-01-05 03:04:05", 1, 25),
            ("[2024-01-05T03:04:05.123-0800] x", "2024-01-05 11:04:05.123000", 1, 29),
            ("[2024-01-05T03:04:05.123Z] gc", "2024-01-05 03:04:05.123000", 1, 25),
        ],
    ),
    Pattern(
        35, "ymd_dash_time",  # YYYY-MM-DD-HH:MM:SS (dash joins time)
        r"^(?P<dt>(?P<Y>\d{4})-(?P<M>\d{2})-(?P<D>\d{2})-"
        r"(?P<h>\d{2}):(?P<mi>\d{2}):(?P<s>\d{2}))",
        "ymd",
        tests=[
            ("2024-01-05-03:04:05 backup done", "2024-01-05 03:04:05", 0, 19),
        ],
    ),
    Pattern(
        36, "compact_ymd_space",  # YYYYMMDD HHMMSS
        r"^(?P<dt>(?P<Y>\d{4})(?P<M>\d{2})(?P<D>\d{2}) "
        r"(?P<h>\d{2})(?P<mi>\d{2})(?P<s>\d{2}))(?!\d)",
        "ymd",
        tests=[
            ("20240105 030405 snapshot ok", "2024-01-05 03:04:05", 0, 15),
        ],
    ),
    # ---- round-2 third batch (ids stable, append-only) --------------
    Pattern(
        37, "unix_date_tz",  # unix date(1): Fri Jan  5 03:04:05 UTC 2024
        # ctime_noyear (27) excludes the ' TZN YYYY' tail by lookahead
        rf"^(?P<dt>(?:{_DOW_ALT}) (?P<b>{_MON_ALT}) (?P<D>[ \d]\d) "
        rf"(?P<h>\d{{2}}):(?P<mi>\d{{2}}):(?P<s>\d{{2}}) "
        rf"(?P<tzn>{_TZN_ALT}) (?P<Y>\d{{4}}))\b",
        "mon_name",
        tests=[
            ("Fri Jan  5 03:04:05 UTC 2024 up", "2024-01-05 03:04:05", 0, 28),
            ("Fri Jan  5 03:04:05 PST 2024 x", "2024-01-05 11:04:05", 0, 28),
        ],
    ),
    Pattern(
        38, "apache_nobracket",  # DD/Mon/YYYY:HH:MM:SS ±zzzz, no []
        rf"^(?P<dt>(?P<D>\d{{2}})/(?P<b>{_MON_ALT})/(?P<Y>\d{{4}}):"
        rf"(?P<h>\d{{2}}):(?P<mi>\d{{2}}):(?P<s>\d{{2}}) (?P<tz>[+-]\d{{4}}))\b",
        "mon_name",
        tests=[
            ("05/Jan/2024:03:04:05 +0000 GET /", "2024-01-05 03:04:05", 0, 26),
            ("05/Jan/2024:03:04:05 -0800 GET /", "2024-01-05 11:04:05", 0, 26),
        ],
    ),
    Pattern(
        39, "iso_tz_hour",  # ISO with bare-hours offset: ...+08
        # pattern 1's lookahead excludes any ±\d\d suffix, so these
        # fall through; the trailing lookahead rejects ±hhmm / ±hh:mm
        # prefixes (those belong to 0 / 13), keeping the bank disjoint.
        r"^(?P<dt>(?P<Y>\d{4})-(?P<M>\d{2})-(?P<D>\d{2})[T ]"
        r"(?P<h>\d{2}):(?P<mi>\d{2}):(?P<s>\d{2})(?:\.(?P<f>\d{1,9}))?"
        r" ?(?P<tz>[+-]\d{2}))(?![\d:])",
        "ymd",
        tests=[
            ("2024-01-05T03:04:05+08 x", "2024-01-04 19:04:05", 0, 22),
            ("2024-01-05 03:04:05.5-11 y", "2024-01-05 14:04:05.500000", 0, 24),
        ],
    ),
    Pattern(
        40, "gc_uptime_s",  # JVM GC log: [12345.123s] (bank-only:
        # the synthetic corpus keeps one uptime family (8) because the
        # boot-anchor derivation is per-conv; embedded tests cover this)
        r"^(?P<pre>\[)(?P<dt>(?P<us_>\d{1,9})\.(?P<f>\d{3}))s\]",
        "uptime",
        dt_beg=None,
        tests=[
            ("[12345.123s] GC pause young", 12345123000, 1, 10),
            ("[0.004s] Using G1", 4000, 1, 6),
        ],
    ),
    # ---- round-2 fourth batch (ids stable, append-only) --------------
    Pattern(
        41, "iso_minute",  # minute-resolution ISO: YYYY-MM-DD HH:MM
        # every other ISO family requires :ss, so these fall through;
        # the lookahead rejects second/fraction/digit continuations.
        r"^(?P<dt>(?P<Y>\d{4})-(?P<M>\d{2})-(?P<D>\d{2})[T ]"
        r"(?P<h>\d{2}):(?P<mi>\d{2}))(?![:.\d])",
        "ymd",
        tests=[
            ("2024-01-05 03:04 backup start", "2024-01-05 03:04:00", 0, 16),
            ("2024-01-05T03:04 cron", "2024-01-05 03:04:00", 0, 16),
        ],
    ),
    Pattern(
        42, "full_month_dmy",  # %B: 05 January 2024 03:04:05 (bank-only:
        # 'DD May YYYY' would be corpus-ambiguous with dd_mon_yyyy, so
        # the synthetic corpus does not emit this family; embedded
        # tests cover it)
        rf"^(?P<dt>(?P<D>\d{{2}}) (?P<bf>{_MON_FULL_ALT}) (?P<Y>\d{{4}}) "
        rf"(?P<h>\d{{2}}):(?P<mi>\d{{2}}):(?P<s>\d{{2}}))",
        "mon_name",
        tests=[
            ("05 January 2024 03:04:05 msg", "2024-01-05 03:04:05", 0, 24),
            ("31 December 2023 23:59:59 y", "2023-12-31 23:59:59", 0, 25),
        ],
    ),
    Pattern(
        43, "win_cbs",  # Windows CBS.log: ISO secs + ', Info CBS ...'
        # pattern 1's catch-all lookahead excludes a trailing comma and
        # iso_comma_frac (9) requires digits after it, so ', <word>'
        # lines land here; the comma stays outside the dt span.
        r"^(?P<dt>(?P<Y>\d{4})-(?P<M>\d{2})-(?P<D>\d{2})[T ]"
        r"(?P<h>\d{2}):(?P<mi>\d{2}):(?P<s>\d{2}))(?=, )",
        "ymd",
        tests=[
            ("2024-01-05 03:04:05, Info CBS Starting", "2024-01-05 03:04:05", 0, 19),
        ],
    ),
    Pattern(
        44, "mdy_slash_yy",  # %y 2-digit year: 01/05/24 03:04:05
        # disjoint from the 4-digit-year slash families by construction
        # (their year digits collide with this one's required space);
        # y2 maps through chrono's %y pivot (<=68 -> 20xx, else 19xx).
        r"^(?P<dt>(?P<M>\d{2})/(?P<D>\d{2})/(?P<y2>\d{2}) "
        r"(?P<h>\d{2}):(?P<mi>\d{2}):(?P<s>\d{2}))(?! [AP]M\b)",
        "ymd",
        tests=[
            ("01/05/24 03:04:05 event ok", "2024-01-05 03:04:05", 0, 17),
            ("12/31/99 23:59:59 y2k-eve", "1999-12-31 23:59:59", 0, 17),
        ],
    ),
    # ---- round-2 fifth batch (ids stable, append-only; shapes mined
    # from the reference's DTPD test cases, ere_datetimes_impl.rs) ----
    Pattern(
        45, "slash_ymd_numtz",  # 2000/01/02 00:00:02(.123) -1100|−08|+05:30
        r"^(?P<dt>(?P<Y>\d{4})/(?P<M>\d{2})/(?P<D>\d{2}) "
        r"(?P<h>\d{2}):(?P<mi>\d{2}):(?P<s>\d{2})(?:\.(?P<f>\d{1,9}))?"
        r" ?(?P<tz>[+-]\d{2}(?::?\d{2})?))(?![\d:])",
        "ymd",
        tests=[
            ("2024/01/05 03:04:05 -0800 a", "2024-01-05 11:04:05", 0, 25),
            ("2024/01/05 03:04:05.123 -08 b", "2024-01-05 11:04:05.123000", 0, 27),
        ],
    ),
    Pattern(
        46, "slash_ymd_namedtz",  # 2000/01/05 00:00:05 PETT
        rf"^(?P<dt>(?P<Y>\d{{4}})/(?P<M>\d{{2}})/(?P<D>\d{{2}}) "
        rf"(?P<h>\d{{2}}):(?P<mi>\d{{2}}):(?P<s>\d{{2}})(?:\.(?P<f>\d{{1,9}}))?"
        rf" (?P<tzn>{_TZN_ALT}))\b",
        "ymd",
        tests=[
            ("2024/01/05 03:04:05 PST event", "2024-01-05 11:04:05", 0, 23),
        ],
    ),
    Pattern(
        47, "commonlog_apache",  # 192.168.0.8 - - [07/Mar/2020:06:30:43 -0800]
        # the one non-line-anchored family: s4's range_regex scans a
        # bounded prefix REGION, not byte 0 — the common-log host/ident/
        # user tokens precede the bracketed datetime (DTPD test cases
        # '192.168.0.8 - - [...]', ere_datetimes_impl.rs)
        rf"^(?P<pre>\S+ \S+ \S+ \[)(?P<dt>(?P<D>\d{{2}})/(?P<b>{_MON_ALT})/"
        rf"(?P<Y>\d{{4}}):(?P<h>\d{{2}}):(?P<mi>\d{{2}}):(?P<s>\d{{2}})"
        rf" (?P<tz>[+-]\d{{4}}))\]",
        "mon_name",
        dt_beg=None,
        tests=[
            (
                '192.168.0.8 - - [05/Jan/2024:03:04:05 -0800] "GET /"',
                "2024-01-05 11:04:05", 17, 43,
            ),
        ],
    ),
    Pattern(
        48, "slash_ymd_dashtime",  # 2000/01/02 05-01-32(.123)
        r"^(?P<dt>(?P<Y>\d{4})/(?P<M>\d{2})/(?P<D>\d{2}) "
        r"(?P<h>\d{2})-(?P<mi>\d{2})-(?P<s>\d{2})(?:\.(?P<f>\d{1,9}))?)"
        r"(?![.\d])(?! ?[+-]\d{2})",
        "ymd",
        tests=[
            ("2024/01/05 03-04-05 backup", "2024-01-05 03:04:05", 0, 19),
        ],
    ),
    Pattern(
        49, "iso_dashtime",  # 2017-05-14 04-00-07: report start
        r"^(?P<dt>(?P<Y>\d{4})-(?P<M>\d{2})-(?P<D>\d{2}) "
        r"(?P<h>\d{2})-(?P<mi>\d{2})-(?P<s>\d{2}))(?![\d-])",
        "ymd",
        tests=[
            ("2024-01-05 03-04-05: report start", "2024-01-05 03:04:05", 0, 19),
        ],
    ),
    # ---- round-2 sixth batch (ids stable, append-only; more
    # reference DTPD fixture shapes: tab-angle / space-curly mid-line
    # datetimes, compact-colon, plus-separated dash-time) -------------
    Pattern(
        50, "angle_dd_mon",  # 192.168.0.172\t<11-oct-2022 00:10:26+0100>
        rf"^(?P<pre>\S+\t<)(?P<dt>(?P<D>\d{{2}})-(?P<b>{_MON_ALT}|{_MON_CI_ALT})-"
        rf"(?P<Y>\d{{4}}) (?P<h>\d{{2}}):(?P<mi>\d{{2}}):(?P<s>\d{{2}})"
        rf"(?:\.(?P<f>\d{{1,9}}))?(?: ?(?P<tz>[+-]\d{{2}}(?::?\d{{2}})?))?)>",
        "mon_name",
        dt_beg=None,
        tests=[
            (
                "192.168.0.8\t<05-jan-2024 03:04:05-0800> fw drop",
                "2024-01-05 11:04:05", 13, 38,
            ),
            (
                "192.168.0.8\t<05-Oct-2024 00:10:26> fw",
                "2024-10-05 00:10:26", 13, 33,
            ),
        ],
    ),
    Pattern(
        51, "curly_dd_mon_slash",  # 192.168.0.8 - - {11/oct/2022 ... +0100}
        rf"^(?P<pre>\S+ \S+ \S+ \{{)(?P<dt>(?P<D>\d{{2}})/"
        rf"(?P<b>{_MON_ALT}|{_MON_CI_ALT})/(?P<Y>\d{{4}}) "
        rf"(?P<h>\d{{2}}):(?P<mi>\d{{2}}):(?P<s>\d{{2}}) (?P<tz>[+-]\d{{4}}))\}}",
        "mon_name",
        dt_beg=None,
        tests=[
            (
                '192.168.0.8 - - {05/jan/2024 03:04:05 +0000} "GET /"',
                "2024-01-05 03:04:05", 17, 43,
            ),
        ],
    ),
    Pattern(
        52, "compact_colon_ms",  # 20000102:070832.123 -1100
        r"^(?P<dt>(?P<Y>\d{4})(?P<M>\d{2})(?P<D>\d{2}):"
        r"(?P<h>\d{2})(?P<mi>\d{2})(?P<s>\d{2})\.(?P<f>\d{3})"
        r" (?P<tz>[+-]\d{4}))(?!\d)",
        "ymd",
        tests=[
            ("20240105:030405.123 -0800 abc", "2024-01-05 11:04:05.123000", 0, 25),
        ],
    ),
    Pattern(
        53, "iso_plus_dashtime",  # 2019-01-29+02-07-27.809
        r"^(?P<dt>(?P<Y>\d{4})-(?P<M>\d{2})-(?P<D>\d{2})\+"
        r"(?P<h>\d{2})-(?P<mi>\d{2})-(?P<s>\d{2})(?:\.(?P<f>\d{1,9}))?)"
        r"(?![.\d])",
        "ymd",
        tests=[
            ("2024-01-29+02-07-27.809 sess", "2024-01-29 02:07:27.809000", 0, 23),
        ],
    ),
    # ---- round-2 seventh batch (ids stable, append-only) -------------
    Pattern(
        54, "mdy_colon_time",  # ie4uinit-style MM/DD/YYYY:HH:MM:SS:
        # colon joins date and time, so this is textually disjoint from
        # every space-joined slash-date family (11/18/38/44)
        r"^(?P<dt>(?P<M>\d{2})/(?P<D>\d{2})/(?P<Y>\d{4}):"
        r"(?P<h>\d{2}):(?P<mi>\d{2}):(?P<s>\d{2}))",
        "ymd",
        tests=[
            ("02/21/2023:06:27:45: Starting x", "2023-02-21 06:27:45", 0, 19),
        ],
    ),
    Pattern(
        55, "paren_slash_tz",  # (2000/01/01 00:00:02.123 -1100) smbd
        r"^(?P<pre>\()(?P<dt>(?P<Y>\d{4})/(?P<M>\d{2})/(?P<D>\d{2}) "
        r"(?P<h>\d{2}):(?P<mi>\d{2}):(?P<s>\d{2})(?:\.(?P<f>\d{1,9}))?"
        r" (?P<tz>[+-]\d{4}))\)",
        "ymd",
        dt_beg=None,
        tests=[
            ("(2024/01/05 03:04:05 -0800) oplock", "2024-01-05 11:04:05", 1, 26),
            ("(2024/01/05 03:04:05.123 -0800) x", "2024-01-05 11:04:05.123000", 1, 30),
        ],
    ),
    Pattern(
        56, "star_rfc2822_tz",  # *Tue, Jun 28 01:51:12 2022 +01:30
        rf"^(?P<pre>\*{{1,3}})(?P<dt>(?:{_DOW_ALT}), (?P<b>{_MON_ALT}) "
        rf"(?P<D>[ \d]\d) (?P<h>\d{{2}}):(?P<mi>\d{{2}}):(?P<s>\d{{2}}) "
        rf"(?P<Y>\d{{4}}) (?P<tz>[+-]\d{{2}}:\d{{2}}))\b",
        "mon_name",
        dt_beg=None,
        tests=[
            ("*Fri, Jan  5 03:04:05 2024 +05:30 X", "2024-01-04 21:34:05", 1, 33),
        ],
    ),
    Pattern(
        57, "compact_upper_mon",  # 11OCT2022T001026Z (compact %d%b%Y)
        rf"^(?P<dt>(?P<D>\d{{2}})(?P<b>{'|'.join(m.upper() for m in MONTHS)})"
        rf"(?P<Y>\d{{4}})T(?P<h>\d{{2}})(?P<mi>\d{{2}})(?P<s>\d{{2}})"
        rf"(?P<tz>Z)?)(?!\d)",
        "mon_name",
        tests=[
            ("05JAN2024T030405Z route", "2024-01-05 03:04:05", 0, 17),
            ("05JAN2024T030405 route", "2024-01-05 03:04:05", 0, 16),
        ],
    ),
]

CONTINUATION_SINK = "continuation"
SINK_NAMES = [p.name for p in PATTERNS] + [CONTINUATION_SINK]
