"""Behavioral DTPD coverage audit against the reference's 188-entry table.

The reference validates every DateTimeParseInstr with embedded test
cases (test_DATETIME_PARSE_DATAS_test_cases,
subprojects/ere/ere_datetimes_impl/src/ere_datetimes_impl.rs:2078-2087).
This tool extracts those exact (haystack, expected-instant) cases from
the table (ere_datetimes_impl.rs:2317-6439, DATETIME_PARSE_DATAS_LEN_MAX
= 188 at :6439) and replays them through OUR bank
(super_speedy_syslog_searcher_spark.functions.datetime_parse.parse_series)
— a behavioral mapping of every reference DTPD onto the family that
covers it, far stronger than a by-eye regex comparison.

Coverage rule per test case: parse_series (anchor_year = the case's
expected year, matching s4 passing the file-mtime year) must produce
the same UTC instant, truncated to microseconds (Spark timestamps are
µs; the reference stores ns).  O_L ("local") entries compare naive.
An entry is COVERED when every case passes, PARTIAL when some do,
UNCOVERED when none do.

Usage:  python tools/dtpd_audit.py [--json out.json] [--md out.md]
Exit status 0 always (the pytest gate asserts the threshold).
"""

from __future__ import annotations

import argparse
import datetime as dt
import json
import os
import re
import sys

REF = "/root/reference/subprojects/ere/ere_datetimes_impl/src/ere_datetimes_impl.rs"

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


# ------------------------------------------------------------ extraction

def _offset_consts(src: str) -> dict[str, int]:
    """O_* named-offset seconds (ere_datetimes_impl.rs:209-333)."""
    out = {"YD": 1972}
    pat = re.compile(r"pub const (O_\w+|YEAR_\w+|YD): \w+ = ([^;]+);")
    pending = pat.findall(src)
    for _ in range(4):  # consts reference earlier consts; fixpoint
        rest = []
        for name, expr in pending:
            expr = expr.strip().replace("i32::MAX", "2147483647")
            try:
                out[name] = int(eval(expr, {}, dict(out)))  # arithmetic only
            except Exception:
                rest.append((name, expr))
        pending = rest
    return out


def _unescape(body: str, raw: bool) -> bytes:
    if raw:
        return body.encode("utf-8")
    out = bytearray()
    i = 0
    while i < len(body):
        c = body[i]
        if c == "\\" and i + 1 < len(body):
            n = body[i + 1]
            if n == "x":
                out.append(int(body[i + 2 : i + 4], 16))
                i += 4
                continue
            mapped = {"n": 10, "r": 13, "t": 9, "0": 0, "\\": 92, '"': 34}.get(n)
            if mapped is not None:
                out.append(mapped)
                i += 2
                continue
        out.extend(c.encode("utf-8"))
        i += 1
    return bytes(out)


_TEST_RE = re.compile(
    r"\(\s*(\d+),\s*(\d+),\s*\(([^()]*)\),\s*(br?)\"((?:\\.|[^\"\\])*)\""
)
# raw-hash byte strings: br#"..."# (haystacks containing quotes)
_TEST_RE_HASH = re.compile(
    r"\(\s*(\d+),\s*(\d+),\s*\(([^()]*)\),\s*(br?)#\"(.*?)\"#"
)


def extract_entries() -> list[dict]:
    src = open(REF, encoding="utf-8", errors="replace").read()
    consts = _offset_consts(src)
    chunks = src.split("ERE_REGEX_DATETIME!(")[1:]
    entries = []
    for idx, ch in enumerate(chunks, start=1):
        ch = ch.split("line!(),")[0]
        dtfs = re.search(r"DTFSS_\w+", ch)
        cases = []
        for m in list(_TEST_RE.finditer(ch)) + list(
            _TEST_RE_HASH.finditer(ch)
        ):
            raw_hash = m.re is _TEST_RE_HASH
            beg, end = int(m.group(1)), int(m.group(2))
            args = [a.strip() for a in m.group(3).split(",")]
            if len(args) != 8:
                continue
            vals = [consts.get(a, a) for a in args]
            try:
                off_s = int(vals[0])
                y, mo, d, h, mi, s, ns = (int(v) for v in vals[1:])
            except (TypeError, ValueError):
                continue
            text = _unescape(
                m.group(5), raw_hash or m.group(4) == "br"
            ).decode("utf-8", errors="replace")
            cases.append(
                {
                    "beg": beg,
                    "end": end,
                    "off_s": off_s,
                    "ymdhmsn": (y, mo, d, h, mi, s, ns),
                    "text": text,
                }
            )
        entries.append(
            {
                "entry": idx,
                "dtfs": dtfs.group(0) if dtfs else "?",
                "cases": cases,
            }
        )
    return entries


# ---------------------------------------------------- contradictions
#
# The reference validates each DTPD entry's regex ALONE
# (test_DATETIME_PARSE_DATAS_test_cases); at actual runtime the table
# is tried in order and the first match wins.  A few embedded cases of
# the no-tz fallback entries (64, 148, 153) reuse the haystack shape —
# in four cases the BYTE-IDENTICAL haystack — of an earlier
# tz-capturing entry (60, 146, 152) whose embedded case expects the
# tz SHIFTED.  One deterministic bank can satisfy at most one side of
# each pair; we implement the runtime winner (the earlier, tz-shifting
# entry).  A failing case is reclassified CONTRADICTED only when a
# machine-checked twin exists: a PASSING case of another entry whose
# normalized shape is identical and whose tz shift explains our
# output exactly.

_DIGITS = re.compile(r"\d+")
_DT_START = re.compile(
    r"(?i)\b(?:mon(?:day)?|tue(?:sday)?|wed(?:nesday)?|thu(?:rsday)?"
    r"|fri(?:day)?|sat(?:urday)?|sun(?:day)?)\b"
)
_TZ_TAIL = re.compile(
    r"(#:#(?:\.#)?(?:\s+#)?\s+(?:[+-−]#(?::?#)?|[a-z]{1,5}))\b"
)


def _shape(text: str) -> str:
    """Digit-normalized, case-folded shape of the datetime region:
    from the weekday token through the tz token (trailing message
    text dropped) — identical for a contradiction pair that differs
    only in day digits or in the pre/post message words."""
    t = _DIGITS.sub("#", text.lower())
    m = _DT_START.search(t)
    if m:
        t = t[m.start():]
    m = _TZ_TAIL.search(t)
    if m:
        t = t[: m.end(1)]
    return t


def find_contradiction(case, got, entries, results):
    """Return (twin_entry, twin_text) iff a passing case of another
    entry has the same shape AND shifting this case's naive expected
    instant by the twin's utc offset reproduces our output."""
    import pandas as pd

    if pd.isna(got):
        return None
    sh = _shape(case["text"])
    naive = expected_utc(case)  # O_L cases: naive == expected
    for e in entries:
        for t in e["cases"]:
            if t is case or t["off_s"] in (0, 2147483647):
                continue
            if not results.get((e["entry"], t["text"]), False):
                continue
            if _shape(t["text"]) != sh:
                continue
            if got.to_pydatetime() == naive - dt.timedelta(
                seconds=t["off_s"]
            ):
                return (e["entry"], t["text"])
    return None


# ------------------------------------------------------------- replay

def expected_utc(case: dict) -> dt.datetime:
    y, mo, d, h, mi, s, ns = case["ymdhmsn"]
    naive = dt.datetime(y, mo, d, h, mi, s, (ns // 1000) % 1_000_000)
    if ns // 1000 >= 1_000_000:  # second-overflow ns (never in table)
        naive += dt.timedelta(seconds=ns // 1_000_000_000)
    if case["off_s"] == 2147483647:  # O_L: local/no-tz — compare naive
        return naive
    return naive - dt.timedelta(seconds=case["off_s"])


def run_audit() -> dict:
    import pandas as pd

    from super_speedy_syslog_searcher_spark.functions.datetime_parse import (
        parse_series,
    )

    entries = extract_entries()
    # pass 1: replay every case, record pass/fail + our output
    results = {}  # (entry, text) -> bool
    records = []  # (entry_dict, case, exp, got, pid)
    for e in entries:
        for c in e["cases"]:
            exp = expected_utc(c)
            res = parse_series(
                pd.Series([c["text"]]), anchor_year=c["ymdhmsn"][0]
            ).iloc[0]
            got = res["ts_parsed"]
            if pd.isna(got) and pd.notna(res["uptime_us"]):
                # uptime entries: the reference's expected instant is
                # epoch + uptime (boot anchoring happens downstream)
                got = pd.Timestamp(int(res["uptime_us"]) * 1000)
            ok = pd.notna(got) and got.to_pydatetime() == exp
            results[(e["entry"], c["text"])] = ok
            pid = (
                int(res["pattern_id"])
                if pd.notna(res["pattern_id"])
                else None
            )
            records.append((e, c, exp, got, pid))
    # pass 2: reclassify entry-isolation contradictions (twin-checked)
    rows_by_entry = {}
    for e, c, exp, got, pid in records:
        r = rows_by_entry.setdefault(
            e["entry"],
            {
                "entry": e["entry"],
                "dtfs": e["dtfs"],
                "n_cases": 0,
                "n_pass": 0,
                "n_contradicted": 0,
                "status": "",
                "families": set(),
                "fails": [],
                "contradicted": [],
            },
        )
        r["n_cases"] += 1
        if results[(e["entry"], c["text"])]:
            r["n_pass"] += 1
            r["families"].add(pid)
            continue
        twin = find_contradiction(c, got, entries, results)
        if twin is not None:
            r["n_contradicted"] += 1
            r["contradicted"].append(
                {
                    "text": c["text"][:72],
                    "expected": exp.isoformat(),
                    "got": got.isoformat() if pd.notna(got) else None,
                    "twin_entry": twin[0],
                    "twin_text": twin[1][:72],
                }
            )
        else:
            r["fails"].append(
                {
                    "text": c["text"][:72],
                    "expected": exp.isoformat(),
                    "got": got.isoformat() if pd.notna(got) else None,
                    "pid": pid,
                }
            )
    rows = []
    for e in entries:
        r = rows_by_entry[e["entry"]]
        r["families"] = sorted(p for p in r["families"] if p is not None)
        n, np_, nc = r["n_cases"], r["n_pass"], r["n_contradicted"]
        if n and np_ == n:
            r["status"] = "COVERED"
        elif n and np_ + nc == n:
            r["status"] = "COVERED*"  # only contradicted cases fail
        elif np_:
            r["status"] = "PARTIAL"
        else:
            r["status"] = "UNCOVERED"
        rows.append(r)
    covered = sum(r["status"] == "COVERED" for r in rows)
    covered_c = sum(r["status"] == "COVERED*" for r in rows)
    partial = sum(r["status"] == "PARTIAL" for r in rows)
    cases_total = sum(r["n_cases"] for r in rows)
    cases_pass = sum(r["n_pass"] for r in rows)
    cases_contra = sum(r["n_contradicted"] for r in rows)
    return {
        "entries_total": len(rows),
        "covered": covered,
        "covered_contradicted": covered_c,
        "partial": partial,
        "uncovered": len(rows) - covered - covered_c - partial,
        "cases_total": cases_total,
        "cases_pass": cases_pass,
        "cases_contradicted": cases_contra,
        "rows": rows,
    }


def write_md(audit: dict, path: str) -> None:
    with open(path, "w") as f:
        f.write(
            "# DTPD coverage audit\n\n"
            "Behavioral replay of every reference DTPD embedded test case\n"
            "(ere_datetimes_impl.rs:2317-6439) through our pattern bank —\n"
            "regenerate with `python tools/dtpd_audit.py`.\n\n"
            f"**{audit['covered']}/{audit['entries_total']} entries fully "
            f"covered + {audit['covered_contradicted']} covered modulo "
            f"machine-verified entry-isolation contradictions "
            f"(COVERED\\*)** ({audit['partial']} partial, "
            f"{audit['uncovered']} uncovered); "
            f"{audit['cases_pass']}/{audit['cases_total']} individual "
            f"test cases pass and the remaining "
            f"{audit['cases_contradicted']} are CONTRADICTED: the "
            "reference validates each DTPD entry's regex in isolation, "
            "and these cases of the no-tz fallback entries reuse the "
            "haystack shape — four of them the byte-identical haystack "
            "— of an earlier tz-capturing entry whose own embedded case "
            "expects the tz SHIFTED.  One deterministic bank can "
            "satisfy at most one side of each pair; we implement the "
            "runtime winner (reference table order tries the earlier, "
            "tz-shifting entry first).  Each is verified below against "
            "its passing twin.\n\n"
            "| entry | dtfs recipe | cases | pass | status | our families |\n"
            "|---|---|---|---|---|---|\n"
        )
        for r in audit["rows"]:
            fams = ",".join(str(p) for p in r["families"]) or "—"
            f.write(
                f"| {r['entry']} | {r['dtfs'][6:]} | {r['n_cases']} | "
                f"{r['n_pass']} | {r['status']} | {fams} |\n"
            )
        f.write("\n## Contradicted cases (proof: passing twin)\n\n")
        for r in audit["rows"]:
            for x in r["contradicted"]:
                f.write(
                    f"- entry {r['entry']} ({r['dtfs'][6:]}): "
                    f"`{x['text']}` expects {x['expected']} naive, but "
                    f"entry {x['twin_entry']}'s PASSING twin "
                    f"`{x['twin_text']}` (same shape) expects the tz "
                    f"shift we apply → {x['got']}\n"
                )
        f.write("\n## Failing cases (first per entry)\n\n")
        wrote = False
        for r in audit["rows"]:
            if r["fails"]:
                wrote = True
                x = r["fails"][0]
                f.write(
                    f"- entry {r['entry']} ({r['dtfs'][6:]}): "
                    f"`{x['text']}` → expected {x['expected']}, "
                    f"got {x['got']} (pid {x['pid']})\n"
                )
        if not wrote:
            f.write("(none)\n")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--md", default=None)
    a = ap.parse_args()
    audit = run_audit()
    print(
        f"{audit['covered']}/{audit['entries_total']} covered "
        f"+ {audit['covered_contradicted']} covered*, "
        f"{audit['partial']} partial, {audit['uncovered']} uncovered; "
        f"cases {audit['cases_pass']}/{audit['cases_total']} "
        f"+ {audit['cases_contradicted']} contradicted(twin-verified)"
    )
    if a.json:
        slim = dict(audit)
        with open(a.json, "w") as f:
            json.dump(slim, f, indent=1)
    if a.md:
        write_md(audit, a.md)
