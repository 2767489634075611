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
    rows = []
    for e in entries:
        n_pass = 0
        matched_pids = set()
        fails = []
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
            if ok:
                n_pass += 1
                matched_pids.add(int(res["pattern_id"]))
            else:
                fails.append(
                    {
                        "text": c["text"][:72],
                        "expected": exp.isoformat(),
                        "got": (
                            got.isoformat() if pd.notna(got) else None
                        ),
                        "pid": (
                            int(res["pattern_id"])
                            if pd.notna(res["pattern_id"])
                            else None
                        ),
                    }
                )
        n = len(e["cases"])
        status = (
            "COVERED"
            if n and n_pass == n
            else ("PARTIAL" if n_pass else "UNCOVERED")
        )
        rows.append(
            {
                "entry": e["entry"],
                "dtfs": e["dtfs"],
                "n_cases": n,
                "n_pass": n_pass,
                "status": status,
                "families": sorted(matched_pids),
                "fails": fails,
            }
        )
    covered = sum(r["status"] == "COVERED" for r in rows)
    partial = sum(r["status"] == "PARTIAL" for r in rows)
    cases_total = sum(r["n_cases"] for r in rows)
    cases_pass = sum(r["n_pass"] for r in rows)
    return {
        "entries_total": len(rows),
        "covered": covered,
        "partial": partial,
        "uncovered": len(rows) - covered - partial,
        "cases_total": cases_total,
        "cases_pass": cases_pass,
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
            f"covered** ({audit['partial']} partial, {audit['uncovered']} "
            f"uncovered); {audit['cases_pass']}/{audit['cases_total']} "
            "individual test cases pass.\n\n"
            "| entry | dtfs recipe | cases | pass | status | our families |\n"
            "|---|---|---|---|---|---|\n"
        )
        for r in audit["rows"]:
            fams = ",".join(str(p) for p in r["families"]) or "—"
            f.write(
                f"| {r['entry']} | {r['dtfs'][6:]} | {r['n_cases']} | "
                f"{r['n_pass']} | {r['status']} | {fams} |\n"
            )
        f.write("\n## Failing cases (first per entry)\n\n")
        for r in audit["rows"]:
            if r["fails"]:
                x = r["fails"][0]
                f.write(
                    f"- entry {r['entry']} ({r['dtfs'][6:]}): "
                    f"`{x['text']}` → expected {x['expected']}, "
                    f"got {x['got']} (pid {x['pid']})\n"
                )


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--md", default=None)
    a = ap.parse_args()
    audit = run_audit()
    print(
        f"{audit['covered']}/{audit['entries_total']} covered, "
        f"{audit['partial']} partial, {audit['uncovered']} uncovered; "
        f"cases {audit['cases_pass']}/{audit['cases_total']}"
    )
    if a.json:
        slim = dict(audit)
        with open(a.json, "w") as f:
            json.dump(slim, f, indent=1)
    if a.md:
        write_md(audit, a.md)
