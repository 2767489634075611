"""CLI datetime-filter grammar (s4's 95-pattern table, core subset —
src/s4/s4.rs:552-559,3537,3614) + end-to-end CLI run."""

from __future__ import annotations

import datetime as dt
import subprocess
import sys

import pytest

from super_speedy_syslog_searcher_spark.cli import (
    parse_dt_filter,
    resolve_filters,
)

NOW = dt.datetime(2024, 6, 1, 12, 0, 0)


@pytest.mark.parametrize(
    "value,expected",
    [
        ("2024-01-10", dt.datetime(2024, 1, 10)),
        ("2024-01-10T05:30", dt.datetime(2024, 1, 10, 5, 30)),
        ("2024-01-10 05:30:07", dt.datetime(2024, 1, 10, 5, 30, 7)),
        ("2024-01-10T05:30:07.123", dt.datetime(2024, 1, 10, 5, 30, 7, 123000)),
        ("2024-01-10T05:30:07Z", dt.datetime(2024, 1, 10, 5, 30, 7)),
        ("2024-01-10T05:30:07+0530", dt.datetime(2024, 1, 10, 0, 0, 7)),
        ("2024-01-10T05:30:07-0800", dt.datetime(2024, 1, 10, 13, 30, 7)),
        ("-1d", NOW - dt.timedelta(days=1)),
        ("-1w2d3h", NOW - dt.timedelta(weeks=1, days=2, hours=3)),
        ("+30m", NOW + dt.timedelta(minutes=30)),
    ],
)
def test_filter_grammar(value, expected):
    assert parse_dt_filter(value, now=NOW) == expected


def test_at_anchoring():
    a, b = resolve_filters("2024-01-10", "@+5d", now=NOW)
    assert a == dt.datetime(2024, 1, 10)
    assert b == dt.datetime(2024, 1, 15)
    a, b = resolve_filters("@-2h", "2024-01-20T10:00", now=NOW)
    assert b == dt.datetime(2024, 1, 20, 10)
    assert a == dt.datetime(2024, 1, 20, 8)


def test_at_both_sides_rejected():
    with pytest.raises(ValueError):
        resolve_filters("@-1d", "@+1d", now=NOW)


def test_bad_filter_rejected():
    with pytest.raises(ValueError):
        parse_dt_filter("next tuesday", now=NOW)


def test_cli_end_to_end():
    """Run the CLI binary-style; ordered, prepended, bounded output."""
    out = subprocess.run(
        [
            sys.executable,
            "-m",
            "super_speedy_syslog_searcher_spark.cli",
            "/root/testdata/sf0.001",
            "-a",
            "2024-01-10",
            "-b",
            "@+5d",
            "-u",
            "-l",
            "--limit",
            "25",
        ],
        capture_output=True,
        text=True,
        timeout=300,
        cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-800:]
    lines = out.stdout.strip().splitlines()
    assert len(lines) == 25
    stamps = [ln.split(" ")[0] for ln in lines]
    assert stamps == sorted(stamps)  # globally ordered
    assert all(ln.split(" ", 2)[1].startswith("conv-") for ln in lines)
