"""Round-6 focused tests: the parse kernel's positional dispatch.

parse_series now drives the pattern walk with numpy positions and one
batch-wide string materialization instead of pandas label indexing
(functions/datetime_parse.py).  These pin the places a positional bug
would hide: null rows, a non-default (label) index, the scan-tier
subset→global position mapping, and the memoized tz conversion.
"""

import numpy as np
import pandas as pd

from super_speedy_syslog_searcher_spark.functions.datetime_parse import (
    _tz_minutes_numeric,
    parse_series,
)


def test_null_and_nonrange_index_rows():
    """None rows stay continuation; results align to the caller's
    labels, not positions."""
    texts = pd.Series(
        [
            "2024-01-05T03:04:05 -0800 hello",
            None,
            "plain continuation line",
            "Jan  5 03:04:05 host app: msg",
        ],
        index=[10, 7, 99, 3],  # non-default, unsorted labels
    )
    out = parse_series(texts)
    assert list(out.index) == [10, 7, 99, 3]
    assert out.loc[10, "sink"] != "continuation"
    assert out.loc[7, "sink"] == "continuation"
    assert pd.isna(out.loc[7, "ts_parsed"])
    assert out.loc[99, "sink"] == "continuation"
    assert out.loc[3, "sink"] != "continuation"


def test_scan_tier_position_mapping():
    """A mid-line datetime (scan tier) interleaved with anchored rows
    and continuations must land on ITS row — the scan tier works on a
    remaining-subset list whose positions map back through rem_pos."""
    texts = pd.Series(
        [
            "2024-01-05T03:04:05 -0800 anchored",        # anchored tier
            "no digits here",                            # continuation
            "lvl=info time=2024-02-03 04:05:06 msg=hi",  # scan tier
            "word 99 word",                              # continuation
            "2024-01-06T00:00:00 -0800 anchored2",       # anchored tier
        ]
    )
    out = parse_series(texts)
    sinks = out["sink"].tolist()
    assert sinks[1] == "continuation"
    assert sinks[3] == "continuation"
    assert sinks[0] != "continuation" and sinks[4] != "continuation"
    # the scan-tier hit is attributed to row 2, with in-row spans
    assert sinks[2] != "continuation"
    beg, end = int(out.loc[2, "dt_beg"]), int(out.loc[2, "dt_end"])
    assert texts[2][beg:end].startswith("2024-02-03")
    assert out.loc[2, "ts_parsed"] == pd.Timestamp("2024-02-03 04:05:06")


def test_winner_pids_any_table_is_output_invariant():
    """Frozen dispatch with an arbitrary (even wrong) winner table is
    bit-identical to bank order — on a non-default index."""
    texts = pd.Series(
        [
            "2024-01-05T03:04:05 -0800 a",
            "Jan  5 03:04:05 b",
            "1704423845.123456 c",
            "no match",
        ],
        index=[5, 2, 8, 1],
    )
    base = parse_series(texts)
    for pid in (0.0, 3.0, 7.0, np.nan):
        frozen = parse_series(
            texts, winner_pids=pd.Series([pid] * 4, index=texts.index)
        )
        pd.testing.assert_frame_equal(base, frozen)


def test_tz_memo_matches_spec():
    vals = pd.Series(
        ["+0530", "-08:00", "+08", "Z", "z", "−1100", "+00:00"],
        index=[3, 1, 4, 1, 5, 9, 2],
    )
    out = _tz_minutes_numeric(vals)
    assert out.tolist() == [330, -480, 480, 0, 0, -660, 0]
    assert list(out.index) == [3, 1, 4, 1, 5, 9, 2]
    assert str(out.dtype) == "int64"
    # memo hit path returns the same values
    assert _tz_minutes_numeric(vals).tolist() == out.tolist()
