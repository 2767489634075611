"""N vs 4N scaling at the 50M-turn point (north_rule evidence at the
scale where constant overheads amortize): interleave local[8] and
local[32] over 3 rounds on the identical 50M-turn input, keep each
level's median, print throughput at both and the scaling efficiency.

Usage: python tools/bench_scaling_50m.py [repl=500] [sf_dir]
Prints one JSON line; does NOT rewrite BENCH/BASELINE.md (paste the
numbers into its 50M section by hand).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_scaling import run_level  # noqa: E402  same-dir import


def main() -> None:
    repl = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    levels = (8, 32)
    runs = {c: [] for c in levels}
    for rnd in range(3):
        for cpus in levels:
            r = run_level(
                cpus, sf_dir, repl, only="parse_merge", timeout=5400
            )
            runs[cpus].append(r)
            print(
                f"round {rnd} local[{cpus}]: "
                f"{r['queries']['parse_merge']:.1f}s",
                file=sys.stderr,
            )
    med = {
        c: sorted(rs, key=lambda r: r["queries"]["parse_merge"])[
            len(rs) // 2
        ]
        for c, rs in runs.items()
    }
    tp = {
        c: r["n_turns"] / r["queries"]["parse_merge"]
        for c, r in med.items()
    }
    out = {
        "n_turns": med[32]["n_turns"],
        "sec_8": med[8]["queries"]["parse_merge"],
        "sec_32": med[32]["queries"]["parse_merge"],
        "turns_per_sec_8": round(tp[8]),
        "turns_per_sec_32": round(tp[32]),
        "eff_8_to_32": round(tp[32] / (4 * tp[8]), 3),
        "rounds_8": [r["queries"]["parse_merge"] for r in runs[8]],
        "rounds_32": [r["queries"]["parse_merge"] for r in runs[32]],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
