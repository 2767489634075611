"""Operator inventory (SURVEY.md §2) — each module maps a cluster of
reference behaviors to idiomatic DataFrame ops:

parse      — pattern-bank datetime extraction (§2.2/§2.3)
repair     — uptime anchoring + no-year rollover (§2.3)
assemble   — multi-line sysline assembly via windows (§2.6)
enrich     — broadcast dimension joins (§2.4)
route      — sink routing + fan-out writes (§2.1 printer/sinks)
merge      — the global datetime-ordered k-way merge (§2.7)
stats      — per-conv and global summary aggregates (§2.5)
dedup      — training-data dedup suite (exact/minhash/jaccard/simhash)
similarity — embedding ANN (brute-force + LSH-bucketed)
textstats  — lang-id, quality, token counts, fingerprints
multimodal — binary-column decode plumbing (stubbed codecs)
"""
