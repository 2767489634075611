"""super_speedy_syslog_searcher_spark — a from-scratch PySpark-native
log/transcript parse → enrich → route → aggregate → merge pipeline.

Re-expresses the capabilities of jtmoon79/super-speedy-syslog-searcher
(reference at /root/reference, Rust) as an idiomatic Spark DataFrame
pipeline over a transcripts table
(conv_id, turn_idx, role, text, tool, ts) — see SURVEY.md.

Nothing here is a port: the reference's thread-per-file k-way merge
becomes a range-partitioned sort; its 188-pattern DTPD regex bank
becomes an Arrow-vectorized pandas UDF pattern bank; its per-file
summary stats become groupBy aggregates.
"""

__version__ = "0.1.0"
