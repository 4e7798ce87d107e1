"""symat_hbase_tools_spark — a PySpark-native engine with the capabilities of
symat/symat-hbase-tools, extended with a relational + LLM-data-pipeline surface.

The reference (/root/reference) is a ~490-LoC HBase troubleshooting toolkit:
  * CopyRow.java      — point-read a row, optionally rewrite cell timestamps,
                        write it to a (possibly different) table.
  * CorruptRowsMR.java — map-only MR job: key-only scan, per-key probe GET,
                        TSV corruption report + TOTAL/SUCCESS/FAILED counters.

This package re-expresses that surface Spark-first (DataFrame/SQL, Catalyst
optimized) on a long-format "cells" data model (SURVEY.md §1.2), and adds the
relational/analytics/dedup/similarity/text/streaming operators a 100 TB
training-data pipeline needs (SURVEY.md §2.5).

Layout:
  sources/    table + cell-layer loaders (parquet now; HBase connector stub)
  functions/  scalar/vector column functions (byte-string codecs, text, vectors)
  operators/  the engine operators (kv, audit, copy_row, diff, relational,
              dedup, similarity, multimodal)
  streaming/  Structured Streaming surface over the events table
  plans/      plan-inspection helpers (pushdown/broadcast assertions)
"""

__version__ = "0.1.0"
