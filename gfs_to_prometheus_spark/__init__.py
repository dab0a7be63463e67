"""gfs_to_prometheus_spark — a from-scratch PySpark-native time-series
rollup + downsample + retention engine with the query and data-processing
capabilities of the reference `4n3w/gfs-to-prometheus` (a Go CLI that
decodes GemFire `.gfs` statistics archives into the Prometheus TSDB
storage format).

This is NOT a port: the reference is a hand-fused single-pass native
pipeline; this engine declares the same semantics as Spark DataFrame
plans (Catalyst handles pushdown/pruning/broadcast/partial-agg) and drops
to vectorized pandas/Arrow UDFs only for the chunk codecs
(delta-of-delta + Gorilla XOR), counter-reset-corrected rate, and
per-series chunk materialization.

Layout (SURVEY.md §7):
  session      SparkSession factory (local[N], AQE, Arrow)
  synth        deterministic tokenized-sequence + samples generators
  codecs       numpy Gorilla XOR / delta-of-delta / Geode compact ints
  naming       metric-name synthesis + validity filters (P1, F1/F2)
  mapping      config-driven remap/include/exclude (P7/P8, F3/F7)
  rollup       5m/1h/1d continuous aggregates (A1/A9) + rate (A3)
  gapfill      LOCF / linear gap-fill over grid-step windows (§2.8)
  chunks       per-series binary chunk build via applyInPandas (§2.11)
  retention    tiered retention over time-partitioned tables (W4)
  checkpoint   per-partition lineage/metrics + resume (north_rule)
  operators/   dedup, similarity, text analysis, multimodal plumbing
  streaming/   file-watch analog on Structured Streaming (ST1–ST6)
"""

__version__ = "0.1.0"
