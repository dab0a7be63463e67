"""Deterministic synthetic tables (FIXTURES.md §1–2) — the engine-specific
input per BASELINE.json ``input_hint``: a tokenized-sequence table
(doc_id, tokens:array<int>, n_tok, source) and the samples view derived
from it.

Everything derives from xxhash64 of the row index (seed folded in), so
generation is distributed (spark.range -> executors), reproducible at any
parallelism, and needs no external data or Python loops. Token values are
int32 in [0, 50257); sample values are functions of the tokens, so any
sample-level correctness check transitively asserts the per-row
token-array-equality invariant.

Skew knobs mirror FIXTURES: ``source`` is ~80% 'web'; ~1% of series
receive ~50% of samples (the hot-series pattern the salt-bucketed
repartition exists for).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

VOCAB = 50257
SEED = 42
BASE_MS = 1704067200000  # 2024-01-01T00:00:00Z
SOURCES = ("web", "code", "books", "wiki")
RESOURCE_TYPES = (
    "CachePerfStats",
    "DistributionStats",
    "VMStats",
    "StatSampler",
    "PartitionedRegionStats",
)


def _h(*cols) -> F.Column:
    """Deterministic 64-bit hash with the fixture seed folded in."""
    return F.xxhash64(F.lit(SEED), *cols)


def sequences(
    spark: SparkSession, n_docs: int, max_len: int = 256, partitions: int | None = None
) -> DataFrame:
    """The tokenized-sequence table. Lengths are zipf-ish in [1, max_len]:
    len = max(1, max_len // (1 + (h % 32)))."""
    rng = spark.range(0, n_docs, numPartitions=partitions)
    doc_id = F.format_string("doc_%09d", F.col("id"))
    ln = F.greatest(
        F.lit(1), (F.lit(max_len) / (F.lit(1) + F.pmod(_h("id"), F.lit(32)))).cast("int")
    )
    tokens = F.transform(
        F.sequence(F.lit(0), ln - F.lit(1)),
        lambda j: F.pmod(_h(F.col("id"), j), F.lit(VOCAB)).cast("int"),
    )
    src = (
        F.when(F.pmod(_h("id", F.lit(1)), F.lit(10)) < 8, F.lit("web"))
        .when(F.pmod(_h("id", F.lit(1)), F.lit(10)) == 8, F.lit("code"))
        .when(F.pmod(_h("id", F.lit(2)), F.lit(2)) == 0, F.lit("books"))
        .otherwise(F.lit("wiki"))
    )
    return rng.select(
        doc_id.alias("doc_id"),
        tokens.alias("tokens"),
        F.size(tokens).alias("n_tok"),
        src.alias("source"),
    )


def samples_from_sequences(seq: DataFrame, n_series: int = 100) -> DataFrame:
    """Derive the decoded-sample-stream analog (SURVEY.md §1.4): one sample
    per token position. Mirrors the reference's parse output
    (/root/reference/internal/gfs/statarchive.go:676-684) after cluster
    label enrichment (/root/reference/internal/cluster/converter.go:81-96).

    * series identity: ~1% of docs land on series 0 (hot), rest spread
      uniformly — the hot-series skew fixture.
    * ts: BASE_MS + per-doc offset + 1000ms cadence with +-100ms jitter and
      occasional 5–120s gaps (P~0.05) to exercise gap-fill.
    * value: derived from the token id (gauges scaled, counters raw), so
      any sample-level check transitively asserts token-array equality.
      Monotone counter-reset semantics are exercised separately via the
      cumulative-counter queries (queries.counter_rate_5m).
    """
    h_doc = _h("doc_id")
    hot = F.pmod(h_doc, F.lit(100)) < 50  # 50% of docs -> 1 hot series
    series_id = F.when(hot, F.lit(0)).otherwise(
        F.pmod(_h("doc_id", F.lit(3)), F.lit(n_series - 1)) + 1
    )
    rt = RESOURCE_TYPES
    resource_type = F.element_at(
        F.array(*[F.lit(x) for x in rt]), (F.pmod(series_id, F.lit(len(rt))) + 1).cast("int")
    )
    node = F.concat(F.lit("server-"), F.pmod(series_id, F.lit(10)))
    node_type = (
        F.when(F.pmod(series_id, F.lit(10)) == 0, F.lit("locator"))
        .when(F.pmod(series_id, F.lit(10)) == 1, F.lit("gateway"))
        .otherwise(F.lit("server"))
    )
    is_counter = F.pmod(series_id, F.lit(2)) == 0

    ex = seq.select(
        "doc_id",
        series_id.alias("series_id"),
        resource_type.alias("resource_type"),
        node.alias("node"),
        node_type.alias("node_type"),
        is_counter.alias("is_counter"),
        F.posexplode("tokens").alias("pos", "token"),
    )
    jitter = F.pmod(_h("doc_id", "pos"), F.lit(201)) - 100
    gap = F.when(
        F.pmod(_h("doc_id", "pos", F.lit(7)), F.lit(20)) == 0,
        (F.pmod(_h("doc_id", "pos", F.lit(11)), F.lit(116)) + 5) * 1000,
    ).otherwise(F.lit(0))
    base_off = F.pmod(h_doc, F.lit(86400)) * 1000
    ts_ms = (
        F.lit(BASE_MS) + base_off + F.col("pos") * 1000 + jitter + gap
    ).cast("long")
    gauge = (F.col("token") % 1000).cast("double") / 10.0
    counter_val = F.col("token").cast("double")
    return ex.select(
        "doc_id",
        F.concat(F.lit("series_"), F.col("series_id")).alias("series_key"),
        F.concat(
            F.lit("gemfire_"),
            F.lower("resource_type"),
            F.lit("_stat"),
            F.pmod("series_id", F.lit(5)),
        ).alias("metric"),
        "resource_type",
        "node",
        "node_type",
        "is_counter",
        ts_ms.alias("ts_ms"),
        F.when(F.col("is_counter"), counter_val).otherwise(gauge).alias("value"),
        "token",
        "pos",
    )
