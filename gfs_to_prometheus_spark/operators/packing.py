"""Sequence packing — the canonical LLM training-data operator: stream
all documents' tokens, in deterministic doc order, into fixed-length
training rows (GPT-style contiguous document packing; the north-rule
input shape ``(doc_id, tokens array<int32>, n_tok, source)``).

The hard part at 10^12 sequences is the GLOBAL prefix sum that places
each document's tokens in the packed stream: a naive
``sum() OVER (ORDER BY doc_id)`` collapses to a single-partition window
(the classic scale-killer). Here it is a two-level prefix sum over
DETERMINISTIC doc-id buckets:

1. per-bucket token totals        — one hash agg (bucket = doc_id // B);
2. exclusive cumsum over buckets  — a window over ~n_docs/B rows (tiny
   by choosing B; these are the only rows that pass a 1-partition
   window, and there are millions of times fewer of them than docs);
3. within-bucket exclusive cumsum — a PROPER distributed window
   (partitionBy bucket), merged with the bucket offset.

Everything keys off doc_id arithmetic, never physical partitioning, so
the result is bit-stable at any parallelism (repartitionByRange-based
prefixes would depend on sampled range boundaries and recompute
differently per action). All math is integer — exactly reproducible in
ANSI SQL, so the operator carries a full value oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from .hashing import md5_lower64
from .text import ws_tokens

#: token-id vocabulary size (md5-derived ids; 2^64 % VOCAB == 0 keeps the
#: signed-pmod / unsigned-mod twins equal across engines)
VOCAB = 32768


def tokenize(df: DataFrame, text: str = "text") -> DataFrame:
    """documents -> the north-rule sequence shape (doc_id, tokens
    array<int>, n_tok): whitespace tokens mapped to md5-derived int ids
    (deterministic, DuckDB-reproducible; a real BPE vocabulary drops in
    by replacing the id expression)."""
    toks = ws_tokens(text)
    ids = F.transform(
        toks, lambda t: F.pmod(md5_lower64(t), F.lit(VOCAB)).cast("int")
    )
    return df.select(
        "doc_id",
        ids.alias("tokens"),
        F.size(toks).alias("n_tok"),
    )


def pack_sequences(
    seq: DataFrame,
    seq_len: int,
    bucket_docs: int = 1024,
) -> DataFrame:
    """Pack (doc_id, tokens, n_tok) rows into rows of exactly ``seq_len``
    tokens (the final partial row keeps n_tok < seq_len), preserving
    token order under ascending doc_id. Documents are NOT padded or
    truncated — they straddle row boundaries exactly as the packed
    pretraining stream does.

    Output: (seq_id, tokens array<int>, n_tok, n_docs, first_doc_id,
    bounds array<int>) — ``bounds`` holds the in-row positions where a
    NEW document begins (its global token 0 landed in this row): the
    attention-reset / loss-mask boundaries a packed pretraining batch
    needs. A row fully inside one long document has an empty bounds
    array; position 0 appears only when a document actually starts
    there, so masks are exact across straddled rows.

    Cost shape: one agg + one join (bucket offsets, broadcast), one
    distributed window (within-bucket cumsum), one explode shuffle on
    seq_id. The explode is the honest cost — token-level rows exist only
    inside the final shuffle/agg stage, and at 100 TB that stage is the
    irreducible "touch every token once" pass.
    """
    d = seq.select(
        "doc_id",
        "tokens",
        F.coalesce(F.col("n_tok"), F.size("tokens")).alias("n_tok"),
        # `div` = integer division: a double-division + cast routes the
        # id through IEEE double and mis-buckets beyond 2^52 — real at
        # the 10^12-sequence design point
        F.expr(f"doc_id div {bucket_docs}").alias("_bucket"),
    )
    per_bucket = d.groupBy("_bucket").agg(F.sum("n_tok").alias("_btok"))
    w_b = (
        W.orderBy("_bucket").rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    offsets = per_bucket.withColumn(
        "_boff", (F.sum("_btok").over(w_b) - F.col("_btok")).cast("long")
    ).select("_bucket", "_boff")
    w_d = (
        W.partitionBy("_bucket")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    placed = (
        d.join(F.broadcast(offsets), "_bucket")
        .withColumn(
            "_start",
            (
                F.col("_boff")
                + F.sum("n_tok").over(w_d)
                - F.col("n_tok")
            ).cast("long"),
        )
    )
    ex = placed.select(
        "doc_id",
        "_start",
        F.posexplode("tokens").alias("_pos", "_tok"),
    ).select(
        "doc_id",
        "_tok",
        (F.col("_pos") == 0).alias("_is_doc_start"),
        (F.col("_start") + F.col("_pos")).alias("_gpos"),
    )
    ex = ex.withColumn(
        "seq_id", F.expr(f"_gpos div {int(seq_len)}")  # exact int division
    ).withColumn("_sp", (F.col("_gpos") % seq_len).cast("int"))
    return (
        ex.groupBy("seq_id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("_sp", F.col("_tok").alias("t")))
                ),
                lambda s: s["t"],
            ).alias("tokens"),
            F.count(F.lit(1)).alias("n_tok"),
            F.count_distinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("first_doc_id"),
            F.array_sort(
                F.collect_list(F.when(F.col("_is_doc_start"), F.col("_sp")))
            ).alias("bounds"),
        )
    )
