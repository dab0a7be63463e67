"""Text analysis over the documents table: token counting, quality
scoring, language-ID heuristic, document fingerprinting.

Everything is built-in Column expressions (split/regexp/aggregate/filter
higher-order functions) — whole-stage codegen, no Python in the path.
Formulas avoid transcendental functions (exp/log differ across libm
builds); only +,-,*,/ and sqrt (IEEE-exact) appear, so the DuckDB oracle
reproduces results bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F

STOPWORDS = ("the", "a", "and", "of", "to", "in", "is")

#: marker words per language for the n-gram/stopword language-ID heuristic;
#: keys sorted asc = deterministic tie-break order
LANG_MARKERS = {
    "de": ("der", "die", "und", "ist", "nicht"),
    "en": ("the", "and", "of", "is", "that"),
    "es": ("el", "los", "que", "una", "para"),
    "fr": ("le", "la", "et", "les", "dans"),
    "zh": ("的", "了", "是"),
}

BPE_ISH = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def ws_tokens(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(c), "\\s+")


def token_counts(df: DataFrame, text: str = "text") -> DataFrame:
    """Whitespace + BPE-ish regex token counts per document."""
    toks = ws_tokens(text)
    return df.select(
        "doc_id",
        F.size(toks).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(F.col(text), F.lit(BPE_ISH), 0)).alias(
            "n_bpe_tokens"
        ),
    )


def quality_scores(df: DataFrame, text: str = "text") -> DataFrame:
    """Length/punctuation/stopword quality features + a linear score.

    score = 0.4*stop_ratio + 0.4*(1/(1+punct_ratio*10)) + 0.2*min(n_ws/100, 1)
    (a Gopher/C4-style heuristic blend, kept rational for exact parity).
    """
    toks = ws_tokens(text)
    n_ws = F.size(toks).cast("double")
    n_chars = F.length(text).cast("double")
    punct = F.length(F.regexp_replace(F.col(text), "[A-Za-z0-9\\s]", "")).cast(
        "double"
    )
    stops = F.size(
        F.filter(toks, lambda t: F.lower(t).isin(*STOPWORDS))
    ).cast("double")
    punct_ratio = punct / n_chars
    stop_ratio = stops / n_ws
    mean_tok_len = F.length(F.array_join(toks, "")).cast("double") / n_ws
    score = (
        stop_ratio * 0.4
        + (F.lit(1.0) / (F.lit(1.0) + punct_ratio * 10.0)) * 0.4
        + F.least(n_ws / 100.0, F.lit(1.0)) * 0.2
    )
    return df.select(
        "doc_id",
        n_ws.alias("n_ws"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stop_ratio"),
        mean_tok_len.alias("mean_tok_len"),
        score.alias("quality"),
    )


def lang_scores(df: DataFrame, text: str = "text") -> DataFrame:
    """Marker-word counts per language + argmax prediction (tie -> first
    language in ascending key order) — same CASE cascade as the oracle."""
    toks = ws_tokens(F.lower(F.col(text)))

    def _in(markers):  # closure factory: a default arg would make PySpark
        return lambda t: t.isin(*markers)  # treat the lambda as (el, idx)

    cols = {
        lang: F.size(F.filter(toks, _in(markers)))
        for lang, markers in LANG_MARKERS.items()
    }
    langs = sorted(LANG_MARKERS)
    pred = None
    for lang in langs:
        cond = None
        for other in langs:
            if other == lang:
                continue
            ge = cols[lang] >= cols[other] if other > lang else cols[lang] > cols[other]
            cond = ge if cond is None else (cond & ge)
        pred = (
            F.when(cond, F.lit(lang)) if pred is None else pred.when(cond, F.lit(lang))
        )
    # unreachable fallback (the cascade is exhaustive), kept for safety
    pred = pred.otherwise(F.lit(langs[0]))
    return df.select(
        "doc_id",
        *[cols[lang].alias(f"s_{lang}") for lang in langs],
        pred.alias("pred_lang"),
    )


def fingerprints(df: DataFrame, text: str = "text", n: int = 3) -> DataFrame:
    """Document fingerprint: lexicographic-min md5 over word n-gram
    shingles (md5 of the full trimmed text when fewer than n words).
    A content-defined rolling-hash analog that both engines compute
    identically (md5 hex strings order the same everywhere)."""
    base = df.select(
        "doc_id", F.trim(F.col(text)).alias("_t"), ws_tokens(text).alias("_w")
    )  # materialize the split once; a lambda reference re-splits per element
    toks = F.col("_w")
    sh = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1))),
        lambda i: F.md5(
            F.concat_ws(
                " ", *[F.element_at(toks, (i + j).cast("int")) for j in range(n)]
            )
        ),
    )
    fp = F.when(F.size(toks) >= n, F.array_min(sh)).otherwise(F.md5(F.col("_t")))
    return base.select("doc_id", fp.alias("fingerprint"))


def vocab_topk(df: DataFrame, k: int = 50, text: str = "text") -> DataFrame:
    """Global vocabulary top-k by token frequency — the training-corpus
    vocabulary builder. One explode + one hash agg (map-side partial
    counts) + TakeOrdered (never a global sort); ties break on the token
    so the result is deterministic at any parallelism."""
    ex = df.select(F.explode(ws_tokens(text)).alias("tok"))
    counts = ex.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    return counts.orderBy(F.desc("n"), F.asc("tok")).limit(k)


def redact_tokens(
    df: DataFrame, pattern: str, replacement: str = "<TOK>", text: str = "text"
) -> DataFrame:
    """Redaction pass (the PII-scrub shape): replace every match of
    `pattern` and count hits per document. Output carries md5(redacted)
    instead of the full text so downstream checks stay narrow."""
    c = F.col(text)
    return df.select(
        "doc_id",
        F.size(F.regexp_extract_all(c, F.lit(pattern), F.lit(0))).alias("n_hits"),
        F.md5(F.regexp_replace(c, pattern, replacement)).alias("redacted_md5"),
    )


def term_doc_stats(df: DataFrame, text: str = "text") -> DataFrame:
    """TF-IDF / BM25 backbone: the (doc, term) matrix with term frequency
    and document frequency — the distributed-heavy part of corpus scoring
    (the final score is trivial local math; log-based weighting is left
    to callers because libm log differs across engines, which would break
    exact oracles). Two hash aggs, one broadcast-size join on the term."""
    ex = df.select("doc_id", F.explode(ws_tokens(text)).alias("tok"))
    tf = ex.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    return tf.join(dfreq, "tok").select("doc_id", "tok", "tf", "df")


def bm25_topk(
    df: DataFrame,
    terms: Sequence[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text: str = "text",
) -> DataFrame:
    """BM25 retrieval scoring with a RATIONAL idf — top-k docs for a fixed
    query-term set.

    score(d) = Σ_t idf_t · tf·(k1+1) / (tf + k1·(1-b + b·dl/avgdl)) with
    idf_t = (N - df_t + 0.5)/(df_t + 0.5) — Robertson's idf WITHOUT the
    log. The log is a per-term monotone reweighting whose only effect is
    damping rare-term dominance; dropping it keeps the ranking family but
    makes every arithmetic step an exactly-rounded IEEE op (+,-,*,/), so
    the score is BIT-IDENTICAL across engines (libm log differs per
    platform and would break exact oracles — the same reason
    term_doc_stats leaves weighting to callers). Per-doc summation runs
    over per-term COLUMNS in fixed left-to-right order, never a
    shuffle-ordered SUM, so float addition order is deterministic too.

    Scale shape: the exploded token stream is filtered to the query
    terms BEFORE the per-doc aggregation, so the tf shuffle carries only
    matching (doc, term) rows — |docs matching ≥1 term| drives the
    exchange, never the corpus (a 10^9-doc corpus with 10^4 matching
    docs shuffles 10^4 grouped rows, not 10^9). Global N/avgdl come from
    a separate 1-row stats agg (map-side partial over dl only) that is
    broadcast-cross-joined; final selection is TakeOrdered top-k.
    """
    terms = list(terms)
    if not terms:
        raise ValueError("bm25_topk needs at least one query term")
    base = df.select("doc_id", ws_tokens(text).alias("_toks"))
    dls = base.select("doc_id", F.size("_toks").alias("dl"))
    stats = dls.agg(
        F.count(F.lit(1)).alias("_n"), F.sum("dl").alias("_sumdl")
    )
    ex = base.select("doc_id", F.explode("_toks").alias("tok")).filter(
        F.col("tok").isin(terms)
    )
    tf_cols = [
        F.sum(F.when(F.col("tok") == t, 1).otherwise(0))
        .cast("long")
        .alias(f"tf{i + 1}")
        for i, t in enumerate(terms)
    ]
    # the pre-filter means every surviving doc has >=1 matching token, so
    # zero-score docs (which the ranking would only tie at 0) never reach
    # the aggregation at all
    g = ex.groupBy("doc_id").agg(*tf_cols)
    dfs = g.agg(
        *[
            F.sum((F.col(f"tf{i + 1}") > 0).cast("int"))
            .cast("long")
            .alias(f"df{i + 1}")
            for i in range(len(terms))
        ]
    )
    j = (
        g.join(dls, "doc_id")
        .crossJoin(F.broadcast(dfs))
        .crossJoin(F.broadcast(stats))
    )
    nd = F.col("_n").cast("double")
    avgdl = F.col("_sumdl").cast("double") / nd
    dld = F.col("dl").cast("double")
    score = None
    for i in range(len(terms)):
        tfd = F.col(f"tf{i + 1}").cast("double")
        dfd = F.col(f"df{i + 1}").cast("double")
        idf = ((nd - dfd) + F.lit(0.5)) / (dfd + F.lit(0.5))
        num = tfd * (F.lit(k1) + F.lit(1.0))
        den = tfd + (
            F.lit(k1)
            * ((F.lit(1.0) - F.lit(b)) + ((F.lit(b) * dld) / avgdl))
        )
        s = (idf * num) / den
        score = s if score is None else (score + s)
    out = j.select(
        "doc_id",
        *[f"tf{i + 1}" for i in range(len(terms))],
        score.alias("score"),
    )
    return out.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def chunk_documents(
    df: DataFrame, size: int = 200, stride: int = 150, text: str = "text"
) -> DataFrame:
    """Overlapping character-window chunker (the RAG / context-window
    shape): windows of ``size`` chars starting every ``stride`` chars,
    the final window clipped at the text end. Pure Column expressions
    (sequence + transform + substring) — no explode of Python rows, one
    narrow pass; chunk text travels as md5 so downstream checks stay
    narrow. n_windows = 1 + ceil(max(len-size, 0)/stride) exactly."""
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")
    if stride > size:
        # gapped windows would SKIP characters (and the final window's
        # n_chars arithmetic below assumes overlap-or-touching coverage);
        # a chunker that silently drops text is never what a training
        # pipeline wants
        raise ValueError(
            f"stride ({stride}) must be <= size ({size}): larger strides "
            "leave un-chunked gaps between windows"
        )
    c = F.col(text)
    n = F.length(c)
    extra = F.greatest(n - size, F.lit(0))
    n_win = (F.lit(1) + F.ceil(extra.cast("double") / stride)).cast("int")
    wins = F.transform(
        F.sequence(F.lit(0), n_win - 1),
        lambda i: F.struct(
            i.cast("int").alias("chunk_idx"),
            F.md5(F.substring(c, (i * stride + 1).cast("int"), size)).alias(
                "chunk_md5"
            ),
            F.least(n - i * stride, F.lit(size)).cast("int").alias("n_chars"),
        ),
    )
    return df.select("doc_id", F.explode(wins).alias("w")).select(
        "doc_id", "w.chunk_idx", "w.chunk_md5", "w.n_chars"
    )


def assign_splits(
    df: DataFrame,
    weights: Sequence[int] = (8, 1, 1),
    names: Sequence[str] = ("train", "val", "test"),
    key: str = "doc_id",
) -> DataFrame:
    """Deterministic train/val/test assignment by content-independent
    hash bucketing (never rand(): resumable jobs and both engines must
    agree). Buckets = md5-derived value mod sum(weights); cumulative
    weight ranges pick the split. Adding documents never reassigns
    existing ones — the property that keeps eval sets stable as a corpus
    grows."""
    from .hashing import md5_lower64

    if len(weights) != len(names):
        # zip() would silently truncate: buckets past the last zipped edge
        # fall through every when() and get a NULL split — documents
        # silently dropped from ALL splits
        raise ValueError(
            f"weights ({len(weights)}) and names ({len(names)}) must have "
            "the same length"
        )
    if any(w <= 0 for w in weights):
        raise ValueError(f"weights must all be > 0, got {tuple(weights)}")
    total = sum(weights)
    # two-step reduction: Spark's signed pmod equals DuckDB's unsigned mod
    # only when the modulus divides 2^64, so reduce through 2^31 first
    # (2^64 % 2^31 == 0 -> both engines see the SAME nonnegative value)
    # and only then take % total — identical in both engines for ANY total
    h31 = F.pmod(md5_lower64(F.col(key).cast("string")), F.lit(2**31))
    b = F.pmod(h31, F.lit(total))
    edges = []
    acc = 0
    for w, name in zip(weights, names):
        acc += w
        edges.append((acc, name))
    expr = None
    for edge, name in edges:
        cond = b < edge
        expr = (
            F.when(cond, F.lit(name))
            if expr is None
            else expr.when(cond, F.lit(name))
        )
    return df.select(key, b.alias("bucket"), expr.alias("split"))
