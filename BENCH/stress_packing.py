#!/usr/bin/env python
"""Sequence-packing scaling ladder: end-to-end wall at 4x-growing corpora.

pack_sequences' cost model says wall should track TOTAL TOKENS ~linearly:
the prefix sums are doc-level (tiny), and the only token-level stage is
the final explode -> shuffle-on-seq_id -> sort/agg pass ("touch every
token once"). A super-linear trend here would flag a plan regression
(e.g. the bucket window collapsing the doc table to one partition, or
the explode materializing before the shuffle).

Each level runs in a fresh process (cached blocks from earlier levels
otherwise skew later ones). Appends to BENCH/BASELINE.md.
Knobs: PACK_SIZES (default "25000,100000,400000" docs, ~60 tokens each).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

WORKER = """
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from gfs_to_prometheus_spark.operators import packing
from gfs_to_prometheus_spark.session import get_spark

spark = get_spark(app="packscale", cpus=8)
n = {n}
# deterministic synthetic token table (no text pass — the ladder measures
# PACKING, not tokenization): ~60 tokens/doc, int ids
toks = F.transform(
    F.sequence(F.lit(0), (F.pmod(F.xxhash64("id"), F.lit(40)) + 40).cast("int")),
    lambda j: F.pmod(F.xxhash64(F.col("id") * 131 + j), F.lit(32768)).cast("int"),
)
seq = spark.range(n).select(
    F.col("id").alias("doc_id"), toks.alias("tokens")
).withColumn("n_tok", F.size("tokens"))
seq = seq.cache(); total_tokens = seq.agg(F.sum("n_tok")).collect()[0][0]
best = None
for _ in range(3):
    t0 = time.time()
    out = packing.pack_sequences(seq, seq_len=2048, bucket_docs=4096)
    m = out.agg(F.sum("n_tok"), F.count(F.lit(1))).collect()[0]
    assert m[0] == total_tokens, (m, total_tokens)  # conservation law
    dt = time.time() - t0
    best = dt if best is None or dt < best else best
print(json.dumps({{"docs": n, "tokens": int(total_tokens),
                   "seqs": int(m[1]), "seconds_min": round(best, 3),
                   "tokens_per_sec": round(total_tokens / best, 1)}}))
"""


def run(n: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", WORKER.format(repo=REPO, n=n)],
        capture_output=True, text=True, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    sizes = [
        int(x)
        for x in os.environ.get("PACK_SIZES", "25000,100000,400000").split(",")
    ]
    rs = [run(n) for n in sizes]
    for r in rs:
        print(json.dumps(r), flush=True)
    base = rs[0]
    lines = [
        "",
        "### Sequence-packing scaling ladder (BENCH/stress_packing.py)",
        "",
        "pack_sequences at 4x-growing corpora (seq_len 2048, fresh process",
        "per level, min-of-3; token-sum conservation asserted every pass):",
        "",
        "| docs | tokens | packed rows | wall (s) | tokens/s "
        "| wall vs 4x smaller |",
        "|---|---|---|---|---|---|",
    ]
    prev = None
    for r in rs:
        ratio = "—" if prev is None else f"{r['seconds_min'] / prev:.2f}x"
        prev = r["seconds_min"]
        lines.append(
            f"| {r['docs']:,} | {r['tokens']:,} | {r['seqs']:,} | "
            f"{r['seconds_min']} | {r['tokens_per_sec']:,} | {ratio} |"
        )
    with open(os.path.join(HERE, "BASELINE.md"), "a") as fh:
        fh.write("\n".join(lines) + "\n")
    print(json.dumps({"metric": "pack_ladder", "levels": rs}))


if __name__ == "__main__":
    main()
