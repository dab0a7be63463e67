#!/usr/bin/env python
"""Near-dup scaling ladder: minhash_lsh_candidates end-to-end wall at
4x-growing synthetic corpora (disjoint deterministic word soup, shared
5k-word vocabulary — the same shape as the driver's documents fixture).

The point: the banded LSH path must grow ~LINEARLY in corpus size
(signatures are O(docs x shingles), the band join is bucket-local),
while the exact all-pairs baseline is quadratic by construction. A
super-linear LSH trend here would flag a plan regression (e.g. the
r1 all-pairs verify, or the r3 planner blowup) before it ships.

Appends to BENCH/BASELINE.md. Knobs: STRESS_SIZES (default "5000,10000,20000").
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)


def synth_docs(spark, n: int):
    """Word soup with PLANTED near-dups: every 100th doc is its
    predecessor with the last word swapped (jaccard ~0.9), so the ladder
    exercises banding, candidate collection AND the exact verify."""
    from pyspark.sql import functions as F

    is_dup = F.pmod(F.col("id"), F.lit(100)) == 99
    base = F.when(is_dup, F.col("id") - 1).otherwise(F.col("id"))
    words = F.transform(
        F.sequence(F.lit(0), F.lit(59)),
        lambda j: F.when(
            is_dup & (j == 59), F.lit("zz")
        ).otherwise(
            F.concat(F.lit("w"), F.pmod(F.xxhash64(base * 60 + j), F.lit(5000)))
        ),
    )
    return spark.range(n).select(
        F.col("id").alias("doc_id"), F.array_join(words, " ").alias("text")
    )


def run_one(n: int) -> dict:
    """One ladder level, isolated in its own process (checkpoint RDDs from
    earlier levels otherwise accumulate in the block manager and skew
    later levels)."""
    from gfs_to_prometheus_spark.operators import dedup
    from gfs_to_prometheus_spark.session import get_spark

    spark = get_spark(app=f"stress_dedup_{n}", cpus=32)
    docs = synth_docs(spark, n).localCheckpoint()  # exclude synth cost
    dedup.minhash_lsh_candidates(docs, 32, 8, 0.05).count()  # warm
    best, pairs = None, 0
    for _ in range(2):
        t0 = time.perf_counter()
        pairs = dedup.minhash_lsh_candidates(docs, 32, 8, 0.05).count()
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    return {"docs": n, "pairs": pairs, "seconds": round(best, 2)}


def main() -> None:
    import subprocess

    sizes = [
        int(s) for s in os.environ.get("STRESS_SIZES", "5000,10000,20000").split(",")
    ]
    results = []
    for n in sizes:
        out = subprocess.run(
            [sys.executable, "-c",
             f"import sys; sys.path.insert(0, {REPO!r}); sys.path.insert(0, {HERE!r});\n"
             f"import json, stress_dedup\n"
             f"print('RESULT ' + json.dumps(stress_dedup.run_one({n})))"],
            capture_output=True, text=True, check=True,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("RESULT ")][-1]
        results.append(json.loads(line[len("RESULT "):]))
        print(json.dumps(results[-1]))
    base = results[0]
    rows = "\n".join(
        "| {d:,} | {p} | {s} | {r:.2f}x time for {g:.0f}x docs |".format(
            d=r["docs"], p=r["pairs"], s=r["seconds"],
            r=r["seconds"] / base["seconds"], g=r["docs"] / base["docs"],
        )
        for r in results
    )
    md = f"""

## Near-dup LSH scaling ladder (latest run)

`minhash_lsh_candidates` (k=32, 8 bands, exact-Jaccard verify) over
4x-growing synthetic corpora, min of 2 warm passes (fresh process per level)
(`BENCH/stress_dedup.py`). Linear-ish growth = the banded plan holds;
the exact `jaccard_pairs` baseline is quadratic by construction and is
not run at these sizes.

| docs | verified pairs | wall (s) | growth |
|---|---|---|---|
{rows}

Raw: `{json.dumps(results)}`
"""
    with open(os.path.join(HERE, "BASELINE.md"), "a") as fh:
        fh.write(md)


if __name__ == "__main__" and os.environ.get("STRESS_MODE", "docs") == "docs":
    main()


def synth_vectors(spark, n: int):
    """Deterministic 64-dim vectors; every 100th is a tiny perturbation of
    its predecessor (cosine >= 0.99 planted near-dups)."""
    from pyspark.sql import functions as F

    is_dup = F.pmod(F.col("id"), F.lit(100)) == 99
    base_id = F.when(is_dup, F.col("id") - 1).otherwise(F.col("id"))
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda j: (
            (F.pmod(F.xxhash64(base_id * 64 + j), F.lit(2001)) - 1000).cast("double")
            / 1000.0
            + F.when(
                is_dup,
                (F.pmod(F.xxhash64(F.col("id"), j), F.lit(21)) - 10).cast("double")
                / 1000.0,
            ).otherwise(F.lit(0.0))
        ).cast("float"),
    )
    return spark.range(n).select(
        F.col("id").alias("vec_id"), vec.alias("embedding")
    )


def run_one_embedding(n: int) -> dict:
    """Embedding near-dup ladder level: banded sign-LSH with ADAPTIVE
    band width r = max(16, ceil(log2(n)) + 3). Random-pair band
    collisions are ~n^2/2 * 2^-r: with FIXED r the candidate set grows
    quadratically once log2(n) approaches r (measured 9.9x wall for 4x
    vectors at 400k with r=16 — the verify drowned the signatures), so r
    must track log2(n) to hold candidates ~linear. The analytic recall
    floor for planted cos>=0.99 pairs at r=24/8 bands is ~0.95; measured:
    every planted pair found at every level (the wider-r dial trades a
    little recall for quadratic-collision immunity — 100 TB operators
    must pick r from corpus size, not a constant)."""
    import math

    from gfs_to_prometheus_spark.operators import similarity
    from gfs_to_prometheus_spark.session import get_spark

    spark = get_spark(app=f"stress_emb_{n}", cpus=32)
    emb = synth_vectors(spark, n).localCheckpoint()
    bands = 8
    r = max(16, math.ceil(math.log2(n)) + 3)
    kw = dict(threshold=0.99, planes=bands * r, bands=bands, dim=64)
    similarity.cosine_dup_pairs_lsh(emb, **kw).count()  # warm
    best, pairs = None, 0
    for _ in range(2):
        t0 = time.perf_counter()
        pairs = similarity.cosine_dup_pairs_lsh(emb, **kw).count()
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    return {
        "vectors": n, "pairs": pairs, "seconds": round(best, 2), "r": r,
    }


def main_embedding() -> None:
    import subprocess

    sizes = [
        int(s)
        for s in os.environ.get("STRESS_VEC_SIZES", "25000,100000").split(",")
    ]
    results = []
    for n in sizes:
        out = subprocess.run(
            [sys.executable, "-c",
             f"import sys; sys.path.insert(0, {REPO!r}); sys.path.insert(0, {HERE!r});\n"
             f"import json, stress_dedup\n"
             f"print('RESULT ' + json.dumps(stress_dedup.run_one_embedding({n})))"],
            capture_output=True, text=True, check=True,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("RESULT ")][-1]
        results.append(json.loads(line[len("RESULT "):]))
        print(json.dumps(results[-1]))
    base = results[0]
    rows = "\n".join(
        "| {d:,} | {rr} | {p} | {s} | {r:.2f}x time for {g:.0f}x vectors |".format(
            d=r["vectors"], rr=r.get("r", 16), p=r["pairs"], s=r["seconds"],
            r=r["seconds"] / base["seconds"], g=r["vectors"] / base["vectors"],
        )
        for r in results
    )
    md = f"""

## Embedding near-dup LSH scaling ladder (adaptive r)

`cosine_dup_pairs_lsh` with ADAPTIVE band width r = max(16,
ceil(log2(n))+3), 8 bands (planted cos>=0.99 near-dups every 100th
vector), min of 2 warm passes, fresh process per level. Random band
collisions are ~n^2/2 * 2^-r, so a FIXED r goes quadratic once log2(n)
reaches it (measured: 9.9x wall for 4x vectors at 400k with r=16); r
tracking log2(n) holds the candidate set ~linear — the sizing rule a
100 TB build must apply per corpus:

| vectors | r | pairs | wall (s) | growth |
|---|---|---|---|---|
{rows}

Raw: `{json.dumps(results)}`
"""
    with open(os.path.join(HERE, "BASELINE.md"), "a") as fh:
        fh.write(md)


if __name__ == "__main__" and os.environ.get("STRESS_MODE") == "embedding":
    main_embedding()


def run_one_simhash(n: int) -> dict:
    """SimHash Hamming-ball ladder level. Band width is PINNED by the
    pigeonhole guarantee (bands = max_hamming+1 = 4 -> 15-bit bands at
    60-bit fingerprints), so random band collisions ~n^2/2 * 4 * 2^-15
    MUST eventually go quadratic — this ladder measures where the knee
    sits on real word-soup docs (the documented mitigation is a wider
    multi-word fingerprint, operators/dedup.py simhash_dup_pairs)."""
    from gfs_to_prometheus_spark.operators import dedup
    from gfs_to_prometheus_spark.session import get_spark

    spark = get_spark(app=f"stress_simhash_{n}", cpus=32)
    docs = synth_docs(spark, n).localCheckpoint()
    dedup.simhash_dup_pairs(docs, max_hamming=3).count()  # warm
    best, pairs = None, 0
    for _ in range(2):
        t0 = time.perf_counter()
        pairs = dedup.simhash_dup_pairs(docs, max_hamming=3).count()
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    return {"docs": n, "pairs": pairs, "seconds": round(best, 2)}


def main_simhash() -> None:
    import subprocess

    sizes = [
        int(s)
        for s in os.environ.get("STRESS_SIMHASH_SIZES", "40000,160000,640000").split(",")
    ]
    results = []
    for n in sizes:
        out = subprocess.run(
            [sys.executable, "-c",
             f"import sys; sys.path.insert(0, {REPO!r}); sys.path.insert(0, {HERE!r});\n"
             f"import json, stress_dedup\n"
             f"print('RESULT ' + json.dumps(stress_dedup.run_one_simhash({n})))"],
            capture_output=True, text=True, check=True,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("RESULT ")][-1]
        results.append(json.loads(line[len("RESULT "):]))
        print(json.dumps(results[-1]))
    base = results[0]
    rows = "\n".join(
        "| {d:,} | {p} | {s} | {r:.2f}x time for {g:.0f}x docs |".format(
            d=r["docs"], p=r["pairs"], s=r["seconds"],
            r=r["seconds"] / base["seconds"], g=r["docs"] / base["docs"],
        )
        for r in results
    )
    md = f"""

## SimHash Hamming-ball scaling ladder (pinned band width)

`simhash_dup_pairs` (60-bit fingerprint, max_hamming=3 -> 4 pigeonhole
bands of 15 bits; the band count CANNOT widen without breaking the
exactness guarantee, so random band collisions ~n^2/2 * 4 * 2^-15 set
a structural knee). This ladder locates the knee empirically on
word-soup docs; the documented scale path past it is a wider
multi-word fingerprint (120 bits -> collisions / 2^15), not more
bands:

| docs | verified pairs | wall (s) | growth |
|---|---|---|---|
{rows}

Raw: `{json.dumps(results)}`
"""
    with open(os.path.join(HERE, "BASELINE.md"), "a") as fh:
        fh.write(md)


if __name__ == "__main__" and os.environ.get("STRESS_MODE") == "simhash":
    main_simhash()
