"""Deterministic, cross-engine-reproducible hashing primitives.

Everything probabilistic in the dedup/ANN family (MinHash permutations,
sign-LSH hyperplanes) is derived from md5 so a DuckDB oracle can
reproduce the Spark result bit-for-bit:

* `md5_lower64(col)` — the Spark twin of DuckDB's `md5_number_lower`:
  the little-endian int64 of md5 bytes 8..15 (hex chars 17..32 read as
  reversed byte pairs). Spark yields the SIGNED int64; DuckDB the
  UNSIGNED — they agree modulo 2^64, so any `pmod(h, m)` with m a
  divisor-friendly modulus (here 2^31) matches exactly.
* `minhash_coeffs(k)` — (a_p, b_p) pairs for the classic universal
  family h_p(x) = (a_p * x + b_p) mod P over the Mersenne prime
  P = 2^31 - 1, with the coefficients drawn from Python-side md5 of a
  fixed seed string. One md5 per shingle (not per permutation): the k
  permutations are cheap integer arithmetic on the shared 31-bit hash,
  and every constant is a plan-time literal both engines embed.
* `plane_weights(planes, dim)` — integer hyperplane weights in
  [-1000, 1000] from Python-side md5 of "lsh:{p}:{d}". The sign-LSH
  projection uses the scaled-int64 sum rule (floor(x * w*1e6 + 0.5)
  summed as bigint) so the bucket bits are shuffle-order independent
  and identical across engines.

The previous implementation used xxhash64, which DuckDB cannot
reproduce — that kept 4 queries() entries rows-only forever.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, functions as F

MERSENNE31 = 2_147_483_647  # 2^31 - 1
MOD31 = 2_147_483_648  # 2^31


def md5_lower64(col: Column) -> Column:
    """Signed int64 of md5 bytes 8..15 little-endian == DuckDB
    md5_number_lower (mod 2^64)."""
    h = F.md5(col)
    rev = F.concat(*[F.substring(h, 31 - 2 * j, 2) for j in range(8)])
    return F.conv(rev, 16, -10).cast("long")


def _det64(seed: str) -> int:
    return int.from_bytes(hashlib.md5(seed.encode()).digest()[:8], "big")


def minhash_coeffs(k: int) -> list[tuple[int, int]]:
    """k (a, b) pairs, a in [1, P), b in [0, P), md5-derived literals."""
    return [
        (_det64(f"minhash-a-{p}") % (MERSENNE31 - 1) + 1,
         _det64(f"minhash-b-{p}") % MERSENNE31)
        for p in range(k)
    ]


def plane_weights(planes: int, dim: int) -> list[list[int]]:
    """Integer hyperplane weights in [-1000, 1000], md5-derived literals."""
    return [
        [(_det64(f"lsh:{p}:{d}") % 2001) - 1000 for d in range(dim)]
        for p in range(planes)
    ]
