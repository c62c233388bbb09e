"""Portable integer hashing shared across operators and oracles.

ONE implementation of the overflow-free 32-bit Knuth multiplicative
hash: ``h32(x) = (x * 2654435761) mod 2^32`` computed in 16-bit limbs
so every intermediate stays < 2^49 (the naive product exceeds int64 at
x ~ 3.47e9). Consumers: IVF centroid sampling, pack_chunks bucketing,
and — transcribed as plain arithmetic — the q78 DuckDB oracle; keeping
the expression in one place is what keeps those three bit-identical.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

KNUTH = 2654435761
M32 = 4294967296


def knuth_hash32(col: Column | str) -> Column:
    """(x * KNUTH) mod 2^32 via 16-bit limb decomposition:
    x*K = (x>>16)*K*2^16 + (x&0xFFFF)*K  (mod 2^32)."""
    x = F.pmod(F.col(col) if isinstance(col, str) else col, F.lit(M32))
    hi = (
        F.pmod(F.floor(x / F.lit(65536)) * F.lit(KNUTH), F.lit(M32))
        * F.lit(65536)
    )
    lo = F.pmod(x, F.lit(65536)) * F.lit(KNUTH)
    return F.pmod(F.pmod(hi, F.lit(M32)) + F.pmod(lo, F.lit(M32)), F.lit(M32))


def knuth_bucket(col: Column | str, n_buckets: int) -> Column:
    """High-bits multiplicative bucket: floor(h32 * n / 2^32) — mixes
    low-bit id structure, unlike the degenerate ``(x*K) mod n`` form
    (for even n that reduces to a permutation of ``x mod n``)."""
    return F.floor(knuth_hash32(col) * F.lit(n_buckets) / F.lit(M32)).cast(
        "int"
    )
