"""Cross-engine deterministic hashing (Spark ⇄ DuckDB).

The correctness gate runs every query twice — PySpark and a DuckDB oracle —
and compares value hashes. Hash-dependent operators (MinHash, SimHash,
fingerprints) therefore need a string→int64 hash that BOTH engines compute
identically. Spark's ``xxhash64`` and DuckDB's ``hash()`` differ, so we
define one from primitives both share: the first 15 hex digits of ``md5``
(60 bits, always < 2^63, never negative):

* Spark SQL:  ``cast(conv(substring(md5(s), 1, 15), 16, 10) as bigint)``
* DuckDB SQL: ``cast('0x' || substring(md5(s), 1, 15) as bigint)``

MinHash permutations are the classic universal-hash family
``(a_i · h + b_i) mod p`` with p = 2^61 − 1 (a Mersenne prime) and seeded
odd constants — pure integer arithmetic, expressible in both dialects.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

MINHASH_PRIME = (1 << 61) - 1

# deterministic permutation constants (seeded LCG, public constants)


def _perm_constants(n: int, seed: int = 42) -> list[tuple[int, int]]:
    state = seed
    out = []
    for _ in range(n):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = (state | 1) % MINHASH_PRIME
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = state % MINHASH_PRIME
        out.append((a, b))
    return out


PERMS_16 = _perm_constants(16)


def portable_hash64(col: Column | str) -> Column:
    """60-bit non-negative hash of a string column (Spark side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def portable_hash64_sql(expr: str) -> str:
    """Same hash in DuckDB SQL (for oracle queries)."""
    return f"CAST('0x' || substring(md5({expr}), 1, 15) AS BIGINT)"


def minhash_perm(h: Column, i: int) -> Column:
    """i-th MinHash permutation of a hash column (Spark side).

    62-bit inputs × 61-bit constants overflow int64, so the product is
    computed in DECIMAL(38,0) then reduced mod p — identical in DuckDB with
    HUGEINT. The result always fits comfortably in int64.
    """
    a, b = PERMS_16[i]
    prod = h.cast("decimal(38,0)") * F.lit(a).cast("decimal(38,0)") + F.lit(b)
    return F.pmod(prod, F.lit(MINHASH_PRIME).cast("decimal(38,0)")).cast("long")


def minhash_perm_sql(expr: str, i: int) -> str:
    """Same permutation in DuckDB SQL (HUGEINT arithmetic)."""
    a, b = PERMS_16[i]
    return (f"CAST((CAST({expr} AS HUGEINT) * {a} + {b}) % {MINHASH_PRIME} AS BIGINT)")
