"""Column-expression helpers shared by operators and oracle SQL."""

from .portable_hash import (  # noqa: F401
    portable_hash64, portable_hash64_sql, minhash_perm, minhash_perm_sql,
    MINHASH_PRIME,
)
