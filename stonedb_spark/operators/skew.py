"""Skew-mitigated equi-join: key salting.

The reference never needs this — single-node, its hash join partitions
the build side in-process and a hot key only costs cache locality
(JoinerHash 'too many conflicts' fallback,
storage/tianmu/optimizer/joiner_hash.cpp:52 / joiner.cpp:97-104).  On a
1000-executor shuffle join, ONE hot key lands its entire value stream on
ONE reducer: the stage runs at the speed of that straggler, or OOMs.
Two layers of defense here:

1. AQE skew-join (session default, skewJoin.enabled) — splits oversized
   partitions at runtime.  Preferred; no query change.
2. Explicit salting (this module) — for the cases AQE can't fix (a
   single key too big for ANY split that must still hash-join, e.g. the
   null-key flood or a power-law fact-to-fact join): the skewed side
   gets a DETERMINISTIC salt in [0, n) derived from a high-cardinality
   disambiguator column; the other side is replicated n×.  The join key
   becomes (key, salt) → the hot key spreads over n reducers.  Result
   set is provably identical to the unsalted join (each original pair
   matches in exactly one salt bucket).

Salt derivation uses hash(disambiguator) — NOT rand() — so the operator
stays deterministic under retries/AQE re-plans (a re-executed task must
salt a row identically or rows are lost/duplicated at shuffle retry).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt__"


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str] | str,
    n_salts: int = 8,
    disambiguator: str | Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed``'s key distribution is power-law.

    ``other`` is replicated ``n_salts``× (choose n_salts ≈ hot-key rows
    per target partition; replication cost is n_salts × |other|, so keep
    the smaller/dimension side as ``other``).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if disambiguator is None:
        # any non-key column spreads a hot key; fall back to whole-row hash
        non_key = [c for c in skewed.columns if c not in keys]
        dis = F.hash(*[F.col(c) for c in non_key]) if non_key else F.hash(*keys)
    else:
        dis = F.col(disambiguator) if isinstance(disambiguator, str) else disambiguator
    left = skewed.withColumn(SALT_COL, F.pmod(F.hash(dis), F.lit(n_salts)))
    right = other.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return left.join(right, keys + [SALT_COL], how).drop(SALT_COL)


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, str],
    n_salts: int = 8,
    salt_source: str | Column | None = None,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys: phase 1 aggregates
    on (keys + salt) — the hot key's rows split across ``n_salts``
    reducers instead of melting one — phase 2 re-aggregates the
    ``n_salts`` partial rows per key.  ``aggs`` maps column → one of
    count/sum/min/max (the re-aggregable functions; AVG callers
    decompose into sum+count themselves).  Phase-2 input is
    |keys × n_salts| rows — negligible — so the extra phase costs one
    tiny shuffle.  Catalyst's own partial aggregation usually makes
    this unnecessary; it exists for agg pipelines where a single
    reducer key still dominates (e.g. high-cardinality DISTINCT inside
    the group, where map-side combine can't help).

    The salt is deterministic (hash of ``salt_source``, default the
    first agg column) so re-runs are stable.
    """
    phase2 = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}
    for fn in aggs.values():
        if fn not in phase2:
            raise ValueError(f"non-re-aggregable function {fn!r}")
    src = F.col(next(iter(aggs))) if salt_source is None else (
        F.col(salt_source) if isinstance(salt_source, str) else salt_source
    )
    salt = F.pmod(F.xxhash64(src.cast("string")), F.lit(n_salts))
    p1 = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(*[getattr(F, fn)(c).alias(f"{c}__{fn}") for c, fn in aggs.items()])
    )
    return (
        p1.groupBy(*keys)
        .agg(
            *[
                getattr(F, phase2[fn])(f"{c}__{fn}").alias(f"{fn}_{c}")
                for c, fn in aggs.items()
            ]
        )
    )
