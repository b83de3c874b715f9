"""Explicit skew-mitigation operators.

AQE's skew-join split (pinned engaged by tests/test_aqe.py) is the
first answer to hot keys — but it only helps sort-merge/shuffle-hash
joins whose skew shows up in map-output sizes, and only within one
join. Salting is the manual, always-available form: it reshapes the
DATA so any downstream engine treatment works — the technique the
brief's scale notes call out alongside broadcasting and AQE.

``salted_join``: equi-join where the big (skewed) side sprays each row
into one of ``n_salt`` sub-keys and the small side replicates
``n_salt``x, so a key that previously landed on one reducer now spreads
over ``n_salt`` of them. Join result is IDENTICAL to the plain join
(inner/left): every (key, salt) pair meets exactly one replica of the
small-side rows for that key.

Cost model: small side grows n_salt x (only acceptable when |small| *
n_salt still fits comfortably — that's what the broadcast/shuffle
budget buys back from the dead hot reducer); big side is untouched
beyond one extra int column. Salt is deterministic (xxhash64 of the
whole row via monotonically-increasing id is NOT — we hash the key
columns plus a uniform spray column) so retries/replays are stable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salt: int = 8,
    how: str = "inner",
    spray_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Skew-safe equi-join of a big (hot-keyed) frame against a small
    frame, identical results to ``big.join(small, on, how)``.

    ``how`` supports "inner" and "left" (the shapes where the small
    side is a lookup). ``spray_cols``: columns of ``big`` whose hash
    picks the salt bucket — defaults to ALL non-key columns, giving a
    uniform deterministic spray even when the key is constant; pass an
    explicit unique column (an id) when rows can be full duplicates.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner|left, got {how!r}")
    keys = list(on)
    spray = list(
        spray_cols
        if spray_cols is not None
        else [c for c in big.columns if c not in keys]
    )
    if not spray:
        raise ValueError(
            "salted_join: no spray columns — pass spray_cols (a unique "
            "id column of the big side)"
        )
    b = big.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in spray]), F.lit(n_salt)).cast(
            "int"
        ),
    )
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    ).withColumn("__salt", F.col("__salt").cast("int"))
    out = b.join(s, keys + ["__salt"], how)
    return out.drop("__salt")
