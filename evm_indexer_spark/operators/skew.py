"""Skew-mitigation helpers: salted aggregation and salted joins.

AQE's skew-join handling (enabled in ``session.get_spark``) splits
oversized partitions at runtime, but two shapes still need explicit
salt at 100 TB:

- **hot-key aggregation** — one key holding a large fraction of rows
  (a contract emitting most events, one language dominating a corpus)
  serializes into a single reduce task; salting spreads the partial
  aggregate across ``salt`` tasks and re-merges.
- **hot-key broadcast-ineligible join** — a fact/dim join where the dim
  is too big to broadcast and one join key dominates the fact side;
  replicating the dim row per salt value keeps the hash join while
  spreading the hot key.

Salts are derived deterministically from row content (xxhash64), so
results are reproducible and no RNG state is involved.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt_col(df: DataFrame, salt: int) -> Column:
    """Deterministic per-row salt in [0, salt) from all columns."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, str],
    salt: int = 16,
) -> DataFrame:
    """Two-stage aggregation: partial by (keys, salt), final by keys.

    *aggs* maps column → one of count/sum/min/max (the re-mergeable
    aggregates; avg must be decomposed into sum+count by the caller).
    Equivalent to ``df.groupBy(keys).agg(...)`` for any data; pays one
    extra small shuffle, wins whenever a key is hot.
    """
    mergeable = {"count", "sum", "min", "max"}
    if not set(aggs.values()) <= mergeable:
        raise ValueError(f"salted_agg supports {mergeable} only")
    partial_exprs = []
    final_exprs = []
    for col, fn in aggs.items():
        alias = f"{fn}_{col}"
        if fn == "count":
            partial_exprs.append(F.count(F.lit(1)).alias(alias))
            final_exprs.append(F.sum(alias).alias(alias))
        else:
            partial_exprs.append(getattr(F, fn)(col).alias(alias))
            merge = F.sum if fn == "sum" else getattr(F, fn)
            final_exprs.append(merge(alias).alias(alias))
    partial = df.withColumn("_salt", _salt_col(df, salt)).groupBy(
        *keys, "_salt"
    ).agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*final_exprs)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the fact side salted and the dim side replicated
    ``salt`` times, so a hot fact key spreads over ``salt`` partitions.

    Row-multiplication happens only on the dim side (×salt) — use when
    the dim is modest but over the broadcast threshold. Join result is
    identical to ``fact.join(dim, key, how)`` for inner/left joins.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left")
    f = fact.withColumn("_salt", _salt_col(fact, salt))
    d = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = f.join(d, [key, "_salt"], how)
    return out.drop("_salt")
