"""Deduplication operators for training-data pipelines.

Four tiers, all shuffle-aware:

- **Exact**: hash-groupBy on a canonical digest — one shuffle on a
  uniformly distributed md5 key, no skew by construction.
- **MinHash + LSH**: shingle → K minhashes → band-bucket join. Candidate
  generation is a self-join on (band_id, band_hash) buckets, so the
  shuffle key space is bands × hash — uniform; at 100 TB the quadratic
  blow-up only happens *inside* buckets, which is the point of LSH.
- **SimHash**: 64-bit signature via per-token bit voting; near-dup
  candidates bucketed by signature prefix, verified by hamming distance.
- **N-gram Jaccard**: exact verification on candidate pairs via
  array_intersect/array_union — only ever run post-LSH, never all-pairs.

Everything is built from native expressions (xxhash64, transform,
aggregate, zip_with) — no Python UDFs, wholly codegen-able.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import fingerprint


def _norm_tokens(col: Column) -> Column:
    """Lowercase, strip punctuation, whitespace-split."""
    return F.split(
        F.regexp_replace(F.lower(col), r"[^a-z0-9\s]", ""), r"\s+"
    )


def shingles(col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles as an array<string> (empty-safe)."""
    c = F.col(col) if isinstance(col, str) else col
    toks = _norm_tokens(c)
    return F.when(F.size(toks) < n, F.array(F.concat_ws(" ", toks))).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
    )


def minhash_signature(shingle_col: Column, num_hashes: int = 64) -> Column:
    """K independent minhashes: min over shingles of xxhash64(shingle, seed_k).

    xxhash64 is a JVM-native 64-bit hash; distinct seeds give the
    independent hash family. Returns array<bigint> of length K.
    """
    return F.array(
        *[
            F.array_min(
                F.transform(shingle_col, lambda s: F.xxhash64(s, F.lit(k)))
            )
            for k in range(num_hashes)
        ]
    )


def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup by canonical fingerprint: one row per distinct content
    with the minimum id as the keeper and the duplicate count."""
    return (
        df.select(F.col(id_col).alias("id"), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min("id").alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def minhash_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """MinHash-LSH near-duplicate pairs with exact Jaccard verification.

    Plan shape (scale path):
      1. signature job — narrow, no shuffle;
      2. explode to ``bands`` rows/doc, shuffle on (band, band_hash) —
         uniform key space;
      3. in-bucket self-join (small groups) → candidate pairs, deduped;
      4. exact Jaccard on candidates only via shingle-set intersection.

    Returns (id_a, id_b, jaccard) with id_a < id_b,
    jaccard >= threshold.
    """
    rows_per_band = num_hashes // bands
    sig = (
        df.select(
            F.col(id_col).alias("id"),
            shingles(text_col, shingle_n).alias("sh"),
        )
        .withColumn("sig", minhash_signature(F.col("sh"), num_hashes))
    )
    banded = sig.select(
        "id",
        "sh",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.slice("sig", b * rows_per_band + 1, rows_per_band), b
                    ).alias("bh"),
                ),
            )
        ).alias("bb"),
    ).select("id", "sh", "bb.band", "bb.bh")

    left = banded.alias("a")
    right = banded.alias("b")
    cand = (
        left.join(
            right,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sh").alias("sh_a"),
            F.col("b.sh").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    inter = F.size(F.array_intersect(F.array_distinct("sh_a"), F.array_distinct("sh_b")))
    union = F.size(F.array_union(F.array_distinct("sh_a"), F.array_distinct("sh_b")))
    return (
        cand.withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash_bitvotes(text_col: Column | str) -> Column:
    """Per-document SimHash bit votes: array<long>[64], one pass over
    tokens via array-aggregate (zip_with accumulate) — no shuffle, no UDF."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = _norm_tokens(c)
    zero = F.array(*[F.lit(0).cast("long") for _ in range(64)])

    def token_bits(t: Column) -> Column:
        h = F.xxhash64(t)
        return F.array(
            *[
                F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, F.lit(1))
                .otherwise(F.lit(-1))
                .cast("long")
                for i in range(64)
            ]
        )

    return F.aggregate(
        toks, zero, lambda acc, t: F.zip_with(acc, token_bits(t), lambda a, b: a + b)
    )


def simhash_from_votes(votes_col: Column | str) -> Column:
    """Fold a bit-vote array into the 64-bit signature (sign → bit).

    Takes a *materialized column* (withColumn the votes first) so the
    vote aggregate is computed once, not 64 times.
    """
    v = F.col(votes_col) if isinstance(votes_col, str) else votes_col
    sig = F.lit(0).cast("long")
    for i in range(64):
        bit = F.when(
            F.element_at(v, i + 1) > 0, F.shiftleft(F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long"))
        sig = sig.bitwiseOR(bit)
    return sig


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit signatures (bit_count of xor)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    prefix_bits: int = 16,
) -> DataFrame:
    """SimHash near-dup pairs bucketed by signature prefix.

    The prefix bucket bounds the self-join (at most one of the 4 16-bit
    blocks must match exactly for hamming <= 3 — we use the top block as
    a recall-oriented single probe; multi-probe is a straightforward
    extension by unioning the 4 block buckets).
    """
    sigs = (
        df.select(F.col(id_col).alias("id"), simhash_bitvotes(text_col).alias("votes"))
        .withColumn("sig", simhash_from_votes("votes"))
        .drop("votes")
        .withColumn("bucket", F.shiftrightunsigned("sig", 64 - prefix_bits))
    )
    a, b = sigs.alias("a"), sigs.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            hamming64(F.col("a.sig"), F.col("b.sig")).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs found by LSH — thin
    wrapper that runs the full MinHash pipeline with a high threshold."""
    return minhash_near_duplicates(
        df,
        id_col,
        text_col,
        shingle_n=shingle_n,
        jaccard_threshold=threshold,
    )
