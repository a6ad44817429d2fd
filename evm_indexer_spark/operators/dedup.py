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
    """Word n-gram shingles as an array<string> (empty-safe).

    NOTE: higher-order ``transform``/``slice`` lambdas are evaluated
    interpreted (no whole-stage codegen), so this per-row form is ~20×
    slower than the exploded-row form — use ``shingle_rows`` in any
    pipeline; this stays for ad-hoc single-column use.
    """
    c = F.col(col) if isinstance(col, str) else col
    toks = _norm_tokens(c)
    return F.when(F.size(toks) < n, F.array(F.concat_ws(" ", toks))).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
    )


def shingle_rows(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, distinct: bool = True
) -> DataFrame:
    """(id, shingle) rows via posexplode + window leads.

    This shape stays fully codegen'd (split/explode/lead/concat are all
    native) and the window's hash-partition by id both parallelizes the
    computation and pre-distributes rows for the downstream signature
    aggregate. Documents shorter than *n* tokens contribute their whole
    text as a single shingle (same semantics as ``shingles``).

    NOTE: an array-indexed form (carry the token array through the
    explode, shingle = toks[k..k+n-1]) avoids the window's exchange+sort
    but measured 3× SLOWER — Tungsten copies the whole array into every
    exploded row, O(tokens²) bytes per document. The lead-window keeps
    rows narrow.

    ``distinct=True`` gives set semantics (required for Jaccard sizes /
    intersections) at the price of a full shuffle; min-aggregation is
    idempotent to duplicates, so the MinHash signature path passes
    ``False`` and skips that shuffle.
    """
    from pyspark.sql import Window as W

    toks = _norm_tokens(F.col(text_col))
    e = df.select(
        F.col(id_col).alias("id"),
        F.size(toks).alias("ntok"),
        F.posexplode(toks).alias("pos", "t"),
    )
    w = W.partitionBy("id").orderBy("pos")
    leads = [F.col("t")] + [F.lead("t", i).over(w) for i in range(1, n)]
    full = (
        e.filter(F.col("ntok") >= n)
        .select(
            "id",
            F.concat_ws(" ", *leads).alias("s"),
            F.lead("t", n - 1).over(w).alias("_last"),
        )
        .filter(F.col("_last").isNotNull())
        .drop("_last")
    )
    short = (
        df.select(
            F.col(id_col).alias("id"),
            F.concat_ws(" ", _norm_tokens(F.col(text_col))).alias("s"),
        )
        .filter(F.size(_norm_tokens(F.col(text_col))) < n)
    )
    out = full.unionByName(short)
    return out.distinct() if distinct else out


def _derive_hash(h: Column, k: int) -> Column:
    """k-th member of the hash family: rehash the base 64-bit hash with
    the member index. Hashing a fixed-width long is a handful of
    multiply-rotate steps in codegen — unlike re-hashing the shingle
    string K times — and avoids wrapping-multiply arithmetic that ANSI
    mode (Spark 4 default) rejects."""
    return F.xxhash64(h, F.lit(k))


def minhash_signature(shingle_col: Column, num_hashes: int = 64) -> Column:
    """K minhashes per row: min over shingles of a_k*xxhash64(s)+b_k.

    One JVM-native string xxhash64 per shingle; the K-family rehashes
    that fixed-width long — constant-time per member instead of K full
    string hashes, keeping runtime and generated whole-stage code small.
    Returns array<bigint> of length K.

    Per-row expression form — fine for ad-hoc use on narrow data; the
    dedup pipeline uses the explode/groupBy form in
    ``_minhash_signatures`` which partial-aggregates map-side.
    """
    hashes = F.transform(shingle_col, lambda s: F.xxhash64(s))
    return F.array(
        *[
            F.array_min(F.transform(hashes, lambda h: _derive_hash(h, k)))
            for k in range(num_hashes)
        ]
    )


def _minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, num_hashes: int, shingle_n: int
) -> DataFrame:
    """(id, sig array<bigint>[K]) via explode → base hash → K min aggregates.

    Scale shape: one narrow shuffle keyed by id with map-side combine
    (each task pre-mins its local shingles). The string xxhash64 runs
    once per shingle; each family member rehashes that fixed-width long,
    so the K aggregate expressions stay small in both generated code and
    per-row work. Duplicate shingles are left in (min is idempotent),
    saving the set-dedup shuffle.
    """
    exploded = shingle_rows(df, id_col, text_col, shingle_n, distinct=False).withColumn(
        "h0", F.xxhash64("s")
    )
    mins = [
        F.min(_derive_hash(F.col("h0"), k)).alias(f"h{k}")
        for k in range(num_hashes)
    ]
    agg = exploded.groupBy("id").agg(*mins)
    return agg.select(
        "id", F.array(*[F.col(f"h{k}") for k in range(num_hashes)]).alias("sig")
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
    num_hashes: int = 16,
    bands: int = 8,
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
    # signatures in one fused pass (shingle explode → K min aggregates);
    # corpus-wide shingles are never materialized or cached — verification
    # recomputes shingles only for the LSH candidates, whose count is
    # bounded by band selectivity, not corpus size
    sig = _minhash_signatures(df, id_col, text_col, num_hashes, shingle_n)
    # slim banded table: (id, band, band_hash) — 16 bytes/row through the
    # bucket shuffle; shingle arrays are NOT carried here
    banded = sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.slice("sig", b * rows_per_band + 1, rows_per_band),
                            F.lit(b),
                        ).alias("bh"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bh")

    cand = (
        banded.alias("a")
        .join(
            banded.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        # consumed twice below (pair join + id prune); without persist the
        # whole signature pipeline would be recomputed per consumer
        .persist()
    )

    # exact Jaccard verification in exploded-row form: |A∩B| by joining
    # candidate pairs against shingle rows on (id, shingle) — uniform keys,
    # no set arrays, no broadcast-size constraint. Shingles are first
    # pruned to candidate ids (semi-join), so every stage here is bounded
    # by |candidates|, never |corpus|.
    cand_ids = (
        cand.select(F.col("id_a").alias("id"))
        .union(cand.select(F.col("id_b").alias("id")))
        .distinct()
    )
    docs_c = df.join(
        cand_ids.withColumnRenamed("id", id_col), id_col, "left_semi"
    )
    # candidate shingles feed three consumers (set sizes + both sides of
    # the intersection join) — persist the small candidate-bounded set so
    # the shingle pipeline doesn't run three times
    sh_c = shingle_rows(docs_c, id_col, text_col, shingle_n).persist()
    sizes = sh_c.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        cand.join(sh_c.withColumnRenamed("id", "id_a"), "id_a")
        .join(
            sh_c.select(F.col("id").alias("id_b"), "s"), ["id_b", "s"], "inner"
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    pairs = (
        inter.join(sizes.select(F.col("id").alias("id_a"), F.col("n").alias("n_a")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("n").alias("n_b")), "id_b")
    )
    jac = F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter"))
    return (
        pairs.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash_signatures(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, sig) 64-bit SimHash per document.

    Scale shape: explode tokens → xxhash64 once per token → 64 signed-bit
    sums as aggregate columns (map-side combined) → fold sums into the
    signature. All whole-stage-codegen; one narrow shuffle keyed by id.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(_norm_tokens(F.col(text_col))).alias("t"),
    ).withColumn("h", F.xxhash64("t"))
    # per-bit +1/-1 voting expressed as popcount vs total: the bit-i vote
    # sum is 2*ones_i - n, positive iff 2*ones_i > n. Summing the bare
    # extracted bit keeps each aggregate a single shift-and-add — far
    # smaller generated code than 64 conditional aggregates.
    ones = [
        F.sum(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1))).alias(f"o{i}")
        for i in range(64)
    ]
    agg = toks.groupBy("id").agg(F.count(F.lit(1)).alias("n"), *ones)
    sig = F.lit(0).cast("long")
    for i in range(64):
        bit = F.when(
            F.col(f"o{i}") * 2 > F.col("n"),
            F.shiftleft(F.lit(1).cast("long"), i),
        ).otherwise(F.lit(0).cast("long"))
        sig = sig.bitwiseOR(bit)
    return agg.select("id", sig.alias("sig"))


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit signatures (bit_count of xor)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    n_blocks: int = 4,
) -> DataFrame:
    """SimHash near-dup pairs via multi-block bucketing.

    Each signature is exploded into ``n_blocks`` (block_idx, block_value)
    bucket keys; candidates are pairs sharing any block verbatim, then
    verified by full hamming distance. By pigeonhole this is *exact* for
    ``max_hamming < n_blocks`` (some block must be untouched) and
    high-recall beyond. The bucket join shuffles slim
    (id, sig, blk, value) rows on a uniform key — candidate blow-up is
    confined to within-bucket groups, same shape as the MinHash band
    join.
    """
    assert 64 % n_blocks == 0
    width = 64 // n_blocks
    mask = (1 << width) - 1
    # the bucketed signatures self-join: persist so the signature
    # aggregation runs once, not per join side
    sigs = simhash_signatures(df, id_col, text_col).persist()
    bucketed = sigs.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("blk"),
                        F.shiftrightunsigned("sig", b * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("bv"),
                    )
                    for b in range(n_blocks)
                ]
            )
        ).alias("bb"),
    ).select("id", "sig", "bb.blk", "bb.bv")
    a, b = bucketed.alias("a"), bucketed.alias("b")
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            hamming64(F.col("a.sig"), F.col("b.sig")).alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
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


def jaccard_all_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    threshold: float = 0.1,
) -> DataFrame:
    """Exact all-pairs n-gram Jaccard via a shingle self-join.

    Shape: distinct (id, shingle) rows → equi-join on the shingle →
    per-pair intersection counts → |A∪B| = |A|+|B|−|A∩B|. The join
    shuffles on the shingle key, so very common shingles are skew — at
    100 TB this is the *verification* stage over an LSH-bounded subset
    (``minhash_near_duplicates``), never a whole-corpus operation.
    Output: (id_a, id_b, jaccard double rounded to 4) with id_a < id_b.
    """
    # three consumers (sizes + both self-join sides): persist or the
    # shingle pipeline runs three times
    sh = shingle_rows(df, id_col, text_col, shingle_n).persist()
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col("id").alias("id_a"), "s")
    b = sh.select(F.col("id").alias("id_b"), "s")
    inter = (
        a.join(b, "s")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sz_a = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"))
    sz_b = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"))
    jac = F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
    return (
        inter.join(sz_a, "id_a")
        .join(sz_b, "id_b")
        .filter(jac >= threshold)
        .select("id_a", "id_b", F.round(jac, 4).alias("jaccard"))
    )


def winnow_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (the MOSS rolling-hash scheme):
    hash every shingle, keep the minimum of each *window* consecutive
    hashes, dedup — a position-robust fingerprint set whose overlap
    detects partial copies that whole-document fingerprints miss.

    Engine-portable hashing (md5-derived 60-bit int, like
    ``corpus.hash_bucket``) so the fingerprints — not just pair
    decisions — are reproducible in any engine; exact SQL oracle in the
    catalog (q49). One narrow pass + two windows over the same
    id-partitioning, no extra shuffle. Documents shorter than
    ``shingle_n`` tokens produce no fingerprints (nothing to window).
    """
    from pyspark.sql import Window as W

    toks = _norm_tokens(F.col(text_col))
    e = df.select(
        F.col(id_col).alias("id"),
        F.size(toks).alias("ntok"),
        F.posexplode(toks).alias("pos", "t"),
    )
    w_lead = W.partitionBy("id").orderBy("pos")
    leads = [F.col("t")] + [F.lead("t", i).over(w_lead) for i in range(1, shingle_n)]
    sh = (
        e.filter(F.col("ntok") >= shingle_n)
        .select(
            "id",
            "pos",
            F.concat_ws(" ", *leads).alias("s"),
            F.lead("t", shingle_n - 1).over(w_lead).alias("_last"),
        )
        .filter(F.col("_last").isNotNull())
        .withColumn(
            "h", F.conv(F.substring(F.md5("s"), 1, 15), 16, 10).cast("long")
        )
    )
    w_min = (
        W.partitionBy("id").orderBy("pos").rowsBetween(W.currentRow, window - 1)
    )
    w_all = W.partitionBy("id")
    return (
        sh.select(
            "id",
            "pos",
            F.min("h").over(w_min).alias("fp"),
            F.count(F.lit(1)).over(w_all).alias("_nsh"),
        )
        .filter(F.col("pos") <= F.col("_nsh") - window)
        .select("id", "fp")
        .distinct()
    )
