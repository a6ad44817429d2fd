"""Driver-facing query catalog: one entry per implemented operator class
from SURVEY.md §2, expressed over the driver's generic tables
(TESTDATA.md), each with an exact DuckDB oracle-SQL twin.

Conventions for hash-stable oracle parity:
- every computed column is aliased identically in Spark and SQL;
- money aggregates go through DecimalType (exact, engine-independent) —
  never raw double sums;
- float-derived scores are computed in double on both sides and rounded;
- top-k queries always carry a deterministic tie-break key.

Hash-family entries (MinHash-LSH, SimHash, ANN variants) are oracled
too: at gate scale each runs full-recall parameters, so its output
equals a brute-force truth DuckDB can compute — all-pairs Jaccard for
q27, all-pairs Hamming over engine-portable md5-based signatures for
q28, exact cosine top-k for both q34 variants. Above the gate cutoff
the entries switch to their scale parameterizations.
"""

from __future__ import annotations

import os

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions import text as TX
from .operators import corpus, dedup, multimodal, similarity, temporal
from .sources.tables import (
    load_table,
    fixture_stamp,
    table_column_bytes,
    table_column_range,
    table_rowcount,
)

SparkQuery = Callable[[SparkSession, str], DataFrame]

# registry: name -> (spark_fn, oracle_sql | None)
_REGISTRY: dict[str, tuple[SparkQuery, str | None]] = {}


def register(name: str, sql: str | None):
    def deco(fn: SparkQuery) -> SparkQuery:
        _REGISTRY[name] = (fn, sql)
        return fn

    return deco


def queries() -> dict[str, SparkQuery]:
    return {name: fn for name, (fn, _) in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in _REGISTRY.items() if sql is not None}


def _dec(col, p=18, s=2):
    return F.col(col).cast(f"decimal({p},{s})") if isinstance(col, str) else col.cast(
        f"decimal({p},{s})"
    )


# -- one-task tier byte gates (round 16) -------------------------------------
#
# Every one-task route (q27/q28/q35/q40/q66/q67/q73/q76/q79/q80-q83)
# used to gate on footer ROWCOUNT alone; a corpus that lands just under
# the row cap with pathological per-row payloads (few rows × megabyte
# documents, or huge embedding dims) would serialize real work into one
# Arrow task while the distributed plan handles it fine. The gates below
# bound the task's INPUT BYTES from the same parquet footer metadata
# (``table_column_bytes`` — zero plan-build jobs; None, i.e. footerless
# or non-local sources, routes DISTRIBUTED, the always-correct path).
#
# Cap calibration (measured, see OPTIMIZATION_r16.md "byte gates"):
# the text kernels process ~1.5 MB of footer text in ~0.2-0.5 s of
# single-task Python at sf0.1 and ~15 MB in ~4 s (the sf1 single-task
# md5 probe) — the distributed plans beat one task well before that, so
# the text cap sits at 8 MB (~5× the sf0.1 gate volume, comfortably
# inside the measured-win region at the sf0.3 crossover point). The
# vector kernels are one numpy matmul whose input at sf1 is 3.5 MB of
# footer bytes; 32 MB (~20k rows × dim 400 float32) bounds the matmul
# and the candidate verify far below single-task pain.
ONETASK_TEXT_BYTES_CAP = 8 << 20
ONETASK_VEC_BYTES_CAP = 32 << 20


def _onetask_bytes_ok(sf: str, table: str, col: str, cap: int) -> bool:
    b = table_column_bytes(sf, table, col)
    return b is not None and b <= cap


# ---------------------------------------------------------------------------
# Flagship: TPC-H Q1-style pricing summary (scan + filter + groupBy agg).
# GroupBy does not exist in the reference (SURVEY §2.4) — this demonstrates
# the engine going beyond parity while staying decimal-exact for the oracle.
# ---------------------------------------------------------------------------

@register(
    "q01_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_qty,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_base_price,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_disc_price,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01(spark: SparkSession, sf: str) -> DataFrame:
    # Sums run in exact decimal on BOTH engines; the final cast to double is
    # transport-only so the pandas dtypes line up for the driver's value
    # hash (DuckDB's .df() renders DECIMAL as float64, Spark as Decimal —
    # equal values, different hashes).
    from .operators.partitioning import spread_small_scan

    # the driver parquet is one row group per table, so the scan is one
    # task and the decimal partial agg runs serial (same starvation as
    # q70); spreading parallelizes the partials — measured 0.88/0.96/1.03
    # unspread vs 0.70/0.71/1.02 spread warm at sf0.1 (4 runs each).
    # At real scale (many row groups) spread_small_scan is a no-op.
    # Round 15 (guide §2.3, project before the exchange): filter and
    # prune to the 6 consumed columns BEFORE the spread repartition —
    # the round-robin exchange otherwise ships all 16 lineitem columns
    # (1.04 → 0.72s interleaved medians at sf0.1; rows identical, the
    # projection/filter commute with repartition).
    li = spread_small_scan(
        load_table(spark, sf, "lineitem")
        .select(
            "l_returnflag", "l_linestatus", "l_quantity",
            "l_extendedprice", "l_discount", "l_shipdate",
        )
        .filter(
            F.col("l_shipdate")
            <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz")
        )
    )
    disc_price = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("decimal(38,2)").cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("decimal(38,2)").cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("decimal(38,4)").cast("double").alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Projections / filters (SURVEY §2.2)
# ---------------------------------------------------------------------------

@register(
    "q02_range_scans",  # P1+P5+P6+W1: number-range + time-range predicates,
    # narrow projection, sorted output (GetAllBlockNumbersInRange /
    # GetBlocksByTimeRange analogs in one pruned scan)
    """
    SELECT event_id, ts, user_id, event_type, value FROM events
    WHERE event_id BETWEEN 1000 AND 40000
      AND ts >= TIMESTAMP '2024-01-05 00:00:00'
      AND ts < TIMESTAMP '2024-01-06 00:00:00'
    ORDER BY event_id
    """,
)
def q02(spark, sf):
    ev = load_table(spark, sf, "events")
    return (
        ev.filter(
            F.col("event_id").between(1000, 40000)
            & (F.col("ts") >= F.lit("2024-01-05 00:00:00").cast("timestamp_ntz"))
            & (F.col("ts") < F.lit("2024-01-06 00:00:00").cast("timestamp_ntz"))
        )
        .select("event_id", "ts", "user_id", "event_type", "value")
        .orderBy("event_id")
    )


@register(
    "q03_point_lookups",  # P4+P9+W3: single-key point read (GetBlockByHash)
    # and composite-PK read (event by blockhash+index), each LIMIT 1,
    # cross-joined into one hash-checkable row
    """
    SELECT o.o_orderkey, o.o_custkey, o.o_totalprice,
           l.l_orderkey AS li_orderkey, l.l_linenumber, l.l_quantity
    FROM (SELECT * FROM orders WHERE o_orderkey = 32) o
    CROSS JOIN (SELECT * FROM lineitem
                WHERE l_orderkey = 7 AND l_linenumber = 1) l
    """,
)
def q03(spark, sf):
    o = (
        load_table(spark, sf, "orders")
        .filter(F.col("o_orderkey") == 32)
        .limit(1)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )
    li = (
        load_table(spark, sf, "lineitem")
        .filter((F.col("l_orderkey") == 7) & (F.col("l_linenumber") == 1))
        .limit(1)
        .select(
            F.col("l_orderkey").alias("li_orderkey"), "l_linenumber", "l_quantity"
        )
    )
    return o.crossJoin(li)


@register(
    "q05_predicate_filters",  # P7+P8: equality (from/to/origin analog) and
    # non-empty-string inequality (contract <> '') in one filtered scan
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_linestatus FROM lineitem
    WHERE l_returnflag = 'R' AND l_linestatus <> 'F'
    """,
)
def q05(spark, sf):
    return (
        load_table(spark, sf, "lineitem")
        .filter((F.col("l_returnflag") == "R") & (F.col("l_linestatus") != "F"))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_linestatus")
    )


@register(
    "q08_positional_array_match",  # P11: element_at(topics,k)==v analog
    """
    SELECT doc_id, text FROM documents
    WHERE len(regexp_split_to_array(text, '\\s+')) > 1
      AND regexp_split_to_array(text, '\\s+')[2] = 'agg'
    """,
)
def q08(spark, sf):
    doc = load_table(spark, sf, "documents")
    toks = F.split(F.col("text"), r"\s+")
    return doc.filter(
        (F.size(toks) > 1) & (F.element_at(toks, 2) == "agg")
    ).select("doc_id", "text")


# ---------------------------------------------------------------------------
# Joins (SURVEY §2.3)
# ---------------------------------------------------------------------------

@register(
    "q09_broadcast_join_number_range",  # J1+P2: fact ⋈ small dim by key range
    """
    SELECT l.l_orderkey, l.l_partkey, l.l_suppkey, l.l_linenumber, l.l_quantity
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey >= 500 AND o.o_orderkey <= 700
    """,
)
def q09(spark, sf):
    li = load_table(spark, sf, "lineitem")
    o = load_table(spark, sf, "orders").filter(F.col("o_orderkey").between(500, 700))
    return li.join(
        F.broadcast(o.select("o_orderkey")),
        li["l_orderkey"] == F.col("o_orderkey"),
        "inner",
    ).select("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity")


@register(
    "q10_broadcast_join_time_range",  # J2: window on the dim's time column
    """
    SELECT l.l_orderkey, l.l_partkey, l.l_linenumber, l.l_extendedprice
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1995-02-01 00:00:00'
    """,
)
def q10(spark, sf):
    li = load_table(spark, sf, "lineitem")
    o = load_table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1995-02-01 00:00:00").cast("timestamp_ntz"))
    )
    return li.join(
        F.broadcast(o.select("o_orderkey")),
        li["l_orderkey"] == F.col("o_orderkey"),
        "inner",
    ).select("l_orderkey", "l_partkey", "l_linenumber", "l_extendedprice")


@register(
    "q11_scalar_counts",  # A1+A2+A6: filtered count, count-over-join-window,
    # and the sync-progress derivation — the reference's global scalar
    # aggregates (it has no GROUP BY) in one cross-joined row
    """
    SELECT jw.join_window_count, fc.filtered_count,
           sp.block_count, sp.head, sp.progress_pct
    FROM (
      SELECT count(*) AS join_window_count
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND o.o_orderdate < TIMESTAMP '1995-02-01 00:00:00') jw
    CROSS JOIN (
      SELECT count(*) AS filtered_count FROM lineitem
      WHERE l_discount >= 0.05) fc
    CROSS JOIN (
      SELECT count(*) AS block_count, max(o_orderkey) AS head,
             count(*) / (max(o_orderkey) + 1) * 100 AS progress_pct
      FROM orders) sp
    """,
)
def q11(spark, sf):
    jw = q10(spark, sf).agg(F.count(F.lit(1)).alias("join_window_count"))
    fc = (
        load_table(spark, sf, "lineitem")
        .filter(F.col("l_discount") >= 0.05)
        .agg(F.count(F.lit(1)).alias("filtered_count"))
    )
    sp = (
        load_table(spark, sf, "orders")
        .agg(F.count(F.lit(1)).alias("block_count"), F.max("o_orderkey").alias("head"))
        .select(
            "block_count",
            "head",
            (F.col("block_count") / (F.col("head") + 1) * 100).alias("progress_pct"),
        )
    )
    return jw.crossJoin(fc).crossJoin(sp)


@register(
    "q12_semi_join",  # J4: scalar-subquery semi-join analog
    """
    SELECT l_orderkey, l_linenumber FROM lineitem
    WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
    """,
)
def q12(spark, sf):
    li = load_table(spark, sf, "lineitem")
    urgent = load_table(spark, sf, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return li.join(
        urgent, li["l_orderkey"] == urgent["o_orderkey"], "left_semi"
    ).select("l_orderkey", "l_linenumber")


@register(
    "q13_anti_join_missing_keys",  # J6: FindMissingBlocksInRange analog
    """
    SELECT t.id AS missing_key FROM generate_series(0, 1499) t(id)
    WHERE t.id NOT IN (SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL)
    ORDER BY missing_key
    """,
)
def q13(spark, sf):
    o = load_table(spark, sf, "orders")
    expected = spark.range(0, 1500).select(F.col("id").alias("missing_key"))
    present = o.select(F.col("o_custkey").alias("missing_key")).distinct()
    return expected.join(present, "missing_key", "left_anti").orderBy("missing_key")


# ---------------------------------------------------------------------------
# Aggregations (SURVEY §2.4)
# ---------------------------------------------------------------------------

@register(
    "q14_minmaxcount",  # A3+A4+A5: sync-state aggregates in one pass
    """
    SELECT min(o_orderkey) AS oldest, max(o_orderkey) AS head, count(*) AS total
    FROM orders
    """,
)
def q14(spark, sf):
    return load_table(spark, sf, "orders").agg(
        F.min("o_orderkey").alias("oldest"),
        F.max("o_orderkey").alias("head"),
        F.count(F.lit(1)).alias("total"),
    )


# ---------------------------------------------------------------------------
# Top-k / sort / window (SURVEY §2.5 + beyond-parity window functions)
# ---------------------------------------------------------------------------

@register(
    "q17_global_topk_join",  # J5+W2: GetLastXEventsFromContract analog
    """
    SELECT o.o_orderkey, o.o_totalprice, c.c_name
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 20
    """,
)
def q17(spark, sf):
    o = load_table(spark, sf, "orders")
    c = load_table(spark, sf, "customer")
    return (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"], "inner")
        .select("o_orderkey", "o_totalprice", "c_name")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


@register(
    "q18_window_rank",  # beyond parity: ranking window function
    """
    SELECT c_custkey, c_nationkey, c_acctbal, rn FROM (
      SELECT c_custkey, c_nationkey, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer
    ) WHERE rn <= 3
    """,
)
def q18(spark, sf):
    from pyspark.sql import Window as W

    c = load_table(spark, sf, "customer")
    w = W.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        c.select(
            "c_custkey",
            "c_nationkey",
            "c_acctbal",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


# ---------------------------------------------------------------------------
# Scalar functions (SURVEY §2.7)
# ---------------------------------------------------------------------------

@register(
    "q19_wire_encodings",  # F1+F4: 0x-prefixed lowercase hex encoding and
    # exact decimal parse/cast of a money value, one projection
    """
    SELECT d.doc_id, concat('0x', lower(hex(substr(d.text, 1, 16)))) AS hexpfx,
           CAST(CAST(d.n_chars AS DECIMAL(18,2)) / 100 AS DOUBLE) AS chars_dec
    FROM documents d WHERE d.doc_id < 100
    """,
)
def q19(spark, sf):
    # decimal cast for exactness, double for dtype-stable transport (see q01)
    doc = load_table(spark, sf, "documents")
    return doc.filter(F.col("doc_id") < 100).select(
        "doc_id",
        F.concat(
            F.lit("0x"), F.lower(F.hex(F.substring(F.col("text"), 1, 16)))
        ).alias("hexpfx"),
        (F.col("n_chars").cast("decimal(18,2)") / 100)
        .cast("double")
        .alias("chars_dec"),
    )


@register(
    "q21_string_matches",  # F6+F7: case-insensitive equality filter plus a
    # prefix/length-check column (the facade guardrail expressions)
    """
    SELECT c_custkey, starts_with(c_name, 'Customer#00000000') AS name_pfx
    FROM customer WHERE lower(c_mktsegment) = 'building'
    """,
)
def q21(spark, sf):
    return (
        load_table(spark, sf, "customer")
        .filter(F.lower(F.col("c_mktsegment")) == "building")
        .select(
            "c_custkey",
            F.col("c_name").startswith("Customer#00000000").alias("name_pfx"),
        )
    )


@register(
    "q23_json_extract",  # F8/F9: JSON shaping of rows
    # TRY_CAST, not CAST: '$.k' can extract a non-scalar (an object /
    # array) or a non-numeric string from hostile props, and an ANSI
    # cast then kills the whole query — one malformed doc must yield
    # one NULL, not fail a 100 TB job. The json_valid guard mirrors a
    # second engine boundary: Spark's get_json_object returns NULL on
    # malformed JSON while DuckDB's json_extract_string THROWS (both
    # found by the round-14 adversarial events fixture).
    """
    SELECT event_id,
           TRY_CAST(CASE WHEN json_valid(props)
                         THEN json_extract_string(props, '$.k') END
                    AS BIGINT) AS prop_k
    FROM events WHERE event_id < 500
    """,
)
def q23(spark, sf):
    ev = load_table(spark, sf, "events")
    return ev.filter(F.col("event_id") < 500).select(
        "event_id",
        F.get_json_object(F.col("props"), "$.k")
        .try_cast("bigint")
        .alias("prop_k"),
    )


# ---------------------------------------------------------------------------
# Streaming semantics, batch-expressible (SURVEY §2.8)
# ---------------------------------------------------------------------------

@register(
    "q24_depth_gate",  # T2: confirmation-depth finality watermark analog
    """
    SELECT event_type, count(*) AS confirmed_count FROM events
    WHERE ts <= (SELECT max(ts) - INTERVAL 1 HOUR FROM events)
    GROUP BY event_type
    """,
)
def q24(spark, sf):
    ev = load_table(spark, sf, "events")
    head = ev.agg(F.max("ts").alias("_head"))
    return (
        ev.join(F.broadcast(head))
        .filter(F.col("ts") <= F.col("_head") - F.expr("INTERVAL 1 HOUR"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("confirmed_count"))
    )


@register(
    "q25_publish_once_dedup",  # T5: publish-once dedup analog
    """
    SELECT user_id, event_type, min(event_id) AS first_event_id
    FROM events GROUP BY user_id, event_type
    """,
)
def q25(spark, sf):
    return (
        load_table(spark, sf, "events")
        .groupBy("user_id", "event_type")
        .agg(F.min("event_id").alias("first_event_id"))
    )


# ---------------------------------------------------------------------------
# Training-data pipeline operators (SURVEY steering: dedup / similarity /
# text analysis over documents + embeddings)
# ---------------------------------------------------------------------------

@register(
    "q26_dedup_exact",
    """
    SELECT md5(regexp_replace(lower(text), '[^A-Za-z0-9\\s]', '', 'g')) AS fp,
           min(doc_id) AS keeper_id, count(*) AS n_copies
    FROM documents GROUP BY 1
    """,
)
def q26(spark, sf):
    """Exact dedup; the fingerprint impl is size-routed on parquet-footer
    row counts (no probe job): small corpora stay whole inside
    WholeStageCodegen (the Arrow worker round-trip IS the runtime
    there), large ones take the measured-faster Arrow path (fingerprint
    docstring: 0.47s arrow vs 1.11s jvm at sf1). Output is identical
    on every row either way."""
    n = table_rowcount(sf, "documents")
    impl = "jvm" if n is not None and n <= 20_000 else "arrow"
    return dedup.exact_duplicates(
        load_table(spark, sf, "documents"), "doc_id", "text", impl=impl
    )


@register(
    "q27_dedup_minhash_lsh",
    # Exact all-pairs Jaccard >= 0.4 — the LSH output EQUALS this truth
    # because (a) verification computes exact Jaccard on candidates and
    # (b) at gate scale the entry runs full-recall banding (r=1, b=64:
    # a qualifying pair is missed only if all 64 independent minhashes
    # differ, p = (1-0.4)^64 ≈ 6e-15 — and the seeded hashes make the
    # outcome deterministic, so a green gate stays green). Same SQL
    # shape as q40.
    """
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(
        trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'),
             '\\s+', ' ', 'g')), ' ') AS t
      FROM documents
    ), sh AS (
      -- contentless docs (t = ['']) contribute NO shingles: dedup
      -- claims need content evidence (mirrors shingle_rows)
      SELECT DISTINCT doc_id,
        CASE WHEN len(t) < 3 THEN array_to_string(t, ' ')
             ELSE t[i] || ' ' || t[i+1] || ' ' || t[i+2] END AS s
      FROM toks, UNNEST(generate_series(1, greatest(len(t) - 2, 1))) AS u(i)
      WHERE t[1] <> ''
    ), sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
      FROM sh a JOIN sh b USING (s) WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
    SELECT id_a, id_b,
           round(inter * 1.0 / (sa.sz + sb.sz - inter), 4) AS jaccard
    FROM inter JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
    WHERE inter * 1.0 / (sa.sz + sb.sz - inter) >= 0.4
    """,
)
def q27(spark, sf):
    """MinHash-LSH near-dup pairs, driver-oracled against exact truth.

    Parameter selection is corpus-size-based, the honest LSH economics:
    r=1 banding has full recall but admits any pair sharing ONE minhash
    as a candidate — affordable only where dense verification is cheap.
    Above the cutoff, banding is sized by the measured miss law
    (per-pair miss = (1-j²)^b, summed over the oracle's pair-jaccard
    histogram), calibrated on the two corpora this entry actually runs:

    The tier table itself lives in ``dedup.banding_for_corpus`` —
    shared with the incremental entry (q66) and the persisted index so
    the banding can never drift between them. The doc count comes from
    parquet footers (``table_rowcount``) — no probe job at plan-build;
    a ``doc.count()`` fallback covers non-footer sources.
    """
    doc = load_table(spark, sf, "documents")
    n = table_rowcount(sf, "documents")
    n = doc.count() if n is None else n
    nh, b = dedup.banding_for_corpus(n)
    if n <= dedup.BRUTE_TASK_CAP and _onetask_bytes_ok(
        sf, "documents", "text", ONETASK_TEXT_BYTES_CAP
    ):
        # one-Arrow-task tier: the distributed plan is 11 AQE jobs of
        # ~0.2s scheduling floor against ~0.5s of compute at this scale
        # (2.4s → 1.0s warm at sf0.1, r7 medians); same blake2b-family
        # signing, same banding, exact verification on raw shingle sets
        out = dedup.minhash_pairs_onetask(
            doc, "doc_id", "text",
            num_hashes=nh, bands=b, jaccard_threshold=0.4,
        )
    else:
        out = dedup.minhash_near_duplicates(
            doc, "doc_id", "text",
            num_hashes=nh, bands=b, jaccard_threshold=0.4,
            # grouped emission signs once and wins 2× below ~100k docs;
            # above, the streaming join keeps executor memory flat (the
            # sf10-measured trade documented at dedup._bucket_pairs)
            pair_source="group" if n <= 100_000 else "join",
        )
    return out.select(
        "id_a", "id_b", F.round("jaccard", 4).alias("jaccard")
    )


def _simhash60_oracle_sql() -> str:
    """All-pairs Hamming over 60-bit md5-family SimHash signatures —
    recomputes the EXACT signature pipeline (normalize → whitespace
    tokens → 60-bit md5 token hash → per-bit majority vote) in DuckDB,
    then joins every pair. Valid as q28's truth at EVERY scale because
    the entry runs the pigeonhole-exact regime (max_hamming=3 <
    n_blocks=4: any qualifying pair leaves at least one 15-bit block
    untouched, so block-bucket recall is exact, not probabilistic)."""
    bit_sums = ",\n             ".join(
        f"sum((h >> {i}) & 1) AS b{i}" for i in range(60)
    )
    sig_bits = "\n           | ".join(
        f"(CASE WHEN 2*b{i} > n THEN (1::BIGINT << {i}) ELSE 0 END)"
        for i in range(60)
    )
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_split_to_array(
        regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'), '\\s+')) AS t
      FROM documents
    ), h AS (
      SELECT doc_id, ('0x' || substr(md5(t), 1, 15))::BIGINT AS h FROM toks
    ), v AS (
      SELECT doc_id, count(*) AS n,
             {bit_sums}
      FROM h GROUP BY doc_id
    ), sig AS (
      SELECT doc_id,
             {sig_bits} AS sig
      FROM v
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.sig, b.sig)) <= 3
    """


@register("q28_dedup_simhash", _simhash60_oracle_sql())
def q28(spark, sf):
    """SimHash near-dup pairs over engine-portable md5-family signatures.

    ``md5_60`` token hashing makes the signatures recomputable by any
    engine with md5 — the property that upgrades this entry from
    rows-only to full hash-checking. The entry runs ONE configuration at
    every scale: the Manku-style exact regime, ``max_hamming=3 <
    n_blocks=4`` — pigeonhole guarantees a qualifying pair shares a
    whole 15-bit block, so bucket recall is exact AND the 2^15-value
    block keys stay selective (candidate volume ~ true pairs +
    n²/2^15·4, subquadratic at corpus scale). The previous cutoff-
    switched form (max_hamming=8, 4 wide blocks above the cutoff) only
    guaranteed recall for hamming < n_blocks and measured 43% recall on
    the sf1 10-way-near-dup corpus — an approximate regime the operator
    still supports, but not one a driver-oracled entry should ship."""
    doc = load_table(spark, sf, "documents")
    n = table_rowcount(sf, "documents")
    n = doc.count() if n is None else n
    if n <= dedup.SIMHASH_TASK_CAP and _onetask_bytes_ok(
        sf, "documents", "text", ONETASK_TEXT_BYTES_CAP
    ):
        # one-Arrow-task tier (the q27/q35/q79/q80-family small-corpus
        # routing): the distributed group plan is one signing task plus
        # three AQE stages of scheduling floor at this scale — 0.94 →
        # 0.60s interleaved same-session noop medians at sf0.1 (gated
        # r15 window had the group plan at 0.66 warm); identity with
        # both distributed pair sources pinned in tests/test_dedup.py
        return dedup.simhash_pairs_onetask(
            doc, "doc_id", "text", max_hamming=3, n_blocks=4, n_bits=60
        )
    return dedup.simhash_near_duplicates(
        doc,
        "doc_id",
        "text",
        max_hamming=3,
        n_blocks=4,
        token_hash="md5_60",
        n_bits=60,
        # same group-below / stream-above routing as q27
        pair_source="group" if n <= 100_000 else "join",
    )


@register(
    "q29_lang_token_stats",
    # language-ID heuristic (stopword argmax, en > de > es > fr tie-break)
    # feeding the per-language token statistics: lang-ID and corpus stats
    # verified together — the group keys themselves are computed columns
    """
    WITH hits AS (
      SELECT doc_id, text,
        len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
            x -> x IN ('the','and','of','to','in','is','that','for'))) AS en,
        len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
            x -> x IN ('der','die','und','das','ist','nicht','ein','mit'))) AS de,
        len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
            x -> x IN ('el','la','de','que','y','los','en','un'))) AS es,
        len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
            x -> x IN ('le','la','et','les','des','est','une','dans'))) AS fr
      FROM documents),
    pred AS (
      SELECT doc_id, text,
        CASE WHEN greatest(en,de,es,fr) = 0 THEN 'und'
             WHEN en = greatest(en,de,es,fr) THEN 'en'
             WHEN de = greatest(en,de,es,fr) THEN 'de'
             WHEN es = greatest(en,de,es,fr) THEN 'es'
             ELSE 'fr' END AS lang_pred
      FROM hits)
    SELECT lang_pred, count(*) AS n_docs,
           CAST(sum(len(regexp_split_to_array(text, '\\s+'))) AS BIGINT) AS total_tokens,
           CAST(sum(length(text)) AS BIGINT) AS total_chars
    FROM pred GROUP BY lang_pred
    """,
)
def q29(spark, sf):
    doc = load_table(spark, sf, "documents")
    # single-tokenization formulation: one explode pass + conditional
    # sums instead of four per-profile regex scans (3x at sf1)
    return TX.lang_token_stats(doc, "doc_id", "text")


@register(
    "q30_doc_metrics",
    # per-doc quality metrics + BPE-ish subword count in one projection
    """
    SELECT doc_id,
           len(regexp_split_to_array(text, '\\s+')) AS n_tokens,
           length(text) AS n_chars,
           length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')) AS n_punct,
           len(regexp_extract_all(text, '([A-Za-z]+|[0-9]|[^A-Za-z0-9\\s])')) AS n_bpe_tokens
    FROM documents WHERE doc_id < 200
    """,
)
def q30(spark, sf):
    doc = load_table(spark, sf, "documents").filter(F.col("doc_id") < 200)
    m = TX.quality_metrics("text")
    return doc.select(
        "doc_id",
        m["n_tokens"].alias("n_tokens"),
        m["n_chars"].alias("n_chars"),
        m["n_punct"].alias("n_punct"),
        TX.bpe_ish_token_count("text").alias("n_bpe_tokens"),
    )


@register(
    "q32_clean_fingerprint",
    # control-char/whitespace normalization + canonical content digest —
    # the two per-doc canonicalization transforms in one projection
    """
    SELECT doc_id,
      trim(regexp_replace(regexp_replace(text, '[\\x00-\\x1F]', ' ', 'g'),
           '\\s+', ' ', 'g')) AS clean,
      md5(regexp_replace(lower(text), '[^A-Za-z0-9\\s]', '', 'g')) AS fp
    FROM documents
    """,
)
def q32(spark, sf):
    doc = load_table(spark, sf, "documents")
    return doc.select(
        "doc_id",
        corpus.clean_text("text").alias("clean"),
        TX.fingerprint("text").alias("fp"),
    )


# per-process memo: the query vector is a CONSTANT parameter of every
# ANN entry, so each sf dir pays for it at most once
# keyed by (sf path, fixture stamp): a fixture regenerated in-process
# (adversarial twins, scale_testdata) is a different key, never a stale
# hit (round-12 verdict nit)
_QVEC_CACHE: dict[tuple, list[float]] = {}


def _query_vec(spark, sf) -> list[float]:
    """The ANN entries' query vector (embeddings.vec_id = 0), fetched as
    a driver-side constant. A single keyed row is parameter lookup, not
    query work — reading it through a Spark job charged every ANN entry
    one scheduling floor per invocation. pyarrow reads it with row-group
    pruning on the driver (the same footer-first discipline as
    ``table_rowcount``); non-local/footerless sources keep the Spark
    path."""
    key = (str(sf), fixture_stamp(str(sf), "embeddings"))
    if key not in _QVEC_CACHE:
        vec = None
        try:
            import os

            import pyarrow.parquet as pq

            path = os.path.join(sf, "embeddings.parquet")
            if os.path.isfile(path):
                t = pq.read_table(
                    path,
                    columns=["vec_id", "embedding"],
                    filters=[("vec_id", "==", 0)],
                )
                if t.num_rows == 1:
                    vec = [float(x) for x in t.column("embedding")[0].as_py()]
        except Exception:
            vec = None
        if vec is None:
            row = (
                load_table(spark, sf, "embeddings")
                .filter(F.col("vec_id") == 0)
                .select("embedding")
                .first()
            )
            vec = [float(x) for x in row[0]]
        _QVEC_CACHE[key] = vec
    return list(_QVEC_CACHE[key])


# routing-hint memo for the q80/q81 decontamination entries (see
# _eval_small_hint)
_EVAL_HINT_CACHE: dict[tuple, bool | None] = {}

# tier-2 driver-read abort: footer bytes UNDER-count logical bytes on
# dictionary-dominated duplicate corpora, so the streamed read keeps a
# hard materialized-bytes cap and bails to the cluster-side probe when
# the footer turns out to have lied (round-12 advice)
_TIER2_ABORT_BYTES = 256 * 1024 * 1024


def _eval_small_hint(sf, variants: int = 1) -> bool | None:
    """Footer-proven broadcast-safety hint for the contamination
    entries' eval split (doc_id % 10 = 0), so their default routing is
    LAZY (zero plan-build Spark jobs — the q34/q79 footer pattern).

    Tiered, each tier sound:

    1. whole-table byte bound. What broadcasts is the DISTINCT eval
       gram set, and parquet footers bound distinct text bytes under
       EVERY encoding: a PLAIN chunk stores every occurrence (>= the
       distinct bytes) and a dictionary chunk's counted dict page
       stores each distinct value at least once — so
       ``total_uncompressed_size >= distinct-text-bytes`` even on
       duplicate-heavy corpora where it runs far BELOW total logical
       bytes (the round-12 advice case). Distinct grams number at most
       distinct-text-bytes/2 (every token costs >= 2 bytes incl.
       separator), so ``(bytes/2) * variants <= broadcast_below``
       proves the broadcast side fits. This deliberately bounds a
       SMALLER quantity than the operator's live probe (total
       occurrences): on dictionary-dominated data the two can route
       differently, but both regimes are value-identical by
       construction and the broadcast this tier approves always fits;
    2. when the bound is slack but the table's footer bytes are small
       (< 64 MB), a driver-side STREAMED pyarrow read measures the
       actual eval-split bytes. Footer bytes under-count logical bytes
       on dictionary-dominated data, so the read is batched with a
       hard 256 MB materialized-bytes abort — driver memory stays
       bounded even when the footer lied by 100x — and an aborted read
       falls through to tier 3;
    3. otherwise None: the operator's live cluster-side probe decides,
       exactly as before.

    True is only returned when an upper bound of the broadcast's own
    row count (distinct gram keys) clears the operator's
    ``broadcast_below``; an over-threshold bound yields None, never
    False, because the bound over-estimates."""
    import os

    broadcast_below = 2_000_000
    key = (str(sf), variants, fixture_stamp(str(sf), "documents"))
    if key in _EVAL_HINT_CACHE:
        return _EVAL_HINT_CACHE[key]
    hint: bool | None = None
    tb = table_column_bytes(sf, "documents", "text")
    if tb is not None:
        if (tb // 2 + 1) * variants <= broadcast_below:
            hint = True
        elif tb <= 64 * 1024 * 1024:
            try:
                import numpy as np
                import pyarrow.compute as pc
                import pyarrow.parquet as pq

                path = os.path.join(sf, "documents.parquet")
                if os.path.isfile(path):
                    ev_bytes, seen = 0, 0
                    pf = pq.ParquetFile(path)
                    for batch in pf.iter_batches(
                        batch_size=8192, columns=["doc_id", "text"]
                    ):
                        ids = batch.column("doc_id").to_numpy(
                            zero_copy_only=False
                        )
                        lens = pc.binary_length(
                            batch.column("text")
                        ).to_numpy(zero_copy_only=False)
                        seen += int(np.sum(lens))
                        if seen > _TIER2_ABORT_BYTES:
                            # footer bytes lied (dictionary-dominated
                            # duplicates): stop reading, let the
                            # cluster-side probe decide
                            ev_bytes = None
                            break
                        ev_bytes += int(np.sum(lens[ids % 10 == 0]))
                    if ev_bytes is not None:
                        bound = (ev_bytes // 2 + 1) * variants
                        if bound <= broadcast_below:
                            hint = True
            except Exception:
                hint = None
    _EVAL_HINT_CACHE[key] = hint
    return hint


@register(
    "q33_ann_cosine_bruteforce",
    """
    SELECT vec_id,
           round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                 (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)), 4) AS score
    FROM embeddings
    ORDER BY score DESC, vec_id LIMIT 10
    """,
)
def q33(spark, sf):
    emb = load_table(spark, sf, "embeddings")
    return similarity.cosine_topk(
        emb, "vec_id", "embedding", _query_vec(spark, sf), k=10, round_digits=4
    )


@register(
    "q34_ann_variants",
    # At gate scale both variants run exhaustive probe parameters
    # (probe radius = n_planes; nprobe = n_lists), which provably
    # degenerates each to exact top-k — so the truth is q33's exact
    # cosine top-10, labeled per method.
    """
    WITH scored AS (
      SELECT vec_id,
             round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                   (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings
                    WHERE vec_id = 0)), 4) AS score
      FROM embeddings),
    topk AS (SELECT * FROM scored ORDER BY score DESC, vec_id LIMIT 10)
    SELECT 'lsh' AS method, vec_id, score FROM topk
    UNION ALL
    SELECT 'ivf' AS method, vec_id, score FROM topk
    """,
)
def q34(spark, sf):
    """ANN variants (hyperplane-LSH multiprobe + IVF/KMeans cells),
    STRATEGY-routed by corpus size — the same observed-size reasoning
    q54 applies between its two interval plans:

    - ≤50k vectors: both labeled variants execute the one-matmul-scan
      exact top-k (``cosine_topk``). Below index-win scale the ANN
      machinery (two index builds + probe passes per query) costs ~70×
      the scan it tries to avoid (2.48s vs 0.03s measured at sf1's 20k
      vectors) while returning the same rows — exhaustive probes
      degenerate to exact top-k, so routing to the scan changes the
      plan, not the answer. The corpus size comes from parquet footers
      (``table_rowcount``) — no probe job at plan-build.
    - above: the REAL index pipelines (hyperplane buckets, IVF cells)
      at exhaustive probe parameters — every bucket / every cell — so
      the result provably stays the exact top-k and the oracle holds
      at ANY SF (no by-design hash break past the cutoff, the q79
      round-11 lesson). The selective probes' recall/latency trade is
      pytest-verified (tests/test_similarity.py) and the sf10 proof
      measured the LSH family's candidate volumes pair-bound at
      recall 1.0."""
    emb = load_table(spark, sf, "embeddings")
    qv = _query_vec(spark, sf)
    n = table_rowcount(sf, "embeddings")
    n = emb.count() if n is None else n
    if n <= 50_000:
        topk = similarity.cosine_topk(
            emb, "vec_id", "embedding", qv, k=10, round_digits=4
        )
        return topk.select(
            F.explode(F.array(F.lit("lsh"), F.lit("ivf"))).alias("method"),
            "vec_id",
            "score",
        )
    # above the routing cutoff the REAL index pipelines run, but with
    # EXHAUSTIVE probe parameters (hamming = n_planes visits every
    # bucket; nprobe = n_lists visits every cell), which provably
    # degenerate to the exact top-k — so the registered oracle stays
    # valid at ANY SF instead of breaking by design past the cutoff
    # (the q79 lesson, round 11). The SELECTIVE probes' recall is the
    # approximate-index contract and is pinned in
    # tests/test_similarity.py, not hash-gated.
    lsh = similarity.lsh_cosine_topk(
        emb, "vec_id", "embedding", qv,
        k=10, n_planes=8, max_probe_hamming=8, round_digits=4,
    ).select(F.lit("lsh").alias("method"), "vec_id", "score")
    ivf = similarity.ivf_topk(
        emb, "vec_id", "embedding", qv,
        k=10, n_lists=8, nprobe=8, round_digits=4,
    ).select(F.lit("ivf").alias("method"), F.col("id").alias("vec_id"), "score")
    return lsh.unionByName(ivf)


@register(
    "q35_embedding_near_dup",
    """
    WITH corpus AS (
        SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        UNION ALL
        SELECT vec_id + 1000000,
               list_concat([CAST(embedding[1] AS DOUBLE) + 0.01],
                           CAST(embedding AS DOUBLE[])[2:])
        FROM embeddings
    )
    SELECT a.id AS id_a, b.id AS id_b,
           round(list_cosine_similarity(a.v, b.v), 6) AS cosine
    FROM corpus a JOIN corpus b ON a.id < b.id
    WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.99
    """,
)
def q35(spark, sf):
    """Near-dup pairs over a corpus with planted near-duplicates.

    The driver embeddings have no natural pairs above cosine 0.51, so the
    catalog entry unions each vector with a deterministically perturbed
    copy (first element + 0.01 → cosine ≈ 0.9999) and must recover every
    planted pair. Because verification is exact and the multi-table LSH
    miss probability at that cosine is ~1e-5 per pair, the output equals
    the brute-force all-pairs truth — which is what the DuckDB oracle
    computes, making this LSH pipeline hash-checkable end to end.
    """
    emb = load_table(spark, sf, "embeddings").select(
        F.col("vec_id").alias("id"),
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v"),
    )
    perturbed = emb.select(
        (F.col("id") + 1000000).alias("id"),
        F.concat(
            F.array(F.get(F.col("v"), 0) + F.lit(0.01)), F.slice(F.col("v"), 2, 1000000)
        ).alias("v"),
    )
    corpus = emb.unionByName(perturbed)
    # 6 tables: the OR-construction must scale with the PAIR count, not
    # the corpus — at sf1 the scaled dataset plants ~380k qualifying
    # pairs, and 4 tables (miss ≈ 2e-5/pair at the low end of the
    # planted cosine spread) dropped 8 of them in the sf1 gate replica.
    # Six tables put the expected misses at << 1 through sf10 while the
    # exact verification stage keeps precision at 1.0.
    n = table_rowcount(sf, "embeddings")
    if (
        n is not None
        and 2 * n <= dedup.BRUTE_TASK_CAP
        and _onetask_bytes_ok(
            sf, "embeddings", "embedding", ONETASK_VEC_BYTES_CAP // 2
        )
    ):
        # one-Arrow-task tier (the q27/q66/q83 routing applied to
        # embeddings): 1.39s -> ~0.45s warm at sf0.1 (round-15 medians)
        # — below the cap the distributed plan is stage floors and four
        # Python boundary crossings around a 4000×64 matmul. Identical
        # output by construction (pinned in tests/test_similarity.py);
        # sf1 (40k vectors) and beyond run the distributed plan.
        return similarity.embedding_pairs_onetask(
            corpus, "id", "v", min_cosine=0.99, n_tables=6, dim=64
        )
    return similarity.embedding_near_duplicates(
        corpus, "id", "v", min_cosine=0.99, n_tables=6, dim=64,
        # grouped emission buckets once and wins below ~100k ids; the
        # streaming join keeps executor memory flat above (the
        # sf10-measured trade documented at dedup._bucket_pairs)
        pair_source="group"
        if (n is not None and 2 * n <= 100_000)
        else "join",
    )


# ---------------------------------------------------------------------------
# Multimodal binary columns (operators/multimodal.py): media as opaque
# binary + typed metadata; decode stubbed (no codec libs in container),
# Spark plumbing real. q37/q39 have exact arithmetic oracles; q38's byte
# histogram runs through mapInPandas (Arrow) — rows-only check.
# ---------------------------------------------------------------------------


@register(
    "q37_media_metadata",
    """
    SELECT doc_id,
      CASE CAST((doc_id % 3 + 3) % 3 AS INT) WHEN 0 THEN 'image'
           WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
      octet_length(encode(text)) AS n_bytes,
      64 + (doc_id * 3) % 448 AS width,
      64 + (doc_id * 7) % 448 AS height,
      1 + doc_id % 16 AS n_frames,
      CAST(CASE WHEN (doc_id % 3 + 3) % 3 = 1 THEN 16000 ELSE 0 END AS BIGINT) AS sample_rate
    FROM documents
    """,
)
def q37(spark, sf):
    return multimodal.media_metadata(load_table(spark, sf, "documents"))


@register(
    "q38_media_byte_histogram",
    # exact integer bin counts (byte >> 3 → 32 bins, zero bins included);
    # DuckDB reads payload bytes back out of the hex string
    """
    WITH m AS (
      SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n
      FROM documents),
    b AS (
      SELECT doc_id, CAST(('0x' || substr(hx, 2 * i + 1, 2)) AS INT) // 8 AS bin
      FROM m, UNNEST(generate_series(0, n - 1)) AS u(i)),
    c AS (SELECT doc_id, bin, count(*) AS cnt FROM b GROUP BY 1, 2)
    SELECT m.doc_id, g.bin, CAST(coalesce(c.cnt, 0) AS BIGINT) AS bin_count
    FROM m
    CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS bin) g
    LEFT JOIN c ON c.doc_id = m.doc_id AND c.bin = g.bin
    """,
)
def q38(spark, sf):
    media = multimodal.synthesize_media(load_table(spark, sf, "documents"))
    return multimodal.byte_histogram_bins(media)


@register(
    "q39_media_chunks",
    # video frame offsets and audio chunk offsets — the two binary-slicing
    # plans, union'd with a kind tag so both are hash-checked in one row set
    """
    WITH v AS (
      SELECT doc_id, octet_length(encode(text)) AS n_bytes,
             1 + doc_id % 16 AS n_frames
      FROM documents WHERE (doc_id % 3 + 3) % 3 = 2),
    a AS (
      SELECT doc_id, octet_length(encode(text)) AS n_bytes,
             32000 AS bpc  -- 16000 Hz * 2 bytes * 1 s
      FROM documents WHERE (doc_id % 3 + 3) % 3 = 1)
    SELECT 'video' AS kind, doc_id, i AS chunk_idx,
           i * (n_bytes // n_frames) AS chunk_off,
           n_bytes // n_frames AS chunk_len
    FROM v, UNNEST(generate_series(0, n_frames - 1)) AS u(i)
    UNION ALL
    SELECT 'audio' AS kind, doc_id, i AS chunk_idx, i * bpc AS chunk_off,
           least(bpc, n_bytes - i * bpc) AS chunk_len
    FROM a, UNNEST(generate_series(0, CAST(ceil(n_bytes * 1.0 / bpc) AS BIGINT) - 1)) AS u(i)
    """,
)
def q39(spark, sf):
    media = multimodal.synthesize_media(load_table(spark, sf, "documents"))
    frames = multimodal.frame_offsets(media).select(
        F.lit("video").alias("kind"),
        "doc_id",
        F.col("frame_idx").alias("chunk_idx"),
        F.col("frame_off").alias("chunk_off"),
        F.col("frame_len").alias("chunk_len"),
    )
    chunks = multimodal.audio_chunk_offsets(media, chunk_seconds=1.0).select(
        F.lit("audio").alias("kind"), "doc_id", "chunk_idx", "chunk_off", "chunk_len"
    )
    return frames.unionByName(chunks)


@register(
    "q40_jaccard_all_pairs",
    # exact mirror of shingle_rows(n=3) + pairwise Jaccard >= 0.5; the
    # Spark side runs the prefix-filtered similarity join, which is
    # provably identical in output to this brute-force all-pairs SQL
    """
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(
        trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'),
             '\\s+', ' ', 'g')), ' ') AS t
      FROM documents WHERE doc_id < 500
    ), sh AS (
      -- contentless docs (t = ['']) contribute NO shingles: dedup
      -- claims need content evidence (mirrors shingle_rows)
      SELECT DISTINCT doc_id,
        CASE WHEN len(t) < 3 THEN array_to_string(t, ' ')
             ELSE t[i] || ' ' || t[i+1] || ' ' || t[i+2] END AS s
      FROM toks, UNNEST(generate_series(1, greatest(len(t) - 2, 1))) AS u(i)
      WHERE t[1] <> ''
    ), sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
      FROM sh a JOIN sh b USING (s) WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
    SELECT id_a, id_b,
           round(inter * 1.0 / (sa.sz + sb.sz - inter), 4) AS jaccard
    FROM inter JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
    WHERE inter * 1.0 / (sa.sz + sb.sz - inter) >= 0.5
    """,
)
def q40(spark, sf):
    """EXACT Jaccard pairs via the prefix-filtered similarity join —
    scale-safe corpus-wide (rare-shingle prefixes bound candidates and
    kill common-shingle skew; see ``dedup.jaccard_prefix_join``). The
    id cap only keeps the small-SF benchmark comparable across rounds;
    the operator itself needs no cap.

    Footer-proven lazy routing (the q80/q81 pattern): doc_id is a
    distinct integer key, so with footer min >= 0 the ``doc_id < 500``
    filter keeps at most 500 rows — strictly under the 2000-row brute
    threshold at EVERY SF — and the brute tier can be passed explicitly
    with zero plan-build jobs. Footerless sources keep the live
    limit-count probe; the auto router itself stays pytest-exercised
    (tests/test_dedup)."""
    doc = load_table(spark, sf, "documents").filter(F.col("doc_id") < 500)
    rng = table_column_range(sf, "documents", "doc_id")
    strategy = "brute" if rng is not None and rng[0] >= 0 else "auto"
    return dedup.jaccard_prefix_join(
        doc, "doc_id", "text", threshold=0.5, strategy=strategy
    )


# ---------------------------------------------------------------------------
# Event-time analytics over the driver `events` stream table — tumbling
# windows, gap sessionization, JSON prop extraction. These are the batch
# twins of the Structured Streaming operators (streaming/windows.py);
# identical expressions run under readStream with a watermark.
# ---------------------------------------------------------------------------


@register(
    "q42_tumbling_window",
    """
    SELECT time_bucket(INTERVAL '5 minutes', ts) AS win_start, event_type,
           count(*) AS n_events, round(sum(value), 4) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def q42(spark, sf):
    ev = load_table(spark, sf, "events")
    return (
        ev.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("win_start"), "event_type", "n_events", "total_value"
        )
    )


@register(
    "q43_session_window",
    # 30-minute-gap sessions per user (gaps-and-islands in SQL; Spark uses
    # the native session_window operator)
    """
    WITH flagged AS (
      SELECT user_id, ts,
        CASE WHEN lag(ts) OVER w IS NULL
             OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
             THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sess AS (
      SELECT user_id, ts, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
            ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged)
    SELECT user_id, min(ts) AS session_start, count(*) AS n_events
    FROM sess GROUP BY user_id, sid
    """,
)
def q43(spark, sf):
    ev = load_table(spark, sf, "events")
    return (
        ev.groupBy(
            "user_id", F.session_window("ts", "30 minutes").alias("sw")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id", F.col("sw.start").alias("session_start"), "n_events"
        )
    )


@register(
    "q44_json_props",
    # TRY_CAST + json_valid for the same reasons as q23: hostile props
    # must degrade to NULL (excluded from avg in both engines), never
    # crash the job; DuckDB's extractor throws on malformed JSON where
    # Spark's returns NULL
    """
    SELECT event_type,
           round(avg(TRY_CAST(CASE WHEN json_valid(props)
                                   THEN props->>'k' END AS BIGINT)), 4)
               AS avg_k
    FROM events GROUP BY event_type
    """,
)
def q44(spark, sf):
    ev = load_table(spark, sf, "events")
    return ev.groupBy("event_type").agg(
        F.round(
            F.avg(F.get_json_object("props", "$.k").try_cast("long")), 4
        ).alias("avg_k")
    )


# ---------------------------------------------------------------------------
# Corpus-preparation operators (operators/corpus.py): engine-portable
# md5 split hashing, text normalization, sequence packing, contamination
# audit — each with an exact SQL oracle.
# ---------------------------------------------------------------------------


@register(
    "q45_samples",
    # engine-portable md5 bucketing: uniform 10% hash sample + per-language
    # stratified rates (en 50%, de 25%, others dropped), tagged and union'd
    """
    SELECT 'uniform' AS method, doc_id, lang FROM documents
    WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
          % 100 < 10
    UNION ALL
    SELECT 'stratified' AS method, doc_id, lang FROM documents
    WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
          % 100 < CASE lang WHEN 'en' THEN 50 WHEN 'de' THEN 25 ELSE -1 END
    """,
)
def q45(spark, sf):
    doc = load_table(spark, sf, "documents")
    uni = corpus.hash_sample(doc, "doc_id", 10).select(
        F.lit("uniform").alias("method"), "doc_id", "lang"
    )
    strat = corpus.stratified_sample(doc, "doc_id", "lang", {"en": 50, "de": 25}).select(
        F.lit("stratified").alias("method"), "doc_id", "lang"
    )
    return uni.unionByName(strat)


@register(
    "q47_sequence_packing",
    """
    WITH t AS (
      SELECT source, doc_id,
             len(regexp_split_to_array(text, '\\s+')) AS n_tok
      FROM documents),
    c AS (
      SELECT source, doc_id, n_tok,
             sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                              ROWS UNBOUNDED PRECEDING) AS cum
      FROM t)
    SELECT source, doc_id, n_tok,
           CAST((cum - n_tok) // 2048 AS BIGINT) AS pack_id
    FROM c
    """,
)
def q47(spark, sf):
    doc = load_table(spark, sf, "documents")
    return corpus.pack_sequences(doc, "doc_id", "text", 2048, shard_col="source")


@register(
    "q48_split_contamination",
    """
    WITH s AS (
      SELECT md5(regexp_replace(lower(text), '[^A-Za-z0-9\\s]', '', 'g')) AS fp,
        CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                  % 100 < 10
             THEN 'test' ELSE 'train' END AS split
      FROM documents)
    SELECT fp,
           CAST(sum(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT) AS n_test,
           CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_train
    FROM s GROUP BY fp
    HAVING n_test > 0 AND n_train > 0
    """,
)
def q48(spark, sf):
    doc = load_table(spark, sf, "documents")
    return corpus.split_contamination(doc, "doc_id", "text", 10)


@register(
    "q49_winnowing_fingerprints",
    # MOSS winnowing with the same portable md5-derived 60-bit hash
    """
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(
        regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'), '\\s+') AS t
      FROM documents WHERE doc_id < 200
    ), sh AS (
      SELECT doc_id, i AS pos,
        CAST(('0x' || substr(md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2]), 1, 15))
             AS BIGINT) AS h
      FROM toks, UNNEST(generate_series(1, greatest(len(t) - 2, 0))) AS u(i)
    ), win AS (
      SELECT doc_id, pos,
             min(h) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp,
             count(*) OVER (PARTITION BY doc_id) AS nsh
      FROM sh)
    SELECT DISTINCT doc_id AS id, fp FROM win WHERE pos <= nsh - 3
    """,
)
def q49(spark, sf):
    doc = load_table(spark, sf, "documents").filter(F.col("doc_id") < 200)
    return dedup.winnow_fingerprints(doc, "doc_id", "text", shingle_n=3, window=4)


@register(
    "q51_repetition_metrics",
    """
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS t
      FROM documents
    ), bg AS (
      SELECT doc_id, t[i] || ' ' || t[i+1] AS b
      FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS u(i)
      WHERE len(t) >= 2
    ), cnt AS (
      SELECT doc_id, sum(c) AS n_bigrams, max(c) AS top
      FROM (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY 1, 2)
      GROUP BY doc_id)
    SELECT doc_id AS id,
           round(top * 1.0 / n_bigrams, 4) AS top_bigram_frac
    FROM cnt
    """,
)
def q51(spark, sf):
    doc = load_table(spark, sf, "documents")
    return corpus.repetition_metrics(doc, "doc_id", "text")


# ---------------------------------------------------------------------------
# Temporal joins (operators/temporal.py) — as-of and point-in-interval.
# Neither exists in the reference (SURVEY §2.3 stops at equi joins); both
# are single-shuffle plans at scale (see module docstring).
# ---------------------------------------------------------------------------


@register(
    "q53_asof_join",
    # "last purchase state as of each click" — DuckDB's native ASOF JOIN
    # is the oracle for the union+window Spark formulation
    """
    WITH l AS (
      SELECT event_id AS click_id, user_id, ts AS click_ts
      FROM events WHERE event_type = 'click'
    ), r AS (
      SELECT user_id, ts AS purchase_ts, value AS purchase_value
      FROM events WHERE event_type = 'purchase'
    )
    SELECT l.click_id, l.user_id, l.click_ts, r.purchase_ts, r.purchase_value
    FROM l ASOF LEFT JOIN r
      ON l.user_id = r.user_id AND l.click_ts >= r.purchase_ts
    """,
)
def q53(spark, sf):
    ev = load_table(spark, sf, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("click_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    return temporal.asof_join(
        clicks, purchases, on="user_id", left_ts="click_ts", right_ts="purchase_ts"
    )


@register(
    "q54_interval_join",
    # events inside each signup's first hour — a keyless range join; the
    # Spark side bins time so it runs as an equi-join on the bucket id
    """
    WITH w AS (
      SELECT event_id AS window_id, ts AS w_start,
             ts + INTERVAL 1 HOUR AS w_end
      FROM events WHERE event_type = 'signup'
    )
    SELECT w.window_id, count(*) AS n_events,
           round(sum(e.value), 4) AS total_value
    FROM w JOIN events e ON e.ts >= w.w_start AND e.ts < w.w_end
    GROUP BY w.window_id
    """,
)
def q54(spark, sf):
    """Count/sum-per-window, COST-ROUTED between the two equivalent
    plans (the same observed-size strategy switch AQE applies to joins,
    and the split q60 uses for its pair graph):

    - small inputs (≤250k points — parquet metadata count, no scan)
      take the tuned bin equi-join + groupBy: fewest stages, lowest
      floor (0.9s vs 1.7s warm noop-write at sf0.1's 100k points,
      where both plans are mostly scheduling floor).
    - above the cutoff, ``interval_aggregate``'s distributed prefix
      sums: O(points + windows) with 2 probe rows per window instead
      of O(matching pairs) — measured 2.4s vs the bin join's 7.2s at
      sf1's 1M points (the pair join visits ~280M pairs there), and
      density × window count keeps growing at 100 TB. Sums there run
      in scaled int64 (exact, order-independent), so round(·,4)
      matches DuckDB's double sum at these magnitudes. (The cutoff
      was 2M through round 5's first bench — set from count()-based
      timings that let Catalyst prune the sum columns; noop-write
      materialization moved the crossover an order of magnitude.)

    Both plans are hash-checked against the same oracle (the routing
    threshold sits inside the tested range on both sides:
    test_temporal covers interval_aggregate vs the theta-join at edge
    semantics, and the gate runs the bin join at sf0.01)."""
    ev = load_table(spark, sf, "events")
    windows = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("window_id"),
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("w_end"),
    )
    n_events = table_rowcount(sf, "events")
    if (ev.count() if n_events is None else n_events) <= 250_000:
        # bin ≈ window/12: finer bins trade a wider (slim-row) interval
        # explosion for fewer false pairs per bin — measured 3.2→2.1s
        # at sf1, 0.73→0.46s at sf0.1 vs bin=window.
        # Points projected to the two consumed columns before binning
        # (fewer shuffle bytes; a broadcast-intervals variant was A/B'd
        # flat at sf0.1 AND at the 250k route boundary and rejected —
        # see interval_join's docstring)
        joined = temporal.interval_join(
            ev.select("ts", "value"), windows,
            point_ts="ts", start_col="w_start", end_col="w_end",
            bin_seconds=300,
        )
        return joined.groupBy("window_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    agg = temporal.interval_aggregate(
        ev, windows, point_ts="ts", start_col="w_start", end_col="w_end",
        id_cols=["window_id"], value_col="value",
    )
    return agg.filter(F.col("n_points") > 0).select(
        "window_id",
        F.col("n_points").alias("n_events"),
        F.round("total_value", 4).alias("total_value"),
    )


# ---------------------------------------------------------------------------
# Statistical summaries (operators/stats.py) — one-pass multi-granularity
# rollup, exact per-group percentiles, cardinality estimation.
# ---------------------------------------------------------------------------


@register(
    "q55_rollup_hierarchy",
    # day × type → day → grand total, one Expand+agg pass; gid is the
    # ANSI GROUPING() bit vector so levels are distinguishable. The day
    # travels as VARCHAR: pandas renders a Spark DATE as datetime.date
    # but a DuckDB DATE as Timestamp, which breaks the driver's value
    # hash even when the dates are equal.
    """
    WITH r AS (SELECT CAST(ts AS DATE) AS d, event_type, value FROM events)
    SELECT CAST(d AS VARCHAR) AS day, event_type,
           count(*) AS n_events, round(sum(value), 4) AS total_value,
           CAST(GROUPING(d)*2 + GROUPING(event_type) AS BIGINT) AS gid
    FROM r GROUP BY ROLLUP(d, event_type)
    """,
)
def q55(spark, sf):
    from .operators import stats

    ev = load_table(spark, sf, "events").withColumn("day", F.to_date("ts"))
    return stats.hierarchical_rollup(
        ev,
        ["day", "event_type"],
        [
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        ],
    ).select(
        F.col("day").cast("string").alias("day"),
        "event_type", "n_events", "total_value", "gid",
    )


@register(
    "q57_distinct_cardinality",
    # exact distinct is the oracle column; the HLL++ estimate (the 100 TB
    # path) is verified as a deterministic error-bound boolean — Spark's
    # HLL is hash-deterministic, so approx_ok is stable run to run
    """
    SELECT event_type, count(DISTINCT user_id) AS n_distinct,
           TRUE AS approx_ok
    FROM events GROUP BY event_type
    """,
)
def q57(spark, sf):
    from .operators import stats

    ev = load_table(spark, sf, "events")
    card = stats.cardinality(ev, "event_type", "user_id", rsd=0.02)
    err = F.abs(F.col("approx_distinct") - F.col("n_distinct")) / F.col("n_distinct")
    return card.select(
        "event_type", "n_distinct", (err < 0.05).alias("approx_ok")
    )


# ---------------------------------------------------------------------------
# Lexical ranking + retrieval chunking (operators/ranking.py, corpus.py).
# ---------------------------------------------------------------------------


@register(
    "q58_bm25_scores",
    # full Okapi BM25 formula mirrored term by term; ln() on both engines
    """
    WITH dl AS (
      SELECT doc_id AS id,
             CAST(len(regexp_split_to_array(text, '\\s+')) AS DOUBLE) AS dl
      FROM documents
    ), const AS (
      SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM dl
    ), post AS (
      SELECT doc_id AS id, t AS term FROM (
        SELECT doc_id, UNNEST(regexp_split_to_array(lower(text), '\\s+')) AS t
        FROM documents)
      WHERE t IN ('vector', 'hash', 'stream')
    ), tf AS (
      SELECT id, term, CAST(count(*) AS DOUBLE) AS tf FROM post GROUP BY 1, 2
    ), dfreq AS (
      SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1
    )
    SELECT id,
           round(sum(ln(1 + (n_docs - df + 0.5) / (df + 0.5))
                     * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))), 4)
             AS score
    FROM tf JOIN dfreq USING (term) JOIN dl USING (id) CROSS JOIN const
    GROUP BY id
    """,
)
def q58(spark, sf):
    from .operators import ranking

    doc = load_table(spark, sf, "documents")
    return ranking.bm25_scores(
        doc, "doc_id", "text", ["vector", "hash", "stream"], k1=1.2, b=0.75
    )


@register(
    "q59_rag_chunks",
    # overlapping 32-token windows, stride 24 (8-token overlap)
    """
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(text, '\\s+') AS t FROM documents
    ), n AS (
      SELECT doc_id, t,
             CAST(ceil(greatest(len(t) - 32, 0) / 24.0) AS BIGINT) + 1 AS n_chunks
      FROM toks)
    SELECT doc_id AS id, i AS chunk_idx, n_chunks,
           array_to_string(t[i*24 + 1 : i*24 + 32], ' ') AS chunk_text
    FROM n, UNNEST(generate_series(0, n_chunks - 1)) AS u(i)
    """,
)
def q59(spark, sf):
    doc = load_table(spark, sf, "documents")
    return corpus.chunk_tokens(doc, "doc_id", "text", chunk_size=32, stride=24)


@register(
    "q60_dedup_clusters",
    # transitive closure of the exact-Jaccard pair graph (same pair
    # definition as q40) via recursive CTE; cluster id = min reachable id
    """
    WITH RECURSIVE toks AS (
      SELECT doc_id, regexp_split_to_array(
        trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'),
             '\\s+', ' ', 'g')), ' ') AS t
      FROM documents WHERE doc_id < 500
    ), sh AS (
      -- contentless docs (t = ['']) contribute NO shingles: dedup
      -- claims need content evidence (mirrors shingle_rows)
      SELECT DISTINCT doc_id,
        CASE WHEN len(t) < 3 THEN array_to_string(t, ' ')
             ELSE t[i] || ' ' || t[i+1] || ' ' || t[i+2] END AS s
      FROM toks, UNNEST(generate_series(1, greatest(len(t) - 2, 1))) AS u(i)
      WHERE t[1] <> ''
    ), sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
      FROM sh a JOIN sh b USING (s) WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
    pairs AS (
      SELECT id_a, id_b
      FROM inter JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
      WHERE inter * 1.0 / (sa.sz + sb.sz - inter) >= 0.5),
    edges AS (
      SELECT id_a AS s, id_b AS d FROM pairs
      UNION SELECT id_b, id_a FROM pairs),
    reach(n, m) AS (
      SELECT doc_id, doc_id FROM toks
      UNION
      SELECT r.n, e.d FROM reach r JOIN edges e ON e.s = r.m)
    SELECT n AS doc_id, min(m) AS cluster_id FROM reach GROUP BY n
    """,
)
def q60(spark, sf):
    """Near-dup clustering over the id<500 slice (the cap keeps the
    small-SF benchmark comparable across rounds). The slice is
    structurally ≤500 docs, so routing picks the one-Arrow-task tier
    from the footer row count — zero probe jobs; "auto" (which pays one
    limit-probe job) covers sources without footer stats."""
    from .operators import graph

    doc = load_table(spark, sf, "documents").filter(F.col("doc_id") < 500)
    n = table_rowcount(sf, "documents")
    strategy = "auto" if n is None else (
        "onetask" if min(n, 500) <= 2000 else "distributed"
    )
    return graph.dedup_clusters(
        doc, "doc_id", "text", threshold=0.5, strategy=strategy
    )


@register(
    "q61_global_row_number",
    # global dense numbering over a total order — the scalable two-phase
    # range-partition formulation vs the oracle's single window
    """
    SELECT l_orderkey, l_linenumber,
           ROW_NUMBER() OVER (ORDER BY l_orderkey, l_linenumber) AS row_id
    FROM lineitem
    """,
)
def q61(spark, sf):
    from .operators import order

    li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_linenumber")
    # footer row count routes small inputs to the one-task window tier;
    # above the tier (sf1's 6M rows and beyond) the two-phase bucketed
    # plan runs fully lazily — the footer (min, max) of the leading key
    # replaces the build-time range aggregate, so BOTH tiers build with
    # zero Spark jobs (round 15: the numbering is now a per-bucket JVM
    # row_number window instead of an Arrow mapInPandas walk)
    return order.global_row_number(
        li,
        ["l_orderkey", "l_linenumber"],
        n_rows_hint=table_rowcount(sf, "lineitem"),
        key_range_hint=table_column_range(sf, "lineitem", "l_orderkey"),
    )


@register(
    "q62_percentile_sketch",
    # exact quantiles are the oracle columns; the Greenwald-Khanna
    # sketch estimates fold into deterministic error-bound booleans
    """
    SELECT lang,
           round(quantile_cont(n_chars, 0.5), 4) AS p50, TRUE AS p50_ok,
           round(quantile_cont(n_chars, 0.9), 4) AS p90, TRUE AS p90_ok,
           round(quantile_cont(n_chars, 0.99), 4) AS p99, TRUE AS p99_ok
    FROM documents GROUP BY lang
    """,
)
def q62(spark, sf):
    from .operators import stats

    doc = load_table(spark, sf, "documents")
    return stats.percentile_sketch_check(doc, "lang", "n_chars").select(
        "lang", "p50", "p50_ok", "p90", "p90_ok", "p99", "p99_ok"
    )


@register(
    "q63_editdist_near_dup",
    # near-dup verification by edit distance with length-bucket blocking:
    # |len(a)-len(b)| > 40 implies dist > 40, and bucket width 50 > 40
    # means qualifying pairs sit in the same OR adjacent buckets — the
    # oracle states the blocking declaratively (|Δbucket| <= 1); the
    # Spark side realizes it as an exact equi-join (dedup.py)
    """
    WITH d AS (
      SELECT doc_id, text, len(text) // 50 AS bkt
      FROM documents WHERE doc_id < 300
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           levenshtein(a.text, b.text) AS dist
    FROM d a JOIN d b
      ON abs(a.bkt - b.bkt) <= 1 AND a.doc_id < b.doc_id
    WHERE levenshtein(a.text, b.text) <= 40
    """,
)
def q63(spark, sf):
    """Edit-distance near-dup pairs, cost-routed like q40: the DEFAULT
    scale path generates candidates with the exact q-gram count/prefix
    filter (``dedup.editdist_candidates`` — content-bounded, measured
    3.6s vs 33s blocking at 5k same-length docs and near-linear to
    20k), while below 2000 docs the auto router keeps plain
    adjacent-length-bucket blocking, whose quadratic is cheaper than
    the prefix plan's window/shuffle stages at that size. Both
    candidate generators are provably lossless — the prefix tier is
    hash-green against this same oracle (round-9 gate replica, entry
    temporarily forced) and byte-equal to the bucket tier in
    tests/test_dedup.py — so routing changes the plan, not the
    answer. Routing is footer-proven lazy exactly as q40: the
    ``doc_id < 300`` cap bounds the kept rows at 300 < 2000 whenever
    footer min(doc_id) >= 0, so the bucket tier passes explicitly with
    zero plan-build jobs (footerless sources keep the live probe)."""
    from .operators import dedup

    doc = load_table(spark, sf, "documents").filter(F.col("doc_id") < 300)
    rng = table_column_range(sf, "documents", "doc_id")
    strategy = "bucket" if rng is not None and rng[0] >= 0 else "auto"
    return dedup.editdist_near_duplicates(
        doc, "doc_id", "text", max_dist=40, bucket_width=50,
        strategy=strategy,
    )


@register(
    "q64_salted_hot_key_agg",
    # the salted two-phase aggregation must be value-identical to the
    # plain GROUP BY it protects at scale
    """
    SELECT event_type, count(*) AS count_event_id,
           round(sum(value), 4) AS sum_value
    FROM events GROUP BY event_type
    """,
)
def q64(spark, sf):
    from .operators import skew

    ev = load_table(spark, sf, "events")
    out = skew.salted_agg(
        ev.select("event_type", "event_id", "value"),
        ["event_type"],
        {"event_id": "count", "value": "sum"},
        salt=16,
    )
    return out.select(
        "event_type", "count_event_id", F.round("sum_value", 4).alias("sum_value")
    )


@register(
    "q65_top_ngrams",
    # corpus-level memorization/boilerplate audit: most-duplicated token
    # 3-grams with document frequency; ties broken by ngram text so the
    # top-k cut is deterministic on both engines
    # tokens are maximal \S+ runs (trim first so split yields no empty
    # leading token — the Spark side's regex tokenizer never produces
    # empty tokens, and the oracle must define the same grams)
    """
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(
        trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS t
      FROM documents
    ), grams AS (
      SELECT doc_id, array_to_string(t[i:i+2], ' ') AS ngram
      FROM toks, UNNEST(generate_series(1, len(t) - 2)) AS u(i)
      WHERE len(t) >= 3 AND t[1] <> ''
    )
    SELECT ngram, count(*) AS n_occurrences,
           count(DISTINCT doc_id) AS n_docs
    FROM grams GROUP BY ngram HAVING count(*) >= 2
    ORDER BY n_occurrences DESC, ngram LIMIT 100
    """,
)
def q65(spark, sf):
    """Top duplicated 3-grams via ``corpus.top_ngrams`` — tokenize +
    window-slide are pure map; one uniform hash shuffle with map-side
    partial agg (Zipfian heads are absorbed before the exchange); the
    final cut is TakeOrderedAndProject, never a global sort."""
    doc = load_table(spark, sf, "documents")
    return corpus.top_ngrams(doc, "doc_id", "text", n=3, k=100, min_count=2)


@register(
    "q66_incremental_dedup",
    # dedup-on-arrival correctness: the pairs an incremental pass must
    # report when the upper-id half of the corpus arrives against an
    # index of the lower half = exactly the q27 truth restricted to
    # pairs touching the new half (id ordering makes that id_b >= split,
    # since id_a < id_b and the split is at the median doc_id)
    """
    WITH split AS (
      SELECT (min(doc_id) + max(doc_id) + 1) // 2 AS s FROM documents
    ), toks AS (
      SELECT doc_id, regexp_split_to_array(
        trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'),
             '\\s+', ' ', 'g')), ' ') AS t
      FROM documents
    ), sh AS (
      -- contentless docs (t = ['']) contribute NO shingles: dedup
      -- claims need content evidence (mirrors shingle_rows)
      SELECT DISTINCT doc_id,
        CASE WHEN len(t) < 3 THEN array_to_string(t, ' ')
             ELSE t[i] || ' ' || t[i+1] || ' ' || t[i+2] END AS s
      FROM toks, UNNEST(generate_series(1, greatest(len(t) - 2, 1))) AS u(i)
      WHERE t[1] <> ''
    ), sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
      FROM sh a JOIN sh b USING (s) WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
    SELECT id_a, id_b,
           round(inter * 1.0 / (sa.sz + sb.sz - inter), 4) AS jaccard
    FROM inter JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
    WHERE inter * 1.0 / (sa.sz + sb.sz - inter) >= 0.4
      AND id_b >= (SELECT s FROM split)
    """,
)
def q66(spark, sf):
    """Incremental dedup: the lower-id half of the corpus is the
    "historical" indexed state (``minhash_banded`` bucket rows — what
    ``streaming/dedup_stream.MinHashBucketIndex`` persists), the upper
    half "arrives", and ``incremental_minhash_pairs`` reports every
    qualifying pair touching the arrival — ONLY the batch is re-signed;
    the historical side contributes its slim (id, band, bh) rows to one
    bucket equi-join. Banding comes from the SHARED tier function
    (``dedup.banding_for_corpus``, same call q27 makes), so index and
    query sides can never drift apart. Corpus shape (count + id range)
    reads from parquet footer statistics — zero plan-build Spark jobs;
    a one-row aggregate covers sources without footer stats."""
    doc = load_table(spark, sf, "documents")
    n = table_rowcount(sf, "documents")
    rng = table_column_range(sf, "documents", "doc_id")
    if n is None or rng is None:
        row = doc.agg(
            F.min("doc_id").alias("lo"),
            F.max("doc_id").alias("hi"),
            F.count("*").alias("n"),
        ).first()
        n, rng = row.n, (row.lo, row.hi)
    split = (int(rng[0]) + int(rng[1]) + 1) // 2
    nh, b = dedup.banding_for_corpus(n)
    if n <= dedup.BRUTE_TASK_CAP and _onetask_bytes_ok(
        sf, "documents", "text", ONETASK_TEXT_BYTES_CAP
    ):
        # one-Arrow-task tier (same routing as q27): the flagged bucket
        # pass runs in-task over the whole small corpus — 2.8s → 1.0s
        # warm at sf0.1 (r7 medians). The O(batch)-not-O(corpus)
        # incremental story is the distributed path above the cap.
        return dedup.minhash_pairs_onetask(
            doc.withColumn("is_new", F.col("doc_id") >= split),
            "doc_id", "text",
            num_hashes=nh, bands=b, jaccard_threshold=0.4,
            new_flag_col="is_new",
        ).select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
    old, new = doc.filter(F.col("doc_id") < split), doc.filter(
        F.col("doc_id") >= split
    )
    index = dedup.minhash_banded(old, "doc_id", "text", num_hashes=nh, bands=b)
    return dedup.incremental_minhash_pairs(
        new, index, doc, "doc_id", "text",
        num_hashes=nh, bands=b, jaccard_threshold=0.4,
        # same group-below / stream-above routing as q27
        pair_source="group" if n <= 100_000 else "join",
    ).select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))


@register(
    "q67_incremental_embedding_dedup",
    # embedding-dedup-on-arrival correctness: the pairs an incremental
    # pass must report when the perturbed copies "arrive" against an
    # index of the originals = exactly the q35 truth restricted to
    # pairs touching the arrival (id_a < id_b and new ids are the
    # +1000000 range, so the restriction is id_b >= 1000000)
    """
    WITH corpus AS (
        SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        UNION ALL
        SELECT vec_id + 1000000,
               list_concat([CAST(embedding[1] AS DOUBLE) + 0.01],
                           CAST(embedding AS DOUBLE[])[2:])
        FROM embeddings
    )
    SELECT a.id AS id_a, b.id AS id_b,
           round(list_cosine_similarity(a.v, b.v), 6) AS cosine
    FROM corpus a JOIN corpus b ON a.id < b.id
    WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.99
      AND b.id >= 1000000
    """,
)
def q67(spark, sf):
    """Incremental embedding dedup: the original vectors are the
    "historical" indexed state (``similarity.embedding_buckets`` rows —
    what ``streaming/embed_stream.EmbeddingBucketIndex`` persists), the
    perturbed near-dup copies "arrive", and
    ``incremental_embedding_pairs`` reports every qualifying pair
    touching the arrival — ONLY the batch is re-bucketed (one Arrow
    matmul over O(batch) vectors); the historical side contributes its
    slim (id, bucket) rows to one flagged bucket join. Same planted
    corpus and recall argument as q35 (exact verification + multi-table
    miss ~1e-5/pair ⇒ output equals the brute-force truth restricted to
    the arrival), so the entry is hash-checkable end to end."""
    emb = load_table(spark, sf, "embeddings").select(
        F.col("vec_id").alias("id"),
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v"),
    )
    perturbed = emb.select(
        (F.col("id") + 1000000).alias("id"),
        F.concat(
            F.array(F.get(F.col("v"), 0) + F.lit(0.01)),
            F.slice(F.col("v"), 2, 1000000),
        ).alias("v"),
    )
    corpus = emb.unionByName(perturbed)
    n = table_rowcount(sf, "embeddings")
    if (
        n is not None
        and 2 * n <= dedup.BRUTE_TASK_CAP
        and _onetask_bytes_ok(
            sf, "embeddings", "embedding", ONETASK_VEC_BYTES_CAP // 2
        )
    ):
        # one-Arrow-task tier (the q66 routing applied to embeddings):
        # the flagged bucket pass runs in-task over the whole small
        # corpus — 1.52s -> ~0.5s warm at sf0.1 (round-15 medians),
        # identical pairs by the flag predicate (≥ 1 arriving member ≡
        # the incremental candidate set when the index covers every
        # original). The O(batch)-not-O(corpus) incremental story is
        # the distributed path below, gated by the sf1 replica.
        return similarity.embedding_pairs_onetask(
            corpus.withColumn("is_new", F.col("id") >= 1000000),
            "id", "v", min_cosine=0.99, n_tables=6, dim=64,
            new_flag_col="is_new",
        )
    index = similarity.embedding_buckets(emb, "id", "v", n_tables=6, dim=64)
    return similarity.incremental_embedding_pairs(
        perturbed, index, corpus, "id", "v",
        min_cosine=0.99, n_tables=6, dim=64,
        pair_source="group"
        if (n is not None and 2 * n <= 100_000)
        else "join",
    )


@register(
    "q68_jpeg_pixel_stats",
    # REAL lossy-codec gate: the Spark side synthesizes baseline-JPEG
    # payloads (functions/jpegcodec.py — DCT + Annex K + Huffman),
    # DECODES them back, and reports exact integer pixel statistics.
    # The oracle recomputes those statistics from the closed-form
    # block formula and knows nothing about JPEG — the hash matches
    # only if encode→decode is bit-exact, which holds for
    # block-constant grayscale at quality 100 (integer DC, zero AC,
    # unit quant tables; see the jpegcodec module docstring). Any
    # defect anywhere in the codec (tables, zig-zag, Huffman, bit
    # stuffing, DC prediction, IDCT) breaks the match.
    """
    SELECT doc_id,
           32 AS width, 24 AS height,
           CAST(min(((doc_id * 7 + bx * 13 + by * 29) % 256 + 256) % 256) AS BIGINT)
               AS px_min,
           CAST(max(((doc_id * 7 + bx * 13 + by * 29) % 256 + 256) % 256) AS BIGINT)
               AS px_max,
           CAST(64 * sum(((doc_id * 7 + bx * 13 + by * 29) % 256 + 256) % 256) AS BIGINT)
               AS px_sum
    FROM documents,
         generate_series(0, 3) AS gx(bx),
         generate_series(0, 2) AS gy(by)
    GROUP BY doc_id
    """,
)
def q68(spark, sf):
    """Baseline-JPEG round-trip over the documents table: synthesize
    real JFIF payloads (32x24 grayscale, block-constant pixels,
    quality 100), decode them with the same pure-numpy codec, emit
    exact per-image pixel statistics. Both stages are Arrow-batched
    ``mapInPandas`` maps — payloads never leave executors, no shuffle.
    Beyond-reference multimodal family (the reference engine has no
    media path)."""
    # Round 15: fused one-task round-trip (multimodal.jpeg_roundtrip_stats)
    # — the two-stage synth->decode pipeline crossed the Arrow boundary
    # 4x per payload; identity with the composition is pytest-pinned.
    # The operator itself partitions ids by the pixel formula's
    # congruence class (duplicate payloads co-locate with the memo),
    # which subsumes the old round-robin spread.
    doc = load_table(spark, sf, "documents").select("doc_id")
    return multimodal.jpeg_roundtrip_stats(
        doc, width=32, height=24, quality=100
    ).select(
        "doc_id",
        F.col("width").cast("int").alias("width"),
        F.col("height").cast("int").alias("height"),
        "px_min", "px_max", "px_sum",
    )


@register(
    "q69_flac_sample_stats",
    # Lossless-codec gate: the Spark side synthesizes real FLAC
    # payloads (functions/flaccodec.py — fixed predictors, Rice
    # residuals, CRC-8/CRC-16 verified frames), DECODES them back, and
    # reports exact integer sample statistics. FLAC is lossless, so
    # the oracle recomputes those statistics from the closed-form
    # waveform formula (same one synthesize_wav uses) knowing nothing
    # about FLAC — any codec defect (predictor integration, Rice
    # zigzag, bit packing, CRC, UTF-8 frame numbers) breaks the hash.
    """
    SELECT doc_id,
           16000 AS sample_rate,
           2048 AS n_samples,
           CAST(max(abs(((doc_id * 31 + i * 7) % 2048 + 2048) % 2048 - 1024)) AS BIGINT)
               AS peak,
           CAST(sum(((doc_id * 31 + i * 7) % 2048 + 2048) % 2048 - 1024) AS BIGINT)
               AS s_sum
    FROM documents, generate_series(0, 2047) AS gs(i)
    GROUP BY doc_id
    """,
)
def q69(spark, sf):
    """FLAC round-trip over the documents table: synthesize real FLAC
    streams (2048 mono int16 samples from the doc_id waveform
    formula), decode them with the same pure-numpy codec, emit exact
    per-payload sample statistics. Both stages are Arrow-batched
    ``mapInPandas`` maps — no shuffle, payloads never leave executors.
    Beyond-reference multimodal family."""
    # Round 15: fused one-task round-trip (flac_roundtrip_stats) — see
    # q68, including the operator-side congruence-class partitioning
    doc = load_table(spark, sf, "documents").select("doc_id")
    return multimodal.flac_roundtrip_stats(
        doc, n_samples=2048, sample_rate=16_000
    ).select(
        "doc_id",
        F.col("sample_rate").cast("int").alias("sample_rate"),
        F.col("n_samples").cast("int").alias("n_samples"),
        "peak", "s_sum",
    )


@register(
    "q70_pii_redaction",
    # typed PII detection + redaction; PII spans are injected into the
    # corpus text by the SAME closed-form expression on both sides, so
    # the regex engines (Java on Spark, RE2 in DuckDB) are exercised on
    # guaranteed-nonzero matches and the redacted text hash-matches
    # byte for byte. Pattern order: email, ssn, phone, ipv4.
    """
    WITH seeded AS (
      SELECT doc_id,
             text || ' reach user' || doc_id ||
             '@example.com, ssn ' || (100 + doc_id % 900) || '-' ||
             (10 + doc_id % 90) || '-' || (1000 + doc_id % 9000) ||
             ', tel 555-' || (100 + doc_id % 900) || '-' ||
             (1000 + doc_id % 9000) || ', host 10.' || (doc_id % 256)
             || '.0.' || ((doc_id * 3) % 256) AS text
      FROM documents
    )
    SELECT doc_id,
      CAST(len(regexp_extract_all(text,
        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT)
        AS n_email,
      CAST(len(regexp_extract_all(text,
        '\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b')) AS BIGINT) AS n_ssn,
      CAST(len(regexp_extract_all(text,
        '\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b')) AS BIGINT) AS n_phone,
      CAST(len(regexp_extract_all(text,
        '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b')) AS BIGINT)
        AS n_ipv4,
      regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        '\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b', '[SSN]', 'g'),
        '\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b', '[PHONE]', 'g'),
        '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b', '[IP]', 'g')
        AS redacted
    FROM seeded
    """,
)
def q70(spark, sf):
    """PII compliance pass (operators/corpus.pii_profile): typed
    detection counts + placeholder redaction as pure JVM regex Columns
    — no UDF, no shuffle, scan-throughput at 100 TB. The corpus text
    is seeded with formula-derived PII spans identically on both
    engines so every pattern fires."""
    from .operators.partitioning import spread_small_scan

    # 8 regex passes are CPU-bound map work; an unspread single-row-
    # group scan serialized this onto one core (5.5s at sf1 = 50k docs
    # x 110us on ONE task — same starvation mode as q27/q65/q68)
    doc = spread_small_scan(load_table(spark, sf, "documents"))
    d = F.col("doc_id")
    seeded = doc.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" reach user"), d.cast("string"),
            F.lit("@example.com, ssn "),
            (d % 900 + 100).cast("string"), F.lit("-"),
            (d % 90 + 10).cast("string"), F.lit("-"),
            (d % 9000 + 1000).cast("string"),
            F.lit(", tel 555-"),
            (d % 900 + 100).cast("string"), F.lit("-"),
            (d % 9000 + 1000).cast("string"),
            F.lit(", host 10."),
            (d % 256).cast("string"), F.lit(".0."),
            ((d * 3) % 256).cast("string"),
        ).alias("text"),
    )
    out = corpus.pii_profile(seeded, "doc_id", "text")
    return out.select(
        F.col("id").alias("doc_id"),
        F.col("n_email").cast("long").alias("n_email"),
        F.col("n_ssn").cast("long").alias("n_ssn"),
        F.col("n_phone").cast("long").alias("n_phone"),
        F.col("n_ipv4").cast("long").alias("n_ipv4"),
        "redacted",
    )


@register(
    "q71_unigram_logprob",
    # corpus-fit quality score: MLE unigram LM over the corpus itself,
    # per-doc sum of token log-probabilities — the engine-exact
    # stand-in for CCNet's KenLM perplexity filter. ln() on both
    # engines; same rounding discipline as q58.
    """
    WITH tok AS (
      SELECT doc_id, t AS term FROM (
        SELECT doc_id,
               UNNEST(regexp_split_to_array(lower(text), '\\s+')) AS t
        FROM documents)
      WHERE t <> ''
    ), cnt AS (
      SELECT term, CAST(count(*) AS DOUBLE) AS c FROM tok GROUP BY 1
    ), tot AS (
      SELECT CAST(sum(c) AS DOUBLE) AS n FROM cnt
    )
    SELECT doc_id, count(*) AS n_tokens,
           round(sum(ln(c / n)), 4) AS logprob
    FROM tok JOIN cnt USING (term) CROSS JOIN tot
    GROUP BY doc_id
    """,
)
def q71(spark, sf):
    """Unigram-LM log-probability per document
    (operators/ranking.unigram_logprob): one explode, one vocabulary
    agg (map-side combined), one broadcastable (term) join, one per-doc
    agg — all Column math in whole-stage codegen. NOT spread: unlike
    the pure-map entries, this plan shuffles right after tokenize, and
    a measured interleaved A/B at sf1 showed the extra exchange costs
    more than the starved scan saves (warm 2.2-2.6s unspread vs
    3.0-3.4s spread, 4 rounds each in one session)."""
    from .operators import ranking

    doc = load_table(spark, sf, "documents")
    return ranking.unigram_logprob(doc, "doc_id", "text").select(
        F.col("id").alias("doc_id"), "n_tokens", "logprob"
    )


@register(
    "q72_h264_frame_stats",
    # Lossless-video-codec gate: the Spark side synthesizes real H.264
    # Annex B streams (functions/h264codec.py — SPS/PPS Exp-Golomb
    # headers, IDR slices of I_PCM macroblocks, emulation prevention),
    # DECODES them back, and reports exact integer luma statistics.
    # I_PCM is lossless, so the oracle recomputes the statistics from
    # the closed-form pixel formula knowing nothing about H.264 — any
    # codec defect (NAL framing, Exp-Golomb, slice headers, PCM
    # alignment, plane layout, emulation prevention) breaks the hash.
    """
    SELECT doc_id,
           2 AS n_frames, 32 AS width, 16 AS height,
           CAST(min(((doc_id * 13 + f * 97 + r * 5 + c * 3) % 256 + 256) % 256) AS BIGINT)
               AS y_min,
           CAST(max(((doc_id * 13 + f * 97 + r * 5 + c * 3) % 256 + 256) % 256) AS BIGINT)
               AS y_max,
           CAST(sum(((doc_id * 13 + f * 97 + r * 5 + c * 3) % 256 + 256) % 256) AS BIGINT)
               AS y_sum
    FROM documents,
         generate_series(0, 1) AS gf(f),
         generate_series(0, 15) AS gr(r),
         generate_series(0, 31) AS gc(c)
    GROUP BY doc_id
    """,
)
def q72(spark, sf):
    """H.264 round-trip over the documents table: synthesize real
    Annex B clips (2 IDR frames, 32x16, I_PCM macroblocks from the
    doc_id pixel formula), decode them with the same pure-numpy codec,
    emit exact per-clip luma statistics. Both stages are Arrow-batched
    ``mapInPandas`` maps — payloads never leave executors, no shuffle.
    Beyond-reference multimodal family (closes the last honest codec
    stub; motion-compensated profiles remain a native-codec job)."""
    # Round 15: fused one-task round-trip (h264_roundtrip_stats) — see
    # q68, including the operator-side congruence-class partitioning
    doc = load_table(spark, sf, "documents").select("doc_id")
    return multimodal.h264_roundtrip_stats(
        doc, width=32, height=16, n_frames=2
    ).select(
        "doc_id",
        F.col("n_frames").cast("int").alias("n_frames"),
        F.col("width").cast("int").alias("width"),
        F.col("height").cast("int").alias("height"),
        "y_min", "y_max", "y_sum",
    )


def _dupwin_oracle_sql(restrict_to_arrivals: bool) -> str:
    """Shared SQL twin of the duplicated-window-span audit — q73 uses
    the full-corpus form, q76 restricts the identical truth to the
    arriving (upper-id) half, so the two entries can never disagree
    about the operator's semantics."""
    where = (
        """
    WHERE d.doc_id >= (SELECT s FROM split)"""
        if restrict_to_arrivals
        else ""
    )
    return f"""
    WITH split AS (
      SELECT (min(doc_id) + max(doc_id) + 1) // 2 AS s FROM documents
    ), toks AS (
      SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS t
      FROM documents
    ), win AS (
      SELECT doc_id, i AS pos,
             CAST(('0x' || substr(md5(array_to_string(t[i:i+7], ' ')), 1, 15))
                  AS BIGINT) AS h
      FROM toks, UNNEST(generate_series(1, len(t) - 7)) AS u(i)
      WHERE len(t) >= 8
    ), cw AS (
      SELECT doc_id, pos, count(*) OVER (PARTITION BY h) AS c FROM win
    ), cov AS (
      SELECT doc_id, count(DISTINCT p) AS covered
      FROM cw, UNNEST(generate_series(pos, pos + 7)) AS g(p)
      WHERE c > 1 GROUP BY doc_id
    ), wagg AS (
      SELECT doc_id, count(*) AS nw,
             sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS dw
      FROM cw GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(len(regexp_split_to_array(lower(d.text), '\\s+')) AS BIGINT)
               AS n_tokens,
           CAST(coalesce(w.nw, 0) AS BIGINT) AS n_windows,
           CAST(coalesce(w.dw, 0) AS BIGINT) AS dup_windows,
           CAST(coalesce(c.covered, 0) AS BIGINT) AS covered_tokens
    FROM documents d
    LEFT JOIN wagg w USING (doc_id)
    LEFT JOIN cov c USING (doc_id){where}
    """


@register(
    "q73_dup_window_spans",
    # exact duplicated-substring audit (the windowed train-data
    # substring-dedup signal): flag every 8-token window whose hash
    # repeats anywhere in the corpus, report per doc the unioned span
    # coverage. Window hashes are the engine-portable md5-60 form, so
    # the FLAGS reproduce bit-for-bit in DuckDB, not just the counts.
    _dupwin_oracle_sql(restrict_to_arrivals=False),
)
def q73(spark, sf):
    """Corpus-wide exact duplicated-span audit
    (operators/corpus.duplicate_window_spans): tokenize, hash every
    8-token window, one analytic count over the hash partitioning (no
    count-table join), union flagged spans per document. The
    distributed analogue of suffix-array substring dedup's
    mark-duplicate-spans pass, at O(total windows) with no all-pairs
    stage."""
    doc = load_table(spark, sf, "documents")
    # STRATEGY-routed small-corpus tier (round 15, the q80/q81 pattern):
    # with every row flagged batch the one-task kernel computes exactly
    # the global >1 rule; the distributed analytic-window plan is the
    # 100-TB path, sf1-gated. Footer-read routing, zero plan-build jobs.
    n_docs = table_rowcount(sf, "documents")
    if (
        n_docs is not None
        and n_docs <= corpus.DUPWIN_TASK_CAP
        and _onetask_bytes_ok(
            sf, "documents", "text", ONETASK_TEXT_BYTES_CAP
        )
    ):
        return corpus.dup_window_spans_onetask(
            doc.select("doc_id", "text", F.lit(True).alias("__b")),
            "doc_id", "text", "__b", window_n=8,
        )
    return corpus.duplicate_window_spans(doc, "doc_id", "text", window_n=8)


@register(
    "q74_dsir_scores",
    # DSIR-style importance score: per-doc Σ ln p_target − ln p_source
    # under add-one-smoothed unigram LMs (target slice = lang 'en');
    # the importance-resampling signal for domain-weighted pretraining
    # mixes. ln() double on both engines, q71's rounding discipline.
    """
    WITH tok AS (
      SELECT doc_id, tgt, t AS term FROM (
        SELECT doc_id,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS tgt,
               UNNEST(regexp_split_to_array(lower(text), '\\s+')) AS t
        FROM documents)
      WHERE t <> ''
    ), vocab AS (
      SELECT term, CAST(count(*) AS DOUBLE) AS cs,
             CAST(sum(tgt) AS DOUBLE) AS ct
      FROM tok GROUP BY 1
    ), tots AS (
      SELECT CAST(sum(cs) AS DOUBLE) AS ns, CAST(sum(ct) AS DOUBLE) AS nt,
             CAST(count(*) AS DOUBLE) AS v
      FROM vocab
    )
    SELECT doc_id, count(*) AS n_tokens,
           round(sum(ln((ct + 1) / (nt + v)) - ln((cs + 1) / (ns + v))), 4)
               + 0.0 AS dsir_score
    FROM tok JOIN vocab USING (term) CROSS JOIN tots
    GROUP BY doc_id
    """,
)
def q74(spark, sf):
    """Importance-resampling data selection
    (operators/ranking.dsir_scores): one tokenize pass computes BOTH
    unigram LMs (target = lang 'en' slice via a conditional sum in the
    same vocabulary agg), one broadcastable term join, one per-doc
    agg. Same plan family as q71; the score ranks documents by
    affinity to the target domain."""
    from .operators import ranking

    doc = load_table(spark, sf, "documents")
    # vocabulary bytes <= total text bytes, so the footer byte cap
    # bounds the broadcast build side; past the cap the join strategy
    # stays the optimizer's (round 16, guide section 3.1: the static
    # planner otherwise broadcasts the post-explode TOKEN STREAM -
    # strictly larger than the distinct-term table)
    return ranking.dsir_scores(
        doc, "doc_id", "text", F.col("lang") == "en",
        broadcast_vocab=_onetask_bytes_ok(
            sf, "documents", "text", ONETASK_TEXT_BYTES_CAP
        ),
    ).select(F.col("id").alias("doc_id"), "n_tokens", "dsir_score")


def _bpe_oracle_sql(k: int) -> str:
    """Chained-stage SQL twin of the FULL BPE loop: stage i recomputes
    weighted pair counts over the vocab reps, picks the argmax under
    the same (count desc, left, right) total order, and folds the
    merge with the same boundary-safe marker replace — then the learned
    chain is applied to every document. Iterative training, still an
    exact hash-checkable oracle (see operators/tokenizer.py)."""
    parts = [
        """
    WITH wc AS (
      SELECT w AS word, count(*) AS freq FROM (
        SELECT UNNEST(regexp_split_to_array(lower(text), '\\s+')) AS w
        FROM documents)
      WHERE w <> '' GROUP BY 1
    ), s0 AS (
      SELECT chr(1) || regexp_replace(word, '(.)', '\\1' || chr(1), 'g')
                 AS rep,
             freq
      FROM wc
    )"""
    ]
    for i in range(k):
        parts.append(f"""
    , p{i} AS (
      SELECT t[i] AS l, t[i+1] AS r, sum(freq) AS cnt
      FROM (SELECT string_split(rep, chr(1)) AS t, freq FROM s{i}),
           UNNEST(generate_series(2, len(t) - 2)) AS u(i)
      GROUP BY 1, 2
    ), b{i} AS (
      SELECT l, r FROM p{i} ORDER BY cnt DESC, l, r LIMIT 1
    ), s{i + 1} AS (
      SELECT replace(rep, chr(1) || l || chr(1) || r || chr(1),
                     chr(1) || l || r || chr(1)) AS rep, freq
      FROM s{i} CROSS JOIN b{i}
    )""")
    parts.append("""
    , d0 AS (
      SELECT doc_id,
             trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm
      FROM documents
    ), docs0 AS (
      SELECT doc_id,
             CASE WHEN norm = '' THEN 0
                  ELSE len(string_split(norm, ' ')) END AS n_words,
             chr(1) || regexp_replace(norm, '(.)', '\\1' || chr(1), 'g')
                 AS rep
      FROM d0
    )""")
    for i in range(k):
        parts.append(f"""
    , docs{i + 1} AS (
      SELECT doc_id, n_words,
             replace(rep, chr(1) || l || chr(1) || r || chr(1),
                     chr(1) || l || r || chr(1)) AS rep
      FROM docs{i} CROSS JOIN b{i}
    )""")
    parts.append(f"""
    SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
           CAST(CASE WHEN n_words = 0 THEN 0
                     ELSE len(string_split(rep, chr(1))) - 2 - (n_words - 1)
                END AS BIGINT) AS n_bpe_tokens
    FROM docs{k}""")
    return "".join(parts)


@register(
    "q75_bpe_tokenize",
    # BPE is ITERATIVE (each merge depends on the corpus state after
    # the previous one) — normally un-oracle-able. The marker-replace
    # formulation makes the WHOLE loop exact SQL: 8 chained
    # argmax+replace stages re-learn the merges inside DuckDB, then
    # apply them to every document; any divergence anywhere in the
    # loop (tokenization, pair weighting, tie-break, merge semantics,
    # application) breaks the per-doc token-count hash.
    _bpe_oracle_sql(8),
)
def q75(spark, sf):
    """BPE tokenizer: train 8 merges over the corpus word-frequency
    table (operators/tokenizer.bpe_train — one corpus-scale agg, then
    vocab-sized argmax jobs), apply them to every document as a chain
    of literal JVM ``replace`` Columns (no UDF, no shuffle), report
    per-doc word and BPE-token counts."""
    from .operators import tokenizer

    doc = load_table(spark, sf, "documents")
    merges = tokenizer.bpe_train(doc, "text", num_merges=8)
    return tokenizer.bpe_token_counts(doc, "doc_id", "text", merges)


@register(
    "q76_incremental_dup_windows",
    # arrival-time substring-dedup correctness: the statistics the
    # incremental pass must report when the upper-id half of the corpus
    # arrives against an index of the lower half = exactly the q73
    # batch truth restricted to arriving ids (hist_occ + batch_occ > 1
    # iff hist >= 1 or batch >= 2 - see incremental_dup_window_stats)
    _dupwin_oracle_sql(restrict_to_arrivals=True),
)
def q76(spark, sf):
    """Substring-dedup-on-arrival: the lower-id half of the corpus is
    the indexed history (the slim (h, occ) counters
    ``streaming/dupwin_stream.WindowHashIndex`` persists), the upper
    half arrives, and ``incremental_dup_window_stats`` reports each
    arriving doc's duplicated-span statistics — O(batch windows), the
    history text never re-tokenized. Corpus shape reads from parquet
    footer statistics (zero plan-build jobs); a one-row aggregate
    covers footerless sources."""
    from .operators.corpus import _window_hashes, incremental_dup_window_stats

    doc = load_table(spark, sf, "documents")
    rng = table_column_range(sf, "documents", "doc_id")
    if rng is None:
        row = doc.agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")).first()
        rng = (row.lo, row.hi)
    split = (int(rng[0]) + int(rng[1]) + 1) // 2
    # STRATEGY-routed small-corpus tier (round 15): the arrival flags
    # are hist_occ + batch_occ > 1 — exactly the total-count rule the
    # one-task kernel applies when history rides along unflagged (the
    # identity incremental_dup_window_stats' docstring derives). The
    # REAL O(batch) stream plan runs above the cap, sf1-gated.
    n_docs = table_rowcount(sf, "documents")
    if (
        n_docs is not None
        and n_docs <= corpus.DUPWIN_TASK_CAP
        and _onetask_bytes_ok(
            sf, "documents", "text", ONETASK_TEXT_BYTES_CAP
        )
    ):
        from .operators.corpus import dup_window_spans_onetask

        flagged = doc.select(
            "doc_id", "text", (F.col("doc_id") >= split).alias("__b")
        )
        return dup_window_spans_onetask(
            flagged, "doc_id", "text", "__b", window_n=8
        )
    from .operators.partitioning import spread_small_scan

    # spread the history scan too: the md5 window pass is the cost and
    # a single-row-group fixture otherwise signs the whole history in
    # one task (round 16, same fix as duplicate_window_spans)
    hist = (
        _window_hashes(
            spread_small_scan(doc.filter(F.col("doc_id") < split)),
            "doc_id", "text", 8,
        )
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("occ"))
    )
    batch = doc.filter(F.col("doc_id") >= split)
    return incremental_dup_window_stats(batch, hist, "doc_id", "text", 8)


def _kmeans_oracle_sql(iters: int, dims: int, scale: int, tau: float) -> str:
    """Chained-stage SQL twin of the FULL deterministic-Lloyd loop
    (see similarity.kmeans_grid): stage i assigns every vector to the
    nearest integer-grid centroid (exact integer distances, argmin
    tie-broken on cluster index) and re-quantizes the centroids with
    the same exact-integer half-away-from-zero mean — then SemDeDup's
    within-cluster lower-id cosine rule marks drops. Iterative
    clustering, still hash-checkable (the q75 BPE strategy)."""
    head = f"""
    WITH corpus AS (
      SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
      UNION ALL
      SELECT vec_id + 1000000,
             list_concat([CAST(embedding[1] AS DOUBLE) + 0.01],
                         CAST(embedding AS DOUBLE[])[2:])
      FROM embeddings
    ), qv0 AS (
      -- the TOTAL grid quantizer (similarity._spark_quantize's SQL
      -- twin): NaN -> 0, clamp to +/-1e6 after rounding, so hostile
      -- NaN/Inf dimensions quantize instead of failing the cast and
      -- every distance term stays exactly representable
      SELECT id, v,
             list_transform(v, x -> CAST(
               CASE WHEN isnan(x) THEN 0.0
                    ELSE least(1000000.0,
                               greatest(-1000000.0, round(x * {scale})))
               END AS BIGINT)) AS q
      FROM corpus
    ), qv AS (
      -- |q|^2 precomputed: dist = |q|^2 - 2 q.c + |c|^2 keeps every
      -- stage a vectorized list_inner_product (exact: all integer
      -- values stay far below 2^53, so the double sums are exact) --
      -- the correlated per-dim subquery form blew past 100 GB at sf1
      SELECT id, v, q,
             CAST(list_inner_product(q, q) AS BIGINT) AS qq
      FROM qv0
    ), c0 AS (
      SELECT row_number() OVER (ORDER BY md5(CAST(id AS VARCHAR)), id) - 1
                 AS j,
             q
      FROM qv
      QUALIFY row_number() OVER (ORDER BY md5(CAST(id AS VARCHAR)), id)
                  <= (SELECT greatest(8, count(*) // 500) FROM qv)
    )"""
    parts = [head]
    for i in range(iters + 1):
        parts.append(f"""
    , d{i} AS (
      SELECT v.id, c.j,
             CAST(v.qq - 2 * list_inner_product(v.q, c.q)
                  + list_inner_product(c.q, c.q) AS BIGINT) AS dist
      FROM qv v CROSS JOIN c{i} c
    ), a{i} AS (
      SELECT id, j AS cluster FROM (
        SELECT id, j,
               row_number() OVER (PARTITION BY id ORDER BY dist, j) AS rn
        FROM d{i})
      WHERE rn = 1
    )""")
        if i == iters:
            break
        parts.append(f"""
    , m{i} AS (
      SELECT a.cluster, g.i AS d, sum(v.q[g.i]) AS s, count(*) AS n
      FROM a{i} a JOIN qv v USING (id), generate_series(1, {dims}) g(i)
      GROUP BY 1, 2
    ), n{i} AS (
      SELECT cluster AS j,
             list(CASE WHEN s >= 0 THEN (2 * s + n) // (2 * n)
                       ELSE -((2 * (-s) + n) // (2 * n)) END
                  ORDER BY d) AS q
      FROM m{i} GROUP BY 1
    ), c{i + 1} AS (
      SELECT c.j, coalesce(n.q, c.q) AS q
      FROM c{i} c LEFT JOIN n{i} n USING (j)
    )""")
    parts.append(f"""
    , drops AS (
      SELECT DISTINCT a.id
      FROM a{iters} a JOIN a{iters} b
        ON a.cluster = b.cluster AND b.id < a.id
      JOIN qv va ON va.id = a.id
      JOIN qv vb ON vb.id = b.id
      WHERE round(list_cosine_similarity(va.v, vb.v), 6) >= {tau}
    )
    SELECT a.id, CAST(a.cluster AS INT) AS cluster,
           (a.id IN (SELECT id FROM drops)) AS is_dropped
    FROM a{iters} a""")
    return "".join(parts)


@register(
    "q77_semantic_dedup",
    # SemDeDup over a corpus with planted near-twins: deterministic
    # integer-grid Lloyd k-means (every distance an exact integer,
    # centroid updates exact-integer rounding, md5-ordered seeds) so
    # the FULL iterative clustering reproduces in SQL, then the
    # within-cluster lower-id cosine rule marks drops. Any divergence
    # in seeding, assignment, tie-break, centroid math, or the dedup
    # rule breaks the hash.
    _kmeans_oracle_sql(iters=2, dims=64, scale=1000, tau=0.95),
)
def q77(spark, sf):
    """Semantic dedup (the SemDeDup recipe): cluster the embedding
    space with the oracle-exact grid k-means
    (similarity.kmeans_grid), drop within each cluster every member
    with a lower-id neighbor above cosine 0.95. The perturbed-twin
    corpus construction is q35's — every vector gets a planted
    ~0.9999-cosine twin, so the drop set is non-trivial and the
    clustering must co-locate twins to find them."""
    emb = load_table(spark, sf, "embeddings").select(
        F.col("vec_id").alias("id"),
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v"),
    )
    perturbed = emb.select(
        (F.col("id") + 1000000).alias("id"),
        F.concat(
            F.array(F.get(F.col("v"), 0) + F.lit(0.01)),
            F.slice(F.col("v"), 2, 1000000),
        ).alias("v"),
    )
    corpus = emb.unionByName(perturbed)
    # k scales with the corpus (bounding the within-cluster quadratic
    # term), computed identically in the oracle: greatest(8, n // 500).
    # Footer row count -> zero plan-build jobs; agg fallback otherwise.
    n = table_rowcount(sf, "embeddings")
    if n is None:
        n = emb.count()
    k = max(8, (2 * n) // 500)
    # Footer-gated LOCAL corpus (the q79 tier): build the SAME
    # emb ∪ perturbed pairs driver-side from one pyarrow read — the
    # perturbation is the identical IEEE double op (float32→double
    # cast then +0.01), quantization goes through the pinned half-up
    # twin inside semantic_dedup — removing the probe-collect job from
    # plan build. Bit-identity vs the Spark tier is pytest-pinned
    # (test_semantic_dedup_local_corpus_bit_identical); larger or
    # footerless corpora keep the Spark probe.
    local = None
    if n <= 25_000:  # 2n rows collected; keep the driver bound tight
        try:
            import os

            import pyarrow.parquet as pq

            path = os.path.join(sf, "embeddings.parquet")
            if os.path.isfile(path):
                t = pq.read_table(path, columns=["vec_id", "embedding"])
                base = [
                    (int(i), [float(x) for x in v])
                    for i, v in zip(
                        t.column("vec_id").to_pylist(),
                        t.column("embedding").to_pylist(),
                    )
                ]
                local = base + [
                    (i + 1000000, [v[0] + 0.01] + v[1:]) for i, v in base
                ]
        except Exception:
            local = None
    return similarity.semantic_dedup(
        corpus, "id", "v", k=k, iters=2, scale=1000, threshold=0.95,
        local_corpus=local,
    )


@register(
    "q78_token_budget_mix",
    # token-budget-exact mixing: per language, select documents in
    # md5 order while the cumulative token count fits half the
    # domain's tokens — budgets in TOKENS (how pretraining mixes are
    # specified), selection reproducible in any engine
    """
    WITH base AS (
      SELECT doc_id, lang AS domain,
             CAST(len(regexp_split_to_array(lower(text), '\\s+')) AS BIGINT)
                 AS n_tokens
      FROM documents
    ), cum AS (
      SELECT doc_id, domain, n_tokens,
             sum(n_tokens) OVER (
               PARTITION BY domain
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS cum
      FROM base
    ), tot AS (
      SELECT domain, CAST(floor(sum(n_tokens) * 0.5) AS BIGINT) AS budget
      FROM base GROUP BY 1
    )
    SELECT c.doc_id, c.domain, c.n_tokens,
           (c.cum <= t.budget) AS selected
    FROM cum c JOIN tot t USING (domain)
    """,
)
def q78(spark, sf):
    """Token-budget data mixing (corpus.token_budget_sample): per-lang
    hash-order walk selecting documents until half the domain's token
    mass is reached. One tokenize pass, one per-domain window cumsum,
    one broadcast totals join — no collect, no iteration."""
    doc = load_table(spark, sf, "documents")
    return corpus.token_budget_sample(doc, "doc_id", "text", "lang", frac=0.5)


@register(
    "q79_pq_ann",
    # Two labeled regimes, BOTH hash-stable at any SF:
    #  * 'total': shortlist >= corpus, provably-exact — q33's oracle.
    #  * 'selective_planted': the REAL 4-k shortlist over the corpus
    #    plus 10 planted copies of the query at ids -10..-1. Planted
    #    codes achieve the global ADC minimum and the smallest ids, so
    #    the (dist asc, id asc) shortlist provably retains them and the
    #    exact re-rank provably returns exactly them (score 1.0, ids
    #    before every corpus id) — the selective path executes end to
    #    end with a closed-form answer at every corpus size.
    """
    SELECT 'selective_planted' AS regime,
           CAST(-i AS BIGINT) AS vec_id, CAST(1.0 AS DOUBLE) AS score
    FROM generate_series(1, 10) s(i)
    UNION ALL
    SELECT 'total' AS regime, vec_id,
           round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                 (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings
                  WHERE vec_id = 0)), 4) AS score
    FROM embeddings
    ORDER BY 1, 3 DESC, 2 LIMIT 20
    """,
)
def q79(spark, sf):
    """Product-quantization ANN, full pipeline under the gate: train
    deterministic integer-grid codebooks on a bounded sample
    (``pq_train``), encode the corpus to 8 codes/vector (``pq_encode``,
    one Arrow pass), ADC-scan the codes for a shortlist, exact-cosine
    re-rank the shortlist's raw vectors (``pq_refine_topk``).

    Both regimes run at EVERY SF and each row is labeled with the
    regime that produced it (no size routing, no bare cutoff — the
    round-10 advice fix):

    * ``total`` — the exact cosine top-10 (data-dependent, checked
      verbatim against q33's oracle), STRATEGY-ROUTED to the exact
      scan at every SF: a shortlist >= corpus degenerates the PQ
      pipeline to exactly this scan (the pytest-pinned degeneration
      theorem, test_pq_refine_total_equals_exact), so running the
      corpus-sized ADC + TakeOrdered + broadcast re-join first
      computed the SAME rows while paying a second full retrieve
      pipeline per invocation (~40% of the entry's warm cost in r12)
      and, above 100k, a corpus-sized driver TakeOrdered. One labeled
      plan at all sizes — no size routing of the ANSWER, only of the
      provably-identical strategy (the q34 pattern, previously applied
      here only above 100k).
    * ``selective_planted`` — the honest 4·k shortlist (40 of n+10
      rows, selective at every gate SF) over the corpus AUGMENTED with
      10 exact copies of the query vector at ids -10..-1. Planted rows
      quantize to the query's own grid points, so their ADC distance
      is the global minimum (per subspace, min over centroids of the
      distance to the query's sub-vector — no code scores lower), and
      their negative ids sort before every corpus id, so the
      (dist asc, id asc) shortlist provably contains all 10 at any
      corpus size; the exact re-rank then scores them cosine 1.0 — the
      unique maximum ties only with vec_id 0, which their smaller ids
      beat. A wrong ADC table, a broken tie-break, or a shortlist that
      drops rows all surface as a hash mismatch, while the answer
      stays closed-form: ids -10..-1, score 1.0. This regime is the
      one exercising the FULL train→encode→ADC→re-rank pipeline at
      every SF; selective recall on UNplanted data is additionally
      pinned in tests/test_similarity.py.
    """
    emb = load_table(spark, sf, "embeddings")
    qv = _query_vec(spark, sf)
    n = table_rowcount(sf, "embeddings")
    n = emb.count() if n is None else n
    # STRATEGY-routed small-corpus tier (round 15, the q35 pattern
    # applied to the retrieve pipeline): below half the brute cap the
    # one-Arrow-task kernel trains, plants, encodes, ADC-shortlists and
    # exact-reranks in a single task — identity with the distributed
    # plan pinned in tests/test_similarity.py; the distributed
    # train->encode->ADC->re-rank plan stays the at-scale path and is
    # gated by the sf1 replica (20k vectors, above this cap).
    if n <= dedup.BRUTE_TASK_CAP // 2 and _onetask_bytes_ok(
        sf, "embeddings", "embedding", ONETASK_VEC_BYTES_CAP
    ):
        return similarity.pq_ann_onetask(
            emb, "vec_id", "embedding", _query_vec(spark, sf),
            k=10, n_candidates=40, sample_rows=20_000, round_digits=4,
        )
    # 20k-row training cap: at every gate SF the corpus is smaller, so
    # the sample — and therefore the codebooks — is bit-identical to
    # the library's 50k default (pinned by test_pq_train_sample_cap);
    # above 20k the ANSWER is codebook-independent anyway (selective
    # regime is closed-form for any codebook, total regime is exact by
    # the degeneration theorem / exact-scan route), so the tighter cap
    # only shrinks the driver-side Lloyd fit, never the result.
    # Footer-gated LOCAL sample: a corpus small enough to train on
    # whole is read once with pyarrow and fed through pq_train's
    # bit-identical local path (same (md5, id) ordering, same half-up
    # grid — test_pq_train_local_sample_bit_identical), removing the
    # training collect job from the plan build; larger or footerless
    # corpora keep the Spark sample.
    local = None
    if n <= 200_000:
        try:
            import os

            import pyarrow.parquet as pq

            path = os.path.join(sf, "embeddings.parquet")
            if os.path.isfile(path):
                t = pq.read_table(path, columns=["vec_id", "embedding"])
                local = list(
                    zip(
                        t.column("vec_id").to_pylist(),
                        t.column("embedding").to_pylist(),
                    )
                )
        except Exception:
            local = None
    books = similarity.pq_train(
        emb, "vec_id", "embedding", n_subspaces=8, sample_rows=20_000,
        local_sample=local,
    )
    # JVM-native planted rows: spark.range + a literal array column. A
    # createDataFrame(list) here parallelizes PICKLED python rows over
    # default parallelism (32 slices for 10 rows), and every consumer
    # of the union then pays a serial Python-worker round trip per
    # slice — measured ~140ms each, ~4.5s per action once coalesced.
    # Range is a single JVM partition; the literal array evaluates in
    # codegen. Values are identical: the same driver doubles, the same
    # cast to float.
    planted = spark.range(-10, 0, 1, 1).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(float(x)) for x in qv])
        .cast("array<float>")
        .alias("embedding"),
    )
    aug = emb.select("vec_id", "embedding").unionByName(planted)
    # ONE retrieve pipeline: the selective regime's encode feeds its
    # ADC scan exactly once, so there is nothing to persist or share —
    # r12 ran a second corpus-sized ADC + TakeOrdered + re-join for
    # the total regime whose output is PROVABLY q33's exact scan
    # (degeneration theorem), plus a persist both consumed; the exact
    # scan now serves total directly at every SF.
    small = n <= 100_000
    if small:
        # local[32] slices even a one-row-group file into 32 byte-range
        # tasks (leaf parallelism), so every consumer of aug paid ~33
        # near-empty Python-runner launches; folding aug ONCE bounds
        # encode, re-rank probe and total scan to a handful of tasks
        # each. Above the cap the natural partitioning stands — at real
        # corpus sizes the tasks are full and the floors amortized.
        aug = aug.coalesce(min(8, n // 25_000 + 1))
    encoded = similarity.pq_encode(aug, "vec_id", "embedding", books)
    # the planted ids are negative BY CONSTRUCTION (the same invariant
    # the selective regime's closed form rests on), so filtering the
    # folded aug is value-identical to scanning emb and reuses the
    # single coalesced scan shape instead of a second 33-task pass
    total_src = aug.filter(F.col("vec_id") >= 0) if small else emb
    total = similarity.cosine_topk(
        total_src, "vec_id", "embedding", qv, k=10, round_digits=4
    ).select(F.lit("total").alias("regime"), "vec_id", "score")
    selective = similarity.pq_refine_topk(
        aug, "vec_id", "embedding", books, qv,
        k=10, n_candidates=40, round_digits=4, encoded=encoded,
    ).select(F.lit("selective_planted").alias("regime"), "vec_id", "score")
    return selective.unionByName(total)


@register(
    "q80_ngram_contamination",
    # benchmark decontamination: a train doc is contaminated when any
    # of its 8-token windows appears verbatim in the eval split
    # (doc_id % 10 = 0). Same gram definition as q65; every output an
    # exact integer, so nothing can drift between engines.
    """
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(
        trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS t
      FROM documents
    ),
    tg AS (
      SELECT doc_id, array_to_string(t[i:i+7], ' ') AS g
      FROM toks, UNNEST(generate_series(1, len(t) - 7)) AS u(i)
      WHERE doc_id % 10 <> 0 AND len(t) >= 8 AND t[1] <> ''
    ),
    eg AS (
      SELECT DISTINCT array_to_string(t[i:i+7], ' ') AS g
      FROM toks, UNNEST(generate_series(1, len(t) - 7)) AS u(i)
      WHERE doc_id % 10 = 0 AND len(t) >= 8 AND t[1] <> ''
    ),
    win AS (
      SELECT doc_id,
             CASE WHEN len(t) >= 8 AND t[1] <> '' THEN len(t) - 7
                  ELSE 0 END AS n_windows
      FROM toks WHERE doc_id % 10 <> 0
    ),
    hits AS (
      SELECT tg.doc_id, count(*) AS n_contaminated
      FROM tg JOIN eg USING (g) GROUP BY 1
    )
    SELECT w.doc_id AS id, w.n_windows,
           coalesce(h.n_contaminated, 0) AS n_contaminated,
           coalesce(h.n_contaminated, 0) >= 1 AS contaminated
    FROM win w LEFT JOIN hits h USING (doc_id)
    """,
)
def q80(spark, sf):
    """Verbatim 8-gram train/eval decontamination
    (``corpus.ngram_contamination``): size-routed on a cheap eval-gram
    cardinality probe — benchmark-sized eval collapses to a broadcast
    distinct gram set (train stays one scan + map-side probe);
    corpus-sized eval routes to a shuffled hash join instead of an
    OOM-bound forced broadcast. Per-doc hit counts are the only
    aggregation — exact integers end to end.

    Routing here is FOOTER-PROVEN lazy (the q34/q79 pattern): token
    windows number at most text-bytes/2, so a footer column-size read
    (``table_column_bytes``) proves the eval gram set broadcast-safe
    with zero plan-build Spark jobs. When the bound can't prove it
    (big corpus, footerless source) the hint stays None and the
    operator's live probe decides — the probe itself is pytest-pinned
    (tests/test_corpus.py), so laziness here costs no routing
    coverage."""
    doc = load_table(spark, sf, "documents")
    # STRATEGY-routed small-corpus tier (round 15, the q27/q66 pattern):
    # below the footer-proven cap the whole check runs in one Arrow
    # task (corpus.contamination_onetask — identity pytest-pinned);
    # the distributed broadcast/shuffle plan is the 100-TB path and
    # stays gated by the sf1 replica.
    n_docs = table_rowcount(sf, "documents")
    if (
        n_docs is not None
        and n_docs <= corpus.CONTAM_TASK_CAP
        and _onetask_bytes_ok(
            sf, "documents", "text", ONETASK_TEXT_BYTES_CAP
        )
    ):
        flagged = doc.select(
            "doc_id", "text", (F.col("doc_id") % 10 == 0).alias("__ev")
        )
        return corpus.contamination_onetask(
            flagged, "doc_id", "text", "__ev", n=8, mode="ngram"
        )
    train = doc.filter(F.col("doc_id") % 10 != 0)
    ev = doc.filter(F.col("doc_id") % 10 == 0)
    return corpus.ngram_contamination(
        train, ev, "doc_id", "text", n=8,
        eval_small=_eval_small_hint(sf),
    )


@register(
    "q81_skipgram_contamination",
    # fuzzy decontamination: an 8-token train window is contaminated
    # when it matches an eval window allowing ONE token substitution —
    # both engines build the same n masked variants per window (chr(1)
    # placeholder, impossible in whitespace-split tokens) and match
    # EXACTLY on them; a window matching via several variants counts
    # once (DISTINCT positions). Same split and tokenization as q80.
    """
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(
        trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS t
      FROM documents
    ),
    tw AS (
      SELECT doc_id, i AS pos, t[i:i+7] AS w
      FROM toks, UNNEST(generate_series(1, len(t) - 7)) AS u(i)
      WHERE doc_id % 10 <> 0 AND len(t) >= 8 AND t[1] <> ''
    ),
    tk AS (
      SELECT doc_id, pos,
             array_to_string(list_transform(w, (x, k) ->
                 CASE WHEN k = j THEN chr(1) ELSE x END), ' ') AS key
      FROM tw, UNNEST(generate_series(1, 8)) AS v(j)
    ),
    ek AS (
      SELECT DISTINCT array_to_string(list_transform(t[i:i+7], (x, k) ->
                 CASE WHEN k = j THEN chr(1) ELSE x END), ' ') AS key
      FROM toks,
           UNNEST(generate_series(1, len(t) - 7)) AS u(i),
           UNNEST(generate_series(1, 8)) AS v(j)
      WHERE doc_id % 10 = 0 AND len(t) >= 8 AND t[1] <> ''
    ),
    win AS (
      SELECT doc_id,
             CASE WHEN len(t) >= 8 AND t[1] <> '' THEN len(t) - 7
                  ELSE 0 END AS n_windows
      FROM toks WHERE doc_id % 10 <> 0
    ),
    hits AS (
      SELECT tk.doc_id, count(DISTINCT tk.pos) AS n_contaminated
      FROM tk JOIN ek USING (key) GROUP BY 1
    )
    SELECT w.doc_id AS id, CAST(w.n_windows AS BIGINT) AS n_windows,
           CAST(coalesce(h.n_contaminated, 0) AS BIGINT) AS n_contaminated,
           coalesce(h.n_contaminated, 0) >= 1 AS contaminated
    FROM win w LEFT JOIN hits h USING (doc_id)
    """,
)
def q81(spark, sf):
    """One-substitution-tolerant decontamination
    (``corpus.skipgram_contamination``): every 8-token window emits 8
    masked skip-gram variants, turning "differs in ≤ 1 token" into an
    exact hash-join — no quadratic window comparison, n× q80's map
    volume, same eval-size broadcast/shuffle routing, footer-proven
    lazy exactly as q80 (n× variants divide the byte bound's slack;
    the unproven case falls back to the live probe). Exact integers
    end to end."""
    doc = load_table(spark, sf, "documents")
    # STRATEGY-routed small-corpus tier (round 15) — see q80
    n_docs = table_rowcount(sf, "documents")
    if (
        n_docs is not None
        and n_docs <= corpus.CONTAM_TASK_CAP
        and _onetask_bytes_ok(
            sf, "documents", "text", ONETASK_TEXT_BYTES_CAP
        )
    ):
        flagged = doc.select(
            "doc_id", "text", (F.col("doc_id") % 10 == 0).alias("__ev")
        )
        return corpus.contamination_onetask(
            flagged, "doc_id", "text", "__ev", n=8, mode="skipgram"
        )
    train = doc.filter(F.col("doc_id") % 10 != 0)
    ev = doc.filter(F.col("doc_id") % 10 == 0)
    return corpus.skipgram_contamination(
        train, ev, "doc_id", "text", n=8,
        eval_small=_eval_small_hint(sf, variants=8),
    )


@register(
    "q82_contamination_on_arrival",
    # decontamination-on-arrival (skipgram mode): the upper-id half of
    # the TRAIN split arrives against the indexed eval gram set — the
    # stats the streaming pipeline must report are exactly the q81
    # batch truth restricted to the arriving ids (the q76 pattern).
    # Same tokenization, masking and split as q81; the arrival split
    # is (min+max+1)//2 over doc_id, computed identically both sides.
    """
    WITH bounds AS (
      SELECT (min(doc_id) + max(doc_id) + 1) // 2 AS split FROM documents
    ),
    toks AS (
      SELECT doc_id, regexp_split_to_array(
        trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS t
      FROM documents
    ),
    tw AS (
      SELECT doc_id, i AS pos, t[i:i+7] AS w
      FROM toks, UNNEST(generate_series(1, len(t) - 7)) AS u(i)
      WHERE doc_id % 10 <> 0 AND doc_id >= (SELECT split FROM bounds)
        AND len(t) >= 8 AND t[1] <> ''
    ),
    tk AS (
      SELECT doc_id, pos,
             array_to_string(list_transform(w, (x, k) ->
                 CASE WHEN k = j THEN chr(1) ELSE x END), ' ') AS key
      FROM tw, UNNEST(generate_series(1, 8)) AS v(j)
    ),
    ek AS (
      SELECT DISTINCT array_to_string(list_transform(t[i:i+7], (x, k) ->
                 CASE WHEN k = j THEN chr(1) ELSE x END), ' ') AS key
      FROM toks,
           UNNEST(generate_series(1, len(t) - 7)) AS u(i),
           UNNEST(generate_series(1, 8)) AS v(j)
      WHERE doc_id % 10 = 0 AND len(t) >= 8 AND t[1] <> ''
    ),
    win AS (
      SELECT doc_id,
             CASE WHEN len(t) >= 8 AND t[1] <> '' THEN len(t) - 7
                  ELSE 0 END AS n_windows
      FROM toks
      WHERE doc_id % 10 <> 0 AND doc_id >= (SELECT split FROM bounds)
    ),
    hits AS (
      SELECT tk.doc_id, count(DISTINCT tk.pos) AS n_contaminated
      FROM tk JOIN ek USING (key) GROUP BY 1
    )
    SELECT w.doc_id AS id, CAST(w.n_windows AS BIGINT) AS n_windows,
           CAST(coalesce(h.n_contaminated, 0) AS BIGINT) AS n_contaminated,
           coalesce(h.n_contaminated, 0) >= 1 AS contaminated
    FROM win w LEFT JOIN hits h USING (doc_id)
    """,
)
def q82(spark, sf):
    """Decontamination-on-arrival (``streaming/contam_stream``): the
    eval suite's masked skip-gram keys are the indexed probe side, the
    upper-id half of the train split ARRIVES, and the stream's scoring
    plan (``contamination_against`` — the exact plan
    ``EvalGramIndex.contamination_for`` runs per micro-batch) reports
    each arriving doc's one-substitution contamination. O(batch)
    tokenization — history text is never re-scanned; the arrival
    contract is the q81 batch truth restricted to arriving ids,
    exactly as q76 pins the dupwin arrival contract. Split and routing
    hints read from parquet footers (zero plan-build jobs)."""
    from .streaming.contam_stream import contamination_against, mode_keys

    doc = load_table(spark, sf, "documents")
    rng = table_column_range(sf, "documents", "doc_id")
    if rng is None:
        row = doc.agg(
            F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")
        ).first()
        rng = (row.lo, row.hi)
    split = (int(rng[0]) + int(rng[1]) + 1) // 2
    ev = doc.filter(F.col("doc_id") % 10 == 0)
    batch = doc.filter(
        (F.col("doc_id") % 10 != 0) & (F.col("doc_id") >= split)
    )
    # STRATEGY-routed small-corpus tier (round 15) — same identity as
    # q80/q81: the arriving batch's scores against the eval key set are
    # a pure function of (batch text, eval text), so below the footer
    # cap the one-Arrow-task kernel computes the identical rows; the
    # REAL O(batch) stream plan (contamination_against, the exact plan
    # EvalGramIndex.contamination_for runs) executes above the cap and
    # stays gated by the sf1 replica.
    n_docs = table_rowcount(sf, "documents")
    if (
        n_docs is not None
        and n_docs <= corpus.CONTAM_TASK_CAP
        and _onetask_bytes_ok(
            sf, "documents", "text", ONETASK_TEXT_BYTES_CAP
        )
    ):
        flagged = ev.select(
            "doc_id", "text", F.lit(True).alias("__ev")
        ).unionByName(
            batch.select("doc_id", "text", F.lit(False).alias("__ev"))
        )
        return corpus.contamination_onetask(
            flagged, "doc_id", "text", "__ev", n=8, mode="skipgram"
        )
    grams = (
        mode_keys(ev, "text", 8, "skipgram").select("gram").distinct()
    )
    # the pigeonhole-prefilter path (eval_windows=...) is deliberately
    # NOT engaged: on this fixture the eval split scales with the
    # corpus, the half-sets densify, and the prefilter measured slower
    # at every graded SF (round-14 A/B — see skipgram_window_hits)
    return contamination_against(
        batch, grams, "doc_id", "text", n=8, mode="skipgram",
        eval_small=_eval_small_hint(sf, variants=8),
    )


@register(
    "q83_retraction_reorg",
    # retraction tier under the driver gate: a reorg retracts the doc
    # set R (doc_id % 37 = 5) from a dedup bucket index persisted over
    # the FULL corpus; the surviving index must answer exactly the q27
    # batch truth of the surviving corpus — the oracle is q27's exact
    # all-pairs Jaccard with R's docs gone. Tokenization identical to
    # q27/q66 by construction.
    """
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(
        trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'),
             '\\s+', ' ', 'g')), ' ') AS t
      FROM documents WHERE doc_id % 37 <> 5
    ), sh AS (
      SELECT DISTINCT doc_id,
        CASE WHEN len(t) < 3 THEN array_to_string(t, ' ')
             ELSE t[i] || ' ' || t[i+1] || ' ' || t[i+2] END AS s
      FROM toks, UNNEST(generate_series(1, greatest(len(t) - 2, 1))) AS u(i)
      WHERE t[1] <> ''
    ), sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
      FROM sh a JOIN sh b USING (s) WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
    SELECT id_a, id_b,
           round(inter * 1.0 / (sa.sz + sb.sz - inter), 4) AS jaccard
    FROM inter JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
    WHERE inter * 1.0 / (sa.sz + sb.sz - inter) >= 0.4
    """,
)
def q83(spark, sf):
    """Retraction-on-reorg convergence (the round-13 fan-out tier's
    driver-visible row, the q82-for-retraction): the dedup bucket
    index holds the FULL corpus's slim (id, band, bh) rows — the state
    ``streaming/dedup_stream.MinHashBucketIndex`` persists — and a
    reorg retracts doc set R. The post-retraction read path is the
    index's tombstone semantics (``live_buckets``,
    dedup_stream.py:632): one anti-join of the persisted rows against
    the retracted ids — O(index scan + |R|), the corpus is never
    re-signed — and the surviving candidates verified on the surviving
    text must CONVERGE to the batch truth of the surviving corpus
    (q27's oracle minus R). Recall is inherited: removing docs only
    removes pairs, and every surviving pair occupied the same buckets
    in the full index, so the banding tier chosen at index-build time
    (the full-corpus ``banding_for_corpus`` call) keeps its guarantee.
    The ledgered counter-store legs of the same fan-out
    (``retraction.retract_document_everywhere``) are pytest- and
    SF10-soak-pinned; this entry gates the index leg end to end.
    Corpus shape reads from parquet footers — zero plan-build jobs.

    STRATEGY-routed like q27 (the q34/q79 degeneration pattern): a
    doc's banded rows are a pure function of its OWN text, so
    anti-joining the retracted ids out of the full-corpus bucket rows
    yields exactly the surviving corpus's bucket rows — below the
    one-task cap the provably-identical filter-then-sign one-Arrow-task
    tier runs instead (2.5s -> ~1s warm at sf0.1, same answer by the
    identity above); at sf1 and beyond the REAL tombstone anti-join
    plan executes (the sf1 replica gates it)."""
    doc = load_table(spark, sf, "documents")
    n = table_rowcount(sf, "documents")
    if n is None:
        n = doc.count()
    nh, b = dedup.banding_for_corpus(n)
    survivors = doc.filter(F.col("doc_id") % 37 != 5)
    if n <= dedup.BRUTE_TASK_CAP and _onetask_bytes_ok(
        sf, "documents", "text", ONETASK_TEXT_BYTES_CAP
    ):
        return dedup.minhash_pairs_onetask(
            survivors, "doc_id", "text",
            num_hashes=nh, bands=b, jaccard_threshold=0.4,
        ).select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
    banded = dedup.minhash_banded(
        doc, "doc_id", "text", num_hashes=nh, bands=b
    )
    tomb = (
        doc.filter(F.col("doc_id") % 37 == 5)
        .select(F.col("doc_id").alias("id"))
    )
    live = banded.join(tomb, "id", "left_anti")
    pairs = dedup._bucket_pairs(
        live, ["band", "bh"], "group" if n <= 100_000 else "join"
    )
    return dedup.verify_jaccard_pairs(
        pairs, survivors, "doc_id", "text", 3, 0.4
    ).select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))


# -- q84: snapshot time travel (round-15 stretch) ----------------------------
#
# Per-process store memo keyed by (sf_dir, documents fixture stamp):
# the archived-manifest read path needs REAL on-disk commits, so this
# entry materializes a two-commit AtomicBlockStore once per fixture —
# the third documented plan-build exception after q75/q77 (there the
# learned model is plan input; here the persisted snapshots ARE the
# queried entity). Repeat invocations (the bench's warm runs) reuse
# the store and pay only the read plan.
_Q84_MEMO: dict = {}


def _q84_block_frames(doc, reorg: bool):
    """(blocks, txs) frames derived from documents by engine-portable
    formulas: block hash md5('h'||id) (reorg replacements md5('r'||id)),
    one tx per block md5('t'||id) / md5('s'||id) — exactly what the
    q84 oracle recomputes in SQL."""
    from pyspark.sql import types as T

    num = F.col("doc_id").cast("long")
    ns = num.cast("string")
    btag, ttag = ("r", "s") if reorg else ("h", "t")
    bh = F.md5(F.concat(F.lit(btag), ns))
    nul = lambda t: F.lit(None).cast(t)  # noqa: E731
    blocks = doc.select(
        bh.alias("hash"),
        num.alias("number"),
        (F.lit(1_600_000_000) + num).alias("time"),
        F.md5(F.concat(F.lit(btag), (num - 1).cast("string"))).alias(
            "parenthash"
        ),
        F.lit("1").alias("difficulty"),
        F.lit(21000).cast("long").alias("gasused"),
        F.lit(30_000_000).cast("long").alias("gaslimit"),
        F.lit("0x0").alias("nonce"),
        nul("string").alias("miner"),
        nul("double").alias("size"),
        nul("string").alias("stateroothash"),
        nul("string").alias("unclehash"),
        nul("string").alias("txroothash"),
        nul("string").alias("receiptroothash"),
        nul("binary").alias("extradata"),
    )
    txs = doc.select(
        F.md5(F.concat(F.lit(ttag), ns)).alias("hash"),
        nul("string").alias("from"),
        nul("string").alias("to"),
        nul("string").alias("contract"),
        F.lit("0").alias("value"),
        nul("binary").alias("data"),
        F.lit(21000).cast("long").alias("gas"),
        F.lit("1").alias("gasprice"),
        F.lit("21000").alias("cost"),
        F.lit(0).cast("long").alias("nonce"),
        F.lit(1).cast("short").alias("state"),
        bh.alias("blockhash"),
    )
    events = doc.limit(0).select(
        nul("string").alias("blockhash"),
        F.lit(0).cast("int").alias("index"),
        nul("string").alias("origin"),
        nul("array<string>").alias("topics"),
        nul("binary").alias("data"),
        nul("string").alias("txhash"),
    )
    return blocks, txs, events


def _q84_store(spark, sf):
    """(store, v1): the memoized two-commit store — commit 1 is the
    full derived chain, commit 2 a reorg replacing every doc_id%10==3
    block (new hash, new tx; the cascade drops the old tx)."""
    import tempfile as _tempfile

    from .streaming.txstore import AtomicBlockStore

    key = (str(sf), fixture_stamp(str(sf), "documents"))
    hit = _Q84_MEMO.get("store")
    if hit is not None and hit[0] == key and os.path.isdir(hit[1].root):
        return hit[1], hit[2]
    doc = load_table(spark, sf, "documents").select("doc_id")
    root = _tempfile.mkdtemp(prefix="q84_snapshot_store_")
    store = AtomicBlockStore(spark, root, commit_mode="cow")
    store.upsert_batch(*_q84_block_frames(doc, reorg=False))
    v1 = store._manifest()["version"]
    store.upsert_batch(
        *_q84_block_frames(doc.filter(F.col("doc_id") % 10 == 3), reorg=True)
    )
    _Q84_MEMO["store"] = (key, store, v1)
    return store, v1


@register(
    "q84_snapshot_time_travel",
    # time travel over the manifest-committed store: the pre-reorg
    # snapshot (archived manifest v1) must show EVERY original block
    # hash and tx — including the doc_id%10==3 set the head has
    # reorged away — while the head shows the replacements and the
    # cascade (old txs gone). The oracle reconstructs both states from
    # the same md5 derivations and knows nothing about manifests.
    """
    SELECT 'head' AS snap, doc_id AS number,
           CASE WHEN doc_id % 10 = 3
                THEN md5('r' || CAST(doc_id AS VARCHAR))
                ELSE md5('h' || CAST(doc_id AS VARCHAR)) END AS hash,
           CASE WHEN doc_id % 10 = 3
                THEN md5('s' || CAST(doc_id AS VARCHAR))
                ELSE md5('t' || CAST(doc_id AS VARCHAR)) END AS tx_hash
    FROM documents
    UNION ALL
    SELECT 'v1', doc_id,
           md5('h' || CAST(doc_id AS VARCHAR)),
           md5('t' || CAST(doc_id AS VARCHAR))
    FROM documents
    """,
)
def q84(spark, sf):
    """Snapshot time travel (``streaming/txstore.AtomicBlockStore``):
    read the store AS OF the pre-reorg commit via the archived
    manifest (``blocks_at``/``transactions_at`` — object dirs are
    immutable, so time travel is pure path resolution, the
    Iceberg/Delta mechanism reduced to its core) alongside the current
    head. A wrong read path fails loudly: serving head state for 'v1'
    flips every reorged row's hash; missing the cascade leaves phantom
    txs. Store construction is memoized per (fixture, stamp) — see
    ``_q84_store`` for the documented plan-build exception."""
    store, v1 = _q84_store(spark, sf)

    def shape(blocks, txs, tag):
        t = txs.select(
            F.col("blockhash").alias("hash"),
            F.col("hash").alias("tx_hash"),
        )
        return (
            blocks.select("number", "hash")
            .join(t, "hash")
            .select(
                F.lit(tag).alias("snap"),
                "number",
                "hash",
                "tx_hash",
            )
        )

    return shape(store.blocks_at(v1), store.transactions_at(v1), "v1").unionByName(
        shape(store.blocks(), store.transactions(), "head")
    )
