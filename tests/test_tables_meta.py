"""Parquet-footer table metadata (zero-job strategy probes) and the
shared MinHash banding tier table.

The cost-routed catalog entries (q27/q34/q54/q66) pick tiers from
footer statistics instead of running a count()/first() Spark job at
plan-build; these tests pin the helpers against an independent engine
(DuckDB) and pin the banding tiers both entries must share.
"""

from __future__ import annotations

import inspect

import duckdb

from evm_indexer_spark.operators.dedup import banding_for_corpus
from evm_indexer_spark.sources.tables import (
    table_column_bytes,
    table_column_range,
    table_rowcount,
)

SF = "/root/testdata/sf0.001"


class TestFooterMeta:
    def test_rowcount_matches_duckdb(self):
        for t in ("documents", "embeddings", "events"):
            expect = duckdb.sql(
                f"SELECT count(*) FROM read_parquet('{SF}/{t}.parquet')"
            ).fetchone()[0]
            assert table_rowcount(SF, t) == expect

    def test_column_range_matches_duckdb(self):
        lo, hi = duckdb.sql(
            f"SELECT min(doc_id), max(doc_id) FROM "
            f"read_parquet('{SF}/documents.parquet')"
        ).fetchone()
        assert table_column_range(SF, "documents", "doc_id") == (lo, hi)

    def test_missing_table_returns_none(self):
        assert table_rowcount(SF, "no_such_table") is None
        assert table_column_range(SF, "no_such_table", "x") is None

    def test_missing_column_returns_none(self):
        assert table_column_range(SF, "documents", "no_such_col") is None

    def test_column_bytes_bounds_text_volume(self):
        # the q80/q81 routing bound: whitespace tokens (hence token
        # n-gram windows) number at most text-bytes/2 — the footer
        # uncompressed size must dominate the true byte volume, which
        # must dominate 2x the true token count
        tb = table_column_bytes(SF, "documents", "text")
        assert tb is not None and tb > 0
        true_bytes, true_tokens = duckdb.sql(
            f"""SELECT sum(strlen(text)),
                       sum(len(regexp_split_to_array(
                           trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                           ' ')))
                FROM read_parquet('{SF}/documents.parquet')"""
        ).fetchone()
        assert tb >= true_bytes
        assert true_bytes >= 2 * true_tokens - duckdb.sql(
            f"SELECT count(*) FROM read_parquet('{SF}/documents.parquet')"
        ).fetchone()[0]  # last token of each doc has no separator byte

    def test_column_bytes_missing_returns_none_or_zero(self):
        assert table_column_bytes(SF, "no_such_table", "text") is None
        # a present table with an absent column sums nothing
        assert table_column_bytes(SF, "documents", "no_such_col") == 0

    def test_eval_small_hint_footer_proven_at_gate_sf(self):
        # at every gate SF the hint must be footer-proven True (zero
        # plan-build Spark jobs for q80/q81) and must agree with the
        # live probe's own decision (total gram occurrences <= 2M)
        from evm_indexer_spark.driver_queries import _eval_small_hint

        assert _eval_small_hint(SF) is True
        assert _eval_small_hint(SF, variants=8) is True
        total = duckdb.sql(
            f"""SELECT sum(greatest(len(regexp_split_to_array(
                    trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                    ' ')) - 7, 0))
                FROM read_parquet('{SF}/documents.parquet')
                WHERE doc_id % 10 = 0"""
        ).fetchone()[0]
        assert total * 8 <= 2_000_000  # the probe would also say True

    def test_directory_parquet_sums_part_files(self, spark, tmp_path):
        # Spark-written tables are DIRECTORIES of part files — the
        # footer reader must sum row counts and fold min/max across
        # every part, skipping _SUCCESS markers
        df = spark.range(0, 1000).withColumnRenamed("id", "k")
        df.repartition(4).write.parquet(str(tmp_path / "t.parquet"))
        assert table_rowcount(str(tmp_path), "t") == 1000
        assert table_column_range(str(tmp_path), "t", "k") == (0, 999)


class TestBandingTiers:
    def test_pinned_tiers(self):
        assert banding_for_corpus(100) == (64, 64)
        assert banding_for_corpus(2000) == (64, 64)
        assert banding_for_corpus(2001) == (16, 8)
        assert banding_for_corpus(20000) == (16, 8)
        assert banding_for_corpus(20001) == (48, 24)
        assert banding_for_corpus(10_000_000) == (48, 24)

    def test_tiers_are_valid_bandings(self):
        for n in (1, 2000, 2001, 20000, 20001, 10**9):
            nh, b = banding_for_corpus(n)
            assert nh % b == 0 and nh >= b >= 1

    def test_both_catalog_entries_use_the_shared_tiers(self):
        # one drift away from a silent bucket-space mismatch: the batch
        # and incremental entries must pick banding through the SAME
        # function, never private tier tables
        from evm_indexer_spark import driver_queries

        q27 = inspect.getsource(driver_queries.q27)
        q66 = inspect.getsource(driver_queries.q66)
        assert "banding_for_corpus" in q27
        assert "banding_for_corpus" in q66
