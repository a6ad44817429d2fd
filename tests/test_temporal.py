"""As-of and interval join semantics vs brute-force pandas/SQL oracles."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from evm_indexer_spark.operators import temporal


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def quotes(spark):
    # (key, ts, px) — two keys, interleaved times, includes an exact-match ts
    rows = [
        ("A", _ts("2024-01-01 00:00:00"), 10.0),
        ("A", _ts("2024-01-01 00:05:00"), 11.0),
        ("A", _ts("2024-01-01 00:10:00"), 12.0),
        ("B", _ts("2024-01-01 00:07:00"), 99.0),
    ]
    return spark.createDataFrame(rows, "k string, qts timestamp, px double")


@pytest.fixture(scope="module")
def trades(spark):
    rows = [
        ("A", _ts("2024-01-01 00:04:00"), 1),   # -> px 10
        ("A", _ts("2024-01-01 00:05:00"), 2),   # exact tie -> px 11
        ("A", _ts("2024-01-01 00:30:00"), 3),   # -> px 12
        ("B", _ts("2024-01-01 00:01:00"), 4),   # before any quote -> null
        ("C", _ts("2024-01-01 00:01:00"), 5),   # unseen key -> null
    ]
    return spark.createDataFrame(rows, "k string, tts timestamp, trade_id int")


def _asof_map(df):
    return {r["trade_id"]: r["px"] for r in df.collect()}


def test_asof_backward(spark, quotes, trades):
    out = temporal.asof_join(trades, quotes, on="k", left_ts="tts", right_ts="qts")
    assert out.count() == 5  # left outer: every trade survives
    px = _asof_map(out)
    assert px == {1: 10.0, 2: 11.0, 3: 12.0, 4: None, 5: None}


def test_asof_backward_strict(spark, quotes, trades):
    out = temporal.asof_join(
        trades, quotes, on="k", left_ts="tts", right_ts="qts",
        allow_exact_matches=False,
    )
    px = _asof_map(out)
    assert px[2] == 10.0  # exact tie excluded -> previous quote
    assert px[1] == 10.0 and px[3] == 12.0


def test_asof_forward(spark, quotes, trades):
    out = temporal.asof_join(
        trades, quotes, on="k", left_ts="tts", right_ts="qts", direction="forward"
    )
    px = _asof_map(out)
    assert px == {1: 11.0, 2: 11.0, 3: None, 4: 99.0, 5: None}


def test_asof_column_collision_rejected(spark, quotes, trades):
    with pytest.raises(ValueError, match="collide"):
        temporal.asof_join(
            trades.withColumnRenamed("trade_id", "px"),
            quotes, on="k", left_ts="tts", right_ts="qts",
        )


def test_asof_matches_pandas_merge_asof(spark):
    """Randomized cross-check against pandas merge_asof per key."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    n_l, n_r = 400, 150
    lp = pd.DataFrame({
        "k": rng.integers(0, 5, n_l),
        "lts": pd.to_datetime(rng.integers(0, 10_000, n_l), unit="s"),
        "lid": np.arange(n_l),
    }).sort_values("lts").reset_index(drop=True)
    rp = pd.DataFrame({
        "k": rng.integers(0, 5, n_r),
        "rts": pd.to_datetime(
            np.sort(rng.choice(20_000, n_r, replace=False)), unit="s"
        ),
        "rv": rng.normal(size=n_r).round(6),
    })
    expected = pd.merge_asof(
        lp, rp, left_on="lts", right_on="rts", by="k", direction="backward"
    )
    got = (
        temporal.asof_join(
            spark.createDataFrame(lp), spark.createDataFrame(rp),
            on="k", left_ts="lts", right_ts="rts",
        )
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    exp = expected.sort_values("lid").reset_index(drop=True)
    assert got["rv"].fillna(-1).tolist() == exp["rv"].fillna(-1).tolist()
    assert got["rts"].fillna(pd.Timestamp(0)).tolist() == (
        exp["rts"].fillna(pd.Timestamp(0)).tolist()
    )


def test_interval_join_vs_theta(spark):
    """Binned equi-join must equal the naive theta-join, including
    intervals shorter / longer than the bin and boundary points."""
    pts = spark.createDataFrame(
        [(i, _ts("2024-01-01 00:00:00") + dt.timedelta(seconds=37 * i))
         for i in range(200)],
        "pid long, pts timestamp",
    )
    iv = spark.createDataFrame(
        [
            (0, _ts("2024-01-01 00:01:00"), _ts("2024-01-01 00:02:00")),   # < bin
            (1, _ts("2024-01-01 00:00:30"), _ts("2024-01-01 01:10:00")),   # > bin
            (2, _ts("2024-01-01 00:59:23"), _ts("2024-01-01 00:59:23")),   # empty
            (3, _ts("2024-01-01 01:00:00"), _ts("2024-01-01 01:30:00")),
        ],
        "wid long, ws timestamp, we timestamp",
    )
    got = temporal.interval_join(
        pts, iv, point_ts="pts", start_col="ws", end_col="we", bin_seconds=300
    )
    naive = pts.join(iv, (F.col("ws") <= F.col("pts")) & (F.col("pts") < F.col("we")))
    key = lambda df: sorted((r["pid"], r["wid"]) for r in df.collect())
    assert key(got) == key(naive)
    assert len(key(got)) > 0

    inc = temporal.interval_join(
        pts, iv, point_ts="pts", start_col="ws", end_col="we",
        bin_seconds=300, end_inclusive=True,
    )
    naive_inc = pts.join(
        iv, (F.col("ws") <= F.col("pts")) & (F.col("pts") <= F.col("we"))
    )
    assert key(inc) == key(naive_inc)


def test_asof_plan_single_shuffle(spark, quotes, trades):
    """The union+window plan must contain exactly one Exchange — the hash
    partition on the key feeding the sort; no join operator at all."""
    out = temporal.asof_join(trades, quotes, on="k", left_ts="tts", right_ts="qts")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_asof_null_payload_column_attached_whole(spark):
    """A right row with NULL in one payload column must be attached as a
    whole row — its NULL wins over an older row's value. Per-column
    fills would mix two right rows (DuckDB ASOF / merge_asof never do)."""
    right = spark.createDataFrame(
        [(1, 10, 100.0, "a"), (1, 20, None, "b")],
        "k long, qts long, px double, src string",
    )
    left = spark.createDataFrame([(1, 25, "T1")], "k long, tts long, trade string")
    row = temporal.asof_join(
        left, right, on="k", left_ts="tts", right_ts="qts"
    ).collect()[0]
    # matched row is (qts=20, px=NULL, src='b'); px must NOT leak 100.0
    assert row["src"] == "b" and row["px"] is None


def test_interval_aggregate_vs_theta(spark):
    """Prefix-sum interval aggregation must equal theta-join + groupBy:
    overlapping/nested/empty windows, points exactly on both edges."""
    pts = spark.createDataFrame(
        [
            (i, _ts("2024-01-01 00:00:00") + dt.timedelta(seconds=37 * i),
             round(0.01 * i, 2))
            for i in range(400)
        ],
        "pid long, pts timestamp, v double",
    )
    iv = spark.createDataFrame(
        [
            (0, _ts("2024-01-01 00:01:00"), _ts("2024-01-01 00:02:00")),
            (1, _ts("2024-01-01 00:00:30"), _ts("2024-01-01 01:10:00")),
            (2, _ts("2024-01-01 00:59:23"), _ts("2024-01-01 00:59:23")),  # empty
            (3, _ts("2024-01-01 01:00:00"), _ts("2024-01-01 01:30:00")),
            # exact-edge window: start and end both on point timestamps
            (4, _ts("2024-01-01 00:00:37"), _ts("2024-01-01 00:01:51")),
            (5, _ts("2030-01-01 00:00:00"), _ts("2030-01-01 01:00:00")),  # no pts
        ],
        "wid long, ws timestamp, we timestamp",
    )
    for inclusive in (False, True):
        upper = (
            F.col("pts") <= F.col("we") if inclusive else F.col("pts") < F.col("we")
        )
        naive = (
            pts.join(iv, (F.col("ws") <= F.col("pts")) & upper)
            .groupBy("wid")
            .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("v"), 4).alias("tv"))
        )
        got = temporal.interval_aggregate(
            pts, iv, "pts", "ws", "we", id_cols=["wid"], value_col="v",
            end_inclusive=inclusive,
        )
        gmap = {
            r["wid"]: (r["n_points"], round(r["total_v"], 4) if r["total_v"] is not None else None)
            for r in got.collect()
        }
        nmap = {r["wid"]: (r["n"], r["tv"]) for r in naive.collect()}
        # every interval appears; empties carry zero
        assert set(gmap) == {0, 1, 2, 3, 4, 5}
        for wid, (n, tv) in nmap.items():
            assert gmap[wid] == (n, tv), (inclusive, wid, gmap[wid], (n, tv))
        for wid in set(gmap) - set(nmap):
            assert gmap[wid][0] == 0


def test_interval_aggregate_count_only_and_empty(spark):
    pts = spark.createDataFrame([], "pid long, pts timestamp")
    iv = spark.createDataFrame(
        [(1, _ts("2024-01-01 00:00:00"), _ts("2024-01-01 01:00:00"))],
        "wid long, ws timestamp, we timestamp",
    )
    out = temporal.interval_aggregate(pts, iv, "pts", "ws", "we", id_cols=["wid"])
    rows = out.collect()
    assert [(r["wid"], r["n_points"]) for r in rows] == [(1, 0)]
    assert "total_" not in " ".join(out.columns)


def test_interval_aggregate_no_pair_explosion_plan(spark):
    """The plan must contain no join at all — density-independence is
    the operator's reason to exist."""
    pts = spark.createDataFrame(
        [(i, _ts("2024-01-01 00:00:00") + dt.timedelta(seconds=i)) for i in range(100)],
        "pid long, pts timestamp",
    )
    iv = spark.createDataFrame(
        [(1, _ts("2024-01-01 00:00:00"), _ts("2024-01-01 01:00:00"))],
        "wid long, ws timestamp, we timestamp",
    )
    out = temporal.interval_aggregate(pts, iv, "pts", "ws", "we", id_cols=["wid"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
