"""Watermarked windowed aggregation: correctness vs batch, and late-data
drop across a checkpointed restart."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from evm_indexer_spark.streaming.windows import start_to_memory, windowed_counts

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)

BASE = "2024-01-01T00:"


def _write(dirpath: str, name: str, rows: list[tuple[int, str, str, float]]) -> None:
    with open(os.path.join(dirpath, name), "w") as f:
        for eid, minute_sec, etype, value in rows:
            f.write(
                json.dumps(
                    {
                        "event_id": eid,
                        "ts": f"{BASE}{minute_sec}.000Z",
                        "event_type": etype,
                        "value": value,
                    }
                )
                + "\n"
            )


@pytest.fixture()
def dirs(tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    return str(landing), str(tmp_path / "ckpt")


def _stream(spark, landing):
    return (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(landing)
    )


def test_windowed_counts_match_batch(spark, dirs):
    landing, ckpt = dirs
    rows = [
        (1, "00:10", "click", 1.0),
        (2, "03:20", "click", 2.0),
        (3, "06:30", "view", 3.0),
        (4, "11:40", "click", 4.0),
    ]
    _write(landing, "b1.json", rows)
    q = start_to_memory(
        windowed_counts(_stream(spark, landing)), "win1", ckpt, "update"
    )
    q.awaitTermination(120)
    got = {
        (r["win_start"].minute, r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.table("win1").collect()
    }
    batch = spark.createDataFrame(
        [(i, f"2024-01-01 00:{m}", t, v) for i, m, t, v in rows],
        "event_id long, ts_s string, event_type string, value double",
    ).select("event_id", F.col("ts_s").cast("timestamp").alias("ts"), "event_type", "value")
    expect = {
        (r["win_start"].minute, r["event_type"]): (r["n_events"], r["total_value"])
        for r in batch.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(F.col("w.start").alias("win_start"), "event_type", "n_events", "total_value")
        .collect()
    }
    assert got == expect
    assert got[(0, "click")] == (2, 3.0)  # 00:00-00:05 window merged two rows


def test_late_rows_dropped_across_restart(spark, dirs):
    landing, ckpt = dirs
    # batch 1 advances the watermark to 30:00 - 10:00 = 20:00
    _write(landing, "b1.json", [(1, "10:00", "click", 1.0), (2, "30:00", "click", 1.0)])
    q = start_to_memory(
        windowed_counts(_stream(spark, landing)), "late1", ckpt, "update"
    )
    q.awaitTermination(120)

    # batch 2 after restart: one row far behind the watermark (dropped),
    # one fresh row (kept) — checkpoint carries the watermark across runs.
    # memory sink cannot recover a checkpoint, so collect via foreachBatch.
    _write(landing, "b2.json", [(3, "12:00", "click", 9.0), (4, "35:00", "view", 2.0)])
    seen: list = []

    def grab(df, _bid):
        seen.extend(df.collect())

    q2 = (
        windowed_counts(_stream(spark, landing))
        .writeStream.foreachBatch(grab)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    updated = {(r["win_start"].minute, r["event_type"]) for r in seen}
    assert (35, "view") in updated  # fresh row aggregated
    assert (10, "click") not in updated  # late row discarded by watermark


def test_sessionized_append_emits_closed_sessions(spark, dirs):
    landing, ckpt = dirs
    with open(os.path.join(landing, "s1.json"), "w") as f:
        for eid, ts, uid in [
            (1, "2024-01-01T00:01:00.000Z", 7),
            (2, "2024-01-01T00:03:00.000Z", 7),  # same 30-min session
            (3, "2024-01-01T00:50:00.000Z", 7),  # new session
            (4, "2024-01-01T03:00:00.000Z", 9),  # advances watermark; stays open
        ]:
            f.write(
                json.dumps(
                    {"event_id": eid, "ts": ts, "event_type": "click",
                     "value": 1.0, "user_id": uid}
                ) + "\n"
            )
    schema = SCHEMA.add("user_id", T.LongType())
    stream = spark.readStream.schema(schema).json(landing)
    from evm_indexer_spark.streaming.windows import sessionized

    q = start_to_memory(sessionized(stream), "sess_t", ckpt, "append")
    q.awaitTermination(120)
    got = sorted(
        (r["user_id"], r["session_start"].minute, r["n_events"])
        for r in spark.table("sess_t").collect()
    )
    # user 7: merged 2-event session + singleton; user 9's session is
    # still open (append emits only watermark-closed sessions)
    assert got == [(7, 1, 2), (7, 50, 1)]


def test_stream_interval_join_matches_batch(spark, tmp_path):
    """Stream-stream point-in-interval join == the batch temporal
    operator on the same rows."""
    from evm_indexer_spark.operators.temporal import interval_join
    from evm_indexer_spark.streaming.windows import stream_interval_join

    p_dir = tmp_path / "points"; p_dir.mkdir()
    i_dir = tmp_path / "intervals"; i_dir.mkdir()
    points = [
        (1, "00:05"), (2, "00:20"), (3, "00:35"), (4, "00:59"),
    ]
    intervals = [
        (10, "00:00", "00:30"),   # catches 1, 2
        (11, "00:30", "01:00"),   # catches 3, 4
        (12, "00:10", "00:12"),   # catches nothing
    ]
    with open(p_dir / "p.json", "w") as f:
        for pid, m in points:
            f.write(json.dumps({"pid": pid, "ts": f"{BASE}{m}.000Z"}) + "\n")
    with open(i_dir / "i.json", "w") as f:
        for wid, s, e in intervals:
            f.write(json.dumps({
                "wid": wid, "w_start": f"{BASE}{s}.000Z",
                "w_end": f"{BASE}{e}.000Z",
            }) + "\n")

    p_schema = "pid long, ts timestamp"
    i_schema = "wid long, w_start timestamp, w_end timestamp"
    ps = spark.readStream.schema(p_schema).json(str(p_dir))
    istr = spark.readStream.schema(i_schema).json(str(i_dir))
    joined = stream_interval_join(ps, istr, max_interval_seconds=86_400)
    q = (
        joined.writeStream.format("memory").queryName("sij")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted((r["pid"], r["wid"]) for r in spark.table("sij").collect())

    pb = spark.createDataFrame(
        [(pid, f"2024-01-01 00:{m}") for pid, m in points],
        "pid long, ts_s string",
    ).select("pid", F.col("ts_s").cast("timestamp").alias("ts"))
    ib = spark.createDataFrame(
        [(w, f"2024-01-01 00:{s}", f"2024-01-01 00:{e}")
         for w, s, e in intervals],
        "wid long, s string, e string",
    ).select(
        "wid",
        F.col("s").cast("timestamp").alias("w_start"),
        F.col("e").cast("timestamp").alias("w_end"),
    )
    expect = sorted(
        (r["pid"], r["wid"])
        for r in interval_join(pb, ib, "ts", "w_start", "w_end", 600).collect()
    )
    assert got == expect == [(1, 10), (2, 10), (3, 11), (4, 11)]
