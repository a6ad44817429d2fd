"""Header monotonicity monitor: pure-core semantics and the stateful
streaming operator across checkpointed restarts."""

from __future__ import annotations

import json
import os

import pandas as pd
import pytest
from pyspark.sql import types as T

from evm_indexer_spark.streaming.monitor import classify_headers, monitor_headers

HEADER_SCHEMA = T.StructType(
    [
        T.StructField("chain", T.StringType()),
        T.StructField("number", T.LongType()),
        T.StructField("hash", T.StringType()),
    ]
)


def test_classify_core_matrix():
    df = pd.DataFrame({"number": [5, 6, 7, 7, 6, 9], "hash": list("abcdef")})
    out, latest = classify_headers(df, latest=None, startup_max=4)
    assert list(out["status"]) == ["first", "normal", "normal", "reorg", "reorg", "gap"]
    assert latest == 9


def test_classify_bad_first():
    df = pd.DataFrame({"number": [3], "hash": ["a"]})
    out, latest = classify_headers(df, latest=None, startup_max=4)
    assert list(out["status"]) == ["bad_first"] and latest is None


def _write(landing, name, rows):
    with open(os.path.join(landing, name), "w") as f:
        for chain, num in rows:
            f.write(
                json.dumps({"chain": chain, "number": num, "hash": f"0x{chain}{num}"})
                + "\n"
            )


def _run(spark, landing, ckpt, sink_name):
    stream = (
        spark.readStream.schema(HEADER_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(landing)
    )
    q = (
        monitor_headers(stream, startup_max=0)
        .writeStream.format("memory")
        .queryName(sink_name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return {
        (r["chain"], r["number"]): r["status"]
        for r in spark.table(sink_name).collect()
    }


def test_stateful_monitor_multi_chain(spark, tmp_path):
    landing = tmp_path / "l"
    landing.mkdir()
    ckpt = str(tmp_path / "c")
    _write(str(landing), "b1.json", [("eth", 10), ("poly", 5)])
    _write(str(landing), "b2.json", [("eth", 11), ("eth", 13), ("poly", 5)])
    got = _run(spark, str(landing), ckpt, "mon1")
    assert got[("eth", 10)] == "first"
    assert got[("eth", 11)] == "normal"
    assert got[("eth", 13)] == "gap"  # skipped 12
    assert got[("poly", 5)] == "reorg"  # re-announce of poly's own head
    # state survives restart: next header continues from latest=13
    # (memory sink cannot recover a checkpoint → collect via foreachBatch)
    _write(str(landing), "b3.json", [("eth", 14)])
    seen: list = []
    stream = (
        spark.readStream.schema(HEADER_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(landing))
    )
    q = (
        monitor_headers(stream, startup_max=0)
        .writeStream.foreachBatch(lambda df, _b: seen.extend(df.collect()))
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got2 = {(r["chain"], r["number"]): r["status"] for r in seen}
    assert got2 == {("eth", 14): "normal"}
