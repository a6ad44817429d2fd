"""Property-based tests (hypothesis) for the subtlest parity semantics:
positional topic matching (P11/T10) and hex codecs (F1/F2), each checked
against an independent pure-Python model of the reference's Go code."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from evm_indexer_spark.functions.hexcodec import hex_decode, hex_encode
from evm_indexer_spark.functions.topics import topic_match
from evm_indexer_spark.streaming.subscribe import subscription_predicate

TOPIC_POOL = [f"0x{i:064x}" for i in range(4)]

topics_arrays = st.lists(st.sampled_from(TOPIC_POOL), min_size=0, max_size=4)
topic_maps = st.dictionaries(
    st.integers(min_value=0, max_value=3), st.sampled_from(TOPIC_POOL), max_size=4
)


def go_does_it_match(topics: list[str], tmap: dict[int, str]) -> bool:
    """DoesItMatch, app/db/query.go:473-485 — positional equality; an
    out-of-range requested position can never match."""
    for k, v in tmap.items():
        if k >= len(topics) or topics[k] != v:
            return False
    return True


def go_event_filter_match(
    topics: list[str], pattern: list[str], origin_ok: bool = True
) -> bool:
    """DoesMatchWithPublishedEventData, subscription.go:74-124 — out-of-
    range position matches only ''/'*'."""
    if not origin_ok:
        return False
    for k, want in enumerate(pattern[1:]):
        if k >= len(topics):
            if want not in ("", "*"):
                return False
        elif want not in ("", "*") and want.lower() != topics[k].lower():
            return False
    return True


@pytest.fixture(scope="module")
def run_batch(spark):
    """Evaluate predicates for many cases in ONE Spark job (a collect per
    hypothesis example would be prohibitively slow)."""

    def run(cases, pred_builder):
        df = spark.createDataFrame(
            [(i, t) for i, (t, _) in enumerate(cases)],
            "i long, topics array<string>",
        )
        preds = [
            F.when(pred_builder(arg), 1).otherwise(0).alias(f"m{i}")
            for i, (_, arg) in enumerate(cases)
        ]
        out = df.select("i", *preds).collect()
        return {r["i"]: [bool(r[f"m{j}"]) for j in range(len(cases))] for r in out}

    return run


@settings(max_examples=30, deadline=None)
@given(st.lists(st.tuples(topics_arrays, topic_maps), min_size=1, max_size=8))
def test_topic_match_equals_go_model(run_batch, cases):
    results = run_batch(cases, lambda tmap: topic_match("topics", tmap))
    for i, (topics, _) in enumerate(cases):
        for j, (_, tmap) in enumerate(cases):
            assert results[i][j] == go_does_it_match(topics, tmap), (
                f"topics={topics} map={tmap}"
            )


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(
            topics_arrays,
            st.lists(
                st.sampled_from(TOPIC_POOL + ["*"]), min_size=4, max_size=4
            ),
        ),
        min_size=1,
        max_size=8,
    )
)
def test_subscription_match_equals_go_model(run_batch, cases):
    cases = [(t, ["*", *pat]) for t, pat in cases]  # wildcard contract
    results = run_batch(
        cases,
        lambda pat: subscription_predicate("event/" + "/".join(pat)),
    )
    for i, (topics, _) in enumerate(cases):
        for j, (_, pat) in enumerate(cases):
            assert results[i][j] == go_event_filter_match(topics, pat), (
                f"topics={topics} pattern={pat}"
            )


@settings(max_examples=20, deadline=None)
@given(st.lists(st.binary(min_size=0, max_size=48), min_size=1, max_size=16))
def test_hex_roundtrip(spark, blobs):
    df = spark.createDataFrame([(b,) for b in blobs], "b binary")
    out = df.select(
        "b",
        hex_encode("b").alias("enc"),
        hex_decode(hex_encode("b")).alias("back"),
    ).collect()
    for r in out:
        raw = bytes(r["b"] or b"")
        # reference renders empty bytes as "" (block.go:38-41)
        assert r["enc"] == ("0x" + raw.hex() if raw else "")
        assert bytes(r["back"] or b"") == raw
        if raw:
            assert r["enc"] == r["enc"].lower()


# -- facade fuzz: no exception class escapes the contract --------------------

param_values = st.one_of(
    st.just(""),
    st.just("*"),
    st.text(alphabet="0x123abcXYZ/ ", max_size=70),
    st.integers(-5, 2**65).map(str),
    st.just("0x" + "a" * 40),
    st.just("0x" + "b" * 64),
)
param_dicts = st.dictionaries(
    st.sampled_from(
        ["hash", "number", "tx", "fromBlock", "toBlock", "fromTime", "toTime",
         "deployer", "fromAccount", "toAccount", "nonce", "blockHash", "txHash",
         "logIndex", "blockNumber", "contract", "count", "topic0", "topic1"]
    ),
    param_values,
    max_size=6,
)


@settings(max_examples=60, deadline=None)
@given(st.sampled_from(["block", "transaction", "event"]), param_dicts)
def test_facade_total_over_garbage(facade_fuzz, method, params):
    from evm_indexer_spark.errors import EngineError

    try:
        getattr(facade_fuzz, method)(params)
    except EngineError:
        pass  # ValidationError / NotFoundError are the contract


@pytest.fixture(scope="module")
def facade_fuzz(spark, evm):
    from evm_indexer_spark.api import RestFacade
    from evm_indexer_spark.operators.historical import HistoricalQueries

    return RestFacade(
        HistoricalQueries(evm["blocks"], evm["transactions"], evm["events"])
    )
