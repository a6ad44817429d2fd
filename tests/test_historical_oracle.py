"""Golden-oracle tests: every method of the historical catalog
(reference app/db/query.go parity list) vs equivalent DuckDB SQL over
identical EVM fixture parquet."""

from __future__ import annotations

import pytest

from evm_indexer_spark.operators.historical import HistoricalQueries
from evm_indexer_spark.sources.fixtures import block_hash, tx_hash

from .conftest import BASE_TIME, assert_matches_oracle

FRM, TO = 100, 180
TFRM, TTO = BASE_TIME + 2 * FRM, BASE_TIME + 2 * TO

TX_NARROW_SQL = (
    't.hash, t."from", t."to", t.contract, t.gas, t.gasprice, t.cost, '
    "t.nonce, t.state, t.blockhash"
)
EVENT_SQL = 'e.origin, e."index", e.topics, e.data, e.txhash, e.blockhash'


@pytest.fixture(scope="module")
def hq(evm):
    return HistoricalQueries(evm["blocks"], evm["transactions"], evm["events"])


def _acct(pools, i):
    return pools["accounts"][i]


CASES = {}


def case(name):
    def reg(fn):
        CASES[name] = fn
        return fn

    return reg


# -- blocks -----------------------------------------------------------------

@case("all_block_numbers_in_range")
def _(hq, pools):
    return (
        hq.get_all_block_numbers_in_range(FRM, TO),
        f"SELECT number FROM blocks WHERE number BETWEEN {FRM} AND {TO} ORDER BY number",
    )


@case("current_oldest_block_number")
def _(hq, pools):
    return (
        hq.get_current_oldest_block_number(),
        "SELECT min(number) AS number FROM blocks",
    )


@case("current_block_number")
def _(hq, pools):
    return (hq.get_current_block_number(), "SELECT max(number) AS number FROM blocks")


@case("block_count")
def _(hq, pools):
    return (hq.get_block_count(), 'SELECT count(*) AS "count" FROM blocks')


@case("block_by_hash")
def _(hq, pools):
    h = block_hash(150)
    return (hq.get_block_by_hash(h), f"SELECT * FROM blocks WHERE hash = '{h}'")


@case("block_by_number")
def _(hq, pools):
    return (hq.get_block_by_number(150), "SELECT * FROM blocks WHERE number = 150")


@case("blocks_by_number_range")
def _(hq, pools):
    return (
        hq.get_blocks_by_number_range(FRM, TO),
        f"SELECT * FROM blocks WHERE number BETWEEN {FRM} AND {TO}",
    )


@case("blocks_by_time_range")
def _(hq, pools):
    return (
        hq.get_blocks_by_time_range(TFRM, TTO),
        f'SELECT * FROM blocks WHERE "time" BETWEEN {TFRM} AND {TTO}',
    )


# -- transactions by block ---------------------------------------------------

@case("tx_count_by_block_hash")
def _(hq, pools):
    h = block_hash(155)
    return (
        hq.get_transaction_count_by_block_hash(h),
        f"SELECT count(*) AS \"count\" FROM transactions WHERE blockhash = '{h}'",
    )


@case("txs_by_block_hash")
def _(hq, pools):
    h = block_hash(155)
    return (
        hq.get_transactions_by_block_hash(h),
        f"SELECT * FROM transactions WHERE blockhash = '{h}'",
    )


@case("tx_count_by_block_number")
def _(hq, pools):
    return (
        hq.get_transaction_count_by_block_number(155),
        'SELECT count(*) AS "count" FROM transactions '
        "WHERE blockhash = (SELECT hash FROM blocks WHERE number = 155)",
    )


@case("txs_by_block_number")
def _(hq, pools):
    return (
        hq.get_transactions_by_block_number(155),
        "SELECT * FROM transactions "
        "WHERE blockhash = (SELECT hash FROM blocks WHERE number = 155)",
    )


@case("tx_by_hash")
def _(hq, pools):
    h = tx_hash(155, 1)
    return (
        hq.get_transaction_by_hash(h),
        f"SELECT * FROM transactions WHERE hash = '{h}'",
    )


# -- account-scoped ----------------------------------------------------------

def _window_sql(select: str, where_tx: str, by_time: bool) -> str:
    col, lo, hi = ("b.\"time\"", TFRM, TTO) if by_time else ("b.number", FRM, TO)
    return (
        f"SELECT {select} FROM transactions t "
        "JOIN blocks b ON t.blockhash = b.hash "
        f"WHERE {where_tx} AND {col} >= {lo} AND {col} <= {hi}"
    )


@case("tx_count_from_account_by_number_range")
def _(hq, pools):
    a = _acct(pools, 0)
    return (
        hq.get_transaction_count_from_account_by_block_number_range(a, FRM, TO),
        _window_sql('count(*) AS "count"', f"t.\"from\" = '{a}'", False),
    )


@case("txs_from_account_by_number_range")
def _(hq, pools):
    a = _acct(pools, 0)
    return (
        hq.get_transactions_from_account_by_block_number_range(a, FRM, TO),
        _window_sql(TX_NARROW_SQL, f"t.\"from\" = '{a}'", False),
    )


@case("tx_count_from_account_by_time_range")
def _(hq, pools):
    a = _acct(pools, 0)
    return (
        hq.get_transaction_count_from_account_by_block_time_range(a, TFRM, TTO),
        _window_sql('count(*) AS "count"', f"t.\"from\" = '{a}'", True),
    )


@case("txs_from_account_by_time_range")
def _(hq, pools):
    a = _acct(pools, 0)
    return (
        hq.get_transactions_from_account_by_block_time_range(a, TFRM, TTO),
        _window_sql(TX_NARROW_SQL, f"t.\"from\" = '{a}'", True),
    )


@case("tx_count_to_account_by_number_range")
def _(hq, pools):
    a = _acct(pools, 4)
    return (
        hq.get_transaction_count_to_account_by_block_number_range(a, FRM, TO),
        _window_sql('count(*) AS "count"', f"t.\"to\" = '{a}'", False),
    )


@case("txs_to_account_by_number_range")
def _(hq, pools):
    a = _acct(pools, 4)
    return (
        hq.get_transactions_to_account_by_block_number_range(a, FRM, TO),
        _window_sql(TX_NARROW_SQL, f"t.\"to\" = '{a}'", False),
    )


@case("tx_count_to_account_by_time_range")
def _(hq, pools):
    a = _acct(pools, 4)
    return (
        hq.get_transaction_count_to_account_by_block_time_range(a, TFRM, TTO),
        _window_sql('count(*) AS "count"', f"t.\"to\" = '{a}'", True),
    )


@case("txs_to_account_by_time_range")
def _(hq, pools):
    a = _acct(pools, 4)
    return (
        hq.get_transactions_to_account_by_block_time_range(a, TFRM, TTO),
        _window_sql(TX_NARROW_SQL, f"t.\"to\" = '{a}'", True),
    )


@case("tx_count_between_accounts_by_number_range")
def _(hq, pools):
    fa, ta = _acct(pools, 0), _acct(pools, 4)
    return (
        hq.get_transaction_count_between_accounts_by_block_number_range(
            fa, ta, FRM, TO
        ),
        _window_sql(
            'count(*) AS "count"', f"t.\"from\" = '{fa}' AND t.\"to\" = '{ta}'", False
        ),
    )


@case("txs_between_accounts_by_number_range")
def _(hq, pools):
    fa, ta = _acct(pools, 0), _acct(pools, 4)
    return (
        hq.get_transactions_between_accounts_by_block_number_range(fa, ta, FRM, TO),
        _window_sql(
            TX_NARROW_SQL, f"t.\"from\" = '{fa}' AND t.\"to\" = '{ta}'", False
        ),
    )


@case("tx_count_between_accounts_by_time_range")
def _(hq, pools):
    fa, ta = _acct(pools, 0), _acct(pools, 4)
    return (
        hq.get_transaction_count_between_accounts_by_block_time_range(
            fa, ta, TFRM, TTO
        ),
        _window_sql(
            'count(*) AS "count"', f"t.\"from\" = '{fa}' AND t.\"to\" = '{ta}'", True
        ),
    )


@case("txs_between_accounts_by_time_range")
def _(hq, pools):
    fa, ta = _acct(pools, 0), _acct(pools, 4)
    return (
        hq.get_transactions_between_accounts_by_block_time_range(fa, ta, TFRM, TTO),
        _window_sql(
            TX_NARROW_SQL, f"t.\"from\" = '{fa}' AND t.\"to\" = '{ta}'", True
        ),
    )


@case("contract_creations_from_account_by_number_range")
def _(hq, pools):
    a = _acct(pools, 0)
    return (
        hq.get_contract_creation_transactions_from_account_by_block_number_range(
            a, 0, 299
        ),
        "SELECT " + TX_NARROW_SQL + " FROM transactions t "
        "JOIN blocks b ON t.blockhash = b.hash "
        f"WHERE t.\"from\" = '{a}' AND t.contract <> '' "
        "AND b.number >= 0 AND b.number <= 299",
    )


@case("contract_creations_from_account_by_time_range")
def _(hq, pools):
    a = _acct(pools, 0)
    lo, hi = BASE_TIME, BASE_TIME + 2 * 299
    return (
        hq.get_contract_creation_transactions_from_account_by_block_time_range(
            a, lo, hi
        ),
        "SELECT " + TX_NARROW_SQL + " FROM transactions t "
        "JOIN blocks b ON t.blockhash = b.hash "
        f"WHERE t.\"from\" = '{a}' AND t.contract <> '' "
        f'AND b."time" >= {lo} AND b."time" <= {hi}',
    )


@case("tx_from_account_with_nonce")
def _(hq, pools):
    a = _acct(pools, 0)
    return (
        hq.get_transaction_from_account_with_nonce(a, 3),
        f"SELECT * FROM transactions WHERE \"from\" = '{a}' AND nonce = 3",
    )


# -- events ------------------------------------------------------------------

@case("events_from_contract_by_number_range")
def _(hq, pools):
    c = pools["contracts"][0]
    return (
        hq.get_events_from_contract_by_block_number_range(c, FRM, TO),
        f"SELECT {EVENT_SQL} FROM events e JOIN blocks b ON e.blockhash = b.hash "
        f"WHERE e.origin = '{c}' AND b.number >= {FRM} AND b.number <= {TO}",
    )


@case("events_from_contract_by_time_range")
def _(hq, pools):
    c = pools["contracts"][0]
    return (
        hq.get_events_from_contract_by_block_time_range(c, TFRM, TTO),
        f"SELECT {EVENT_SQL} FROM events e JOIN blocks b ON e.blockhash = b.hash "
        f"WHERE e.origin = '{c}' AND b.\"time\" >= {TFRM} AND b.\"time\" <= {TTO}",
    )


@case("events_by_block_hash")
def _(hq, pools):
    h = block_hash(155)
    return (
        hq.get_events_by_block_hash(h),
        f"SELECT * FROM events WHERE blockhash = '{h}'",
    )


@case("events_by_tx_hash")
def _(hq, pools):
    h = tx_hash(155, 2)
    return (
        hq.get_events_by_transaction_hash(h),
        f"SELECT * FROM events WHERE txhash = '{h}'",
    )


@case("events_with_topics_by_number_range")
def _(hq, pools):
    c = pools["contracts"][0]
    t0 = pools["sigs"][0]
    return (
        hq.get_events_from_contract_with_topics_by_block_number_range(
            c, 0, 299, {0: t0}
        ),
        f"SELECT {EVENT_SQL} FROM events e JOIN blocks b ON e.blockhash = b.hash "
        f"WHERE e.origin = '{c}' AND b.number >= 0 AND b.number <= 299 "
        f"AND len(e.topics) > 0 AND e.topics[1] = '{t0}'",
    )


@case("events_with_positional_topic1_by_number_range")
def _(hq, pools):
    # topic at position 1 (0-based) — exercises out-of-range semantics for
    # events with < 2 topics (query.go:477, subscription.go:84-86)
    c = pools["contracts"][1]
    t1 = "0x" + "0" * 24 + pools["accounts"][5][2:]
    return (
        hq.get_events_from_contract_with_topics_by_block_number_range(
            c, 0, 299, {1: t1}
        ),
        f"SELECT {EVENT_SQL} FROM events e JOIN blocks b ON e.blockhash = b.hash "
        f"WHERE e.origin = '{c}' AND b.number >= 0 AND b.number <= 299 "
        f"AND len(e.topics) > 1 AND e.topics[2] = '{t1}'",
    )


@case("events_with_topics_by_time_range")
def _(hq, pools):
    # query.go:547-563 — same positional semantics over the time window
    c = pools["contracts"][2]
    t0 = pools["sigs"][1]
    lo, hi = BASE_TIME, BASE_TIME + 2 * 299
    return (
        hq.get_events_from_contract_with_topics_by_block_time_range(
            c, lo, hi, {0: t0}
        ),
        f"SELECT {EVENT_SQL} FROM events e JOIN blocks b ON e.blockhash = b.hash "
        f"WHERE e.origin = '{c}' AND b.time >= {lo} AND b.time <= {hi} "
        f"AND len(e.topics) > 0 AND e.topics[1] = '{t0}'",
    )


@case("event_by_block_hash_and_log_index")
def _(hq, pools):
    h = block_hash(155)
    return (
        hq.get_event_by_block_hash_and_log_index(h, 2),
        f"SELECT * FROM events WHERE blockhash = '{h}' AND \"index\" = 2",
    )


@case("event_by_block_number_and_log_index")
def _(hq, pools):
    return (
        hq.get_event_by_block_number_and_log_index(155, 2),
        "SELECT * FROM events WHERE blockhash = "
        "(SELECT hash FROM blocks WHERE number = 155) AND \"index\" = 2",
    )


@pytest.mark.parametrize("name", sorted(CASES))
def test_oracle(name, hq, pools, duck):
    spark_df, sql = CASES[name](hq, pools)
    assert_matches_oracle(spark_df, duck, sql)


def test_topk_last_x_events(hq, pools, duck):
    """W2 top-k: LIMIT with ties is non-deterministic row-wise, so compare
    the deterministic prefix property instead: result size == x and every
    returned event's block number >= the x-th largest candidate number."""
    c = pools["contracts"][0]
    x = 10
    df = hq.get_last_x_events_from_contract(c, x)
    rows = df.collect()
    assert len(rows) == x
    # all returned events belong to the top block numbers for this contract
    numbers = [
        r[0]
        for r in duck.sql(
            f"SELECT b.number FROM events e JOIN blocks b ON e.blockhash = b.hash "
            f"WHERE e.origin = '{c}' ORDER BY b.number DESC LIMIT {x}"
        ).fetchall()
    ]
    cutoff = min(numbers)
    got_numbers = [
        r[0]
        for r in duck.sql(
            "SELECT number FROM blocks WHERE hash IN ("
            + ",".join(f"'{row['blockhash']}'" for row in rows)
            + ")"
        ).fetchall()
    ]
    assert all(n >= cutoff for n in got_numbers)


def test_fixture_sanity(duck, pools):
    # non-empty coverage of the interesting branches
    assert duck.sql("SELECT count(*) FROM transactions WHERE contract <> ''").fetchone()[0] > 0
    assert duck.sql("SELECT count(*) FROM events WHERE len(topics) = 0").fetchone()[0] > 0
    assert duck.sql("SELECT count(*) FROM events WHERE len(topics) = 4").fetchone()[0] > 0
    # (from, nonce) unique
    assert (
        duck.sql(
            'SELECT max(c) FROM (SELECT count(*) c FROM transactions GROUP BY "from", nonce)'
        ).fetchone()[0]
        == 1
    )
