"""Deterministic EVM fixture generator (FIXTURES.md).

The reference ships zero tests or fixtures (no ``*_test.go``), so
correctness is established against a DuckDB oracle over synthetic tables
that satisfy the storage-model invariants of ``app/db/model.go`` and the
normalizers ``app/block/pack_block.go`` / ``pack_tx.go``:

- ``blocks.number`` unique, ``time`` strictly increasing ~2 s apart, with
  configurable gaps (missing-block anti-join, ``app/block/syncer.go:21-37``).
- ``(from, nonce)`` unique per sender with sequential nonces
  (``GetTransactionFromAccountWithNonce``, ``query.go:401-409``).
- contract creations: ``to = ''`` and ``contract != ''``, mutually
  exclusive (``pack_tx.go:16-48``).
- ``events.index`` dense 0-based per block; topics length 0-4 drawn
  position-significantly (``query.go:473-485``).
- values include >2^63 and >10^38 strings (uint256 stress).

Everything is derived from SHA-256 of a (seed, kind, ordinal) tuple — no
RNG state, fully reproducible, order-independent.
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa
import pyarrow.parquet as pq


def _h(seed: int, *parts: object) -> str:
    return hashlib.sha256(f"{seed}|{'|'.join(map(str, parts))}".encode()).hexdigest()


def _hash66(seed: int, *parts: object) -> str:
    return "0x" + _h(seed, *parts)


def _addr(seed: int, *parts: object) -> str:
    return "0x" + _h(seed, *parts)[:40]


# pool builders -------------------------------------------------------------

def _pools(seed: int):
    miners = [_addr(seed, "miner", i) for i in range(10)]
    accounts = [_addr(seed, "acct", i) for i in range(20)]
    contracts = [_addr(seed, "contract", i) for i in range(10)]
    # topic0 drawn from 5 known event signatures (Transfer/Approval/...)
    sigs = [_hash66(seed, "sig", i) for i in range(5)]
    return miners, accounts, contracts, sigs


def _pad_topic(addr: str) -> str:
    """Address → 32-byte topic (0x + 24 zeros + 40 hex)."""
    return "0x" + "0" * 24 + addr[2:]


def generate_evm_fixtures(
    out_dir: str,
    n_blocks: int = 1_000,
    seed: int = 42,
    gap_every: int = 97,
    base_time: int = 1_600_000_000,
) -> dict[str, int]:
    """Write blocks/transactions/events parquet into *out_dir*.

    Every ``gap_every``-th block number is left missing (never the first or
    last) to exercise gap repair. Returns row counts per table.
    """
    os.makedirs(out_dir, exist_ok=True)
    miners, accounts, contracts, sigs = _pools(seed)

    blk_cols: dict[str, list] = {k: [] for k in (
        "hash number time parenthash difficulty gasused gaslimit nonce miner "
        "size stateroothash unclehash txroothash receiptroothash extradata"
    ).split()}
    tx_cols: dict[str, list] = {k: [] for k in (
        "hash from to contract value data gas gasprice cost nonce state blockhash"
    ).split()}
    ev_cols: dict[str, list] = {k: [] for k in (
        "blockhash index origin topics data txhash"
    ).split()}

    nonce_counters = dict.fromkeys(accounts, 0)

    for number in range(n_blocks):
        if gap_every and number % gap_every == 0 and 0 < number < n_blocks - 1:
            continue  # deliberate gap
        bhash = _hash66(seed, "block", number)
        blk_cols["hash"].append(bhash)
        blk_cols["number"].append(number)
        blk_cols["time"].append(base_time + 2 * number)
        blk_cols["parenthash"].append(_hash66(seed, "block", number - 1))
        blk_cols["difficulty"].append(str(10**15 + number * 1_234_567))
        gaslimit = 30_000_000
        blk_cols["gasused"].append((number * 997_001) % gaslimit)
        blk_cols["gaslimit"].append(gaslimit)
        blk_cols["nonce"].append("0x" + _h(seed, "bnonce", number)[:16])
        blk_cols["miner"].append(miners[number % len(miners)])
        blk_cols["size"].append(500.0 + (number * 7919) % 1500)
        blk_cols["stateroothash"].append(_hash66(seed, "sroot", number))
        blk_cols["unclehash"].append(_hash66(seed, "uroot", number))
        blk_cols["txroothash"].append(_hash66(seed, "troot", number))
        blk_cols["receiptroothash"].append(_hash66(seed, "rroot", number))
        blk_cols["extradata"].append(
            b"" if number % 5 else bytes.fromhex(_h(seed, "extra", number))[:32]
        )

        n_tx = number % 7  # includes empty blocks (number % 7 == 0)
        log_index = 0  # dense per BLOCK (model.go:84)
        for ti in range(n_tx):
            txhash = _hash66(seed, "tx", number, ti)
            sender = accounts[(number + ti * 3) % len(accounts)]
            creating = (number + ti) % 20 == 0  # ~5% contract creations
            tx_cols["hash"].append(txhash)
            tx_cols["from"].append(sender)
            tx_cols["to"].append(
                "" if creating else accounts[(number + ti * 7 + 1) % len(accounts)]
            )
            tx_cols["contract"].append(
                _addr(seed, "newc", number, ti) if creating else ""
            )
            # uint256 stress: rotate small / >2^63 / >10^38 magnitudes
            mag = (number + ti) % 3
            base_val = 10_000 + number * 13 + ti
            value = base_val * (10 ** (0 if mag == 0 else 19 if mag == 1 else 39))
            tx_cols["value"].append(str(value))
            tx_cols["data"].append(
                b"" if (number + ti) % 2 else bytes.fromhex(_h(seed, "cd", number, ti))[
                    : 4 + (number % 29)
                ]
            )
            gas = 21_000 + (number * 31 + ti * 977) % 979_000
            gasprice = 1_000_000_000 + (number % 100) * 10_000_000
            tx_cols["gas"].append(gas)
            tx_cols["gasprice"].append(str(gasprice))
            tx_cols["cost"].append(str(gas * gasprice + value))
            tx_cols["nonce"].append(nonce_counters[sender])
            nonce_counters[sender] += 1
            tx_cols["state"].append((number + ti) % 10 != 9)  # ~10% failed
            tx_cols["blockhash"].append(bhash)

            n_ev = (number + ti) % 4  # 0-3 events per tx
            for ei in range(n_ev):
                n_topics = (number + ti + ei) % 5  # lengths 0-4
                topics = []
                if n_topics >= 1:
                    topics.append(sigs[(number + ei) % len(sigs)])
                for k in range(1, n_topics):
                    topics.append(
                        _pad_topic(accounts[(number + ti + ei + k) % len(accounts)])
                    )
                dmode = (number + ei) % 4
                if dmode == 0:
                    data = b""
                elif dmode == 1:
                    # one zero 32-byte ABI word → hex "0"*64 → JSON-empty
                    # special case, event.go:33
                    data = b"\x00" * 32
                else:
                    data = bytes.fromhex(_h(seed, "ed", number, ti, ei))[:32]
                ev_cols["blockhash"].append(bhash)
                ev_cols["index"].append(log_index)
                ev_cols["origin"].append(contracts[(number + ti + ei) % len(contracts)])
                ev_cols["topics"].append(topics)
                ev_cols["data"].append(data)
                ev_cols["txhash"].append(txhash)
                log_index += 1

    blocks_schema = pa.schema(
        [
            ("hash", pa.string()),
            ("number", pa.int64()),
            ("time", pa.int64()),
            ("parenthash", pa.string()),
            ("difficulty", pa.string()),
            ("gasused", pa.int64()),
            ("gaslimit", pa.int64()),
            ("nonce", pa.string()),
            ("miner", pa.string()),
            ("size", pa.float64()),
            ("stateroothash", pa.string()),
            ("unclehash", pa.string()),
            ("txroothash", pa.string()),
            ("receiptroothash", pa.string()),
            ("extradata", pa.binary()),
        ]
    )
    tx_schema = pa.schema(
        [
            ("hash", pa.string()),
            ("from", pa.string()),
            ("to", pa.string()),
            ("contract", pa.string()),
            ("value", pa.string()),
            ("data", pa.binary()),
            ("gas", pa.int64()),
            ("gasprice", pa.string()),
            ("cost", pa.string()),
            ("nonce", pa.int64()),
            ("state", pa.int16()),
            ("blockhash", pa.string()),
        ]
    )
    ev_schema = pa.schema(
        [
            ("blockhash", pa.string()),
            ("index", pa.int32()),
            ("origin", pa.string()),
            ("topics", pa.list_(pa.string())),
            ("data", pa.binary()),
            ("txhash", pa.string()),
        ]
    )

    tx_cols["state"] = [int(s) for s in tx_cols["state"]]
    tables = {
        "blocks": pa.table(blk_cols, schema=blocks_schema),
        "transactions": pa.table(tx_cols, schema=tx_schema),
        "events": pa.table(ev_cols, schema=ev_schema),
    }
    for name, table in tables.items():
        pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))
    return {name: table.num_rows for name, table in tables.items()}


def block_hash(number: int, seed: int = 42) -> str:
    """Deterministic fixture block hash for tests."""
    return _hash66(seed, "block", number)


def tx_hash(number: int, ti: int, seed: int = 42) -> str:
    """Deterministic fixture tx hash for tests."""
    return _hash66(seed, "tx", number, ti)


def fixture_pools(seed: int = 42):
    """Expose the deterministic pools so tests can pick known keys."""
    miners, accounts, contracts, sigs = _pools(seed)
    return {
        "miners": miners,
        "accounts": accounts,
        "contracts": contracts,
        "sigs": sigs,
    }
