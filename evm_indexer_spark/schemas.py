"""Fixed StructTypes for the three core EVM tables.

Mirrors the reference storage model (``app/db/model.go:15-89``): no schema
inference anywhere — GORM auto-migration there, declared StructTypes here
(``app/db/db.go:26``). Big numbers (uint256 ``value``/``gasprice``/``cost``/
``difficulty``) are canonical decimal strings exactly as the reference
stores varchar (``model.go:20,65,68-69``); cast with
``functions.numeric.as_decimal`` for arithmetic (documented 38-digit bound).

Addresses and hashes are normalized to lowercase at ingestion and compared
lowercase everywhere — a deliberate improvement over the reference, which
stores EIP-55 mixed case but matches case-insensitively in its streaming
filters (``app/pubsub/subscription.go:141-150``).
"""

from __future__ import annotations

from pyspark.sql import types as T

# blocks — app/db/model.go:15-33
BLOCKS_SCHEMA = T.StructType(
    [
        T.StructField("hash", T.StringType(), False),  # char(66) PK, model.go:16
        T.StructField("number", T.LongType(), False),  # unique, model.go:17
        T.StructField("time", T.LongType(), False),  # unix seconds, model.go:18
        T.StructField("parenthash", T.StringType(), True),
        T.StructField("difficulty", T.StringType(), True),  # big.Int string
        T.StructField("gasused", T.LongType(), True),
        T.StructField("gaslimit", T.LongType(), True),
        T.StructField("nonce", T.StringType(), True),  # 0x-hex uint64, pack_block.go:23
        T.StructField("miner", T.StringType(), True),  # char(42)
        T.StructField("size", T.DoubleType(), True),
        T.StructField("stateroothash", T.StringType(), True),
        T.StructField("unclehash", T.StringType(), True),
        T.StructField("txroothash", T.StringType(), True),
        T.StructField("receiptroothash", T.StringType(), True),
        T.StructField("extradata", T.BinaryType(), True),
    ]
)

# transactions — app/db/model.go:60-74
TRANSACTIONS_SCHEMA = T.StructType(
    [
        T.StructField("hash", T.StringType(), False),  # char(66) PK
        T.StructField("from", T.StringType(), True),  # indexed, model.go:62
        T.StructField("to", T.StringType(), True),  # '' for contract creation
        T.StructField("contract", T.StringType(), True),  # set iff creation, pack_tx.go:21
        T.StructField("value", T.StringType(), True),  # uint256 wei as string
        T.StructField("data", T.BinaryType(), True),  # calldata
        T.StructField("gas", T.LongType(), True),
        T.StructField("gasprice", T.StringType(), True),
        T.StructField("cost", T.StringType(), True),
        T.StructField("nonce", T.LongType(), True),  # indexed
        T.StructField("state", T.ShortType(), True),  # receipt status 0/1
        T.StructField("blockhash", T.StringType(), False),  # FK → blocks.hash
    ]
)

# events — app/db/model.go:82-89
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("blockhash", T.StringType(), False),  # composite PK w/ index
        T.StructField("index", T.IntegerType(), False),  # log index within block
        T.StructField("origin", T.StringType(), True),  # emitting contract
        T.StructField("topics", T.ArrayType(T.StringType()), True),  # 0-4, positional
        T.StructField("data", T.BinaryType(), True),  # ABI payload
        T.StructField("txhash", T.StringType(), True),  # FK → transactions.hash
    ]
)

# Narrow projection lists replicated for parity.
# P2: every joined tx query selects these 10 columns, deliberately dropping
# the wide value/data columns — query.go:223,251,279,307,335,363,377,391.
TX_NARROW_COLS = [
    "hash",
    "from",
    "to",
    "contract",
    "gas",
    "gasprice",
    "cost",
    "nonce",
    "state",
    "blockhash",
]

# P3: joined event queries select these 6 — query.go:417,433,531,552,572.
EVENT_COLS = ["origin", "index", "topics", "data", "txhash", "blockhash"]

# Partitioning constant: blocks/txs/events are written partitioned by
# number-bucket (number // BLOCK_BUCKET_SIZE) so that the ≤100-block range
# queries (guardrail, config.go:62-77) prune to 1-2 partitions, and a
# 100 TB table still scans only the touched buckets. This replaces the
# reference's B-tree on blocks.number (model.go:17).
BLOCK_BUCKET_SIZE = 100_000
