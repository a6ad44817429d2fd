"""Raw-block normalizers (SURVEY S5-S7).

The reference builds storage rows from chain objects in Go
(``BuildPackedBlock``, ``app/block/pack_block.go:11-36``; ``BuildPackedTx``,
``app/block/pack_tx.go:12-67``; ``StringifyEventTopics``,
``app/common/common.go:13-21``). Here the same normalization is a pure
``select()``/``explode()`` projection over a raw nested block document
(one row per block, txs and logs nested) — the shape a landing zone of
JSON-RPC responses would have. Everything stays in native expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.hexcodec import uint64_hex

# Raw landing schema: one document per block with nested txs/logs.
RAW_LOG_SCHEMA = T.StructType(
    [
        T.StructField("index", T.IntegerType()),
        T.StructField("address", T.StringType()),  # emitting contract
        T.StructField("topics", T.ArrayType(T.StringType())),
        T.StructField("data", T.StringType()),  # 0x-hex payload
    ]
)

RAW_TX_SCHEMA = T.StructType(
    [
        T.StructField("hash", T.StringType()),
        T.StructField("from", T.StringType()),
        T.StructField("to", T.StringType()),  # null ⇒ contract creation
        T.StructField("contractAddress", T.StringType()),  # from receipt
        T.StructField("value", T.StringType()),  # decimal string
        T.StructField("input", T.StringType()),  # 0x-hex calldata
        T.StructField("gas", T.LongType()),
        T.StructField("gasPrice", T.StringType()),
        T.StructField("nonce", T.LongType()),
        T.StructField("status", T.IntegerType()),  # receipt status
        T.StructField("logs", T.ArrayType(RAW_LOG_SCHEMA)),
    ]
)

RAW_BLOCK_SCHEMA = T.StructType(
    [
        T.StructField("hash", T.StringType()),
        T.StructField("number", T.LongType()),
        T.StructField("timestamp", T.LongType()),
        T.StructField("parentHash", T.StringType()),
        T.StructField("difficulty", T.StringType()),
        T.StructField("gasUsed", T.LongType()),
        T.StructField("gasLimit", T.LongType()),
        T.StructField("nonce", T.LongType()),  # uint64, hex-encoded at normalize
        T.StructField("miner", T.StringType()),
        T.StructField("size", T.DoubleType()),
        T.StructField("stateRoot", T.StringType()),
        T.StructField("sha3Uncles", T.StringType()),
        T.StructField("transactionsRoot", T.StringType()),
        T.StructField("receiptsRoot", T.StringType()),
        T.StructField("extraData", T.StringType()),  # 0x-hex
        T.StructField("transactions", T.ArrayType(RAW_TX_SCHEMA)),
    ]
)


def _hex_to_bytes(col):
    """0x-hex string → binary (empty/null → empty bytes)."""
    c = F.coalesce(col, F.lit("0x"))
    body = F.when(c.startswith("0x"), c.substr(F.lit(3), F.length(c) - 2)).otherwise(c)
    return F.coalesce(F.unhex(body), F.lit(b""))


def normalize_blocks(raw: DataFrame) -> DataFrame:
    """Raw block docs → ``blocks`` rows (pack_block.go:11-36 semantics):
    nonce hex-encoded, addresses/hashes lowercased at ingest."""
    return raw.select(
        F.lower("hash").alias("hash"),
        F.col("number"),
        F.col("timestamp").alias("time"),
        F.lower("parentHash").alias("parenthash"),
        F.col("difficulty"),
        F.col("gasUsed").alias("gasused"),
        F.col("gasLimit").alias("gaslimit"),
        uint64_hex(F.col("nonce")).alias("nonce"),
        F.lower("miner").alias("miner"),
        F.col("size"),
        F.lower("stateRoot").alias("stateroothash"),
        F.lower("sha3Uncles").alias("unclehash"),
        F.lower("transactionsRoot").alias("txroothash"),
        F.lower("receiptsRoot").alias("receiptroothash"),
        _hex_to_bytes(F.col("extraData")).alias("extradata"),
    )


def normalize_transactions(raw: DataFrame) -> DataFrame:
    """Raw block docs → ``transactions`` rows via explode (pack_tx.go:12-48):
    contract-creation branch sets to='' / contract=receipt address; cost is
    gas×gasprice+value in exact decimal."""
    tx = raw.select(
        F.lower("hash").alias("blockhash"), F.explode("transactions").alias("t")
    ).select("blockhash", "t.*")
    creating = F.col("to").isNull() | (F.col("to") == "")
    # try_* arithmetic: adversarial uint256 values beyond decimal(38,0)
    # must normalize to NULL cost, not throw under ANSI mode
    gas_cost = F.try_add(
        F.try_multiply(
            F.col("gasPrice").try_cast("decimal(38,0)"),
            F.col("gas").try_cast("decimal(38,0)"),
        ),
        F.coalesce(F.col("value").try_cast("decimal(38,0)"), F.lit(0)),
    )
    return tx.select(
        F.lower("hash").alias("hash"),
        F.lower("from").alias("from"),
        F.when(creating, F.lit("")).otherwise(F.lower("to")).alias("to"),
        F.when(creating, F.lower(F.coalesce("contractAddress", F.lit(""))))
        .otherwise(F.lit(""))
        .alias("contract"),
        F.col("value"),
        _hex_to_bytes(F.col("input")).alias("data"),
        F.col("gas"),
        F.col("gasPrice").alias("gasprice"),
        gas_cost.cast("string").alias("cost"),
        F.col("nonce"),
        F.col("status").cast("short").alias("state"),
        "blockhash",
    )


def normalize_events(raw: DataFrame) -> DataFrame:
    """Raw block docs → ``events`` rows: double explode (tx → logs), topics
    lowercased (StringifyEventTopics, common.go:13-21)."""
    logs = (
        raw.select(
            F.lower("hash").alias("blockhash"), F.explode("transactions").alias("t")
        )
        .select("blockhash", F.lower("t.hash").alias("txhash"), F.explode("t.logs").alias("l"))
    )
    return logs.select(
        "blockhash",
        F.col("l.index").alias("index"),
        F.lower("l.address").alias("origin"),
        F.transform("l.topics", lambda t: F.lower(t)).alias("topics"),
        _hex_to_bytes(F.col("l.data")).alias("data"),
        "txhash",
    )
