"""Notification JSON shaping as native expressions (SURVEY S12, F8/F9).

The reference publishes per-entity JSON to Redis channels
(``app/block/publish_block.go:12-47``, ``publish_tx.go``,
``publish_event.go``) using the same custom encoders the REST layer
uses. Here each entity stream gains a ``payload`` string column built
with ``to_json(struct(...))`` — wholly JVM-side, so a 1000-executor
stream serializes in parallel with zero Python involvement; the Python
encoders in ``api`` are the single-row serving twins (cross-checked in
tests).

``to_json`` emits struct fields in declaration order, matching the
reference's fixed field order; empty-binary and zero-word special cases
(``data/block.go:38-41``, ``event.go:32-35``) are ``when`` branches.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ZERO_WORD = "0" * 64


def _hex0x(col: Column) -> Column:
    """binary → 0x-prefixed lowercase hex; empty/null → ''."""
    h = F.lower(F.hex(col))
    return F.when(col.isNull() | (F.length(col) == 0), F.lit("")).otherwise(
        F.concat(F.lit("0x"), h)
    )


def block_payload(blocks: DataFrame) -> DataFrame:
    """blocks rows + JSON ``payload`` (Block.MarshalJSON field order)."""
    return blocks.withColumn(
        "payload",
        F.to_json(
            F.struct(
                F.col("hash"),
                F.col("number"),
                F.col("time"),
                F.col("parenthash").alias("parentHash"),
                F.col("difficulty"),
                F.col("gasused").alias("gasUsed"),
                F.col("gaslimit").alias("gasLimit"),
                F.col("nonce"),
                F.col("miner"),
                F.col("size"),
                F.col("stateroothash").alias("stateRootHash"),
                F.col("unclehash").alias("uncleHash"),
                F.col("txroothash").alias("txRootHash"),
                F.col("receiptroothash").alias("receiptRootHash"),
                _hex0x(F.col("extradata")).alias("extraData"),
            )
        ),
    )


def tx_payload(transactions: DataFrame) -> DataFrame:
    """transactions rows + JSON ``payload``; the contract-creation branch
    carries ``contract`` instead of ``to`` (Transaction.MarshalJSON,
    tx.go:34-53). Both branch structs are built and ``when``-selected —
    one pass, no UDF."""
    common_tail = [
        F.coalesce(F.col("value"), F.lit("")).alias("value"),
        _hex0x(F.col("data")).alias("data"),
        F.col("gas"),
        F.col("gasprice").alias("gasPrice"),
        F.col("cost"),
        F.col("nonce"),
        F.col("state"),
        F.col("blockhash").alias("blockHash"),
    ]
    normal = F.to_json(
        F.struct(F.col("hash"), F.col("from"), F.col("to"), *common_tail)
    )
    creation = F.to_json(
        F.struct(F.col("hash"), F.col("from"), F.col("contract"), *common_tail)
    )
    return transactions.withColumn(
        "payload",
        F.when(F.col("contract").startswith("0x"), creation).otherwise(normal),
    )


def event_payload(events: DataFrame) -> DataFrame:
    """events rows + JSON ``payload``; data empty when zero-length or one
    zero ABI word (Event.MarshalJSON, event.go:30-45)."""
    h = F.lower(F.hex(F.col("data")))
    data_str = F.when(
        F.col("data").isNull() | (F.length(F.col("data")) == 0) | (h == _ZERO_WORD),
        F.lit(""),
    ).otherwise(F.concat(F.lit("0x"), h))
    return events.withColumn(
        "payload",
        F.to_json(
            F.struct(
                F.col("origin"),
                F.col("index"),
                F.col("topics"),
                data_str.alias("data"),
                F.col("txhash").alias("txHash"),
                F.col("blockhash").alias("blockHash"),
            )
        ),
    )
