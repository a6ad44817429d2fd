"""Hex codec expressions (SURVEY F1-F3).

The reference JSON-encodes byte columns as ``0x…`` lowercase hex with
special empty cases (``app/data/block.go:38-41``, ``tx.go:36-39``,
``event.go:32-35``); decodes incoming hex strings back to bytes
(``app/pubsub/transaction.go:110-112``). All expressible as native Spark
SQL — `hex`/`unhex`/`concat` — so they stay inside codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ZERO_WORD_HEX = "0" * 64  # 32 zero bytes (one ABI word): empty-event-data case


def hex_encode(col: Column | str) -> Column:
    """bytes → ``0x…`` lowercase hex; empty/NULL bytes → ``''``.

    Reference: ``app/data/block.go:38-41`` (extradata), ``tx.go:36-39``
    (calldata) render zero-length byte columns as the empty string, else
    ``0x`` + hex.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.when(
        c.isNull() | (F.length(c) == 0), F.lit("")
    ).otherwise(F.concat(F.lit("0x"), F.lower(F.hex(c))))


def hex_encode_event_data(col: Column | str) -> Column:
    """Event-data variant: additionally renders one all-zero ABI word
    (32 zero bytes = 64 hex chars) as ``''``.

    Reference: ``app/data/event.go:32-35`` compares the hex encoding to
    ``strings.Repeat("0", 64)`` — same semantics as ``api.event_to_dict``
    and ``publish.event_payload``.
    """
    c = F.col(col) if isinstance(col, str) else col
    enc = hex_encode(c)
    return F.when(F.lower(F.hex(c)) == F.lit(ZERO_WORD_HEX), F.lit("")).otherwise(enc)


def hex_decode(col: Column | str) -> Column:
    """``0x…`` string → bytes (empty string → empty bytes).

    Reference: ``app/pubsub/transaction.go:110-112``, ``event.go:98-100``.
    """
    c = F.col(col) if isinstance(col, str) else col
    # substring is 1-based; drop the 0x prefix when present.
    body = F.when(c.startswith("0x"), c.substr(F.lit(3), F.length(c) - 2)).otherwise(c)
    return F.unhex(body)


def uint64_hex(col: Column | str) -> Column:
    """uint64 → ``0x`` + minimal lowercase hex (block nonce encoding).

    Reference: ``app/block/pack_block.go:23`` (`hexutil.EncodeUint64`),
    which emits no leading zeros (0 → ``0x0``).
    """
    c = F.col(col) if isinstance(col, str) else col
    trimmed = F.regexp_replace(F.lower(F.hex(c)), "^0+", "")
    return F.concat(F.lit("0x"), F.when(trimmed == "", F.lit("0")).otherwise(trimmed))
