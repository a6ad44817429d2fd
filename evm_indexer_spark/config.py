"""Engine configuration and query guardrails.

Mirrors the reference defaults (``app/config/config.go``): range guards
bound worst-case scan width, which at 100 TB is what keeps interactive
queries aligned with partition pruning (SURVEY §4).
"""

from __future__ import annotations

import os
from dataclasses import dataclass


@dataclass(frozen=True)
class EngineConfig:
    # Max (to - from) width for block-number range queries.
    # app/config/config.go:62-77 (default 100).
    block_range: int = 100
    # Max (to - from) width for block-time range queries, in seconds.
    # app/config/config.go:81-96 (default 3600).
    time_range: int = 3600
    # Max events returned by the last-X top-k query.
    # app/rest/rest.go:612, app/rest/graph/schema.resolvers.go:446.
    max_events_topk: int = 50
    # Finality depth: a block is confirmed once latest - number >= this.
    # app/config/config.go:43-58 (default 0; README example 200).
    block_confirmations: int = 0
    # Backfill chunk size — app/block/syncer.go:65.
    backfill_step: int = 10_000

    @staticmethod
    def from_env() -> "EngineConfig":
        return EngineConfig(
            block_range=int(os.environ.get("EVM_SPARK_BLOCK_RANGE", "100")),
            time_range=int(os.environ.get("EVM_SPARK_TIME_RANGE", "3600")),
            max_events_topk=int(os.environ.get("EVM_SPARK_MAX_EVENTS", "50")),
            block_confirmations=int(os.environ.get("EVM_SPARK_CONFIRMATIONS", "0")),
        )


DEFAULT_CONFIG = EngineConfig()
