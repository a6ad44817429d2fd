"""Subscription layer over the notification streams (SURVEY T8-T10).

The reference fans published block/transaction/event JSON out to
WebSocket clients through per-client filter patterns
(``app/rest/rest.go:762-859``; ``app/pubsub/data.go:28-113``;
``app/pubsub/subscription.go``). Engine-side, each subscription is just
a boolean Column predicate over the corresponding streaming DataFrame —
the delivery transport (WS/Kafka consumer) sits outside Spark.

Replicated exactly:
- the validation regex (``GetRegex``, ``subscription.go:20-28``) —
  including its quirk of accepting any alphanumerics where hex digits
  are expected;
- omitted trailing segments behave as wildcards (``GetLogEventFilters``
  returns empty strings, matched as ``""``/``"*"``,
  ``subscription.go:84-96``);
- duplicate subscribe / unknown unsubscribe rejection and the
  ``{"code": 0|1, "message": ...}`` response shapes
  (``Validate``, ``subscription.go:212-255``; ``data.go:66-110``);
- matching is case-insensitive (``CheckSimilarity``,
  ``subscription.go:141-150``).

Scale note: predicates are plain Catalyst expressions, so N
subscriptions over one stream cost one pass — evaluate them as N
boolean columns in a single ``select`` (``match_columns``) and route on
the result, instead of running N filtered copies of the stream.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.topics import event_subscription_match, tx_subscription_match

# GetRegex, subscription.go:21 — translated verbatim (Go RE2 → Python re).
SUBSCRIPTION_REGEX = re.compile(
    r"^(block|(transaction(/(0x[a-zA-Z0-9]{40}|\*)(/(0x[a-zA-Z0-9]{40}|\*))?)?)"
    r"|(event(/(0x[a-zA-Z0-9]{40}|\*)(/(0x[a-zA-Z0-9]{64}|\*)"
    r"(/(0x[a-zA-Z0-9]{64}|\*)(/(0x[a-zA-Z0-9]{64}|\*)"
    r"(/(0x[a-zA-Z0-9]{64}|\*))?)?)?)?)?))$"
)

TOPICS = ("block", "transaction", "event")


def is_valid_subscription(name: str) -> bool:
    """IsValidTopic, subscription.go:202-209."""
    return bool(SUBSCRIPTION_REGEX.match(name or ""))


def root_topic(name: str) -> str:
    """Topic(), subscription.go:31-46 — prefix-based root extraction."""
    for t in TOPICS:
        if name.startswith(t):
            return t
    return ""


def parse_filters(name: str) -> tuple[str, list[str]]:
    """(root, filter segments) with omitted trailing segments as ``"*"``.

    transaction → [from, to] (GetTransactionFilters, subscription.go:129-137);
    event → [contract, topic0..topic3] (GetLogEventFilters,
    subscription.go:56-64). The reference leaves missing groups as empty
    strings and treats ""/"*" identically at match time — we normalize
    to "*" here once.
    """
    if not is_valid_subscription(name):
        raise ValueError(f"invalid subscription name: {name!r}")
    root = root_topic(name)
    if root == "block":
        return root, []
    parts = name.split("/")[1:]
    want = 2 if root == "transaction" else 5
    segs = [p if p else "*" for p in parts] + ["*"] * (want - len(parts))
    return root, segs


def subscription_predicate(name: str) -> Column:
    """The T9/T10 filter expression for one subscription name, against the
    matching entity stream's columns."""
    root, segs = parse_filters(name)
    if root == "block":
        return F.lit(True)
    if root == "transaction":
        return tx_subscription_match("from", "to", segs[0], segs[1])
    return event_subscription_match("origin", "topics", segs)


@dataclass
class SubscriptionManager:
    """Per-client registry mirroring ps.SubscriptionManager semantics.

    Tracks subscriptions per root topic (≤3 roots — one consumer per
    root, ``data.go:41-75``) and builds the combined per-root predicate.
    """

    topics: dict[str, dict[str, bool]] = field(default_factory=dict)

    def subscribe(self, name: str) -> dict[str, object]:
        if not is_valid_subscription(name) or name in self.topics.get(
            root_topic(name), {}
        ):
            return {"code": 0, "message": "Bad Payload"}
        self.topics.setdefault(root_topic(name), {})[name] = True
        return {"code": 1, "message": f"Subscribed to `{root_topic(name)}`"}

    def unsubscribe(self, name: str) -> dict[str, object]:
        if not is_valid_subscription(name) or name not in self.topics.get(
            root_topic(name), {}
        ):
            return {"code": 0, "message": "Bad Payload"}
        del self.topics[root_topic(name)][name]
        if not self.topics[root_topic(name)]:
            del self.topics[root_topic(name)]
        return {"code": 1, "message": f"Unsubscribed from `{root_topic(name)}`"}

    # -- engine-side stream shaping ----------------------------------------

    def match_columns(self, root: str, stream: DataFrame) -> DataFrame:
        """One boolean column per active subscription of *root*, evaluated
        in a single pass over the stream (no per-subscription copies)."""
        out = stream
        for i, name in enumerate(sorted(self.topics.get(root, {}))):
            out = out.withColumn(f"_sub{i}", subscription_predicate(name))
        return out

    def filtered(self, root: str, stream: DataFrame) -> DataFrame:
        """Rows any active subscription of *root* wants (delivery set)."""
        subs = sorted(self.topics.get(root, {}))
        if not subs:
            return stream.limit(0)
        pred = subscription_predicate(subs[0])
        for name in subs[1:]:
            pred = pred | subscription_predicate(name)
        return stream.filter(pred)
