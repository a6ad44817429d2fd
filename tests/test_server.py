"""End-to-end HTTP/WS transport tests: real sockets against the stdlib
server wrapping RestFacade + GraphQLResolvers, status codes matching the
gin branches in app/rest/rest.go."""

from __future__ import annotations

import base64
import hashlib
import json
import socket
import struct
import threading

import pytest

from evm_indexer_spark.api import RestFacade
from evm_indexer_spark.graphql import GraphQLResolvers
from evm_indexer_spark.operators.historical import HistoricalQueries
from evm_indexer_spark.server import make_server
from evm_indexer_spark.sources.fixtures import block_hash


@pytest.fixture(scope="module")
def srv(evm):
    q = HistoricalQueries(evm["blocks"], evm["transactions"], evm["events"])
    server = make_server(
        RestFacade(q),
        GraphQLResolvers(q),
        status=lambda: (9, 4.2),
    )
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield server.server_address
    server.shutdown()


def _get(addr, path):
    import http.client

    conn = http.client.HTTPConnection(*addr, timeout=60)
    conn.request("GET", path)
    r = conn.getresponse()
    body = r.read()
    conn.close()
    return r.status, json.loads(body) if body.startswith(b"{") else body


def _post(addr, path, doc):
    import http.client

    conn = http.client.HTTPConnection(*addr, timeout=60)
    conn.request(
        "POST", path, json.dumps(doc), {"Content-Type": "application/json"}
    )
    r = conn.getresponse()
    out = r.status, json.loads(r.read())
    conn.close()
    return out


def test_synced(srv):
    code, body = _get(srv, "/v1/synced")
    assert code == 200
    assert set(body) == {"synced", "processed", "elapsed", "eta"}


def test_block_by_number(srv):
    code, body = _get(srv, "/v1/block?number=3")
    assert code == 200 and body["number"] == 3


def test_block_by_hash_with_txs(srv):
    code, body = _get(srv, f"/v1/block?hash={block_hash(2)}&tx=yes")
    assert code == 200 and "transactions" in body


def test_bad_number_is_400(srv):
    code, body = _get(srv, "/v1/block?number=+5")
    assert code == 400 and body == {"msg": "Bad block number"}


def test_no_params_is_400(srv):
    code, body = _get(srv, "/v1/block")
    assert code == 400 and body == {"msg": "Bad query param(s)"}


def test_missing_block_is_404(srv):
    code, body = _get(srv, "/v1/block?number=99999")
    assert code == 404 and body == {"msg": "Not found"}


def test_unknown_route_is_404(srv):
    code, body = _get(srv, "/v1/nope")
    assert code == 404


def test_transaction_range(srv):
    code, body = _get(srv, "/v1/transaction?fromBlock=0&toBlock=5")
    assert code == 400 or "transactions" in body


def test_event_by_block_hash(srv):
    code, body = _get(srv, f"/v1/event?blockHash={block_hash(2)}")
    assert code in (200, 404)


def test_graphql_block_by_number(srv):
    code, body = _post(
        srv,
        "/v1/graphql",
        {"query": '{ blockByNumber(number: "3") { hash number } }'},
    )
    assert code == 200
    data = body["data"]["blockByNumber"]
    assert data["number"] == "3" and set(data) == {"hash", "number"}


def test_graphql_range_query(srv):
    code, body = _post(
        srv,
        "/v1/graphql",
        {"query": '{ blocksByNumberRange(from: "0", to: "4") { number } }'},
    )
    assert code == 200
    assert [b["number"] for b in body["data"]["blocksByNumberRange"]] == [
        "0", "1", "2", "3", "4",
    ]


def test_graphql_error_envelope(srv):
    code, body = _post(
        srv, "/v1/graphql", {"query": '{ blockByNumber(number: "zzz") { hash } }'}
    )
    assert code == 200 and body["errors"]


def test_graphql_unknown_field(srv):
    code, body = _post(srv, "/v1/graphql", {"query": "{ nosuchField { x } }"})
    assert code == 200 and "unknown field" in body["errors"][0]["message"]


def test_graphql_playground(srv):
    code, body = _get(srv, "/v1/graphql")
    assert code == 200 and b"GraphQL" in body


# -- WebSocket subscribe/unsubscribe protocol -------------------------------


def _ws_connect(addr):
    s = socket.create_connection(addr, timeout=60)
    key = base64.b64encode(b"0123456789abcdef").decode()
    s.sendall(
        (
            f"GET /v1/ws HTTP/1.1\r\nHost: {addr[0]}\r\nUpgrade: websocket\r\n"
            f"Connection: Upgrade\r\nSec-WebSocket-Key: {key}\r\n"
            "Sec-WebSocket-Version: 13\r\n\r\n"
        ).encode()
    )
    head = b""
    while b"\r\n\r\n" not in head:
        head += s.recv(1024)
    assert b"101" in head.split(b"\r\n", 1)[0]
    expect = base64.b64encode(
        hashlib.sha1(
            (key + "258EAFA5-E914-47DA-95CA-C5AB0DC85B11").encode()
        ).digest()
    )
    assert expect in head
    return s


def _ws_send(s, obj):
    payload = json.dumps(obj).encode()
    mask = b"\x11\x22\x33\x44"
    masked = bytes(b ^ mask[i % 4] for i, b in enumerate(payload))
    s.sendall(b"\x81" + bytes([0x80 | len(payload)]) + mask + masked)


def _ws_recv(s):
    head = s.recv(2)
    length = head[1] & 0x7F
    if length == 126:
        length = struct.unpack(">H", s.recv(2))[0]
    buf = b""
    while len(buf) < length:
        buf += s.recv(length - len(buf))
    return json.loads(buf)


def test_ws_subscription_protocol(srv):
    s = _ws_connect(srv)
    _ws_send(s, {"name": "block", "type": "subscribe"})
    assert _ws_recv(s) == {"code": 1, "message": "Subscribed to `block`"}
    # duplicate subscribe → Bad Payload (data.go one-consumer-per-root)
    _ws_send(s, {"name": "block", "type": "subscribe"})
    assert _ws_recv(s) == {"code": 0, "message": "Bad Payload"}
    _ws_send(s, {"name": "block", "type": "unsubscribe"})
    assert _ws_recv(s) == {"code": 1, "message": "Unsubscribed from `block`"}
    _ws_send(s, {"name": "???", "type": "subscribe"})
    assert _ws_recv(s) == {"code": 0, "message": "Bad Payload"}
    # close frame
    s.sendall(b"\x88\x80\x00\x00\x00\x00")
    s.close()


def test_graphql_two_field_document_with_variables(srv):
    """The reference playground shape: a named operation, two top-level
    fields (one aliased), variables, and a fragment — executed verbatim
    (round-4 executor; the round-3 one rejected multi-field documents)."""
    doc = """
    query Demo($n: String!, $lo: String! = "0", $hi: String!) {
      pinned: blockByNumber(number: $n) { ...bits }
      blocksByNumberRange(from: $lo, to: $hi) { number }
    }
    fragment bits on Block { hash number }
    """
    code, body = _post(
        srv,
        "/v1/graphql",
        {"query": doc, "variables": {"n": "3", "hi": "2"}},
    )
    assert code == 200 and "errors" not in body
    assert body["data"]["pinned"]["number"] == "3"
    assert set(body["data"]["pinned"]) == {"hash", "number"}
    assert [b["number"] for b in body["data"]["blocksByNumberRange"]] == [
        "0", "1", "2",
    ]


def test_graphql_variables_and_operation_name_route(srv):
    doc = """
    query A { blockByNumber(number: "1") { number } }
    query B { blockByNumber(number: "2") { number } }
    """
    code, body = _post(
        srv, "/v1/graphql", {"query": doc, "operationName": "B"}
    )
    assert code == 200
    assert body["data"]["blockByNumber"]["number"] == "2"


def test_graphql_non_string_query_is_400(srv):
    for bad in [{"query": {"a": 1}}, {"query": 7}, {"query": ["x"]}, [1, 2]]:
        code, body = _post(srv, "/v1/graphql", bad)
        assert code == 400, bad
        assert body == {"msg": "Bad request body"}


def test_graphql_non_dict_variables_is_400(srv):
    code, body = _post(
        srv, "/v1/graphql", {"query": "{ __typename }", "variables": [1]}
    )
    assert code == 400
    assert body == {"msg": "Bad request body"}


def test_graphql_playground_route_parity(srv):
    """rest.go:887 serves the playground at /v1/graphql-playground; the
    page must be interactive HTML wired to POST /v1/graphql."""
    for route in ("/v1/graphql-playground", "/v1/graphql"):
        code, body = _get(srv, route)
        assert code == 200
        text = body.decode()
        assert "<html" in text and "/v1/graphql" in text and "fetch(" in text
