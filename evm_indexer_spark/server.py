"""Thin stdlib HTTP/WebSocket transport over the engine facades.

The reference serves gin REST routes (``app/rest/rest.go:69-887``), a
WebSocket subscription endpoint (``rest.go:762-859``) and GraphQL
(``rest.go:861-887``). The repo's ``RestFacade`` and ``GraphQLResolvers``
already replicate the full dispatch/validation/JSON semantics; this
module only binds them to sockets — no third-party web framework, just
``http.server`` plus a minimal RFC 6455 handshake for ``/v1/ws``.

Route → handler parity (status codes match the gin branches):

- ``GET /v1/synced``                → ``RestFacade.synced``      (200)
- ``GET /v1/block|transaction|event`` → facade methods; 400 on
  ``ValidationError`` (gin ``StatusBadRequest`` branches), 404 on
  ``NotFoundError`` (``{"msg": "Not found"}``), 200 otherwise
- ``POST /v1/graphql``              → resolver execution, 200 with a
  GraphQL ``{"data": ...}`` / ``{"errors": [...]}`` envelope
- ``GET /v1/graphql``               → interactive playground console
- ``GET /v1/ws`` (Upgrade)          → subscribe/unsubscribe protocol via
  ``SubscriptionManager`` (``{"code": 0|1, "message": ...}`` payloads,
  ``app/pubsub/pubsub.go`` semantics)

GraphQL documents are executed by :mod:`evm_indexer_spark.gqlexec` — a
spec-conformant query executor (multi-field documents, aliases, nested
selections, fragments, variables, ``@skip``/``@include``), matching the
gqlgen executor the reference generates
(``app/rest/graph/generated/generated.go``).
"""

from __future__ import annotations

import base64
import hashlib
import json
import struct
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Callable
from urllib.parse import parse_qs, urlparse

from .api import RestFacade
from .errors import NotFoundError, ValidationError
from .gqlexec import GraphQLExecutor
from .graphql import GraphQLResolvers
from .streaming.subscribe import SubscriptionManager

_WS_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"

# Parity with rest.go:887-899 (gqlgen playground.Handler("validationcloud",
# "/v1/graphql")): an interactive console served beside the endpoint. The
# reference's page bootstraps graphql-playground-react from a CDN; this
# one is self-contained (works in an offline deployment) but serves the
# same purpose — compose a query, POST it to /v1/graphql, read the JSON.
_PLAYGROUND = b"""<!DOCTYPE html><html><head><title>GraphQL playground</title>
<style>
 body{font-family:monospace;margin:1.5em;background:#1e2228;color:#d8dee9}
 textarea{width:100%;height:14em;background:#11141a;color:#d8dee9;
          border:1px solid #3b4252;padding:.6em;box-sizing:border-box}
 pre{background:#11141a;border:1px solid #3b4252;padding:.6em;
     white-space:pre-wrap;min-height:8em}
 button{padding:.4em 1.4em;margin:.6em 0}
 h1{font-size:1.1em}
</style></head><body>
<h1>GraphQL playground &mdash; POST /v1/graphql</h1>
<textarea id="q">{ blockByNumber(number: "1") { hash number miner } }</textarea>
<div><label>variables (JSON): <input id="v" size="48" value="{}"></label></div>
<button onclick="run()">Run &#9654;</button>
<pre id="out">&nbsp;</pre>
<script>
async function run(){
  const out = document.getElementById('out');
  let vars = {};
  try { vars = JSON.parse(document.getElementById('v').value || '{}'); }
  catch (e) { out.textContent = 'bad variables JSON: ' + e; return; }
  try {
    const r = await fetch('/v1/graphql', {method:'POST',
      headers:{'Content-Type':'application/json'},
      body: JSON.stringify({query: document.getElementById('q').value,
                            variables: vars})});
    out.textContent = JSON.stringify(await r.json(), null, 2);
  } catch (e) { out.textContent = String(e); }
}
</script></body></html>"""


def _ws_accept_key(key: str) -> str:
    digest = hashlib.sha1((key + _WS_GUID).encode()).digest()
    return base64.b64encode(digest).decode()


def _ws_read_frame(rfile) -> tuple[int, bytes] | None:
    """One client frame → (opcode, payload); None on close/EOF."""
    head = rfile.read(2)
    if len(head) < 2:
        return None
    opcode = head[0] & 0x0F
    masked = head[1] & 0x80
    length = head[1] & 0x7F
    if length == 126:
        length = struct.unpack(">H", rfile.read(2))[0]
    elif length == 127:
        length = struct.unpack(">Q", rfile.read(8))[0]
    mask = rfile.read(4) if masked else b"\x00" * 4
    payload = rfile.read(length)
    if masked:
        payload = bytes(b ^ mask[i % 4] for i, b in enumerate(payload))
    if opcode == 0x8:  # close
        return None
    return opcode, payload


def _ws_send_text(wfile, payload: bytes) -> None:
    header = b"\x81"  # FIN + text
    n = len(payload)
    if n < 126:
        header += bytes([n])
    elif n < 1 << 16:
        header += bytes([126]) + struct.pack(">H", n)
    else:
        header += bytes([127]) + struct.pack(">Q", n)
    wfile.write(header + payload)
    wfile.flush()


def make_server(
    facade: RestFacade,
    resolvers: GraphQLResolvers | None = None,
    status: Callable[[], tuple[int, float]] | None = None,
    host: str = "127.0.0.1",
    port: int = 0,
) -> ThreadingHTTPServer:
    """Build (not start) the HTTP server; ``serve_forever()`` to run.

    *status* supplies ``(latest_block_number, elapsed_seconds)`` for
    ``/v1/synced`` — the reference reads the same pair from its
    ``StatusHolder``.
    """
    gql = GraphQLExecutor(resolvers) if resolvers is not None else None
    get_status = status or (lambda: (0, 0.0))

    class Handler(BaseHTTPRequestHandler):
        # one SubscriptionManager per connected WS client, like the
        # reference's per-client ps.SubscriptionManager
        def log_message(self, fmt, *args):  # quiet test output
            pass

        def _json(self, code: int, payload: dict[str, Any]) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _dispatch(self, fn: Callable[[], dict[str, Any]]) -> None:
            try:
                self._json(200, fn())
            except NotFoundError:
                self._json(404, {"msg": "Not found"})
            except ValidationError as e:
                self._json(400, {"msg": str(e)})

        def do_GET(self) -> None:  # noqa: N802 (stdlib API)
            url = urlparse(self.path)
            params = {k: v[0] for k, v in parse_qs(url.query).items()}
            route = url.path.rstrip("/")
            if route == "/v1/ws" and "websocket" in self.headers.get(
                "Upgrade", ""
            ).lower():
                return self._websocket()
            if route == "/v1/synced":
                latest, elapsed = get_status()
                return self._dispatch(lambda: facade.synced(latest, elapsed))
            if route == "/v1/block":
                return self._dispatch(lambda: facade.block(params))
            if route == "/v1/transaction":
                return self._dispatch(lambda: facade.transaction(params))
            if route == "/v1/event":
                return self._dispatch(lambda: facade.event(params))
            if route in ("/v1/graphql", "/v1/graphql-playground"):
                # /v1/graphql-playground is the reference's route
                # (rest.go:887); GET on the endpoint itself serves the
                # same page as a convenience
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.send_header("Content-Length", str(len(_PLAYGROUND)))
                self.end_headers()
                self.wfile.write(_PLAYGROUND)
                return
            self._json(404, {"msg": "Not found"})

        def do_POST(self) -> None:  # noqa: N802
            url = urlparse(self.path)
            if url.path.rstrip("/") != "/v1/graphql" or gql is None:
                return self._json(404, {"msg": "Not found"})
            length = int(self.headers.get("Content-Length", "0"))
            try:
                doc = json.loads(self.rfile.read(length) or b"{}")
            except json.JSONDecodeError:
                return self._json(400, {"msg": "Bad request body"})
            query = doc.get("query", "") if isinstance(doc, dict) else None
            variables = doc.get("variables") or {} if isinstance(doc, dict) else None
            op_name = doc.get("operationName") if isinstance(doc, dict) else None
            if (
                not isinstance(query, str)
                or not isinstance(variables, dict)
                or not (op_name is None or isinstance(op_name, str))
            ):
                return self._json(400, {"msg": "Bad request body"})
            self._json(
                200,
                gql.execute(query, variables=variables, operation_name=op_name),
            )

        def _websocket(self) -> None:
            key = self.headers.get("Sec-WebSocket-Key", "")
            if not key:
                return self._json(400, {"msg": "Bad handshake"})
            self.send_response(101, "Switching Protocols")
            self.send_header("Upgrade", "websocket")
            self.send_header("Connection", "Upgrade")
            self.send_header("Sec-WebSocket-Accept", _ws_accept_key(key))
            self.end_headers()
            subs = SubscriptionManager()
            while True:
                frame = _ws_read_frame(self.rfile)
                if frame is None:
                    break
                opcode, payload = frame
                if opcode == 0x9:  # ping → pong
                    self.wfile.write(b"\x8a" + bytes([len(payload)]) + payload)
                    continue
                try:
                    req = json.loads(payload.decode())
                except (UnicodeDecodeError, json.JSONDecodeError):
                    resp = {"code": 0, "message": "Bad Payload"}
                else:
                    name = req.get("name", "")
                    if req.get("type") == "subscribe":
                        resp = subs.subscribe(name)
                    elif req.get("type") == "unsubscribe":
                        resp = subs.unsubscribe(name)
                    else:
                        resp = {"code": 0, "message": "Bad Payload"}
                _ws_send_text(self.wfile, json.dumps(resp).encode())
            self.close_connection = True

    return ThreadingHTTPServer((host, port), Handler)
