"""JSON-RPC block-fetch connector (SURVEY S2-S4).

The reference fetches chain data over Ethereum JSON-RPC — block by
hash / by number (``app/block/fetch.go:21-57``) and one receipt per
transaction (``fetch.go:62-98``) — with worker-pool concurrency sized
CPUs × factor (``app/config/config.go:24-38``). This connector
reproduces that ingestion edge with stdlib asyncio (no client
libraries): blocks and their receipts fetch concurrently under a
semaphore, and the assembled documents land as newline-JSON in
``normalize.RAW_BLOCK_SCHEMA`` shape — the landing zone
``streaming.ingest.start_ingest_stream`` already consumes.

Scale stance: the fetch edge is a CONNECTOR, not an engine operator —
it runs beside the stream (one process per RPC endpoint), and
everything downstream of the landing zone is Spark. Wire-format
quantities (0x-hex) are decoded here once, so the engine never parses
hex quantities again.
"""

from __future__ import annotations

import asyncio
import json
import os
import uuid
from urllib.parse import urlparse


class RpcError(RuntimeError):
    """JSON-RPC error response, or a block/receipt that does not exist."""


def _qty(v) -> int:
    """0x-hex quantity → int (RPC wire form); ints pass through."""
    return int(v, 16) if isinstance(v, str) else int(v)


def _qty_str(v) -> str:
    """0x-hex quantity → decimal string (uint256-safe storage form)."""
    return str(_qty(v))


def _u64(v) -> int:
    """uint64 quantity → signed int64 (two's complement), the landing
    schema's LongType carrier for PoW nonces ≥ 2^63."""
    x = _qty(v)
    return x - (1 << 64) if x >= 1 << 63 else x


class BlockFetcher:
    """Fetch blocks + receipts over JSON-RPC and land raw documents.

    *concurrency* defaults to ``os.cpu_count() × factor`` — the
    reference's worker-pool sizing (``config.go:24-38``). One semaphore
    bounds ALL in-flight RPC calls (blocks and receipts), matching the
    shared worker-pool behavior rather than a per-block pool.
    """

    def __init__(
        self, url: str, concurrency: int | None = None, factor: int = 1
    ) -> None:
        p = urlparse(url)
        if p.scheme != "http" or not p.hostname:
            raise ValueError(f"unsupported RPC url {url!r} (http only)")
        self.host = p.hostname
        self.port = p.port or 80
        self.path = p.path or "/"
        self.concurrency = concurrency or max(1, (os.cpu_count() or 1) * factor)
        self._sem: asyncio.Semaphore | None = None
        self._id = 0

    # -- transport ---------------------------------------------------------

    async def _call(self, method: str, params: list):
        """One JSON-RPC call over a fresh HTTP/1.1 connection (stdlib
        streams; connection-per-call keeps the client dependency-free —
        a production deployment would pool keep-alive connections)."""
        self._id += 1
        body = json.dumps(
            {"jsonrpc": "2.0", "id": self._id, "method": method, "params": params}
        ).encode()
        req = (
            f"POST {self.path} HTTP/1.1\r\n"
            f"Host: {self.host}:{self.port}\r\n"
            "Content-Type: application/json\r\n"
            f"Content-Length: {len(body)}\r\n"
            "Connection: close\r\n\r\n"
        ).encode() + body
        assert self._sem is not None
        async with self._sem:
            reader, writer = await asyncio.open_connection(self.host, self.port)
            try:
                writer.write(req)
                await writer.drain()
                raw = await reader.read()
            finally:
                writer.close()
                try:
                    await writer.wait_closed()
                except Exception:
                    pass
        head, _, payload = raw.partition(b"\r\n\r\n")
        status = head.split(b" ", 2)[1:2]
        if not status or status[0] != b"200":
            raise RpcError(f"HTTP {status[0].decode() if status else '???'}")
        if b"Transfer-Encoding: chunked" in head:
            payload = _dechunk(payload)
        resp = json.loads(payload)
        if resp.get("error"):
            raise RpcError(str(resp["error"]))
        return resp.get("result")

    # -- document assembly (fetch.go:21-98) --------------------------------

    async def _assemble(self, blk: dict) -> dict:
        """Wire block + per-tx receipts → one RAW_BLOCK_SCHEMA doc."""
        txs = blk.get("transactions") or []
        receipts = await asyncio.gather(
            *[self._call("eth_getTransactionReceipt", [t["hash"]]) for t in txs]
        )
        out_txs = []
        for t, r in zip(txs, receipts):
            if r is None:
                raise RpcError(f"missing receipt for {t['hash']}")
            out_txs.append(
                {
                    "hash": t["hash"],
                    "from": t.get("from"),
                    "to": t.get("to"),
                    "contractAddress": r.get("contractAddress"),
                    "value": _qty_str(t.get("value", "0x0")),
                    "input": t.get("input", "0x"),
                    "gas": _qty(t.get("gas", "0x0")),
                    "gasPrice": _qty_str(t.get("gasPrice", "0x0")),
                    "nonce": _qty(t.get("nonce", "0x0")),
                    "status": _qty(r.get("status", "0x1")),
                    "logs": [
                        {
                            "index": _qty(lg["logIndex"]),
                            "address": lg.get("address"),
                            "topics": list(lg.get("topics") or []),
                            "data": lg.get("data", "0x"),
                        }
                        for lg in (r.get("logs") or [])
                    ],
                }
            )
        return {
            "hash": blk["hash"],
            "number": _qty(blk["number"]),
            "timestamp": _qty(blk["timestamp"]),
            "parentHash": blk.get("parentHash"),
            "difficulty": _qty_str(blk.get("difficulty", "0x0")),
            "gasUsed": _qty(blk.get("gasUsed", "0x0")),
            "gasLimit": _qty(blk.get("gasLimit", "0x0")),
            "nonce": _u64(blk.get("nonce", "0x0")),
            "miner": blk.get("miner"),
            "size": float(_qty(blk.get("size", "0x0"))),
            "stateRoot": blk.get("stateRoot"),
            "sha3Uncles": blk.get("sha3Uncles"),
            "transactionsRoot": blk.get("transactionsRoot"),
            "receiptsRoot": blk.get("receiptsRoot"),
            "extraData": blk.get("extraData", "0x"),
            "transactions": out_txs,
        }

    async def _block_by_number(self, number: int) -> dict:
        blk = await self._call("eth_getBlockByNumber", [hex(number), True])
        if blk is None:
            raise RpcError(f"block {number} not found")
        return await self._assemble(blk)

    async def _block_by_hash(self, block_hash: str) -> dict:
        blk = await self._call("eth_getBlockByHash", [block_hash, True])
        if blk is None:
            raise RpcError(f"block {block_hash} not found")
        return await self._assemble(blk)

    async def _run(self, coros):
        self._sem = asyncio.Semaphore(self.concurrency)
        try:
            return await asyncio.gather(*coros)
        finally:
            self._sem = None

    # -- public sync surface ------------------------------------------------

    def fetch_block_by_number(self, number: int) -> dict:
        """S3: ``eth_getBlockByNumber`` + receipts → raw doc."""
        return asyncio.run(self._run([self._block_by_number(number)]))[0]

    def fetch_block_by_hash(self, block_hash: str) -> dict:
        """S2: ``eth_getBlockByHash`` + receipts → raw doc."""
        return asyncio.run(self._run([self._block_by_hash(block_hash)]))[0]

    def fetch_range(self, frm: int, to: int) -> list[dict]:
        """[frm, to] inclusive, all blocks + receipts concurrently under
        the worker-pool semaphore (the backfill/gap-repair fetch shape,
        ``syncer.go:107-148``)."""
        return asyncio.run(
            self._run([self._block_by_number(n) for n in range(frm, to + 1)])
        )

    def land(self, docs: list[dict], landing_dir: str, name: str | None = None) -> str:
        """Write docs as ONE newline-JSON landing file, atomically
        (tmp + rename): the streaming source never observes a partial
        file. Returns the landed path."""
        os.makedirs(landing_dir, exist_ok=True)
        fname = name or f"fetched-{uuid.uuid4().hex}.json"
        final = os.path.join(landing_dir, fname)
        tmp = final + ".tmp"
        with open(tmp, "w") as f:
            for d in docs:
                f.write(json.dumps(d) + "\n")
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, final)
        return final


def _dechunk(payload: bytes) -> bytes:
    """Minimal HTTP/1.1 chunked-transfer decoder."""
    out = []
    rest = payload
    while rest:
        size_line, _, rest = rest.partition(b"\r\n")
        try:
            size = int(size_line.strip(), 16)
        except ValueError:
            break
        if size == 0:
            break
        out.append(rest[:size])
        rest = rest[size + 2 :]
    return b"".join(out)
