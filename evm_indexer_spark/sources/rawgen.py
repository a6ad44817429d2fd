"""Synthetic raw-block landing-doc generator for ingest benchmarks and
streaming tests: deterministic nested JSON documents in
``normalize.RAW_BLOCK_SCHEMA`` shape (3 txs × 2 logs per block —
comparable to the reference's demo-scope chain)."""

from __future__ import annotations

import json
import os


def raw_block_doc(n: int) -> dict:
    return {
        "hash": f"0x{n:064x}",
        "number": n,
        "timestamp": 1_700_000_000 + 12 * n,
        "parentHash": f"0x{n - 1:064x}",
        "difficulty": "58750003716598352816469",
        "gasUsed": 12_345_678,
        "gasLimit": 30_000_000,
        "nonce": n * 7919,
        "miner": f"0x{n % 97:040x}",
        "size": 54321.0,
        "stateRoot": "0x" + "ab" * 32,
        "sha3Uncles": "0x" + "cd" * 32,
        "transactionsRoot": "0x" + "ef" * 32,
        "receiptsRoot": "0x" + "01" * 32,
        "extraData": "0x646574686572",
        "transactions": [
            {
                "hash": f"0x{n:032x}{t:032x}",
                "from": f"0x{(n + t) % 1000:040x}",
                "to": None if (n + t) % 20 == 0 else f"0x{(n * 3 + t) % 1000:040x}",
                "contractAddress": f"0x{n:040x}" if (n + t) % 20 == 0 else None,
                "value": "1000000000000000000",
                "input": "0xa9059cbb" + "00" * 64,
                "gas": 21000 + t,
                "gasPrice": "25000000000",
                "nonce": n * 3 + t,
                "status": 1,
                "logs": [
                    {
                        "index": t * 2 + lg,
                        "address": f"0x{lg:040x}",
                        "topics": ["0x" + "dd" * 32, f"0x{n + lg:064x}"],
                        "data": "0x" + "00" * 32,
                    }
                    for lg in range(2)
                ],
            }
            for t in range(3)
        ],
    }


def write_landing_files(
    landing_dir: str, n_blocks: int, n_files: int = 8, start: int = 0
) -> None:
    """Write *n_blocks* docs as newline-JSON across *n_files* chunks."""
    os.makedirs(landing_dir, exist_ok=True)
    per = max(1, n_blocks // n_files)
    for i in range(n_files):
        lo, hi = i * per, min((i + 1) * per, n_blocks)
        if lo >= hi:
            break
        with open(os.path.join(landing_dir, f"chunk{i}.json"), "w") as f:
            for n in range(start + lo, start + hi):
                f.write(json.dumps(raw_block_doc(n)) + "\n")
