#!/usr/bin/env python
"""Build a larger LOCAL scale factor from the driver's sf0.1 tables.

Measurement tool only (r12 verdict item 1: at sf0.1 every one of the 55
bench queries is dispatch-bound — 8-vs-32-core ratios 0.45-1.77 against an
ideal of ~4 — so sf0.1 floors rank job count, not data work).  This tool
tiles the read-only /root/testdata/sf0.1 tables into /root/sfgen/sf<X>
with `shards = 10*X` deterministic shards so that per-query rankings at
the bigger SF reflect data-bound cost.  It never touches /root/testdata,
the bench contract (bench.py still reads $SPARK_GRAFT_SF_DIR), or any
query result the driver checks (the driver benches at sf0.1; correctness
runs at sf0.01).

Scaling rules (shard 0 is the identity copy, so sf0.1 is a subset):

- every int64 id column gets `+ shard * 10_000_000` (one GLOBAL stride —
  dense ids top out at 600k — so referential integrity between
  lineitem/orders/customer/supplier/part/events survives untouched);
- dimension tables (nation, region) are NOT scaled, like TPC-H;
- documents: per-shard deterministic vocabulary remap (about half of the
  words get a shard suffix, chosen by a seeded hash of (word, shard)).
  Within-shard duplicate/near-duplicate structure is preserved exactly
  (the remap is a bijection per shard); across shards the 3-gram shingle
  overlap collapses (~0.5**3), so near-dup candidate volume grows ~10x
  linearly instead of quadratically — duplicating text verbatim would
  have made every doc a 10-way exact duplicate and turned the dedup
  benchmarks into a different (and unrealistically hostile) workload;
- embeddings: per-shard deterministic perturbation (seeded N(0, 0.05)
  per component) so ANN structure stays (10 label clusters) without 10
  exact copies of every vector;
- events: ids/user ids strided, timestamps kept — 10x event density in
  the same 30-day window, which is how real traffic scales.

Usage: python tools/make_sf.py [X] [outdir]   (default X=1 → 10 shards)
"""

from __future__ import annotations

import hashlib
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
STRIDE = 10_000_000

ID_COLS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_ONLY = ["nation", "region"]


def _remap_word(word: str, shard: int) -> str:
    h = hashlib.md5(f"{word}:{shard}".encode()).digest()[0]
    return f"{word}{shard}" if h % 2 == 0 else word


def shard_table(name: str, tab: pa.Table, shard: int) -> pa.Table:
    if shard == 0:
        return tab
    cols = {}
    for i, cname in enumerate(tab.schema.names):
        col = tab.column(i)
        if cname in ID_COLS.get(name, []):
            col = pc.add(col, pa.scalar(shard * STRIDE, type=col.type))
        elif name == "documents" and cname == "text":
            vocab = {}
            texts = col.to_pylist()
            out = []
            for t in texts:
                words = t.split(" ")
                for w in set(words):
                    if w not in vocab:
                        vocab[w] = _remap_word(w, shard)
                out.append(" ".join(vocab[w] for w in words))
            col = pa.array(out, type=pa.string())
        elif name == "embeddings" and cname == "embedding":
            flat = np.asarray(col.combine_chunks().flatten(), dtype=np.float32)
            rng = np.random.default_rng(42 + shard)
            noisy = flat + rng.normal(0.0, 0.05, size=flat.shape).astype(np.float32)
            offs = col.combine_chunks().offsets
            col = pa.ListArray.from_arrays(offs, pa.array(noisy, type=pa.float32()))
        cols[cname] = col
    return pa.table(cols, schema=tab.schema) if all(
        cols[n].type == tab.schema.field(n).type for n in tab.schema.names
    ) else pa.table(cols)


def main() -> None:
    x = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    shards = max(1, round(10 * x))
    out = sys.argv[2] if len(sys.argv) > 2 else f"/root/sfgen/sf{x:g}"
    os.makedirs(out, exist_ok=True)
    for name in COPY_ONLY:
        tab = pq.read_table(f"{SRC}/{name}.parquet")
        pq.write_table(tab, f"{out}/{name}.parquet")
        print(f"{name}: {tab.num_rows} (copied)")
    for name in ID_COLS:
        tab = pq.read_table(f"{SRC}/{name}.parquet")
        parts = [shard_table(name, tab, s) for s in range(shards)]
        big = pa.concat_tables(parts)
        pq.write_table(big, f"{out}/{name}.parquet", row_group_size=1_000_000)
        print(f"{name}: {tab.num_rows} -> {big.num_rows}")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
