#!/usr/bin/env python3
"""Generate a 10x (sf1.0-equivalent) copy of /root/testdata/sf0.1 for the
round-9 scaling audit (VERDICT r8 item 4). The driver ships sf{0.001,0.01,
0.1} only; this derives sf1.0 under target/ (not committed) so the heavy
queries' scaling exponents can be MEASURED instead of argued.

Method (documented in PERF.md):
- region/nation: fixed-size dims, copied as-is (the TPC-H scaling rule).
- customer/supplier/part/orders/lineitem/events/embeddings: 10 replicas
  with disjoint key ranges (stride = next power of 10 >= max+1) so
  referential integrity and join fan-ins scale like a native 10x corpus
  (nations keep 10x the customers, orders keep their lineitems, etc.).
- documents: replica texts are RESAMPLED from the corpus vocabulary
  (per-doc length preserved, global word frequencies preserved, seeded
  per (copy, doc)) instead of duplicated — verbatim copies would plant
  5 000 artificial 10-way exact/near-duplicate groups and quadratically
  inflate every dedup query's candidate pairs, which is not what a
  natural 10x corpus looks like.
- embeddings: replica vectors get small seeded Gaussian noise (sigma =
  0.01) for the same reason: exact vector duplicates are not a natural
  10x corpus.
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/target/sf1.0"
COPIES = 10


def stride_for(maxval):
    s = 1
    while s <= maxval:
        s *= 10
    return s


def replicate(name, key_cols, int32_keys=()):
    t = pq.read_table(f"{SRC}/{name}.parquet")
    strides = {c: stride_for(max(t.column(c).to_pylist())) for c in key_cols}
    chunks = []
    for i in range(COPIES):
        cols = {}
        for field in t.schema:
            col = t.column(field.name)
            if field.name in key_cols:
                arr = np.asarray(col.to_pylist(), dtype=np.int64) + i * strides[field.name]
                cols[field.name] = pa.array(arr, type=field.type)
            else:
                cols[field.name] = col.combine_chunks()
        chunks.append(pa.table(cols, schema=t.schema))
    out = pa.concat_tables(chunks)
    pq.write_table(out, f"{DST}/{name}.parquet")
    print(f"{name}: {t.num_rows} -> {out.num_rows}")


def documents():
    t = pq.read_table(f"{SRC}/documents.parquet")
    doc_ids = np.asarray(t.column("doc_id").to_pylist(), dtype=np.int64)
    texts = t.column("text").to_pylist()
    langs = t.column("lang").to_pylist()
    sources = t.column("source").to_pylist()
    stride = stride_for(doc_ids.max())
    vocab = np.array(" ".join(texts).split())
    rng0 = np.random.default_rng(9)
    chunks = [t]
    for i in range(1, COPIES):
        rng = np.random.default_rng(1000 * i + 9)
        new_texts = []
        for txt in texts:
            n = len(txt.split())
            new_texts.append(" ".join(rng.choice(vocab, size=max(n, 1))))
        chunks.append(pa.table({
            "doc_id": pa.array(doc_ids + i * stride, type=pa.int64()),
            "text": pa.array(new_texts),
            "lang": pa.array(langs),
            "source": pa.array(sources),
            "n_chars": pa.array([len(s) for s in new_texts], type=pa.int64()),
        }, schema=t.schema))
    out = pa.concat_tables(chunks)
    pq.write_table(out, f"{DST}/documents.parquet")
    print(f"documents: {t.num_rows} -> {out.num_rows}")
    _ = rng0  # seed anchor documented above


def embeddings():
    t = pq.read_table(f"{SRC}/embeddings.parquet")
    vec_ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    vecs = np.asarray(t.column("embedding").to_pylist(), dtype=np.float32)
    labels = t.column("label").combine_chunks()
    stride = stride_for(vec_ids.max())
    chunks = [t]
    for i in range(1, COPIES):
        rng = np.random.default_rng(2000 * i + 9)
        noisy = vecs + rng.normal(0, 0.01, vecs.shape).astype(np.float32)
        chunks.append(pa.table({
            "vec_id": pa.array(vec_ids + i * stride, type=pa.int64()),
            "embedding": pa.array(noisy.tolist(), type=t.schema.field("embedding").type),
            "label": labels,
        }, schema=t.schema))
    out = pa.concat_tables(chunks)
    pq.write_table(out, f"{DST}/embeddings.parquet")
    print(f"embeddings: {t.num_rows} -> {out.num_rows}")


def main():
    os.makedirs(DST, exist_ok=True)
    for name in ("region", "nation"):
        t = pq.read_table(f"{SRC}/{name}.parquet")
        pq.write_table(t, f"{DST}/{name}.parquet")
        print(f"{name}: copied ({t.num_rows})")
    replicate("customer", ["c_custkey"])
    replicate("supplier", ["s_suppkey"])
    replicate("part", ["p_partkey"])
    replicate("orders", ["o_orderkey", "o_custkey"])
    replicate("lineitem", ["l_orderkey", "l_partkey", "l_suppkey"])
    replicate("events", ["event_id"])
    documents()
    embeddings()


if __name__ == "__main__":
    main()
