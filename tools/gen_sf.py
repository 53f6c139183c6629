#!/usr/bin/env python3
"""Deterministic 10x scale-up of the driver's sf0.1 testdata -> sf1.

Usage: python3 tools/gen_sf.py [srcDir] [dstDir] [copies]
Defaults: /root/testdata/sf0.1 /tmp/graft_sf1 10

Methodology (TPC-style replication with per-copy orthogonalization):
each table is the union of `copies` transformed copies of the source,
copy 0 being the identity. The transforms are chosen so every operator
family's work scales LINEARLY in the copy count — naive replication
would plant cross-copy near-duplicates and co-located points, making
every similarity/dedup/spatial operator quadratically heavier BY
CONSTRUCTION and poisoning the scaling measurement:

- Key columns shift by a per-copy offset (disjoint id spaces; offsets
  stay far below the 1e9 mutant-id offsets used by j8/j9).
- `events.ts` shifts by copy * 32 days: each copy is a disjoint time
  epoch, so windows, sessions, as-of/range joins, and the (cell,
  time-bucket) spatial joins never pair rows across copies.
- `documents.text` and `customer.c_name` letters are Caesar-shifted by
  the copy index (digits/punctuation untouched): within-copy duplicate
  and near-duplicate structure is preserved EXACTLY (a character
  bijection commutes with equality, shingling, and edit distance), but
  cross-copy token sets are disjoint, so MinHash/Jaccard/SimHash/BPE and
  the c_name fuzzy join stay linear. Text length is preserved, keeping
  n_chars consistent.
- `embeddings.embedding` dimensions are cyclically rotated by 7*copy
  (mod 64): a shared permutation preserves all within-copy dot products
  exactly, while cross-copy cosines scatter like random directions — the
  ANN/near-dup corpus grows 10x without planting 10x duplicate matches.
- region/nation are fixed dimensions and stay single-copy.

Everything is reproducible (no RNG anywhere) and physical parquet types
are preserved bit-exactly via pyarrow (events.ts keeps the source file's
timestamp unit — ns in the original driver generation, us since 2026-08;
the engine's readers adapt to either, see Tbl.eventsTsType).
"""
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1"
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 10

EPOCH_DAYS = 32  # > the 30-day event span: disjoint epochs


def caesar(s, k):
    if s is None:
        return None
    k %= 26
    lo = "abcdefghijklmnopqrstuvwxyz"
    hi = lo.upper()
    tbl = str.maketrans(lo + hi, lo[k:] + lo[:k] + hi[k:] + hi[:k])
    return s.translate(tbl)


def shifted(col, off):
    return pc.add(col, pa.scalar(off, type=col.type))


def write(name, tables):
    out = pa.concat_tables(tables)
    pq.write_table(out, f"{DST}/{name}.parquet")
    print(f"{name}: {out.num_rows} rows")


def main():
    import os
    os.makedirs(DST, exist_ok=True)

    for t in ("region", "nation"):
        pq.write_table(pq.read_table(f"{SRC}/{t}.parquet"), f"{DST}/{t}.parquet")
        print(f"{t}: copied")

    cust = pq.read_table(f"{SRC}/customer.parquet")
    copies = []
    for i in range(COPIES):
        names = pa.array([caesar(v, i) for v in cust["c_name"].to_pylist()],
                         type=cust.schema.field("c_name").type)
        copies.append(cust.set_column(
            cust.schema.get_field_index("c_custkey"), cust.schema.field("c_custkey"),
            shifted(cust["c_custkey"], i * 1000000)
        ).set_column(
            cust.schema.get_field_index("c_name"), cust.schema.field("c_name"), names))
    write("customer", copies)

    supp = pq.read_table(f"{SRC}/supplier.parquet")
    write("supplier", [
        supp.set_column(supp.schema.get_field_index("s_suppkey"),
                        supp.schema.field("s_suppkey"),
                        shifted(supp["s_suppkey"], i * 100000))
        for i in range(COPIES)])

    part = pq.read_table(f"{SRC}/part.parquet")
    write("part", [
        part.set_column(part.schema.get_field_index("p_partkey"),
                        part.schema.field("p_partkey"),
                        shifted(part["p_partkey"], i * 1000000))
        for i in range(COPIES)])

    orders = pq.read_table(f"{SRC}/orders.parquet")
    write("orders", [
        orders.set_column(orders.schema.get_field_index("o_orderkey"),
                          orders.schema.field("o_orderkey"),
                          shifted(orders["o_orderkey"], i * 10000000))
               .set_column(orders.schema.get_field_index("o_custkey"),
                           orders.schema.field("o_custkey"),
                           shifted(orders["o_custkey"], i * 1000000))
        for i in range(COPIES)])

    li = pq.read_table(f"{SRC}/lineitem.parquet")
    write("lineitem", [
        li.set_column(li.schema.get_field_index("l_orderkey"),
                      li.schema.field("l_orderkey"),
                      shifted(li["l_orderkey"], i * 10000000))
          .set_column(li.schema.get_field_index("l_partkey"),
                      li.schema.field("l_partkey"),
                      shifted(li["l_partkey"], i * 1000000))
          .set_column(li.schema.get_field_index("l_suppkey"),
                      li.schema.field("l_suppkey"),
                      shifted(li["l_suppkey"], i * 100000))
        for i in range(COPIES)])

    ev = pq.read_table(f"{SRC}/events.parquet")
    # the driver's ts physical type has drifted across generations
    # (timestamp[ns] originally, timestamp[us] since 2026-08) — preserve
    # it bit-exactly AND shift in the file's own unit
    ts_type = ev.schema.field("ts").type
    unit_per_s = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}[ts_type.unit]
    epoch_raw = EPOCH_DAYS * 86400 * unit_per_s
    ts_raw = ev["ts"].cast(pa.int64())
    copies = []
    for i in range(COPIES):
        copies.append(
            ev.set_column(ev.schema.get_field_index("event_id"),
                          ev.schema.field("event_id"),
                          shifted(ev["event_id"], i * 1000000))
              .set_column(ev.schema.get_field_index("user_id"),
                          ev.schema.field("user_id"),
                          shifted(ev["user_id"], i * 100000))
              .set_column(ev.schema.get_field_index("ts"),
                          ev.schema.field("ts"),
                          pc.add(ts_raw, pa.scalar(i * epoch_raw, type=pa.int64()))
                            .cast(ts_type)))
    write("events", copies)

    docs = pq.read_table(f"{SRC}/documents.parquet")
    copies = []
    for i in range(COPIES):
        texts = pa.array([caesar(v, i) for v in docs["text"].to_pylist()],
                         type=docs.schema.field("text").type)
        copies.append(docs.set_column(
            docs.schema.get_field_index("doc_id"), docs.schema.field("doc_id"),
            shifted(docs["doc_id"], i * 1000000)
        ).set_column(
            docs.schema.get_field_index("text"), docs.schema.field("text"), texts))
    write("documents", copies)

    emb = pq.read_table(f"{SRC}/embeddings.parquet")
    vecs = np.array(emb["embedding"].to_pylist(), dtype=np.float32)
    dim = vecs.shape[1]
    copies = []
    for i in range(COPIES):
        rolled = np.roll(vecs, (7 * i) % dim, axis=1)
        arr = pa.array(list(rolled), type=emb.schema.field("embedding").type)
        copies.append(emb.set_column(
            emb.schema.get_field_index("vec_id"), emb.schema.field("vec_id"),
            shifted(emb["vec_id"], i * 100000)
        ).set_column(
            emb.schema.get_field_index("embedding"),
            emb.schema.field("embedding"), arr))
    write("embeddings", copies)


if __name__ == "__main__":
    main()
