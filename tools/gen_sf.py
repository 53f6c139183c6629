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
- `documents.text` and `customer.c_name` letters pass through a
  per-copy alphabet BIJECTION (digits/punctuation untouched):
  within-copy duplicate and near-duplicate structure is preserved
  EXACTLY (a character bijection commutes with equality, shingling, and
  edit distance), but cross-copy token sets are disjoint, so
  MinHash/Jaccard/SimHash/BPE and the c_name fuzzy join stay linear.
  Text length is preserved, keeping n_chars consistent.
- `embeddings.embedding` passes through a per-copy SIGNED PERMUTATION
  of the dimensions (cyclic rotation + per-dimension sign flips): an
  orthogonal transform shared across one copy preserves all within-copy
  dot products bit-exactly in float32 (roll moves values, *±1.0 is
  exact), while cross-copy cosines scatter like random directions — the
  ANN/near-dup corpus grows 10x without planting 10x duplicate matches.
- region/nation are fixed dimensions and stay single-copy.

Scheme (4th arg): `perm` (default since round 9) draws the letter
bijection / sign pattern from a copy-seeded Fisher-Yates — the family
has 26!·(64·2^64) members, so NO wrap at any copy count. The original
`caesar` scheme (letters shifted copy%26, dims rolled 7*copy%64) wraps
at 26/64 copies: at copies=1000 each letter class holds ~38 copies, so
every doc would gain C(38,2) cross-copy EXACT-duplicate pairs per
class — candidate mass quadratic in the wrap count, a DATA artifact
that poisons the decade measurement (at copies=100 the classes hold
~4 copies; a bounded constant, which is why rounds 7-8's sf1/sf10
corpora — generated with `caesar` — remain valid). Pass `caesar` to
reproduce the pre-round-9 artifacts bit-exactly.

Everything is reproducible (the only RNG is random.Random(copy), whose
Mersenne sequence is pinned by CPython's language spec) and physical
parquet types are preserved bit-exactly via pyarrow (events.ts keeps
the source file's timestamp unit — ns in the original driver
generation, us since 2026-08; the engine's readers adapt to either,
see Tbl.eventsTsType). Tables are written copy-at-a-time through one
ParquetWriter, so memory stays one copy-sized at any copy count.
"""
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1"
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 10
SCHEME = sys.argv[4] if len(sys.argv) > 4 else "perm"
assert SCHEME in ("perm", "caesar"), SCHEME
# key offsets are copy*1e6; the largest sf0.1 key is ~15000 and j8/j9's
# mutant-id space starts at 1e9, so 1000 copies is the hard ceiling
assert COPIES >= 1, "zero copies would stream no tables into write()"
assert COPIES <= 1000, "copy offsets would cross the 1e9 mutant-id space"

EPOCH_DAYS = 32  # > the 30-day event span: disjoint epochs

LO = "abcdefghijklmnopqrstuvwxyz"


def letter_map(i):
    """Per-copy letter bijection (applied to both cases), copy 0 = identity."""
    if SCHEME == "caesar" or i == 0:
        k = i % 26
        return LO[k:] + LO[:k]
    import random
    rng = random.Random(0xC0FFEE + i)
    sub = list(LO)
    rng.shuffle(sub)
    return "".join(sub)


def subst(s, tbl):
    return None if s is None else s.translate(tbl)


def emb_transform(i, dim):
    """Per-copy orthogonal transform: (roll, signs). Copy 0 = identity."""
    roll = (7 * i) % dim
    if SCHEME == "caesar" or i == 0:
        signs = np.ones(dim, dtype=np.float32)
    else:
        import random
        rng = random.Random(0x5EED + i)
        signs = np.array([1.0 if rng.random() < 0.5 else -1.0
                          for _ in range(dim)], dtype=np.float32)
    return roll, signs


def shifted(col, off):
    return pc.add(col, pa.scalar(off, type=col.type))


def trans_table(i):
    m = letter_map(i)
    return str.maketrans(LO + LO.upper(), m + m.upper())


def write(name, tables):
    """Stream copy-tables through one ParquetWriter (memory = one copy)."""
    n, w = 0, None
    for t in tables:
        if w is None:
            w = pq.ParquetWriter(f"{DST}/{name}.parquet", t.schema)
        w.write_table(t)
        n += t.num_rows
    w.close()
    print(f"{name}: {n} rows", flush=True)


def main():
    import os
    os.makedirs(DST, exist_ok=True)

    for t in ("region", "nation"):
        pq.write_table(pq.read_table(f"{SRC}/{t}.parquet"), f"{DST}/{t}.parquet")
        print(f"{t}: copied")

    cust = pq.read_table(f"{SRC}/customer.parquet")
    write("customer", (
        cust.set_column(
            cust.schema.get_field_index("c_custkey"), cust.schema.field("c_custkey"),
            shifted(cust["c_custkey"], i * 1000000)
        ).set_column(
            cust.schema.get_field_index("c_name"), cust.schema.field("c_name"),
            pa.array([subst(v, trans_table(i)) for v in cust["c_name"].to_pylist()],
                     type=cust.schema.field("c_name").type))
        for i in range(COPIES)))

    supp = pq.read_table(f"{SRC}/supplier.parquet")
    write("supplier", (
        supp.set_column(supp.schema.get_field_index("s_suppkey"),
                        supp.schema.field("s_suppkey"),
                        shifted(supp["s_suppkey"], i * 100000))
        for i in range(COPIES)))

    part = pq.read_table(f"{SRC}/part.parquet")
    write("part", (
        part.set_column(part.schema.get_field_index("p_partkey"),
                        part.schema.field("p_partkey"),
                        shifted(part["p_partkey"], i * 1000000))
        for i in range(COPIES)))

    orders = pq.read_table(f"{SRC}/orders.parquet")
    write("orders", (
        orders.set_column(orders.schema.get_field_index("o_orderkey"),
                          orders.schema.field("o_orderkey"),
                          shifted(orders["o_orderkey"], i * 10000000))
               .set_column(orders.schema.get_field_index("o_custkey"),
                           orders.schema.field("o_custkey"),
                           shifted(orders["o_custkey"], i * 1000000))
        for i in range(COPIES)))

    li = pq.read_table(f"{SRC}/lineitem.parquet")
    write("lineitem", (
        li.set_column(li.schema.get_field_index("l_orderkey"),
                      li.schema.field("l_orderkey"),
                      shifted(li["l_orderkey"], i * 10000000))
          .set_column(li.schema.get_field_index("l_partkey"),
                      li.schema.field("l_partkey"),
                      shifted(li["l_partkey"], i * 1000000))
          .set_column(li.schema.get_field_index("l_suppkey"),
                      li.schema.field("l_suppkey"),
                      shifted(li["l_suppkey"], i * 100000))
        for i in range(COPIES)))

    ev = pq.read_table(f"{SRC}/events.parquet")
    # the driver's ts physical type has drifted across generations
    # (timestamp[ns] originally, timestamp[us] since 2026-08) — preserve
    # it bit-exactly AND shift in the file's own unit
    ts_type = ev.schema.field("ts").type
    unit_per_s = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}[ts_type.unit]
    epoch_raw = EPOCH_DAYS * 86400 * unit_per_s
    ts_raw = ev["ts"].cast(pa.int64())
    write("events", (
        ev.set_column(ev.schema.get_field_index("event_id"),
                      ev.schema.field("event_id"),
                      shifted(ev["event_id"], i * 1000000))
          .set_column(ev.schema.get_field_index("user_id"),
                      ev.schema.field("user_id"),
                      shifted(ev["user_id"], i * 100000))
          .set_column(ev.schema.get_field_index("ts"),
                      ev.schema.field("ts"),
                      pc.add(ts_raw, pa.scalar(i * epoch_raw, type=pa.int64()))
                        .cast(ts_type))
        for i in range(COPIES)))

    docs = pq.read_table(f"{SRC}/documents.parquet")
    texts0 = docs["text"].to_pylist()
    write("documents", (
        docs.set_column(
            docs.schema.get_field_index("doc_id"), docs.schema.field("doc_id"),
            shifted(docs["doc_id"], i * 1000000)
        ).set_column(
            docs.schema.get_field_index("text"), docs.schema.field("text"),
            pa.array([subst(v, trans_table(i)) for v in texts0],
                     type=docs.schema.field("text").type))
        for i in range(COPIES)))

    emb = pq.read_table(f"{SRC}/embeddings.parquet")
    vecs = np.array(emb["embedding"].to_pylist(), dtype=np.float32)
    dim = vecs.shape[1]

    def emb_copies():
        for i in range(COPIES):
            roll, signs = emb_transform(i, dim)
            out = np.roll(vecs, roll, axis=1) * signs  # exact: *±1.0
            arr = pa.array(list(out), type=emb.schema.field("embedding").type)
            yield emb.set_column(
                emb.schema.get_field_index("vec_id"), emb.schema.field("vec_id"),
                shifted(emb["vec_id"], i * 100000)
            ).set_column(
                emb.schema.get_field_index("embedding"),
                emb.schema.field("embedding"), arr)
    write("embeddings", emb_copies())


if __name__ == "__main__":
    main()
