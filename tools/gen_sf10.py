#!/usr/bin/env python3
"""sf10 (100x sf0.1) stress copies of the HEAVY-FAMILY tables.

Builder-side tooling only (round-13 verdict #2: add a second measured
scale decade). Same decorrelated-replica scheme as gen_sf1.py — seeded
alphabet cipher per documents replica (stopwords exempt), seeded dim
permutation per embeddings replica, key offsets for events — extended to
REPS=100 with two changes gen_sf1.py could not absorb:

- incremental ParquetWriter per table (100 concat'd in-memory replicas of
  documents would hold ~1 GB of python lists);
- events user_id offsets wrap at the z-order ZBits budget (2^16): the
  first floor(65536/u_stride) replicas get disjoint user ranges (new
  users — the gen_sf1 scheme), later replicas REUSE a user range but
  shift all timestamps by a full span + 1 day (the same users, a longer
  history) — sessionization/windows never merge cross-replica events
  because the gap dwarfs any session timeout, and per-user per-window
  density stays exactly sf0.1's. Both directions are how real event
  stores actually grow 100x (more users AND longer history).

documents / embeddings / events are generated at 100x; the TPC-H fact
tables (customer / supplier / part / orders / lineitem) at 10x via
key-offset replicas with referential integrity preserved (o_custkey
offsets track the customer stride, lineitem's three foreign keys track
orders/part/supplier — every join row count scales exactly 10x).
region / nation stay 1x symlinks: they are the FIXED 5/25-row dimension
tables; scaling them would change join semantics, not stress anything.
(r14 verdict #3: before this, TPC-H rode at 1x symlinks and the
relational rows in the sf10 gate measured nothing beyond sf0.1.)

Usage: python3 tools/gen_sf10.py [outdir=/tmp/sf10] [reps=100]
"""
import sys
import re
import random

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 100
ID_STRIDE = 10_000_000

import os
os.makedirs(OUT, exist_ok=True)

# ---- documents (cipher scheme verbatim from gen_sf1.py) ----
docs = pq.read_table(f"{SRC}/documents.parquet")
cols = docs.column_names
texts = docs.column("text").to_pylist()
doc_ids = docs.column("doc_id").to_pylist()
LOWER = "abcdefghijklmnopqrstuvwxyz"
STOPWORDS = {
    "the", "and", "of", "to", "in", "is", "that", "with",      # en
    "der", "die", "und", "das", "ist", "mit", "von", "ein",    # de
    "le", "la", "et", "les", "des", "est", "dans", "que",      # fr
    "el", "los", "es", "con", "por", "una",                    # es (rest shared)
}
writer = pq.ParquetWriter(f"{OUT}/documents.parquet", docs.schema)
total_docs = 0
for k in range(REPS):
    if k == 0:
        t = texts
    else:
        rng = random.Random(7000 + k)
        perm = list(LOWER)
        rng.shuffle(perm)
        cipher = str.maketrans(
            LOWER + LOWER.upper(),
            "".join(perm) + "".join(perm).upper())
        collisions = 0
        def cw(w):
            global collisions
            if w.lower() in STOPWORDS:
                return w
            cwd = w.translate(cipher)
            if cwd.lower() in STOPWORDS:
                collisions += 1
            return cwd
        t = ["".join(c if i % 2 else cw(c)
                     for i, c in enumerate(re.split(r"(\s+)", s)))
             for s in texts]
        if collisions:
            print(f"documents replica {k}: {collisions} ciphered tokens "
                  f"collided into the stopword lexicon (pass_stopword skew)")
    arrays = []
    for c in cols:
        if c == "doc_id":
            arrays.append(pa.array([v + k * ID_STRIDE for v in doc_ids],
                                   type=docs.schema.field(c).type))
        elif c == "text":
            arrays.append(pa.array(t, type=docs.schema.field(c).type))
        else:
            arrays.append(docs.column(c).combine_chunks())
    tab = pa.table(arrays, names=cols)
    writer.write_table(tab)
    total_docs += tab.num_rows
writer.close()
print("documents:", total_docs)

# ---- embeddings ----
emb = pq.read_table(f"{SRC}/embeddings.parquet")
cols = emb.column_names
vecs = emb.column("embedding").to_pylist()
vec_ids = emb.column("vec_id").to_pylist()
dim = len(vecs[0])
writer = pq.ParquetWriter(f"{OUT}/embeddings.parquet", emb.schema)
total_emb = 0
for k in range(REPS):
    rng = random.Random(1000 + k)
    perm = list(range(dim))
    if k > 0:
        rng.shuffle(perm)
    pv = vecs if k == 0 else [[v[p] for p in perm] for v in vecs]
    arrays = []
    for c in cols:
        if c == "vec_id":
            arrays.append(pa.array([v + k * ID_STRIDE for v in vec_ids],
                                   type=emb.schema.field(c).type))
        elif c == "embedding":
            arrays.append(pa.array(pv, type=emb.schema.field(c).type))
        else:
            arrays.append(emb.column(c).combine_chunks())
    tab = pa.table(arrays, names=cols)
    writer.write_table(tab)
    total_emb += tab.num_rows
writer.close()
print("embeddings:", total_emb)

# ---- events (user-offset up to the ZBits cap, time-shift beyond) ----
ev = pq.read_table(f"{SRC}/events.parquet")
eid = ev.column("event_id")
uid = ev.column("user_id")
ts = ev.column("ts").combine_chunks()
ev_stride = pc.max(eid).as_py() + 1
u_stride = pc.max(uid).as_py() + 1
user_reps = (1 << 16) // u_stride  # replicas with disjoint user ranges
span_us = (pc.max(ts).as_py() - pc.min(ts).as_py())
shift_unit_us = int(span_us.total_seconds() * 1_000_000) + 86_400_000_000
writer = pq.ParquetWriter(f"{OUT}/events.parquet", ev.schema)
total_ev = 0
for k in range(REPS):
    u_off = (k % user_reps) * u_stride
    t_off = (k // user_reps) * shift_unit_us
    arrays = []
    for c in ev.column_names:
        if c == "event_id":
            arrays.append(pc.add(eid, pa.scalar(k * ev_stride, pa.int64())))
        elif c == "user_id":
            arrays.append(pc.add(uid, pa.scalar(u_off, pa.int64())))
        elif c == "ts" and t_off:
            arrays.append(pc.add(ts, pa.scalar(t_off, pa.duration("us"))))
        else:
            arrays.append(ev.column(c).combine_chunks())
    tab = pa.table(arrays, names=ev.column_names)
    writer.write_table(tab)
    total_ev += tab.num_rows
writer.close()
print(f"events: {total_ev} (user-disjoint replicas: {user_reps}, "
      f"time-shift unit us: {shift_unit_us})")

# ---- TPC-H fact tables at 10x (r14 verdict #3) ----
# Key-offset replicas: every primary key gets k*stride; every foreign
# key gets k*(referenced table's stride), so each replica's joins hit
# exactly its own replica — row counts, join fan-outs and group sizes
# all scale 10x with no cross-replica collisions. Non-key columns ride
# verbatim (duplicate names/prices across replicas are how a real store
# grows: more entities, same value distributions).
TPCH_REPS = 10


def stride(tab, col):
    return pc.max(tab.column(col)).as_py() + 1


tpch = {t: pq.read_table(f"{SRC}/{t}.parquet")
        for t in ["customer", "supplier", "part", "orders", "lineitem"]}
strides = {
    "c": stride(tpch["customer"], "c_custkey"),
    "s": stride(tpch["supplier"], "s_suppkey"),
    "p": stride(tpch["part"], "p_partkey"),
    "o": stride(tpch["orders"], "o_orderkey"),
}
# column -> stride key (primary and foreign keys share the referenced
# table's stride)
key_cols = {
    "c_custkey": "c", "o_custkey": "c",
    "s_suppkey": "s", "l_suppkey": "s",
    "p_partkey": "p", "l_partkey": "p",
    "o_orderkey": "o", "l_orderkey": "o",
}
for name, tab in tpch.items():
    writer = pq.ParquetWriter(f"{OUT}/{name}.parquet", tab.schema)
    total = 0
    for k in range(TPCH_REPS):
        arrays = []
        for c in tab.column_names:
            colv = tab.column(c).combine_chunks()
            if c in key_cols and k > 0:
                off = k * strides[key_cols[c]]
                colv = pc.add(colv, pa.scalar(off, tab.schema.field(c).type))
            arrays.append(colv)
        rep = pa.table(arrays, names=tab.column_names)
        writer.write_table(rep)
        total += rep.num_rows
    writer.close()
    print(f"{name}: {total}")
