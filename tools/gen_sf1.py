#!/usr/bin/env python3
"""One-off sf1 (10x sf0.1) stress copies of the testdata tables.

Builder-side tooling only (the library never reads this script's output
outside the scale-stress run). /root/testdata is read-only, so the output
goes to /tmp/sf1 by default.

Scaling is 10 deterministic REPLICAS of sf0.1, constructed so per-replica
structure is preserved and cross-replica structure is decorrelated —
the honest x10: without decorrelation, planted near-dup clusters would
match across replicas and candidate-pair counts would grow x100,
misreporting the engine as super-linear.

- documents: replica k applies a seeded PERMUTATION of the lowercase
  alphabet to the text (a bijective letter cipher; digits/punctuation/
  case structure untouched), EXCEPT stopword tokens, which map to
  themselves — the quality/lang-id rules count membership in a fixed
  stopword lexicon, so a ciphered stopword would fail pass_stopword at
  replica-dependent rates and skew the curation-family work mix
  (round-8 advice). With the exemption, token statistics, lengths, dup
  clusters, quality pass rates AND language id are isomorphic to
  replica 0. Across replicas: word-level and char-gram-level overlap of
  NON-stop tokens collapses to chance (an earlier suffix-based scheme
  left word interiors shared, so char-3-gram MinHash bands still
  collided across replicas and pair counts grew superlinearly —
  misreporting the engine as super-linear); shared stopwords contribute
  only the few char-grams of 2-3-letter words, far below any band
  threshold. Residual caveat: a ciphered non-stop token could in
  principle COLLIDE INTO the lexicon (letters permuting onto a
  stopword), nudging pass_stopword up for that replica — the script
  prints the collision count per replica so a nonzero skew is visible
  at generation time (0 for the shipped seeds). doc_id offset by
  k*10^7.
- embeddings: replica k applies a seeded PERMUTATION of the 64 dims —
  all within-replica dot products are exactly preserved (clusters,
  planted near-dups, centroid geometry), cross-replica cosines are
  scrambled. vec_id offset by k*10^7; labels unchanged.
- events: replica k offsets user_id by k*(max_user+1) (stays < 2^16 for
  the z-order domain) and event_id by k*(max_event+1); timestamps
  unchanged so per-user session/window density matches sf0.1.
"""
import sys
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import random

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 10
ID_STRIDE = 10_000_000

import os
os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()

# ---- documents ----
docs = con.sql(f"SELECT * FROM '{SRC}/documents.parquet'").arrow()
cols = docs.column_names
out_batches = []
texts = docs.column("text").to_pylist()
LOWER = "abcdefghijklmnopqrstuvwxyz"
# The stopword lexicon the library's quality/lang-id rules count —
# keep in sync with graft.operators.TextAnalysis.stopwords. Exempted
# from the cipher so pass_stopword/lang-id rates stay isomorphic
# across replicas.
STOPWORDS = {
    "the", "and", "of", "to", "in", "is", "that", "with",      # en
    "der", "die", "und", "das", "ist", "mit", "von", "ein",    # de
    "le", "la", "et", "les", "des", "est", "dans", "que",      # fr
    "el", "los", "es", "con", "por", "una",                    # es (rest shared)
}
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
            # the library lowercases before membership-testing, so "The"
            # is a stopword hit too — exempt on the lowercased form but
            # return the ORIGINAL so case structure is untouched
            if w.lower() in STOPWORDS:
                return w
            cwd = w.translate(cipher)
            if cwd.lower() in STOPWORDS:
                collisions += 1
            return cwd
        # split on runs of ANY whitespace, keeping the delimiters, so the
        # cipher sees exactly the tokens the library's normalize-then-
        # split tokenization sees while original spacing is preserved
        import re as _re
        t = ["".join(c if i % 2 else cw(c)
                     for i, c in enumerate(_re.split(r"(\s+)", s)))
             for s in texts]
        if collisions:
            print(f"replica {k}: {collisions} ciphered tokens collided "
                  f"into the stopword lexicon (pass_stopword skew)")
    arrays = []
    for c in cols:
        if c == "doc_id":
            arrays.append(pa.array([v + k * ID_STRIDE
                                    for v in docs.column(c).to_pylist()],
                                   type=docs.schema.field(c).type))
        elif c == "text":
            arrays.append(pa.array(t, type=docs.schema.field(c).type))
        else:
            arrays.append(docs.column(c).combine_chunks())
    out_batches.append(pa.table(arrays, names=cols))
pq.write_table(pa.concat_tables(out_batches), f"{OUT}/documents.parquet")
print("documents:", sum(t.num_rows for t in out_batches))

# ---- embeddings (vector column is named `embedding`) ----
emb = pq.read_table(f"{SRC}/embeddings.parquet")
cols = emb.column_names
vecs = emb.column("embedding").to_pylist()
dim = len(vecs[0])
out_batches = []
for k in range(REPS):
    rng = random.Random(1000 + k)
    perm = list(range(dim))
    if k > 0:
        rng.shuffle(perm)
    pv = vecs if k == 0 else [[v[p] for p in perm] for v in vecs]
    arrays = []
    for c in cols:
        if c == "vec_id":
            arrays.append(pa.array([v + k * ID_STRIDE
                                    for v in emb.column(c).to_pylist()],
                                   type=emb.schema.field(c).type))
        elif c == "embedding":
            arrays.append(pa.array(pv, type=emb.schema.field(c).type))
        else:
            arrays.append(emb.column(c).combine_chunks())
    out_batches.append(pa.table(arrays, names=cols))
pq.write_table(pa.concat_tables(out_batches), f"{OUT}/embeddings.parquet")
print("embeddings:", sum(t.num_rows for t in out_batches))

# ---- events (pyarrow, preserving the TIMESTAMP(NS) physical type the
# loader depends on; id/user offsets only) ----
ev = pq.read_table(f"{SRC}/events.parquet")
eid = ev.column("event_id").to_pylist()
uid = ev.column("user_id").to_pylist()
ev_stride, u_stride = max(eid) + 1, max(uid) + 1
assert REPS * u_stride < (1 << 16), \
    "user domain must stay inside the z-order ZBits budget"
out_batches = []
for k in range(REPS):
    arrays = []
    for c in ev.column_names:
        if c == "event_id":
            arrays.append(pa.array([v + k * ev_stride for v in eid],
                                   type=ev.schema.field(c).type))
        elif c == "user_id":
            arrays.append(pa.array([v + k * u_stride for v in uid],
                                   type=ev.schema.field(c).type))
        else:
            arrays.append(ev.column(c).combine_chunks())
    out_batches.append(pa.table(arrays, names=ev.column_names))
pq.write_table(pa.concat_tables(out_batches), f"{OUT}/events.parquet")
print("events:", sum(t.num_rows for t in out_batches))

# ---- TPC-H relational family (round 9: extend the stress set to the
# relational/broker queries). Realistic 10x growth model: FACT tables
# (customer/orders/lineitem) replicate with disjoint key ranges — new
# customers placing new orders — while DIMENSIONS (supplier/part/
# nation/region) stay fixed, exactly how a production star schema
# scales. Per-replica join structure (order→lineitem fan-out, customer
# mix, date distributions) is preserved; cross-replica keys are
# disjoint so no join output grows superlinearly. ----
def offset_replicate(name, strides):
    """strides: {col: stride}. A column's stride comes from its KEY
    DOMAIN (the referenced parent table's max key + 1), shared by the
    PK side and every FK side of that domain — deriving each FK's
    stride from the child table's own max would silently break
    referential integrity whenever some parent keys are unreferenced
    (TPC-H proper skips custkeys divisible by 3: max(o_custkey) <
    max(c_custkey), so replica k's o_custkey offsets would dangle or
    alias a DIFFERENT replica's customers)."""
    t = pq.read_table(f"{SRC}/{name}.parquet")
    out = []
    for k in range(REPS):
        arrays = []
        for c in t.column_names:
            if c in strides:
                arrays.append(pa.array(
                    [v + k * strides[c] for v in t.column(c).to_pylist()],
                    type=t.schema.field(c).type))
            else:
                arrays.append(t.column(c).combine_chunks())
        out.append(pa.table(arrays, names=t.column_names))
    pq.write_table(pa.concat_tables(out), f"{OUT}/{name}.parquet")
    print(f"{name}:", sum(x.num_rows for x in out))

# one stride per key DOMAIN, from the parent table's own key
cust_stride = max(pq.read_table(f"{SRC}/customer.parquet")
                  .column("c_custkey").to_pylist()) + 1
order_stride = max(pq.read_table(f"{SRC}/orders.parquet")
                   .column("o_orderkey").to_pylist()) + 1
offset_replicate("customer", {"c_custkey": cust_stride})
offset_replicate("orders", {"o_orderkey": order_stride,
                            "o_custkey": cust_stride})
offset_replicate("lineitem", {"l_orderkey": order_stride})

# referential integrity of the replicated star: every FK must hit a
# parent row, or the stress answers silently stop being join-preserving
custs = set(pq.read_table(f"{OUT}/customer.parquet")
            .column("c_custkey").to_pylist())
orders_t = pq.read_table(f"{OUT}/orders.parquet")
assert set(orders_t.column("o_custkey").to_pylist()) <= custs, \
    "replicated o_custkey dangles outside customer"
okeys = set(orders_t.column("o_orderkey").to_pylist())
assert set(pq.read_table(f"{OUT}/lineitem.parquet")
           .column("l_orderkey").to_pylist()) <= okeys, \
    "replicated l_orderkey dangles outside orders"
print("fk-integrity: ok")
for dim in ["supplier", "part", "nation", "region"]:
    t = pq.read_table(f"{SRC}/{dim}.parquet")
    pq.write_table(t, f"{OUT}/{dim}.parquet")
    print(f"{dim}: {t.num_rows} (dimension, copied)")
