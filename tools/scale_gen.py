#!/usr/bin/env python3
"""Synthetic ~10x data tier (round 18, VERDICT r17 item 1).

Inflates /root/testdata/sf0.1 into an sf1-equivalent tier by
deterministic id-offset replication so the full Verify + DuckDB oracle
sweep and a bench pass can run ONCE at 10x the largest driver fixture —
every "100-TB shape" claim has otherwise only ever executed on 17 MB.

Usage: python3 tools/scale_gen.py [K] [srcDir] [outDir]
Defaults: K=10, src=/root/testdata/sf0.1, out=data/sf1

Replication design (distribution-preserving, pair-blowup-free):
- region/nation: fixed dimensions, copied unchanged (TPC-H semantics).
- customer/supplier/part/orders/lineitem/events: replica k offsets every
  primary AND foreign key by k*N (N = the table's row count), so each
  replica is a self-contained shard with identical join fanout, value
  distributions, and time range. Key-derived names (Customer#%09d,
  Supplier#%09d) are regenerated from the NEW key so name-keyed fuzzy
  queries keep one row per name. events replicas get fresh user_id space
  (per-user history shape preserved; user count scales 10x).
- documents: doc_id offsets; replica k>0 maps every word w -> w + code_k
  (a replica-specific suffix from a SUFFIX-FREE code set — no code is a
  proper suffix of another, so w1+code_i = w2+code_j forces i = j; see
  the inline proof at the code-set construction). Word ORDER and per-replica word
  frequency shape are preserved, so the planted dup/near-dup structure
  REPLICATES once per replica (each replica is a self-contained shard
  with the original's dup density — pair results scale exactly K-linear),
  while replicas share ZERO shingles or 40-char windows with each other
  (no cross-replica near-dups, no quadratic pair blowup). First draft
  used a word PERMUTATION instead; the synthetic corpus's tiny
  vocabulary kept shuffled replicas Jaccard-similar and minhash pairs
  grew 51x at 10x data — suffixing makes cross-replica overlap exactly
  zero. Vocabulary count and doc lengths grow with K (types 10x, chars
  ~+20%), the realistic crawl-growth shape for tokenizer/TF-IDF tiers.
- embeddings: vec_id offsets; replica k's vector is the original ROTATED
  by k dimensions — exactly norm-preserving (SQ8/PQ rails, dim-stats
  hold) while decorrelating cosine, so ANN/semantic-dedup neighbor
  structure does not replicate into cross-replica near-dup pairs; labels
  unchanged (filtered-ANN selectivity preserved).

Everything is seeded/deterministic: re-running produces byte-identical
logical content. The tool asserts row counts, key uniqueness, and FK
integrity before declaring the tier ready.
"""
import sys
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

K = int(sys.argv[1]) if len(sys.argv) > 1 else 10
SRC = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
OUT = sys.argv[3] if len(sys.argv) > 3 else "data/sf1"

N = {"customer": 15000, "supplier": 1000, "part": 20000, "orders": 150000,
     "lineitem": 600000, "events": 100000, "documents": 5000,
     "embeddings": 2000, "users": 1500}


def main():
    out = Path(OUT)
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO 16")

    def src(t):
        return f"'{SRC}/{t}.parquet'"

    def write(t, select_k):
        sql = " UNION ALL ".join(select_k(k) for k in range(K))
        con.execute(
            f"COPY ({sql}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")
        return n

    # fixed dimensions
    for t in ("region", "nation"):
        con.execute(f"COPY (SELECT * FROM {src(t)}) TO '{out}/{t}.parquet' "
                    "(FORMAT PARQUET)")
        print(f"{t}: copied")

    write("customer", lambda k: f"""
        SELECT c_custkey + {k * N['customer']} AS c_custkey,
               printf('Customer#%09d', c_custkey + {k * N['customer']}) AS c_name,
               c_nationkey, c_acctbal, c_mktsegment
        FROM {src('customer')}""")
    write("supplier", lambda k: f"""
        SELECT s_suppkey + {k * N['supplier']} AS s_suppkey,
               printf('Supplier#%09d', s_suppkey + {k * N['supplier']}) AS s_name,
               s_nationkey, s_acctbal
        FROM {src('supplier')}""")
    write("part", lambda k: f"""
        SELECT p_partkey + {k * N['part']} AS p_partkey,
               p_name, p_brand, p_type, p_size, p_retailprice
        FROM {src('part')}""")
    write("orders", lambda k: f"""
        SELECT o_orderkey + {k * N['orders']} AS o_orderkey,
               o_custkey + {k * N['customer']} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM {src('orders')}""")
    write("lineitem", lambda k: f"""
        SELECT l_orderkey + {k * N['orders']} AS l_orderkey,
               l_partkey + {k * N['part']} AS l_partkey,
               l_suppkey + {k * N['supplier']} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM {src('lineitem')}""")
    write("events", lambda k: f"""
        SELECT event_id + {k * N['events']} AS event_id, ts,
               user_id + {k * N['users']} AS user_id,
               event_type, value, props
        FROM {src('events')}""")

    # documents: replica-suffixed words (see module docstring)
    docs = con.execute(
        f"SELECT doc_id, text, lang, source, n_chars FROM {src('documents')} "
        "ORDER BY doc_id").fetchall()
    # replica k>0 uses suffix[k-1]. The code set must be SUFFIX-FREE
    # (no code a proper suffix of another), else w2+'cb' collides with
    # (w2+'c')+'b' whenever the vocabulary contains both w2 and w2+'c'
    # (advice r19 — the old scheme's two-letter codes ended in one-letter
    # codes). Codes: 25 one-letter from b..z (k<=25 unchanged, so the
    # committed sf1 tier is byte-identical), then three-letter codes
    # c1+c2+'a' — all the same length (mutually suffix-free) and
    # 'a'-terminated ('a' is excluded from the one-letter set, so no
    # one-letter code is their suffix; their proper suffixes have length
    # 1 or 2 and end in 'a', matching no code). 25 + 676 codes => K<=702.
    base = "bcdefghijklmnopqrstuvwxyz"
    alpha = "abcdefghijklmnopqrstuvwxyz"
    suffix = list(base) + [c1 + c2 + "a" for c1 in alpha for c2 in alpha]
    used = suffix[:max(0, K - 1)]
    for i, si in enumerate(used):  # structural proof over the used codes
        for j, sj in enumerate(used):
            assert i == j or not si.endswith(sj), \
                f"suffix codes not suffix-free: {si!r} ends with {sj!r}"
    drows = {"doc_id": [], "text": [], "lang": [], "source": [], "n_chars": []}
    for k in range(K):
        for (doc_id, text, lang, source, _) in docs:
            if k == 0:
                t = text
            else:
                sfx = suffix[k - 1]
                t = " ".join(w + sfx for w in text.split(" "))
            drows["doc_id"].append(doc_id + k * N["documents"])
            drows["text"].append(t)
            drows["lang"].append(lang)
            drows["source"].append(source)
            drows["n_chars"].append(len(t))
    dschema = pa.schema([("doc_id", pa.int64()), ("text", pa.string()),
                         ("lang", pa.string()), ("source", pa.string()),
                         ("n_chars", pa.int64())])
    pq.write_table(pa.table(drows, schema=dschema), f"{out}/documents.parquet")
    print(f"documents: {len(drows['doc_id'])} rows")

    # embeddings: per-replica dimension rotation (norm-exact)
    embs = con.execute(
        f"SELECT vec_id, embedding, label FROM {src('embeddings')} "
        "ORDER BY vec_id").fetchall()
    erows = {"vec_id": [], "embedding": [], "label": []}
    dim = len(embs[0][1])
    assert K <= 2 * dim, "rotation+negation scheme exhausted; add a new lap transform"
    for k in range(K):
        for (vec_id, emb, label) in embs:
            erows["vec_id"].append(vec_id + k * N["embeddings"])
            # rotation wraps at the dimension count; past one full lap,
            # NEGATE the rotated vector (still exactly norm-preserving)
            # so replica k never duplicates replica k-dim's vectors
            r = k % dim
            rot = emb[r:] + emb[:r] if r else list(emb)
            if (k // dim) % 2 == 1:
                rot = [-x for x in rot]
            erows["embedding"].append(rot if k else emb)
            erows["label"].append(label)
    eschema = pa.schema([("vec_id", pa.int64()),
                         ("embedding", pa.list_(pa.float32())),
                         ("label", pa.int32())])
    pq.write_table(pa.table(erows, schema=eschema), f"{out}/embeddings.parquet")
    print(f"embeddings: {len(erows['vec_id'])} rows")

    # integrity gate: counts, key uniqueness, FK closure
    checks = [
        ("customer pk", f"SELECT count(*) - count(DISTINCT c_custkey) FROM '{out}/customer.parquet'"),
        ("orders pk", f"SELECT count(*) - count(DISTINCT o_orderkey) FROM '{out}/orders.parquet'"),
        ("events pk", f"SELECT count(*) - count(DISTINCT event_id) FROM '{out}/events.parquet'"),
        ("documents pk", f"SELECT count(*) - count(DISTINCT doc_id) FROM '{out}/documents.parquet'"),
        ("embeddings pk", f"SELECT count(*) - count(DISTINCT vec_id) FROM '{out}/embeddings.parquet'"),
        ("orders->customer fk", f"""SELECT count(*) FROM '{out}/orders.parquet' o
            LEFT JOIN '{out}/customer.parquet' c ON o.o_custkey = c.c_custkey
            WHERE c.c_custkey IS NULL"""),
        ("lineitem->orders fk", f"""SELECT count(*) FROM '{out}/lineitem.parquet' l
            LEFT JOIN '{out}/orders.parquet' o ON l.l_orderkey = o.o_orderkey
            WHERE o.o_orderkey IS NULL"""),
        ("lineitem->part fk", f"""SELECT count(*) FROM '{out}/lineitem.parquet' l
            LEFT JOIN '{out}/part.parquet' p ON l.l_partkey = p.p_partkey
            WHERE p.p_partkey IS NULL"""),
        # replica k>0 adds exactly len(suffix[k-1]) chars per word
        # (1 char for k <= 25, 3 chars for the 'a'-terminated codes past 'z')
        ("doc length law", f"""SELECT count(*) FROM '{out}/documents.parquet' d
            JOIN {src('documents')} s ON d.doc_id % {N['documents']} = s.doc_id
            WHERE d.n_chars != s.n_chars +
              (length(s.text) - length(replace(s.text, ' ', '')) + 1) *
              CASE WHEN d.doc_id // {N['documents']} = 0 THEN 0
                   WHEN d.doc_id // {N['documents']} <= 25 THEN 1
                   ELSE 3
              END"""),
        # zero cross-replica shingle overlap: the suffix-free code proof
        # above covers suffixed-vs-suffixed pairs; replica 0 is
        # UNsuffixed, so verify it empirically against EVERY suffixed
        # replica's vocabulary at once (a natural word could end in a
        # code with its stem also in the vocabulary) — this subsumes the
        # old replica-1-only spot check and, for K>26, exercises the
        # long-suffix replicas the old check never touched (advice r19)
        ("cross-replica vocab disjoint", f"""
            WITH v0 AS (SELECT DISTINCT unnest(string_split(text, ' ')) AS w
                        FROM '{out}/documents.parquet' WHERE doc_id < {N['documents']}),
                 vk AS (SELECT DISTINCT unnest(string_split(text, ' ')) AS w
                        FROM '{out}/documents.parquet'
                        WHERE doc_id >= {N['documents']})
            SELECT count(*) FROM vk JOIN v0 USING (w)"""),
        ("emb norm preserved", f"""SELECT count(*) FROM (
            SELECT d.vec_id,
              abs(list_sum(list_transform(d.embedding, x -> CAST(x AS DOUBLE) * x)) -
                  list_sum(list_transform(s.embedding, x -> CAST(x AS DOUBLE) * x))) AS dn
            FROM '{out}/embeddings.parquet' d
            JOIN {src('embeddings')} s ON d.vec_id % {N['embeddings']} = s.vec_id)
            WHERE dn > 1e-6"""),
    ]
    bad = 0
    for name, sql in checks:
        v = con.execute(sql).fetchone()[0]
        status = "OK" if v == 0 else f"FAIL ({v})"
        if v != 0:
            bad += 1
        print(f"check {name}: {status}")
    print("TIER READY" if bad == 0 else f"{bad} CHECKS FAILED")
    sys.exit(0 if bad == 0 else 1)


if __name__ == "__main__":
    main()
