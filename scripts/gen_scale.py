"""Generate a scaled-up copy of the driver testdata for throughput
checkpoints (sf0.1 -> sf1 by default). NOT a correctness input — the
oracle gate stays on the driver-generated sf0.01 — this exists to
measure how every expensive plan scales one order of magnitude up
(VERDICT r6 #6).

Strategy:
- relational tables (customer/supplier/part/orders/lineitem/events):
  replicate the WHOLE star schema FACTOR times with per-copy key
  shifts on every join key, so referential integrity and all value
  distributions (dates, flags, prices) are preserved exactly while
  key cardinalities scale linearly;
- documents: regenerated from the sf0.1 empirical token unigram +
  length distributions (replication would make every doc a 10-way
  exact duplicate and distort the dedup workload); the observed
  exact-duplicate rate is re-planted;
- embeddings: new vectors sampled as (random sf0.1 base vector +
  small gaussian noise) so the label cluster structure survives at
  10x the rows.

Usage: python scripts/gen_scale.py [SRC_DIR DST_DIR FACTOR]
Defaults: /root/testdata/sf0.1 -> <repo>/.scratch/sf1, factor 10.
Deterministic (seed 42).
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
    REPO, ".scratch", "sf1")
FACTOR = int(sys.argv[3]) if len(sys.argv) > 3 else 10

# key columns per table -> shift basis column ("max of" in source)
KEYED = {
    "customer": {"c_custkey": "c_custkey"},
    "supplier": {"s_suppkey": "s_suppkey"},
    "part": {"p_partkey": "p_partkey"},
    "orders": {"o_orderkey": "o_orderkey", "o_custkey": "c_custkey"},
    "lineitem": {"l_orderkey": "o_orderkey", "l_partkey": "p_partkey",
                 "l_suppkey": "s_suppkey"},
    "events": {"event_id": "event_id", "user_id": "user_id"},
}


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents",
              "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SRC}/{t}.parquet')")

    # shift bases: max value of each key domain in the source
    base = {
        "c_custkey": con.execute(
            "SELECT max(c_custkey) FROM customer").fetchone()[0],
        "s_suppkey": con.execute(
            "SELECT max(s_suppkey) FROM supplier").fetchone()[0],
        "p_partkey": con.execute(
            "SELECT max(p_partkey) FROM part").fetchone()[0],
        "o_orderkey": con.execute(
            "SELECT max(o_orderkey) FROM orders").fetchone()[0],
        "event_id": con.execute(
            "SELECT max(event_id) FROM events").fetchone()[0],
        "user_id": con.execute(
            "SELECT max(user_id) FROM events").fetchone()[0],
    }

    for t in ("region", "nation"):
        con.execute(f"COPY (SELECT * FROM {t}) TO "
                    f"'{DST}/{t}.parquet' (FORMAT PARQUET)")
        print(t, "copied")

    for t, keys in KEYED.items():
        cols = [r[0] for r in con.execute(
            f"DESCRIBE {t}").fetchall()]
        sel = ", ".join(
            f"{c} + i * {base[keys[c]]} AS {c}" if c in keys else c
            for c in cols)
        con.execute(
            f"COPY (SELECT {sel} FROM {t}, range({FACTOR}) r(i)) "
            f"TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) * {FACTOR} FROM {t}"
                        ).fetchone()[0]
        print(t, n, "rows")

    _gen_documents(con)
    _gen_embeddings(con)
    print("done ->", DST)


def _gen_documents(con) -> None:
    rng = np.random.default_rng(42)
    rows = con.execute(
        "SELECT text, lang, source FROM documents").fetchall()
    n_src = len(rows)
    n_out = n_src * FACTOR
    # empirical unigram distribution + token-count distribution
    from collections import Counter
    vocab_counts: Counter = Counter()
    lengths = []
    for text, _, _ in rows:
        toks = text.split()
        lengths.append(len(toks))
        vocab_counts.update(toks)
    vocab = np.array(sorted(vocab_counts))
    probs = np.array([vocab_counts[w] for w in vocab], dtype=float)
    probs /= probs.sum()
    langs = np.array([r[1] for r in rows])
    sources = np.array([r[2] for r in rows])
    dup_extra = n_src - con.execute(
        "SELECT count(DISTINCT text) FROM documents").fetchone()[0]

    texts = []
    lens = rng.choice(lengths, size=n_out)
    for ln in lens:
        texts.append(" ".join(rng.choice(vocab, size=ln, p=probs)))
    # re-plant the observed exact-duplicate rate
    for _ in range(dup_extra * FACTOR):
        i, j = rng.integers(0, n_out, 2)
        texts[j] = texts[i]
    out = {
        "doc_id": np.arange(1, n_out + 1, dtype=np.int64),
        "text": texts,
        "lang": rng.choice(langs, size=n_out),
        "source": rng.choice(sources, size=n_out),
    }
    out["n_chars"] = np.array([len(t) for t in texts], dtype=np.int64)
    import pyarrow as pa
    import pyarrow.parquet as pq
    pq.write_table(pa.table(out), f"{DST}/documents.parquet")
    print("documents", n_out, "rows")


def _gen_embeddings(con) -> None:
    rng = np.random.default_rng(43)
    rows = con.execute(
        "SELECT embedding, label FROM embeddings").fetchall()
    emb = np.array([r[0] for r in rows], dtype=np.float32)
    labels = np.array([r[1] for r in rows], dtype=np.int64)
    n_out = len(rows) * FACTOR
    idx = rng.integers(0, len(rows), n_out)
    noise = rng.normal(0.0, 0.05 * emb.std(), (n_out, emb.shape[1])
                       ).astype(np.float32)
    vecs = emb[idx] + noise
    import pyarrow as pa
    import pyarrow.parquet as pq
    tbl = pa.table({
        "vec_id": np.arange(1, n_out + 1, dtype=np.int64),
        "embedding": pa.array(list(vecs),
                              type=pa.list_(pa.float32())),
        "label": labels[idx],
    })
    pq.write_table(tbl, f"{DST}/embeddings.parquet")
    print("embeddings", n_out, "rows")


if __name__ == "__main__":
    main()
