"""Build a LOCAL profiling corpus approximating a larger driver scale
factor from the read-only sf0.1 fixtures (for bench_extra profiling
only — never used by bench.py or any gate; the driver generates its
own measurement data).

Approach per table (factor k, default 10):
- documents: keep the 5000 originals, then generate fresh docs with
  token lengths and unigrams drawn from the empirical sf0.1
  distributions (the fixture generator is visibly iid-tokens-over-a-
  small-vocab), ids continuing upward.  Near-dup mass then comes from
  the same random-collision process as the fixtures, not from planted
  copies (mutated-copy corpora overstate dup mass badly).
- events / lineitem / orders / customer / part / supplier /
  embeddings: k key-shifted copies (referential integrity preserved
  by shifting every fk by the same per-copy offset); embeddings get
  small deterministic per-copy noise so ANN lanes don't see exact
  duplicate vectors.
- region / nation: copied as-is.

Each output table is written as ONE flat parquet file to mirror the
driver's single-file-per-table layout (what load_table's fan-out rule
sees at measurement scale).

Usage: python tools/make_profile_sf.py OUTDIR [k]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"


def one_file(con, sql: str, out: str) -> None:
    con.sql(
        f"copy ({sql}) to '{out}' (format parquet, row_group_size 1048576)"
    )


def main() -> None:
    out_dir = sys.argv[1]
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()

    # -- documents: empirical-resample fresh docs -------------------------
    rows = con.sql(
        f"select doc_id, text, lang, source from '{SRC}/documents.parquet'"
    ).fetchall()
    texts = [r[1] for r in rows]
    langs = [r[2] for r in rows]
    sources = [r[3] for r in rows]
    vocab: dict[str, int] = {}
    lengths = []
    for t in texts:
        toks = t.split()
        lengths.append(len(toks))
        for w in toks:
            vocab[w] = vocab.get(w, 0) + 1
    words = np.array(list(vocab))
    freqs = np.array([vocab[w] for w in words], dtype=np.float64)
    freqs /= freqs.sum()
    lengths = np.array(lengths)
    rng = np.random.default_rng(20260822)
    n_orig = len(texts)
    n_new = n_orig * (k - 1)
    new_lens = rng.choice(lengths, size=n_new)
    flat = rng.choice(words, size=int(new_lens.sum()), p=freqs)
    doc_ids = list(range(n_orig))
    out_texts = list(texts)
    out_langs = list(langs)
    out_sources = list(sources)
    pos = 0
    for i in range(n_new):
        ln = int(new_lens[i])
        out_texts.append(" ".join(flat[pos:pos + ln]))
        pos += ln
        doc_ids.append(n_orig + i)
        out_langs.append(langs[i % n_orig])
        out_sources.append(sources[i % n_orig])
    tbl = pa.table({
        "doc_id": pa.array(doc_ids, pa.int64()),
        "text": pa.array(out_texts, pa.string()),
        "lang": pa.array(out_langs, pa.string()),
        "source": pa.array(out_sources, pa.string()),
        "n_chars": pa.array([len(t) for t in out_texts], pa.int64()),
    })
    pq.write_table(tbl, f"{out_dir}/documents.parquet",
                   row_group_size=1 << 20)

    # -- key-shifted unions ----------------------------------------------
    copies = " union all ".join(
        f"""select event_id + {i} * 100000 as event_id,
                   ts + interval ({i} * 7) second as ts,
                   user_id + {i} * 1500 as user_id,
                   event_type, value, props
            from '{SRC}/events.parquet'"""
        for i in range(k)
    )
    one_file(con, copies, f"{out_dir}/events.parquet")

    copies = " union all ".join(
        f"""select l_orderkey + {i} * 600000 as l_orderkey,
                   l_partkey + {i} * 20000 as l_partkey,
                   l_suppkey + {i} * 1000 as l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            from '{SRC}/lineitem.parquet'"""
        for i in range(k)
    )
    one_file(con, copies, f"{out_dir}/lineitem.parquet")

    copies = " union all ".join(
        f"""select o_orderkey + {i} * 600000 as o_orderkey,
                   o_custkey + {i} * 15000 as o_custkey,
                   o_orderstatus, o_totalprice,
                   o_orderdate + interval ({i}) second as o_orderdate,
                   o_orderpriority
            from '{SRC}/orders.parquet'"""
        for i in range(k)
    )
    one_file(con, copies, f"{out_dir}/orders.parquet")

    copies = " union all ".join(
        f"""select c_custkey + {i} * 15000 as c_custkey,
                   c_name, c_nationkey, c_acctbal, c_mktsegment
            from '{SRC}/customer.parquet'"""
        for i in range(k)
    )
    one_file(con, copies, f"{out_dir}/customer.parquet")

    copies = " union all ".join(
        f"""select p_partkey + {i} * 20000 as p_partkey,
                   p_name, p_brand, p_type, p_size, p_retailprice
            from '{SRC}/part.parquet'"""
        for i in range(k)
    )
    one_file(con, copies, f"{out_dir}/part.parquet")

    copies = " union all ".join(
        f"""select s_suppkey + {i} * 1000 as s_suppkey,
                   s_name, s_nationkey, s_acctbal
            from '{SRC}/supplier.parquet'"""
        for i in range(k)
    )
    one_file(con, copies, f"{out_dir}/supplier.parquet")

    # -- embeddings: per-copy deterministic noise ------------------------
    emb = con.sql(
        f"select vec_id, embedding, label from '{SRC}/embeddings.parquet'"
    ).fetchall()
    n = len(emb)
    dim = len(emb[0][1])
    base = np.array([e[1] for e in emb], dtype=np.float32)
    ids, vecs, labels = [], [], []
    for i in range(k):
        noise = (np.random.default_rng(1000 + i).standard_normal(
            (n, dim)).astype(np.float32) * (0.0 if i == 0 else 0.05))
        ids.extend(int(e[0]) + i * n for e in emb)
        vecs.append(base + noise)
        labels.extend(int(e[2]) for e in emb)
    vecs = np.concatenate(vecs)
    tbl = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    })
    pq.write_table(tbl, f"{out_dir}/embeddings.parquet",
                   row_group_size=1 << 20)

    for t in ("region", "nation"):
        one_file(con, f"select * from '{SRC}/{t}.parquet'",
                 f"{out_dir}/{t}.parquet")
    print("wrote", out_dir, "k=", k)


if __name__ == "__main__":
    main()
