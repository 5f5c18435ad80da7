"""Stage a LARGER-scale perf fixture (default sf1.0 = 10x sf0.1) for the
empirical scale check (scripts/scale_check.py).

The driver's generator isn't available in-repo, so this reproduces the
observed fixture process rather than copying it:

* TPC-H tables + events are REPLICATE-WITH-REMAP from sf0.1: K copies,
  every key column offset by copy_index * (source key-range stride), so
  referential integrity, value distributions, per-key fan-outs, and
  skew shape are preserved EXACTLY while group-by/join cardinalities
  scale by K. (The standard scale-stretch for relational perf tests.)
* documents are GENERATED FRESH at K x rows with the observed process
  (measured on sf0.1): uniform tokens from the 30-word vocabulary,
  uniform length 10..100, lang weights {en .412, zh .151, es .149,
  fr .148, de .140}, source = f"src{doc_id % 20}", 5% near-dup docs
  (copy of an earlier doc + " dup") and 0.16% exact dups. Replicating
  texts verbatim would inflate every dup group by K and blow the
  pair-producing dedup stages QUADRATICALLY — not what a real K x
  corpus looks like; fresh generation keeps the dup RATE constant,
  which is the honest scaling regime for c02/c04/c07-style operators.
* embeddings are unit-normalized 64-dim gaussians (the observed
  vectors are unit-norm, isotropic, label-balanced); the count follows
  the fixture's own 4x-per-decade curve (500 -> 2000 -> 8000).

Output layout matches /root/testdata/sf*/: one <table>.parquet FILE per
table. Note one physical difference: DuckDB writes ~122k-row row
groups, so the sf1.0 lineitem scan parallelizes across ~49 groups while
the driver's sf0.1 file is a single row group — scan-bound queries can
therefore scale BETTER than K x; scale_check.py documents this.

Usage: python scripts/gen_scale_fixture.py [out_dir] [src_dir] [K]
       (defaults: .scale/sf1.0  /root/testdata/sf0.1  10)
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "the",
    "row", "agg", "key", "query", "a", "scan", "batch",
]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_W = [0.412, 0.151, 0.149, 0.148, 0.140]
NEAR_DUP_FRAC = 0.05
EXACT_DUP_FRAC = 0.0016


def gen_documents(n: int, rng: np.random.Generator) -> pa.Table:
    lengths = rng.integers(10, 101, size=n)
    texts = [
        " ".join(VOCAB[t] for t in rng.integers(0, len(VOCAB), size=ln))
        for ln in lengths
    ]
    # near-dups: copy of a random OTHER doc + " dup" (observed shape)
    for i in rng.choice(n, size=int(n * NEAR_DUP_FRAC), replace=False):
        src = int(rng.integers(0, n - 1))
        texts[i] = texts[src if src != i else n - 1] + " dup"
    # exact dups
    for i in rng.choice(n, size=int(n * EXACT_DUP_FRAC), replace=False):
        src = int(rng.integers(0, n - 1))
        texts[i] = texts[src if src != i else n - 1]
    langs = rng.choice(LANGS, size=n, p=LANG_W)
    return pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs.tolist(), pa.string()),
            "source": pa.array([f"src{i % 20}" for i in range(n)], pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def gen_embeddings(m: int, dim: int, rng: np.random.Generator) -> pa.Table:
    x = rng.standard_normal((m, dim))
    x = (x / np.linalg.norm(x, axis=1, keepdims=True)).astype(np.float32)
    return pa.table(
        {
            "vec_id": pa.array(range(m), pa.int64()),
            "embedding": pa.array(x.tolist(), pa.list_(pa.float32())),
            "label": pa.array(
                rng.integers(0, 10, size=m).tolist(), pa.int32()
            ),
        }
    )


#: (table, [key columns offset per copy]); stride = max(key)+1 read
#: from the source so copies never collide.
_REPLICATE = {
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
    "nation": [],
    "region": [],
}
#: Name columns regenerated from the remapped key so replicated rows
#: keep the reference format instead of K identical names per entity.
_NAME_FMT = {
    "customer": ("c_name", "Customer#%09d", "c_custkey"),
    "supplier": ("s_name", "Supplier#%09d", "s_suppkey"),
}


def replicate(con, src_dir: str, out_dir: str, table: str, k: int) -> int:
    src = f"{src_dir}/{table}.parquet"
    keys = _REPLICATE[table]
    if not keys:  # fixed dimension tables: straight copy
        con.execute(
            f"COPY (SELECT * FROM '{src}') TO '{out_dir}/{table}.parquet'"
        )
        return con.execute(f"SELECT COUNT(*) FROM '{src}'").fetchone()[0]
    strides = {
        key: con.execute(f"SELECT MAX({key}) + 1 FROM '{src}'").fetchone()[0]
        for key in keys
    }
    cols = [c[0] for c in con.execute(f"DESCRIBE SELECT * FROM '{src}'").fetchall()]
    exprs = []
    for c in cols:
        if c in strides:
            exprs.append(f"{c} + i * {strides[c]} AS {c}")
        elif table in _NAME_FMT and c == _NAME_FMT[table][0]:
            name_col, fmt, key = _NAME_FMT[table]
            exprs.append(
                f"printf('{fmt}', {key} + i * {strides[key]}) AS {name_col}"
            )
        else:
            exprs.append(c)
    con.execute(
        f"COPY (SELECT {', '.join(exprs)} FROM '{src}' "
        f"CROSS JOIN range({k}) t(i) ORDER BY i) "
        f"TO '{out_dir}/{table}.parquet'"
    )
    return con.execute(
        f"SELECT COUNT(*) FROM '{out_dir}/{table}.parquet'"
    ).fetchone()[0]


def main() -> int:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, ".scale", "sf1.0"
    )
    src_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(9042)
    con = duckdb.connect()

    n_docs = k * con.execute(
        f"SELECT COUNT(*) FROM '{src_dir}/documents.parquet'"
    ).fetchone()[0]
    pq.write_table(gen_documents(n_docs, rng), f"{out_dir}/documents.parquet")
    print(f"documents: {n_docs} rows (fresh, dup rates preserved)", flush=True)

    m_src, dim = con.execute(
        f"SELECT COUNT(*), MAX(len(embedding)) FROM '{src_dir}/embeddings.parquet'"
    ).fetchone()
    m = 4 * m_src  # the fixture's own 4x-per-decade embedding curve
    pq.write_table(gen_embeddings(m, dim, rng), f"{out_dir}/embeddings.parquet")
    print(f"embeddings: {m} rows x {dim} dims (fresh unit vectors)", flush=True)

    for table in _REPLICATE:
        n = replicate(con, src_dir, out_dir, table, k)
        print(f"{table}: {n} rows", flush=True)
    print(f"scale fixture staged at {out_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
