"""Degenerate-input sweep: every registered query on zero-row and
null-hostile fixtures.

At production scale a query's input is routinely EMPTY (partition
pruning, a selective date filter, a tenant with no data yet) or
carries nulls / empty strings / empty arrays in value columns. A
query that crashes there — ``IndexError`` on a collected artifact,
k-means with zero points, division by zero — is a scale bug the
non-degenerate sf fixtures can never surface. This sweep runs the
FULL registry against schema-identical degenerate fixtures, and for
every query with an oracle it runs the same driver-replica strict
compare as ``driver_sim.py`` — so Spark's and DuckDB's empty-input /
null semantics (``SUM() -> NULL``, null group keys, concat-vs-null)
are adjudicated, not just "didn't crash".

Usage:
    python scripts/degenerate_sweep.py make [base_dir]
    python scripts/degenerate_sweep.py run {empty|hostile|unicode} [base_dir] [names...]

``make`` writes ``<base>/empty/*.parquet`` (zero rows, exact arrow
schema of the driver fixtures) and ``<base>/hostile/*.parquet`` (a
few real rows plus rows with NULL / '' / [] in value columns; key
columns stay non-null — the engine's documented precondition).
Default base: ``/root/repo/.scale/degenerate`` (gitignored).
"""

from __future__ import annotations

import os
import sys
import time
import traceback

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

SRC_SF = "/root/testdata/sf0.001"
DEFAULT_BASE = os.path.join(REPO, ".scale", "degenerate")

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

#: Columns that must stay non-null in the hostile fixture — the
#: engine's documented ingest contract, two classes:
#: * join / identity KEYS;
#: * STRUCTURAL payloads validated at write time in any production
#:   deployment: ``embeddings.embedding`` (an ANN index enforces
#:   fixed dimensionality at build — ragged/NULL vectors are rejected
#:   upstream, and the engine's numpy paths fail LOUDLY on violation,
#:   never silently corrupt) and ``events.ts`` (event time: the
#:   streaming transport stamps every record; watermarking over NULL
#:   event time is meaningless). Everything else — entity attributes
#:   (user_id, event_type, value, props), text/doc columns, dimension
#:   strings, numerics — is fair game for NULL / '' / [] injection
#:   and must be BOTH crash-free and DuckDB-oracle-exact.
_KEY_COLS = {
    "r_regionkey", "n_nationkey", "n_regionkey", "c_custkey",
    "c_nationkey", "s_suppkey", "s_nationkey", "p_partkey",
    "o_orderkey", "o_custkey", "l_orderkey", "l_partkey", "l_suppkey",
    "l_linenumber", "event_id", "doc_id", "vec_id",
    # structural payloads (see above)
    "embedding", "ts",
}


def _strip_pandas_meta(schema: pa.Schema) -> pa.Schema:
    return schema.remove_metadata()


#: Free-text columns that take multibyte content in the `unicode`
#: variant. Domain-coded columns (order/line status, returnflag,
#: priority, event_type, split) keep their enumerated values — queries
#: legitimately encode their domains.
_UNICODE_COLS = {
    "text", "source", "lang", "p_name", "p_type", "p_brand",
    "c_name", "s_name", "n_name", "r_name", "c_mktsegment",
}

#: Multibyte samples, each a distinct unicode hazard: accented latin
#: (2-byte), CJK with and without spaces (3-byte, tokenization),
#: emoji (4-byte, surrogate-pair territory in UTF-16 engines), RTL
#: arabic, combining marks (NFD 'e'+U+0301 vs precomposed NFC é),
#: and sharp-s (case-mapping expands ß→SS in some libraries).
_UNICODE_SAMPLES = (
    "héllo wörld français",
    "こんにちは 世界 日本語テキスト",
    "全角空白なし連結テキスト",
    "🦀 emoji 🚀 test 🌍",
    "مرحبا بالعالم النص العربي",
    "café vs café nfd nfc",
    "straße GROSS ß",
)


def make_fixtures(base: str) -> None:
    empty_dir = os.path.join(base, "empty")
    hostile_dir = os.path.join(base, "hostile")
    os.makedirs(empty_dir, exist_ok=True)
    os.makedirs(hostile_dir, exist_ok=True)
    for t in TABLES:
        src = os.path.join(SRC_SF, f"{t}.parquet")
        schema = _strip_pandas_meta(pq.read_schema(src))
        # Zero-row, schema-exact.
        pq.write_table(schema.empty_table(),
                       os.path.join(empty_dir, f"{t}.parquet"))
        # Hostile: first 6 real rows, then per value-column one row
        # with that column nulled (others from row 0), plus for
        # string columns an empty-string row and for list columns an
        # empty-list row.
        head = pq.read_table(src).slice(0, 6)
        cols = {name: head.column(name).to_pylist()
                for name in schema.names}
        n_base = len(cols[schema.names[0]])
        next_key = 1_000_000  # fresh key values for injected rows

        def add_row(mutate: dict) -> None:
            nonlocal next_key
            for name in schema.names:
                if name in mutate:
                    v = mutate[name]
                elif name in _KEY_COLS and pa.types.is_integer(
                    schema.field(name).type
                ):
                    v = next_key
                    next_key += 1
                else:
                    v = cols[name][0]
                cols[name].append(v)

        for field in schema:
            if field.name in _KEY_COLS:
                continue
            add_row({field.name: None})
            if pa.types.is_string(field.type):
                add_row({field.name: ""})
            elif pa.types.is_list(field.type):
                add_row({field.name: []})
        arrays = [pa.array(cols[f.name], type=f.type) for f in schema]
        tbl = pa.Table.from_arrays(arrays, schema=schema)
        pq.write_table(tbl, os.path.join(hostile_dir, f"{t}.parquet"))

        # Unicode variant: head rows plus one row per multibyte sample
        # with every free-text column set to it (props gets a JSON
        # wrapper so parse paths see valid JSON with unicode values).
        ucols = {name: head.column(name).to_pylist()
                 for name in schema.names}
        u_injected = 0
        if any(f.name in _UNICODE_COLS or f.name == "props"
               for f in schema):
            for s in _UNICODE_SAMPLES:
                for name in schema.names:
                    if name in _UNICODE_COLS:
                        v = s
                    elif name == "props":
                        v = '{"k": 7, "note": ' + \
                            '"' + s.replace('"', '') + '"}'
                    elif name in _KEY_COLS and pa.types.is_integer(
                        schema.field(name).type
                    ):
                        v = next_key
                        next_key += 1
                    else:
                        v = ucols[name][0]
                    ucols[name].append(v)
                u_injected += 1
        u_arrays = [pa.array(ucols[f.name], type=f.type) for f in schema]
        u_tbl = pa.Table.from_arrays(u_arrays, schema=schema)
        unicode_dir = os.path.join(base, "unicode")
        os.makedirs(unicode_dir, exist_ok=True)
        pq.write_table(u_tbl, os.path.join(unicode_dir, f"{t}.parquet"))
        print(f"{t}: empty 0 rows, hostile {tbl.num_rows} rows "
              f"({tbl.num_rows - n_base} injected), unicode "
              f"{u_tbl.num_rows} rows ({u_injected} injected)")


def run_sweep(sf_dir: str, only: list[str]) -> int:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("degenerate-sweep")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    import __spark_entry__ as entrymod
    from oracle_harness import assert_flat_output_schema, compare

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = [n for n in queries if not only or n in only]
    failures = []
    for i, name in enumerate(names, 1):
        t0 = time.perf_counter()
        try:
            if name in oracles:
                compare(spark, sf_dir, name, queries[name], oracles[name])
                status = "ok (oracle)"
            else:
                df = queries[name](spark, sf_dir)
                assert_flat_output_schema(name, df)
                n = df.count()
                status = f"ok (rows-only, {n} rows)"
        except Exception:
            status = "FAIL"
            failures.append(name)
            traceback.print_exc(limit=4)
        print(f"[{i:3d}/{len(names)}] {name}: {status} "
              f"({time.perf_counter() - t0:.2f}s)", flush=True)
    spark.stop()
    print(f"\n{len(names) - len(failures)}/{len(names)} green on {sf_dir}")
    if failures:
        print("FAILURES:", failures)
        return 1
    return 0


def main() -> int:
    if len(sys.argv) < 2 or sys.argv[1] not in ("make", "run"):
        print(__doc__)
        return 2
    if sys.argv[1] == "make":
        base = sys.argv[2] if len(sys.argv) > 2 else DEFAULT_BASE
        make_fixtures(base)
        return 0
    variant = sys.argv[2]
    base = sys.argv[3] if len(sys.argv) > 3 else DEFAULT_BASE
    only = sys.argv[4:]
    return run_sweep(os.path.join(base, variant), only)


if __name__ == "__main__":
    sys.exit(main())
