"""Generate a local sf1.0-scale MEASUREMENT dataset at /root/sfx/sf1.0.

The driver's round-end bench runs at a driver-generated sf1.0 (BENCH_r06
records sf=1.0) that is not present under /root/testdata (read-only,
sf<=0.1). This script synthesizes a dataset with the same shape so
optimization work can be measured at the scale the driver grades:

* documents: 50k rows, 30-word uniform vocab, word count U[10,100],
  5% near-dup chains ("<earlier text> dup") — matches the observed
  sf0.1 distribution (5000 docs, 250 near-dups, avg 54 words) and
  reproduces the ~2.6M shingle-row / ~127M candidate-pair blowup the
  round-6 bench measured at sf1.0.
* lineitem/orders/customer/part/supplier: 10 shifted copies of sf0.1
  (all FK domains offset consistently -> same join selectivity, 10x keys).
* events: 10 copies, same 30-day window (matches driver scaling: the
  user population grows with sf, the window does not).
* embeddings: 20k unit vectors, dim 64, labels 0..9.

Deterministic (seed 4242). NOT driver data — numbers measured on it are
comparable round-over-round locally but are not the driver's numbers.
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = "/root/sfx/sf1.0"
COPIES = 10

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "row",
    "the", "agg", "key", "query", "a", "scan", "batch",
]
LANGS = ["en", "en", "en", "en", "en", "en", "de", "fr", "es", "zh"]


def documents(rng: np.random.Generator, n: int = 50_000) -> pa.Table:
    texts: list[str] = []
    for i in range(n):
        if i > 0 and rng.random() < 0.05:
            texts.append(texts[rng.integers(0, i)] + " dup")
        else:
            k = int(rng.integers(10, 101))
            texts.append(" ".join(VOCAB[j] for j in rng.integers(0, len(VOCAB), k)))
    return pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array([LANGS[int(x)] for x in rng.integers(0, len(LANGS), n)]),
            "source": pa.array([f"src{int(x)}" for x in rng.integers(0, 20, n)]),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def embeddings(rng: np.random.Generator, n: int = 20_000, dim: int = 64) -> pa.Table:
    v = rng.standard_normal((n, dim)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(list(v), pa.list_(pa.float32())),
            "label": pa.array(rng.integers(0, 10, n), pa.int32()),
        }
    )


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    rng = np.random.default_rng(4242)
    pq.write_table(documents(rng), f"{OUT}/documents.parquet")
    pq.write_table(embeddings(rng), f"{OUT}/embeddings.parquet")

    con = duckdb.connect()
    con.sql(f"CREATE VIEW gs AS SELECT unnest(generate_series(0, {COPIES - 1})) AS c")
    copyspec = {
        "lineitem": (
            "l_orderkey + c*150000 AS l_orderkey, l_partkey + c*20000 AS l_partkey,"
            " l_suppkey + c*1000 AS l_suppkey, l_linenumber, l_quantity,"
            " l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate"
        ),
        "orders": "o_orderkey + c*150000 AS o_orderkey, o_custkey + c*15000 AS o_custkey, * EXCLUDE (o_orderkey, o_custkey)",
        "customer": "c_custkey + c*15000 AS c_custkey, * EXCLUDE (c_custkey)",
        "part": "p_partkey + c*20000 AS p_partkey, * EXCLUDE (p_partkey)",
        "supplier": "s_suppkey + c*1000 AS s_suppkey, * EXCLUDE (s_suppkey)",
        "events": "event_id + c*100000 AS event_id, user_id + c*1500 AS user_id, * EXCLUDE (event_id, user_id)",
    }
    for t, sel in copyspec.items():
        con.sql(
            f"COPY (SELECT {sel} FROM read_parquet('{SRC}/{t}.parquet'), gs"
            f" ORDER BY 1) TO '{OUT}/{t}.parquet' (FORMAT PARQUET)"
        )
    for t in ("region", "nation"):
        con.sql(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet'))"
            f" TO '{OUT}/{t}.parquet' (FORMAT PARQUET)"
        )
    for t in [*copyspec, "region", "nation", "documents", "embeddings"]:
        n = con.sql(f"SELECT count(*) FROM read_parquet('{OUT}/{t}.parquet')").fetchone()[0]
        print(t, n)


if __name__ == "__main__":
    main()
