"""Generate the 10x sf1 scaling replica used by the SCALING.md probes.

Corpus model (matches the round-5 full-registry probe): K=10 key-shifted
copies of every sf0.1 table, preserving referential integrity — each key
domain gets its own stride (max+1 at sf0.1), and every foreign key shifts
by the same stride as its referenced primary key, so joins line up within
a copy and never across copies. Data-dependent cardinalities therefore
scale exactly 10x:

- ``documents``: every whitespace word is suffixed ``c{i}`` in copy i>0, so
  gram/fingerprint/vocab volumes scale linearly instead of collapsing into
  10x-duplicate buckets (which would distort dedup-family curves).
- ``embeddings``: copy i>0 is masked by a deterministic Rademacher sign
  vector (sha256 of (i, pos)) — norms and within-copy cosine structure are
  preserved, across-copy vectors decorrelate, so ANN candidate volumes
  scale honestly.
- ``embeddings.label`` shifts per copy like a key domain: the label is the
  near-dup family's blocking bucket (the stand-in for a trained quantizer,
  whose cell count grows with the corpus), so bucket CARDINALITY must
  scale 10x while bucket SIZE stays flat — copying labels verbatim makes
  the label-blocked pair space grow 100x, a replica artifact rather than
  an operator property.
- TPC-H tables + events: pure key shifts; timestamps/dates/measures are
  copied verbatim (same time range at 10x density).

Output parquet is written with bounded row groups (~64 per table). Parquet
scan parallelism is row-group-granular: a single-row-group file — which is
what a naive ``pyarrow.write_table`` produces, and what burned the first
version of this script — serializes every downstream scan into ONE task no
matter how many executors exist, turning a 10x replica into a 10x
single-thread wall-clock cliff (measured: 17x on the label-blocked pair
join). The same lesson applies at 100 TB: file/row-group layout is part of
the engine's scan parallelism budget.

Usage: python tests/make_sf1.py [src_dir] [dst_dir]   (defaults
/root/testdata/sf0.1 -> /tmp/sf1). Then:
SPARK_GRAFT_SF_DIR=/tmp/sf1 python bench.py
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

K = 10

# table -> [(column, key_domain)] — every column in one domain shifts by
# that domain's stride, wherever it appears.
_KEYED = {
    "region": [("r_regionkey", "region")],
    "nation": [("n_nationkey", "nation"), ("n_regionkey", "region")],
    "customer": [("c_custkey", "cust"), ("c_nationkey", "nation")],
    "supplier": [("s_suppkey", "supp"), ("s_nationkey", "nation")],
    "part": [("p_partkey", "part")],
    "orders": [("o_orderkey", "order"), ("o_custkey", "cust")],
    "lineitem": [
        ("l_orderkey", "order"),
        ("l_partkey", "part"),
        ("l_suppkey", "supp"),
    ],
    "events": [("event_id", "event"), ("user_id", "user")],
}


def _strides(con: duckdb.DuckDBPyConnection, src: str) -> dict[str, int]:
    dom_max: dict[str, int] = {}
    for table, cols in _KEYED.items():
        for col, dom in cols:
            m = con.sql(
                f"SELECT max({col}) FROM read_parquet('{src}/{table}.parquet')"
            ).fetchone()[0]
            dom_max[dom] = max(dom_max.get(dom, 0), int(m))
    return {d: m + 1 for d, m in dom_max.items()}


def _copy_keyed(con, src: str, dst: str, table: str, strides: dict[str, int]):
    shifted = dict(_KEYED[table])
    cols = [
        r[0]
        for r in con.sql(
            f"DESCRIBE SELECT * FROM read_parquet('{src}/{table}.parquet')"
        ).fetchall()
    ]
    selects = []
    for i in range(K):
        exprs = ", ".join(
            f"{c} + {i * strides[shifted[c]]} AS {c}" if c in shifted else c
            for c in cols
        )
        selects.append(
            f"SELECT {exprs} FROM read_parquet('{src}/{table}.parquet')"
        )
    n = K * con.sql(
        f"SELECT count(*) FROM read_parquet('{src}/{table}.parquet')"
    ).fetchone()[0]
    con.execute(
        f"COPY ({' UNION ALL '.join(selects)}) TO '{dst}/{table}.parquet'"
        f" (FORMAT PARQUET, ROW_GROUP_SIZE {_row_group_size(n)})"
    )


def _rademacher(i: int, dims: int) -> np.ndarray:
    signs = np.empty(dims, dtype=np.float32)
    for pos in range(dims):
        h = hashlib.sha256(f"{i}:{pos}".encode()).digest()
        signs[pos] = 1.0 if h[0] % 2 == 0 else -1.0
    return signs


def _row_group_size(total: int) -> int:
    """~64 row groups per table so scans parallelize (see module note)."""
    return max(1024, total // 64)


def _copy_documents(src: str, dst: str) -> None:
    t = pq.read_table(f"{src}/documents.parquet")
    doc_id = t.column("doc_id").to_numpy()
    stride = int(doc_id.max()) + 1
    texts = t.column("text").to_pylist()
    out = []
    for i in range(K):
        if i == 0:
            new_texts = texts
        else:
            suf = f"c{i}"
            new_texts = [
                None
                if x is None
                else " ".join(w + suf for w in x.split(" "))
                for x in texts
            ]
        out.append(
            pa.table(
                {
                    "doc_id": pa.array(doc_id + i * stride, type=pa.int64()),
                    "text": pa.array(new_texts, type=pa.string()),
                    "lang": t.column("lang"),
                    "source": t.column("source"),
                    "n_chars": t.column("n_chars"),
                }
            )
        )
    merged = pa.concat_tables(out)
    pq.write_table(
        merged,
        f"{dst}/documents.parquet",
        row_group_size=_row_group_size(merged.num_rows),
    )


def _copy_embeddings(src: str, dst: str) -> None:
    t = pq.read_table(f"{src}/embeddings.parquet")
    vec_id = t.column("vec_id").to_numpy()
    stride = int(vec_id.max()) + 1
    vecs = np.array(t.column("embedding").to_pylist(), dtype=np.float32)
    dims = vecs.shape[1]
    label = t.column("label").to_numpy()
    label_stride = int(label.max()) + 1
    out = []
    for i in range(K):
        masked = vecs if i == 0 else vecs * _rademacher(i, dims)
        out.append(
            pa.table(
                {
                    "vec_id": pa.array(vec_id + i * stride, type=pa.int64()),
                    "embedding": pa.array(
                        list(masked), type=pa.list_(pa.float32())
                    ),
                    "label": pa.array(
                        label + i * label_stride, type=pa.int32()
                    ),
                }
            )
        )
    merged = pa.concat_tables(out)
    pq.write_table(
        merged,
        f"{dst}/embeddings.parquet",
        row_group_size=_row_group_size(merged.num_rows),
    )


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    strides = _strides(con, src)
    for table in _KEYED:
        _copy_keyed(con, src, dst, table, strides)
        print(f"{table}: x{K}")
    _copy_documents(src, dst)
    print("documents: x10 (word-suffixed)")
    _copy_embeddings(src, dst)
    print("embeddings: x10 (Rademacher-masked)")


if __name__ == "__main__":
    main()
