"""Derive a larger deterministic scale tier from the driver's sf0.1.

The driver ships sf{0.001,0.01,0.1} only (TESTDATA.md — read-only).
Round-4's experience is that each 10x tier surfaces real scale bugs the
correctness gate cannot see, so round 5 needs an sf1: this tool builds
one BY DERIVATION from sf0.1 — no external data, fully deterministic —
into a local directory (default /root/repo/localdata/sf1, gitignored).

Replication rules (R replicas, default 10):

- region / nation: fixed dimensions, copied verbatim.
- customer / supplier / part / orders / lineitem: R replicas with every
  key column offset by ``r * stride`` where stride = max(key)+1 from
  sf0.1 — foreign keys stay consistent *within* a replica, so join
  selectivities and per-key group sizes match sf0.1 while table sizes
  grow 10x (the realistic "more customers, same behavior" scale-up).
- events: R replicas; event_id and user_id strided (10x users, same
  per-user activity — the shape the band/as-of/session operators must
  scale along); ts kept, so wall-clock window density grows 10x.
- documents: doc_id strided; for r > 0 every whitespace token gets an
  ``_r{r}`` suffix.  Jaccard/MinHash/SimHash similarity is invariant
  under a per-replica bijective token rename, so each replica
  reproduces sf0.1's near-dup structure exactly while CROSS-replica
  similarity drops to zero — output sizes scale linearly (10x), not
  quadratically (100x), which is what "same corpus distribution, more
  of it" means.  n_chars is recomputed from the new text.
- embeddings: vec_id strided; for r > 0 the vector is multiplied
  element-wise by a deterministic ±1 pattern seeded by r.  A shared
  sign pattern preserves all within-replica cosines and norms exactly;
  across replicas cosines scramble toward 0 — again linear growth of
  the near-dup output.

Usage: python tools/make_sf.py [out_dir] [replicas]
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

# table -> columns needing a per-replica offset (strides from max+1)
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
}
# key domains shared across tables (FK -> PK) must use ONE stride
DOMAIN = {
    "c_custkey": "custkey", "o_custkey": "custkey",
    "s_suppkey": "suppkey", "l_suppkey": "suppkey",
    "p_partkey": "partkey", "l_partkey": "partkey",
    "o_orderkey": "orderkey", "l_orderkey": "orderkey",
    "event_id": "eventid", "user_id": "userid",
}


def _strides(con, src: str) -> dict[str, int]:
    out: dict[str, int] = {}
    for tbl, cols in KEYED.items():
        for c in cols:
            dom = DOMAIN[c]
            mx = con.sql(
                f"SELECT max({c}) FROM '{src}/{tbl}.parquet'"
            ).fetchone()[0]
            out[dom] = max(out.get(dom, 0), int(mx) + 1)
    return out


def build(out_dir: str, replicas: int = 10, src: str = SRC) -> None:
    """Build the derived tier ATOMICALLY: everything is written into a
    temp sibling directory that is renamed into place only once every
    table is complete.  Guarantees ``out_dir exists => tier complete``,
    so a crashed/interrupted build can never leave a partial tier that
    bench.py's isdir() check would silently benchmark forever after,
    and a rebuild with a different replica count can never mix stale
    part files from the previous run into the new tier."""
    tmp_dir = f"{out_dir}.tmp-{os.getpid()}"
    if os.path.isdir(tmp_dir):
        shutil.rmtree(tmp_dir)
    done_dir, out_dir = out_dir, tmp_dir
    os.makedirs(out_dir)
    con = duckdb.connect()
    strides = _strides(con, src)

    for tbl in ("region", "nation"):
        shutil.copyfile(f"{src}/{tbl}.parquet", f"{out_dir}/{tbl}.parquet")

    # one part file per replica (a directory named {tbl}.parquet, which
    # spark.read.parquet consumes transparently): a real 10x dataset
    # has ~10x the files, and a single coalesced file caps scan
    # parallelism at size/maxPartitionBytes — 2 tasks for the 6 MB
    # documents table, which under-parallelizes every profiled doc op
    for tbl, keys in KEYED.items():
        cols = [
            r[0]
            for r in con.sql(
                f"DESCRIBE SELECT * FROM '{src}/{tbl}.parquet'"
            ).fetchall()
        ]
        os.makedirs(f"{out_dir}/{tbl}.parquet", exist_ok=True)
        for r in range(replicas):
            sel = ", ".join(
                f"{c} + {r * strides[DOMAIN[c]]} AS {c}" if c in keys else c
                for c in cols
            )
            con.sql(
                f"COPY (SELECT {sel} FROM '{src}/{tbl}.parquet') "
                f"TO '{out_dir}/{tbl}.parquet/part-{r:04d}.parquet' "
                f"(FORMAT parquet)"
            )

    doc_stride = (
        int(
            con.sql(
                f"SELECT max(doc_id) FROM '{src}/documents.parquet'"
            ).fetchone()[0]
        )
        + 1
    )
    os.makedirs(f"{out_dir}/documents.parquet", exist_ok=True)
    for r in range(replicas):
        suffixed = (
            "text"
            if r == 0
            else f"regexp_replace(text, '(\\S+)', '\\1_r{r}', 'g')"
        )
        con.sql(
            f"""
            COPY (
              SELECT doc_id + {r * doc_stride} AS doc_id,
                     {suffixed} AS text, lang, source,
                     length({suffixed}) AS n_chars
              FROM '{src}/documents.parquet'
            ) TO '{out_dir}/documents.parquet/part-{r:04d}.parquet'
              (FORMAT parquet)
            """
        )

    emb = pq.read_table(f"{src}/embeddings.parquet")
    vec = np.asarray(emb.column("embedding").to_pylist(), dtype=np.float32)
    vid = emb.column("vec_id").to_numpy()
    lab = emb.column("label").to_numpy()
    n, dim = vec.shape
    stride = int(vid.max()) + 1
    os.makedirs(f"{out_dir}/embeddings.parquet", exist_ok=True)
    for r in range(replicas):
        signs = (
            np.ones(dim, dtype=np.float32)
            if r == 0
            else np.random.default_rng(1_000_003 * r)
            .choice(np.float32([-1.0, 1.0]), size=dim)
        )
        out = pa.table(
            {
                "vec_id": pa.array(vid + r * stride, pa.int64()),
                "embedding": pa.array(
                    (vec * signs).tolist(), pa.list_(pa.float32())
                ),
                "label": pa.array(lab, pa.int32()),
            }
        )
        pq.write_table(
            out, f"{out_dir}/embeddings.parquet/part-{r:04d}.parquet"
        )
    if os.path.isdir(done_dir):
        shutil.rmtree(done_dir)
    os.rename(out_dir, done_dir)
    print(f"wrote {done_dir} (replicas={replicas})")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/localdata/sf1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    build(out, reps)
