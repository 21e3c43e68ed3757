"""Harness-tool guarantees the benchmarks rely on.

make_sf.build's atomicity is load-bearing for bench.py's sf1 tier:
bench_sf1 treats ``os.path.isdir(sf1_dir)`` as "tier complete", so a
partial directory left by a crashed or replica-count-changed build
would be silently benchmarked forever after (round-5 review finding).
These tests pin the invariant ``out_dir exists => tier complete`` on
the tiny driver sf0.001 tables (~2 s per build).
"""

from __future__ import annotations

import os

import duckdb
import pytest

from tools import make_sf

SRC = "/root/testdata/sf0.001"


def _rows(path: str, tbl: str) -> int:
    return duckdb.sql(
        f"SELECT count(*) FROM '{path}/{tbl}.parquet/*.parquet'"
    ).fetchone()[0]


def test_make_sf_rebuild_replaces_atomically(tmp_path):
    out = str(tmp_path / "tier")
    make_sf.build(out, replicas=2, src=SRC)
    src_docs = duckdb.sql(
        f"SELECT count(*) FROM '{SRC}/documents.parquet'"
    ).fetchone()[0]
    assert _rows(out, "documents") == 2 * src_docs
    assert len(os.listdir(f"{out}/documents.parquet")) == 2

    # rebuild with a DIFFERENT replica count: the old tier must be
    # replaced wholesale — exactly 3 parts, exactly 3x rows, no stale
    # part-0000/0001 from the 2-replica run surviving into the read
    make_sf.build(out, replicas=3, src=SRC)
    assert _rows(out, "documents") == 3 * src_docs
    assert len(os.listdir(f"{out}/documents.parquet")) == 3
    assert _rows(out, "events") == 3 * duckdb.sql(
        f"SELECT count(*) FROM '{SRC}/events.parquet'"
    ).fetchone()[0]
    # keys stay collision-free across replicas (strided, dense-packed)
    assert duckdb.sql(
        f"SELECT count(DISTINCT doc_id) FROM "
        f"'{out}/documents.parquet/*.parquet'"
    ).fetchone()[0] == 3 * src_docs


def test_make_sf_crashed_build_leaves_no_partial_tier(tmp_path, monkeypatch):
    out = str(tmp_path / "tier")

    # embeddings are written LAST — failing there proves nothing lands
    # in out_dir even after every other table was fully written
    def boom(*a, **k):
        raise RuntimeError("simulated crash mid-build")

    monkeypatch.setattr(make_sf.pq, "write_table", boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        make_sf.build(out, replicas=2, src=SRC)
    assert not os.path.isdir(out)  # bench_sf1 would rebuild, not skip

    # and a crash during a REBUILD must leave the previous complete
    # tier untouched rather than half-replaced
    monkeypatch.undo()
    make_sf.build(out, replicas=2, src=SRC)
    monkeypatch.setattr(make_sf.pq, "write_table", boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        make_sf.build(out, replicas=3, src=SRC)
    assert len(os.listdir(f"{out}/documents.parquet")) == 2
