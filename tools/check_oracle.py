"""Local mimic of the driver's CORRECTNESS gate.

For every entry in __spark_entry__.queries(): run the Spark DataFrame
and the matching oracle_sql() through DuckDB on the same parquet dir,
then compare row count, column-name set, and an order-insensitive
value comparison (rows sorted by their full stringified tuple).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time
import traceback

import duckdb

sys.path.insert(0, ".")

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


class ListColumnError(TypeError):
    pass


def norm_cell(v):
    """STRICT normalization — deliberately at least as strict as the
    driver's hasher (round-1 lesson: the old Decimal→float + round-to-9
    coercions made local green while the driver was red):

    - floats compare by exact repr (no rounding) — queries must emit
      values that are bit-identical across engines;
    - Decimal objects pass through repr unchanged, so a DECIMAL output
      column fails locally exactly like it hash-mismatches the driver;
    - list/array cells are REJECTED outright (they crash the driver's
      pandas row sorter with 'unhashable type: list').
    """
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            v = 0.0  # -0.0 -> 0.0
        return repr(v)
    if isinstance(v, (list, tuple)):
        raise ListColumnError(
            "list-typed output cell — the driver's hasher crashes on these"
        )
    if hasattr(v, "tolist") and not isinstance(v, (bytes, str)):  # numpy
        return norm_cell(v.tolist())
    if hasattr(v, "isoformat"):
        return v.isoformat().replace("+00:00", "")
    return repr(v)


def to_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from topicalcrawler_spark.session import get_spark

    spark = get_spark(app_name="oracle-check", cpus=8, shuffle_partitions=8)
    qs, sqls = entrymod.queries(), entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
            s_cols, s_vals = to_rows(scols, [tuple(r) for r in srows])
        except Exception:
            print(f"FAIL {name}: SPARK ERROR")
            traceback.print_exc()
            n_fail += 1
            continue
        sql = sqls.get(name)
        if sql is None:
            # rows-only entries are a FAIL locally: the round-1 lesson
            # was that every registry entry must carry an exact oracle —
            # this keeps the leniency gap from silently re-opening.
            print(f"FAIL {name}: rows-only entry (no oracle SQL) — "
                  f"every registry entry must be exact-oracle-checked")
            n_fail += 1
            continue
        try:
            res = con.sql(sql)
            d_cols, d_vals = to_rows(res.columns, res.fetchall())
        except Exception:
            print(f"FAIL {name}: DUCKDB ERROR")
            traceback.print_exc()
            n_fail += 1
            continue
        if s_cols != d_cols:
            print(f"FAIL {name}: columns spark={s_cols} duck={d_cols}")
            n_fail += 1
            continue
        if len(s_vals) != len(d_vals):
            print(f"FAIL {name}: rowcount spark={len(s_vals)} duck={len(d_vals)}")
            n_fail += 1
            continue
        bad = [
            (a, b) for a, b in zip(s_vals, d_vals) if a != b
        ]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(s_vals)} rows differ; first:")
            print("  spark:", bad[0][0][:8])
            print("  duck :", bad[0][1][:8])
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s_vals)} rows, {time.monotonic()-t0:.1f}s)")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
