"""URL-seen deduplication — J1 (two-phase), T1 (deterministic union-dedup).

North-rule (``BASELINE.json:14``) requires the *exact* URL-seen set, so
a Bloom filter alone can never be the authority (false positives would
silently drop URLs the reference fetches).  Architecture:

  phase 1 (optional, scale): bloom-shard prefilter inside an
           Arrow-batch UDF — drops ~(1-fpp) of already-seen candidates
           before any shuffle;
  phase 2 (authority): exact left_anti join against the seen table on
           (url_hash, url_canon) — hash first so the join keys compare
           cheaply, canonical string second so a 64-bit collision can
           never merge two distinct URLs (at 10^10 keys the birthday
           bound makes pure-hash joins wrong).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..core import bloom
from ..functions import order_cols


def shard_ids(keys: np.ndarray, n_shards: int) -> np.ndarray:
    """Shard assignment = top log2(n_shards) bits of the unsigned
    url_hash.  Computable from the key alone (the probe side needs
    that) AND aligned with the seen table's url_hash RANGE partitioning
    — so one partition overlaps only ~1-2 shards, which is what lets
    the builder keep just a couple of partial bitmaps per task.
    n_shards must be a power of two."""
    shift = np.uint64(64 - int(math.log2(n_shards)))
    return (
        np.ascontiguousarray(keys.astype(np.int64)).view(np.uint64) >> shift
    ).astype(np.int64)


def dedup_batch(links: DataFrame) -> DataFrame:
    """T1 — collapse duplicate url_canon within one discovery batch,
    keeping the row that is *first in frontier order* (deterministic —
    never dropDuplicates, which keeps an arbitrary row)."""
    w = Window.partitionBy("url_canon").orderBy(*order_cols())
    return (
        links.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def anti_join_seen(links: DataFrame, seen: DataFrame) -> DataFrame:
    """J1 phase 2 — the exact-set authority."""
    return links.join(seen, ["url_hash", "url_canon"], "left_anti")


def bloom_prefilter(
    links: DataFrame, shard_bits: list[bytes], n_shards: int, k: int
) -> DataFrame:
    """J1 phase 1 — probe broadcast bloom shards; keep rows the filter
    says are unseen, plus route possible-hits onward (the exact join
    then decides).  Returns links annotated with ``maybe_seen``.

    Shards are keyed by the top url_hash bits (``shard_ids``) — aligned
    with the url_hash range partitioning of the seen table, so a probe
    task touches ~1-2 shard bitmaps.
    """
    from pyspark.sql import types as T

    sc = links.sparkSession.sparkContext
    b_shards = sc.broadcast([np.frombuffer(b, dtype=np.uint8) for b in shard_bits])

    # never .add() onto df.schema — it mutates the DataFrame's cached schema
    out_schema = T.StructType(
        list(links.schema.fields) + [T.StructField("maybe_seen", T.BooleanType())]
    )

    def probe_iter(batches):
        shards = b_shards.value
        for pdf in batches:
            keys = pdf["url_hash"].to_numpy(dtype=np.int64)
            sids = shard_ids(keys, n_shards)
            hit = np.zeros(len(pdf), dtype=bool)
            for sid in np.unique(sids):
                m = sids == sid
                hit[m] = bloom.probe(keys[m], shards[sid], k)
            yield pdf.assign(maybe_seen=pd.Series(hit, index=pdf.index))

    return links.mapInPandas(probe_iter, schema=out_schema)


def build_bloom_shards(
    seen: DataFrame, n_shards: int, fpp: float = 0.01, total: int | None = None
) -> tuple[list[bytes], int]:
    """A5 — per-shard bloom bitmaps, built scale-safe; returns
    (bitmaps, k).

    Round-1's grouped-map build pulled every url_hash of a shard into
    ONE pandas group (~5 GB of keys per task at the 10^10-key design
    point) and was replaced by:

      1. ``mapInPandas`` over the seen table's existing partitions —
         each task STREAMS its Arrow batches into at most a couple of
         partial bitmaps (shard = top url_hash bits, which aligns with
         the table's url_hash range partitioning), so per-task memory
         is O(bitmap), never O(keys);
      2. a tiny grouped OR-merge of the partials per shard
         (``bloom.merge``, commutative + property-tested);
      3. one collect of the n_shards merged bitmaps for broadcast.  At
         10^10 keys the documented crossover (SURVEY.md §4) is
         partition-local bitmap files probed in place of a driver
         broadcast — the build path above already never concentrates
         keys anywhere.

    All shards share one (n_bits, k) sizing derived from the expected
    per-shard load so probe code stays branch-free. Pass ``total``
    (e.g. an icelite manifest row_count) to skip the sizing count job.
    n_shards must be a power of two (top-bits shard function).
    """
    assert n_shards > 0 and n_shards & (n_shards - 1) == 0, "power of two"
    if total is None:
        total = seen.count()
    per_shard = max(total // n_shards, 1)
    n_bits, k = bloom.params_for(int(per_shard * 1.5), fpp)

    def partials(batches):
        acc: dict[int, np.ndarray] = {}
        for pdf in batches:
            keys = pdf["url_hash"].to_numpy(dtype=np.int64)
            sids = shard_ids(keys, n_shards)
            for sid in np.unique(sids):
                bm = bloom.build(keys[sids == sid], n_bits, k)
                if int(sid) in acc:
                    np.bitwise_or(acc[int(sid)], bm, out=acc[int(sid)])
                else:
                    acc[int(sid)] = bm
        if acc:
            yield pd.DataFrame(
                {
                    "shard_id": list(acc.keys()),
                    "bits": [b.tobytes() for b in acc.values()],
                }
            )

    partial_df = seen.select("url_hash").mapInPandas(
        partials, schema="shard_id int, bits binary"
    )

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        arrs = [np.frombuffer(b, dtype=np.uint8) for b in pdf["bits"]]
        return pd.DataFrame(
            {
                "shard_id": [int(pdf["shard_id"].iloc[0])],
                "bits": [bloom.merge(arrs).tobytes()],
            }
        )

    merged = partial_df.groupBy("shard_id").applyInPandas(
        merge_group, schema="shard_id int, bits binary"
    )
    rows = {r["shard_id"]: r["bits"] for r in merged.collect()}
    empty = bloom.build(np.array([], dtype=np.int64), n_bits, k).tobytes()
    return [rows.get(i, empty) for i in range(n_shards)], k
