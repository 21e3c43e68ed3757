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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..core import bloom
from ..functions import order_cols


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

    Shards are keyed by pmod(url_hash, n_shards) — the same url_hash
    range alignment the seen table is partitioned by, so probe i only
    touches shard i's bitmap.
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
            shard_ids = (keys % n_shards + n_shards) % n_shards
            hit = np.zeros(len(pdf), dtype=bool)
            for sid in np.unique(shard_ids):
                m = shard_ids == sid
                hit[m] = bloom.probe(keys[m], shards[sid], k)
            yield pdf.assign(maybe_seen=pd.Series(hit, index=pdf.index))

    return links.mapInPandas(probe_iter, schema=out_schema)


def build_bloom_shards(
    seen: DataFrame, n_shards: int, fpp: float = 0.01, total: int | None = None
) -> tuple[list[bytes], int]:
    """A5 — fold the seen table's url_hashes into per-shard bitmaps via
    grouped-map applyInPandas (numpy bitwise fold); returns (bitmaps, k).

    All shards share one (n_bits, k) sizing derived from the largest
    shard so probe code stays branch-free. Pass ``total`` (e.g. from an
    icelite manifest row_count) to skip the sizing count job.
    """
    if total is None:
        total = seen.count()
    per_shard = max(total // max(n_shards, 1), 1)
    n_bits, k = bloom.params_for(int(per_shard * 1.5), fpp)

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        keys = pdf["url_hash"].to_numpy(dtype=np.int64)
        bits = bloom.build(keys, n_bits, k)
        return pd.DataFrame(
            {
                "shard_id": [int(pdf["shard_id"].iloc[0])],
                "bits": [bits.tobytes()],
                "nkeys": [len(keys)],
                "fpp": [fpp],
            }
        )

    shards_df = (
        seen.withColumn(
            "shard_id", F.pmod(F.col("url_hash"), F.lit(n_shards)).cast("int")
        )
        .groupBy("shard_id")
        .applyInPandas(fold, schema="shard_id int, bits binary, nkeys long, fpp double")
    )
    rows = {r["shard_id"]: r["bits"] for r in shards_df.collect()}
    empty = bloom.build(np.array([], dtype=np.int64), n_bits, k).tobytes()
    return [rows.get(i, empty) for i in range(n_shards)], k
