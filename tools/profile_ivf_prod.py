"""Profile the IVF near-dup PRODUCTION leg standalone at a scale dir.

The registry entry `embedding_ivf_neardup` is an assertion row: it runs
the production IVF path AND the exact O(n²) all-pairs baseline, then
checks recall.  That baseline is the oracle, never the production plan
— and at the derived sf100 tier (2M vectors ⇒ 2×10¹² ordered pairs) it
is physically infeasible, so the full-registry sweep skips the entry.
This tool supplies the missing scale evidence for the path users would
actually run at 100 TB: ivf_build (auto cells, 1 Lloyd iter — same
params as the registry entry) + ivf_neardup(nprobe=2), materialized
through the noop sink, timed per phase.

Usage: python tools/profile_ivf_prod.py [sf_dir] [--out FILE]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/repo/localdata/sf100"
    out_path = None
    i = 0
    while i < len(args):
        if args[i] == "--out":
            out_path = args[i + 1]; i += 2
        else:
            sf_dir = args[i]; i += 1

    from topicalcrawler_spark.analysis import similarity as sim
    from topicalcrawler_spark.session import get_spark
    from topicalcrawler_spark.sources import scan

    spark = get_spark(app_name="profile_ivf_prod")
    emb = scan(spark, "embeddings", sf_dir)
    n = emb.count()

    t0 = time.monotonic()
    cents = sim.ivf_build(emb, n_cells=None, iters=1)
    n_cells = cents.count()  # materializes the build
    build_s = round(time.monotonic() - t0, 2)

    t0 = time.monotonic()
    pairs = sim.ivf_neardup(emb, cents, threshold=0.4, nprobe=2)
    pairs.write.format("noop").mode("overwrite").save()
    probe_s = round(time.monotonic() - t0, 2)

    t0 = time.monotonic()
    n_pairs = pairs.count()
    count_s = round(time.monotonic() - t0, 2)

    summary = {
        "sf_dir": sf_dir,
        "n_vectors": int(n),
        "n_cells": int(n_cells),
        "build_s": build_s,
        "probe_noop_s": probe_s,
        "pair_count_s": count_s,
        "n_pairs": int(n_pairs),
    }
    print(json.dumps(summary), flush=True)
    if out_path:
        with open(out_path, "w") as f:
            json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
