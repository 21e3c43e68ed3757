"""Per-entry wall-clock sweep of the full query registry at a scale dir.

Round 4's sf0.1 sweep of this kind found two real O(scale) bugs the
correctness gate could not see (the connected-components driver OOM and
the IVF assignment shuffle); round 5 repeats the method one tier up on
the derived sf1 (tools/make_sf.py).

Each entry's DataFrame is materialized through the noop sink (executes
the whole plan, writes nothing, no driver collect) and timed
individually; output is one JSON object per line per entry plus a final
summary line, so a hung entry still leaves every earlier measurement on
disk.

Usage:
  python tools/profile_registry.py [sf_dir] [--out FILE]
                                   [--skip name,name] [--only name,name]
"""

from __future__ import annotations

import json
import os
import sys
import time

# anchor imports to the repo root (parent of tools/), not the cwd
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    args = [a for a in sys.argv[1:]]
    sf_dir = "/root/repo/localdata/sf1"
    out_path, skip, only = None, set(), None
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--out":
            out_path = args[i + 1]; i += 2
        elif a == "--skip":
            skip = set(args[i + 1].split(",")); i += 2
        elif a == "--only":
            only = set(args[i + 1].split(",")); i += 2
        else:
            sf_dir = a; i += 1

    from topicalcrawler_spark.queries import REGISTRY
    from topicalcrawler_spark.session import get_spark

    spark = get_spark(app_name="profile_registry")
    results: dict[str, float] = {}
    skipped: list[str] = []
    for name, q in REGISTRY.items():
        if (only is not None and name not in only) or name in skip:
            skipped.append(name)
            continue
        t0 = time.monotonic()
        try:
            materialize(q.fn(spark, sf_dir))
            wall = round(time.monotonic() - t0, 2)
            results[name] = wall
            print(json.dumps({"entry": name, "wall_s": wall}), flush=True)
        except Exception as e:  # keep sweeping; report the failure
            wall = round(time.monotonic() - t0, 2)
            results[name] = -wall
            print(
                json.dumps(
                    {"entry": name, "wall_s": wall,
                     "err": f"{type(e).__name__}: {e}"[:300]}
                ),
                flush=True,
            )
    summary = {
        "sf_dir": sf_dir,
        "n_entries": len(results),
        "skipped": skipped,
        "total_s": round(sum(abs(v) for v in results.values()), 2),
        "entries": results,
    }
    print(json.dumps(summary), flush=True)
    if out_path:
        with open(out_path, "w") as f:
            json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
