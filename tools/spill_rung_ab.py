"""A/B the jaccard_verify spill rung: shuffle_merge vs shuffle_hash.

r10 moved the fat per-doc shingle-array sides of ``jaccard_verify``
from ``shuffle_hash`` to ``shuffle_merge`` because shuffle-hash builds
a NON-spillable in-memory hash relation that OOM'd at the 100× scale
point. The r10 VERDICT (ask #4) wants the sf0.1 cost of that
robustness recorded as a measured decision rather than inferred from
round-over-round map drift. This tool times the four queries that ride
``jaccard_verify`` under both hints on identical code and data.

Usage:
    python tools/spill_rung_ab.py [sf_dir]     # default /root/testdata/sf0.1

Prints one JSON object: per-query best-of-2 seconds under each hint
plus the merge/hash ratio. Run on an idle host (same caveat as bench).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CALLERS = [
    "neardup_prefix_pairs",
    "neardup_components",
    "doc_neardup_keep",
    "doc_curation_pipeline",
]
RUNS = 2


def time_queries(spark, sf_dir: str, hint: str) -> dict[str, float]:
    from kyiv_traffic_bigdata_spark.operators import dedup
    from kyiv_traffic_bigdata_spark.queries import QUERIES

    dedup.ARRAY_SIDE_JOIN_HINT = hint
    out: dict[str, float] = {}
    for name in CALLERS:
        samples = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            samples.append(time.perf_counter() - t0)
        out[name] = round(min(samples), 3)
        print(f"# {hint}: {name} {out[name]:.3f}s", file=sys.stderr)
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from kyiv_traffic_bigdata_spark.session import get_spark
    from kyiv_traffic_bigdata_spark.tables import TABLE_NAMES, load_table

    spark = get_spark("spill-rung-ab")
    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).count()

    try:
        with open("/proc/loadavg") as fh:
            load1 = float(fh.read().split()[0])
    except OSError:
        load1 = None

    # hash first, merge second, then a merge->hash repeat guards
    # against order effects (JVM warmup favoring whichever runs later)
    hash_1 = time_queries(spark, sf_dir, "shuffle_hash")
    merge = time_queries(spark, sf_dir, "shuffle_merge")
    hash_2 = time_queries(spark, sf_dir, "shuffle_hash")
    hash_best = {n: min(hash_1[n], hash_2[n]) for n in CALLERS}

    report = {
        "sf_dir": sf_dir,
        "host_loadavg_1min": load1,
        "runs_per_query_per_hint": RUNS,
        "shuffle_hash_sec": hash_best,
        "shuffle_merge_sec": merge,
        "merge_over_hash_ratio": {
            n: round(merge[n] / hash_best[n], 3) for n in CALLERS
        },
    }
    print(json.dumps(report, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
