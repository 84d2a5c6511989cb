"""Full-registry execution sweep at bench scale (default sf0.1).

The driver's correctness gate runs at sf0.01 and bench.py times a fixed
31-query subset at sf0.1 — so a query OUTSIDE the headline set can hide
a scale-sensitive cost (this caught prefix_filter_jaccard_join at 96 s
in round 5: 122k unfiltered candidates each materializing an array
union). This sweep executes EVERY registry query end-to-end with the
noop sink and reports failures plus anything over the slow threshold.

Usage: python tools/full_sweep.py [--sf-dir DIR] [--slow-sec N]
Exit status: number of failures (slow queries are reported, not fatal).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from datapipeline_spike_spark.plans import REGISTRY  # noqa: E402
from datapipeline_spike_spark.session import get_session  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--slow-sec", type=float, default=5.0)
    args = ap.parse_args()
    spark = get_session("full_sweep")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    slow: list[tuple[str, float]] = []
    failed: list[tuple[str, str]] = []
    for name, q in REGISTRY.items():
        t0 = time.perf_counter()
        try:
            q.spark(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 1)
            if dt > args.slow_sec:
                slow.append((name, dt))
        except Exception as e:  # noqa: BLE001
            failed.append((name, f"{type(e).__name__}: {e}"[:200]))
    print(json.dumps({
        "sf_dir": args.sf_dir,
        "n_queries": len(REGISTRY),
        "failed": failed,
        "slow": slow,
        "slow_threshold_sec": args.slow_sec,
    }))
    return len(failed)


if __name__ == "__main__":
    raise SystemExit(main())
