"""Round-close independent oracle sample (VERDICT r17 item 8): the
head rotation is the primary freshness signal, but it only covers the
50 names the driver samples — this tool re-checks a deterministic
md5-seeded sample of registered names OUTSIDE the current head, so
every round ends with evidence that the tail didn't rot while the
head was green (the judge ran exactly this check by hand in r17; now
it is part of the round-close checklist next to the full sweep).

Usage:
  python tools/oracle_sample.py [sf_dir] [n] [salt]
    sf_dir  default /root/testdata/sf0.01
    n       default 12
    salt    default the current round tag file content if present,
            else "r18" — change per round so the sample rotates

The sample is deterministic given (registry contents, salt): names
sort by md5(salt + name), the first n oracle-able non-head names run
through the SAME compare as tools/check_oracle.
"""

from __future__ import annotations

import hashlib
import sys

sys.path.insert(0, "/root/repo")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    salt = sys.argv[3] if len(sys.argv) > 3 else "r18"

    import duckdb

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "check_oracle", "/root/repo/tools/check_oracle.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("check_oracle", mod)
    spec.loader.exec_module(mod)

    from datapipeline_spike_spark.plans import DRIVER_SAMPLE, REGISTRY
    from datapipeline_spike_spark.plans.registry import TABLES
    from datapipeline_spike_spark.session import get_session

    head = set(list(REGISTRY)[:DRIVER_SAMPLE])
    tail = [
        name
        for name in REGISTRY
        if name not in head and REGISTRY[name].oracle is not None
    ]
    tail.sort(key=lambda s: hashlib.md5((salt + s).encode()).hexdigest())
    sample = tail[:n]

    spark = get_session("oracle-sample", cpus=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = 0
    for name in sample:
        q = REGISTRY[name]
        try:
            sdf = q.spark(spark, sf_dir).toPandas()
            odf = con.execute(q.oracle).df()
            problems = mod.compare(name, sdf, odf)
        except Exception as exc:  # noqa: BLE001 — report, keep sampling
            problems = [f"exception: {exc}"]
        if problems:
            failures += 1
            print(f"FAIL  {name}: {problems}", flush=True)
        else:
            print(f"PASS  {name} ({len(sdf)} rows)", flush=True)
    print(
        f"oracle sample: {failures} failures / {len(sample)} "
        f"(salt={salt}, outside-head tail of {len(tail)})",
        flush=True,
    )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
