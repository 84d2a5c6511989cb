"""ExactSubstr relaxation probe (staged r19, VERDICT r18 item 4):
quantify the documented L x corpus shuffle trade of
operators/dedup.exact_substr_char_runs on the record.

The stride-1 operator is EXACT (Lee 2022 byte-grain semantics): every
length-L window of every document is generated, counted corpus-wide,
and joined back — shuffle volume ~L x corpus bytes. The documented
relaxation samples windows; this probe measures the honest variant:

  CONTENT-mod-s sampling — keep a window iff
  ``pmod(xxhash64(content), s) == 0``. Unlike positional stride-s
  (start positions 0, s, 2s, ...), content selection is
  ALIGNMENT-INDEPENDENT: two occurrences of the same bytes at
  arbitrary offsets in different documents are either both kept or
  both dropped, so the corpus count of every KEPT window content is
  exact and no cross-document match is lost to phase mismatch (the
  winnowing/modp-sketch argument). The cost is coverage, not
  correctness-of-counts: a duplicated run is detected only where its
  selected windows land, so short runs (few windows, none selected
  with prob ~(1-1/s)^w) can vanish and run BOUNDARIES erode by up to
  the selection gap.

Metrics per s in {1, 2, 4, 8} at the given sf_dir:
  - windows_shuffled: rows entering the corpus-wide count (the
    shuffle volume driver; ratio to s=1 is the claimed saving)
  - count_stage_sec: wall-clock of generate -> count -> mark
  - covered_chars: distinct (doc, char) positions inside some
    selected duplicated window (the dedup span mass)
  - char_recall: covered_chars / covered_chars(s=1) — how much of
    the EXACT span set the relaxation still marks

Usage: python tools/substr_stride_probe.py [sf_dir] [min_len]
Prints one JSON line per s (redirect/append to SCALE_PROBE_r19.jsonl).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from datapipeline_spike_spark.cache import unpersist_all  # noqa: E402
from datapipeline_spike_spark.plans.registry import load  # noqa: E402
from datapipeline_spike_spark.scale import fan_out  # noqa: E402
from datapipeline_spike_spark.session import get_session  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    min_len = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    spark = get_session("substr-stride-probe")
    docs = load(spark, sf_dir, "documents")

    base = fan_out(docs).select(
        "doc_id", F.col("text").alias("_t"), F.length("text").alias("_len")
    )
    wins_all = (
        base.filter(F.col("_len") >= min_len)
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(1), F.col("_len") - F.lit(min_len) + 1)
            ).alias("_pos"),
            "_t",
        )
        .select(
            "doc_id",
            "_pos",
            F.expr(f"substring(_t, _pos, {min_len})").alias("_win"),
        )
        .persist()
    )
    n_all = wins_all.count()

    baseline_cov = None
    for s in (1, 2, 4, 8):
        wins = (
            wins_all
            if s == 1
            else wins_all.filter(F.pmod(F.xxhash64("_win"), F.lit(s)) == 0)
        )
        t0 = time.perf_counter()
        dup = (
            wins.groupBy("_win")
            .agg(F.count(F.lit(1)).alias("_c"))
            .filter(F.col("_c") >= 2)
            .select("_win")
        )
        marked = wins.join(dup, "_win").select("doc_id", "_pos")
        n_marked = marked.count()
        count_sec = round(time.perf_counter() - t0, 2)
        covered = (
            marked.select(
                "doc_id",
                F.explode(
                    F.sequence(
                        F.col("_pos"), F.col("_pos") + F.lit(min_len - 1)
                    )
                ).alias("_ch"),
            )
            .distinct()
            .count()
        )
        if s == 1:
            baseline_cov = covered
        n_wins = n_all if s == 1 else wins.count()
        print(
            json.dumps(
                {
                    "probe": "exact_substr_content_mod_s",
                    "sf_dir": sf_dir,
                    "min_len": min_len,
                    "s": s,
                    "windows_shuffled": n_wins,
                    "volume_ratio": round(n_wins / n_all, 4),
                    "marked_positions": n_marked,
                    "count_stage_sec": count_sec,
                    "covered_chars": covered,
                    "char_recall": round(covered / baseline_cov, 4)
                    if baseline_cov
                    else None,
                }
            ),
            flush=True,
        )
    unpersist_all(spark)
    spark.stop()


if __name__ == "__main__":
    main()
