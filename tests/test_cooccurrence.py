"""Skip-gram co-occurrence + PMI (operators/cooccurrence.py)."""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from datapipeline_spike_spark.operators.cooccurrence import (
    cooccurrence_counts,
    pmi_scores,
    skipgram_pairs,
)

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat on the log"),
    (2, "hong kong hong kong hong kong"),
    (3, "one"),
    (4, ""),
    (5, "Hong Kong skyline at night"),
]
WINDOW = 3


def _tok(text: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9']+", text.lower()) if t]


def _brute_pairs(docs, window):
    c = Counter()
    for _, text in docs:
        t = _tok(text)
        for i in range(len(t)):
            for j in range(i + 1, min(i + window, len(t) - 1) + 1):
                c[(t[i], t[j])] += 1
    return c


def _fixture_df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_pair_counts_match_brute_force(spark):
    got = {
        (r.w1, r.w2): r.pair_count
        for r in cooccurrence_counts(_fixture_df(spark), window=WINDOW).collect()
    }
    assert got == dict(_brute_pairs(DOCS, WINDOW))


def test_pairs_ordered_and_window_bounded(spark):
    got = _brute_pairs(DOCS, WINDOW)
    # direction-sensitive: "hong kong" repeats forward, "kong hong" only
    # at the seams — counts must differ.
    assert got[("hong", "kong")] > got[("kong", "hong")]
    # doc 0: "the ... mat" are 5 positions apart > window -> no pair.
    spark_pairs = {
        (r.w1, r.w2)
        for r in cooccurrence_counts(_fixture_df(spark), window=WINDOW).collect()
    }
    assert ("the", "mat") not in spark_pairs or got[("the", "mat")] > 0
    # window=5 brings it in range (positions 1 -> 6).
    wide = {
        (r.w1, r.w2)
        for r in cooccurrence_counts(_fixture_df(spark), window=5).collect()
    }
    assert ("the", "mat") in wide


def test_short_and_empty_docs_emit_nothing(spark):
    df = spark.createDataFrame([(0, "one"), (1, ""), (2, "   ")], ["doc_id", "text"])
    assert cooccurrence_counts(df, window=WINDOW).count() == 0


def test_window_must_be_positive():
    with pytest.raises(ValueError):
        skipgram_pairs("text", window=0)


def test_pmi_matches_brute_force_and_ranks_collocation(spark):
    rows = pmi_scores(
        _fixture_df(spark), window=WINDOW, min_pair_count=2
    ).collect()
    pair_counts = _brute_pairs(DOCS, WINDOW)
    n_pairs = sum(pair_counts.values())
    uni = Counter(t for _, text in DOCS for t in _tok(text))
    n_tok = sum(uni.values())
    for r in rows:
        assert r.pair_count == pair_counts[(r.w1, r.w2)]
        assert r.w1_count == uni[r.w1] and r.w2_count == uni[r.w2]
        expect = math.log(
            (r.pair_count / n_pairs) / ((r.w1_count / n_tok) * (r.w2_count / n_tok))
        )
        assert abs(r.pmi - round(expect, 6)) < 1e-9
    by_pair = {(r.w1, r.w2): r.pmi for r in rows}
    # the planted collocation scores strictly above a pair diluted by
    # the high-frequency "the" ("sat on" is itself a perfect
    # collocation in this tiny fixture, so it is not the right foil)
    assert by_pair[("hong", "kong")] > by_pair[("the", "sat")]
    # min_pair_count prunes singletons
    assert all(r.pair_count >= 2 for r in rows)


def test_pmi_plan_has_no_forced_vocab_broadcast(spark):
    """The unigram join sides scale with vocabulary — the logical plan
    must carry no broadcast hint on them (AQE owns the decision). The
    only hints allowed are the two 1-row totals crosses."""
    plan = pmi_scores(_fixture_df(spark), window=WINDOW)._jdf.queryExecution().logical().toString()
    hints = plan.count("UnresolvedHint broadcast") + plan.count("ResolvedHint (strategy=broadcast)")
    assert hints == 2, plan


def test_pair_generation_single_shuffle(spark):
    """cooccurrence_counts = scan -> generate -> explode -> partial agg
    -> ONE exchange -> final agg. More exchanges would mean the pair
    stream is shuffled before aggregation."""
    plan = (
        cooccurrence_counts(_fixture_df(spark), window=WINDOW)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1, plan
