"""Pairwise-preference aggregation (staged r14): the RLHF/eval side of
the training-data pipeline. Preference datasets arrive as pairwise
comparisons (model A beat model B on prompt p; annotator preferred
response x over y); ranking them needs a strength model, and the
standard one is Bradley-Terry: P(i beats j) = s_i / (s_i + s_j).

Fitting uses Hunter 2004's MM (minorize-maximize) iteration — the same
fixed-point Elo-style leaderboards (e.g. Chatbot Arena) fit offline:

    s_i  <-  W_i / sum_{j != i} n_ij / (s_i + s_j)

where W_i = total wins of i and n_ij = games between i and j; each
step is followed by sum-to-1 renormalization. The iteration is
monotone in the likelihood and converges for any connected comparison
graph.

Engine-parity design (the doremi_domain_weights pattern): the
pair-grain aggregate collapses the match log to <= |items|^2 rows,
ONE assembled row of item-sorted arrays carries (items, wins, pairs
with pre-resolved item INDICES), every iteration is a column
projection (no joins, no driver collect), and the strength vector is
renormalized and 6dp-quantized each step so a SQL oracle walks the
identical trajectory. HOF cost per iteration is
O(|items| * |pairs|) interpreted ops — bounded by the items-grain
contract (leaderboards rank tens of models, not corpora; the
match LOG may be arbitrarily large, it collapses in the first keyed
aggregate)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bradley_terry_strengths(
    df: DataFrame,
    item_a_col: str = "item_a",
    item_b_col: str = "item_b",
    wins_a_col: str = "wins_a",
    wins_b_col: str = "wins_b",
    iters: int = 20,
) -> DataFrame:
    """Fit Bradley-Terry strengths from a pairwise match log (module
    docstring). Input rows are (item_a, item_b, wins_a, wins_b) at any
    grain — duplicates and both orientations fold in the first
    aggregate. Items with zero games are absent by construction; an
    item with zero WINS converges to strength 0 (the MM fixed point),
    which is the correct ranking statement.

    Returns one row per item: (item, n_games, n_wins, strength) with
    strengths normalized to sum 1 and 6dp-quantized (engine-parity:
    re-pinned every iteration, exactly like doremi's weight walk)."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    # fold both orientations into canonical (lo, hi) pair stats
    lo = F.least(F.col(item_a_col), F.col(item_b_col))
    hi = F.greatest(F.col(item_a_col), F.col(item_b_col))
    wlo = F.when(F.col(item_a_col) <= F.col(item_b_col), F.col(wins_a_col)).otherwise(
        F.col(wins_b_col)
    )
    whi = F.when(F.col(item_a_col) <= F.col(item_b_col), F.col(wins_b_col)).otherwise(
        F.col(wins_a_col)
    )
    pairs = (
        df.filter(F.col(item_a_col) != F.col(item_b_col))
        .select(
            lo.alias("_lo"),
            hi.alias("_hi"),
            wlo.cast("long").alias("_wlo"),
            whi.cast("long").alias("_whi"),
        )
        .groupBy("_lo", "_hi")
        .agg(
            F.sum("_wlo").alias("_wlo"),
            F.sum("_whi").alias("_whi"),
            (F.sum("_wlo") + F.sum("_whi")).alias("_n"),
        )
        .filter(F.col("_n") > 0)
    )
    per = (
        pairs.select(F.col("_lo").alias("_it"), F.col("_n"), F.col("_wlo").alias("_w"))
        .unionByName(
            pairs.select(
                F.col("_hi").alias("_it"), F.col("_n"), F.col("_whi").alias("_w")
            )
        )
        .groupBy("_it")
        .agg(F.sum("_n").alias("_games"), F.sum("_w").alias("_wins"))
    )
    # ONE assembled row: item-sorted arrays + index-resolved pair list
    one = (
        per.agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("_it"), "_games", "_wins"))
            ).alias("_rows")
        )
        .crossJoin(
            F.broadcast(
                pairs.agg(
                    F.collect_list(F.struct("_lo", "_hi", "_n")).alias("_pl")
                )
            )
        )
        .select(
            "_rows",
            F.transform("_rows", lambda r: r["_it"]).alias("_its"),
            F.transform("_rows", lambda r: r["_wins"].cast("double")).alias(
                "_ws"
            ),
            "_pl",
        )
        .select(
            "_rows",
            "_its",
            "_ws",
            F.transform(
                "_pl",
                lambda p: F.struct(
                    F.array_position(F.col("_its"), p["_lo"]).alias("ia"),
                    F.array_position(F.col("_its"), p["_hi"]).alias("ib"),
                    p["_n"].cast("double").alias("n"),
                ),
            ).alias("_pi"),
        )
        .select(
            "*",
            F.transform(
                "_its", lambda _: F.round(F.lit(1.0) / F.size("_its"), 6)
            ).alias("s0"),
        )
        # empty/fully-filtered match log: without this guard the
        # assembled row survives with empty arrays and
        # F.sequence(1, 0) (which descends to [1, 0]) manufactures two
        # all-NULL phantom items downstream (r14 review)
        .filter(F.size("_its") > 0)
    )
    cur = "s0"
    for t in range(iters):
        # denominators for every item in one projection, then the MM
        # update + renormalize + 6dp re-pin in the next (linear
        # expression tree in iters, the doremi stage discipline).
        # Each stage is ONE parsed SQL string (r6 lesson: every
        # Column-API lambda costs py4j round trips at plan-BUILD time,
        # and the driver harness builds each query fresh — the lambda
        # form spent ~2x longer building the 20-iteration chain than
        # executing it; selectExpr parses identically, 0.0D literals
        # keep every intermediate a double exactly like F.lit(0.0)).
        # _z{t} is bound as a real column BEFORE the s{t+1} transform
        # references it, so the renormalize lambda touches only an
        # attribute — never re-evaluating the aggregate per element.
        one = one.selectExpr(
            "*",
            f"transform(sequence(1, size(_its)), i -> aggregate(_pi, "
            f"0.0D, (acc, p) -> acc + (CASE WHEN p.ia = i OR p.ib = i "
            f"THEN p.n / (element_at({cur}, cast(p.ia as int)) + "
            f"element_at({cur}, cast(p.ib as int))) ELSE 0.0D END))) "
            f"AS _d{t}",
        )
        one = one.selectExpr(
            "*",
            f"zip_with(_ws, _d{t}, (w, d) -> CASE WHEN d > 0 THEN w / d "
            f"ELSE 0.0D END) AS _u{t}",
        )
        one = one.selectExpr(
            "*", f"aggregate(_u{t}, 0.0D, (acc, x) -> acc + x) AS _z{t}"
        )
        one = one.selectExpr(
            "*",
            f"transform(_u{t}, x -> round(x / _z{t}, 6)) AS s{t + 1}",
        )
        cur = f"s{t + 1}"
    out = one.select(
        F.explode(
            F.zip_with(
                "_rows", cur, lambda r, s: F.struct(r.alias("r"), s.alias("s"))
            )
        ).alias("x")
    )
    return out.select(
        F.col("x.r._it").alias("item"),
        F.col("x.r._games").cast("long").alias("n_games"),
        F.col("x.r._wins").cast("long").alias("n_wins"),
        F.col("x.s").alias("strength"),
    )
