"""Link-graph operators (staged r14 wave 2, register r16): host-level
PageRank for crawl/domain-authority weighting.

Why this belongs in a training-data engine: web-corpus pipelines
(CommonCrawl-derived sets, RefinedWeb, FineWeb) weight or gate
documents by the authority of their host — a damped PageRank over the
host link graph is the standard signal (Page et al. 1999), used both
for crawl-frontier prioritization and as a quality prior next to the
text-level filters. Reference scope: the reference's docs describe
quality routing and source-level scoring (README.md "quality routing",
FeatureEngineeringApproaches.md source weighting); host authority is
the web-corpus analogue of the same per-source prior, expressed
Spark-first.

Engine-parity design: vertex set, degrees, and the graph itself are
exact integers; every iteration's rank is computed with the SAME
arithmetic text on both engines ((1-d)/N + d*sum(contrib) + d*dangling
/N, one bounded float sum per vertex per iteration) so only summation
order is engine-sensitive — absorbed by 6dp rounding at the output,
the house float-reduction rule.

Scale shape (the part that matters at 100 TB): each of the K
iterations is ONE shuffle join (edges ⋈ ranks on src — edges hash-
partitioned by src, ranks re-partitioned by key, both sides keyed) and
ONE keyed aggregate (contributions groupBy dst); the dangling mass is
a 1-row aggregate broadcast back via a bounded cross (the BNLJ_OK
1-row-cross precedent). No collect, no driver loop over data — the
Python loop builds K plan layers, the data never leaves executors.
Vertex frames are |hosts| rows (orders of magnitude below |docs|), so
at a real corpus scale AQE broadcast-joins ranks into edges and the
per-iteration cost is a single pass over the edge list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

R = 6


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    n_iter: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Damped PageRank over a directed edge list, ``n_iter`` fixed
    power iterations from the uniform vector.

    Semantics (each exactly replayable in SQL):

    - vertices V = distinct(src) ∪ distinct(dst); N = |V|
    - multi-edges collapse: the walk is uniform over DISTINCT
      out-neighbors; out_deg = distinct dst per src
    - r0(v) = 1/N
    - r_{k+1}(v) = (1-d)/N + d * Σ_{(u,v)∈E} r_k(u)/out_deg(u)
                 + d * dangling_k / N,
      dangling_k = Σ r_k(u) over u with out_deg(u) = 0
      (total mass is conserved: Σ r_k = 1 for every k)

    Returns (host, pagerank r6, out_degree, in_degree) — one row per
    vertex. ``pagerank`` is rounded only at the OUTPUT; intermediate
    iterations keep full doubles on both engines.
    """
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    verts = (
        e.select(F.col("src").alias("host"))
        .union(e.select(F.col("dst").alias("host")))
        .distinct()
    )
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_degree"))
    in_deg = e.groupBy("dst").agg(F.count(F.lit(1)).alias("in_degree"))
    # degree-annotated vertex frame: the loop's stable left side
    base = (
        verts.join(out_deg, verts.host == out_deg.src, "left")
        .drop("src")
        .join(in_deg, verts.host == in_deg.dst, "left")
        .drop("dst")
        .select(
            "host",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
        )
    )
    n = base.select(F.count(F.lit(1)).alias("_n"))
    d = float(damping)

    # r0 = 1/N (the 1-row count crosses in as a broadcast-able literal
    # frame — bounded by construction, the BNLJ_OK precedent)
    ranks = base.crossJoin(F.broadcast(n)).select(
        "host",
        "out_degree",
        (F.lit(1.0) / F.col("_n")).alias("rank"),
        F.col("_n"),
    )
    for _ in range(int(n_iter)):
        dangling = ranks.filter(F.col("out_degree") == 0).select(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dang")
        )
        contrib = (
            e.join(
                ranks.select(
                    F.col("host").alias("src"),
                    (F.col("rank") / F.col("out_degree")).alias("_share"),
                ),
                "src",
            )
            .groupBy("dst")
            .agg(F.sum("_share").alias("_in_mass"))
        )
        ranks = (
            ranks.join(contrib, ranks.host == contrib.dst, "left")
            .drop("dst")
            .crossJoin(F.broadcast(dangling))
            .select(
                "host",
                "out_degree",
                (
                    (1.0 - d) / F.col("_n")
                    + F.lit(d) * F.coalesce("_in_mass", F.lit(0.0))
                    + F.lit(d) * F.col("_dang") / F.col("_n")
                ).alias("rank"),
                "_n",
            )
        )
    return (
        base.select("host", "in_degree")
        .join(ranks.select("host", "out_degree", "rank"), "host")
        .select(
            "host",
            F.round("rank", R).alias("pagerank"),
            F.col("out_degree").cast("long").alias("out_degree"),
            F.col("in_degree").cast("long").alias("in_degree"),
        )
    )


def host_link_graph(
    docs: DataFrame,
    n_hosts: int = 64,
    links_per_doc: int = 3,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic host-level link graph derived from a document
    corpus (the registered-query corpus for :func:`pagerank`, the
    synth-plant house pattern — url_host_dedup's integer-arithmetic
    URL derivation, audio_pcm_features' patterned waveform): each doc
    lives on host ``doc_id % n_hosts`` and links to ``links_per_doc``
    hosts at ``(doc_id*doc_id + j*13 + 1) % n_hosts``; self-loops
    drop. The QUADRATIC dst term concentrates in-links on quadratic
    residues, so the graph has realistic authority skew and (at small
    corpora) genuinely dangling hosts — both code paths exercise.
    Everything is nonnegative integer arithmetic, so DuckDB replays
    the exact edge list."""
    j = F.explode(
        F.sequence(F.lit(0), F.lit(int(links_per_doc) - 1))
    ).alias("_j")
    e = docs.select(F.col(id_col).alias("_id"), j).select(
        (F.col("_id") % n_hosts).alias("src"),
        ((F.col("_id") * F.col("_id") + F.col("_j") * 13 + 1) % n_hosts).alias(
            "dst"
        ),
    )
    return e.filter(F.col("src") != F.col("dst"))
