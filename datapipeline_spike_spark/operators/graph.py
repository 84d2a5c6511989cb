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
from datapipeline_spike_spark.cache import materialize_barrier
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
    # persist the corpus-reduced DISTINCT edge frame: it is referenced
    # by the vertex/degree assembly AND by every iteration's
    # contribution join — ~8 plan branches at n_iter=3, each otherwise
    # re-running the full corpus scan + distinct shuffle that derived
    # the edges. After distinct the frame is edge-universe-sized
    # (bounded by hosts x links, not docs). persist, NOT
    # localCheckpoint: AQE fires a lazy checkpoint's upstream stages
    # at plan build (the r16 ngram lesson); persist keeps EXPLAIN and
    # registry wiring job-free and materializes once on first action.
    # The cache is a DELIBERATE leak (ADVICE r16): the returned frame
    # reads it lazily, so there is no safe in-function unpersist point;
    # lifetime is bounded by session-rebuild cadence (bench.py's
    # posture) or executor LRU eviction.
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct().persist()
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

    # ONE eager checkpoint of the degree-annotated vertex frame with the
    # 1-row vertex count attached (r20, guide §2.4): the frame is STATIC
    # across iterations and referenced by the r0 seed, every iteration's
    # update (below), and the final output join — before the barrier,
    # each reference re-rendered the verts-union-distinct + two degree
    # joins (~3 exchanges) against the cached edge frame, ~6 renders per
    # action (measured: pagerank_host_authority 42 jobs/run steady).
    # Vertex-grain rows, the documented iterative-operator trade. The
    # 1-row count crosses in as a broadcast (BNLJ_OK precedent).
    base = base.crossJoin(F.broadcast(n)).transform(materialize_barrier)

    # r0 = 1/N over the checkpointed vertex frame
    ranks = base.select(
        "host",
        "out_degree",
        (F.lit(1.0) / F.col("_n")).alias("rank"),
        F.col("_n"),
    )
    for _it in range(int(n_iter)):
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
        # update left side is the STATIC checkpointed vertex frame, not
        # ranks_k (r20): the damped update never reads the old rank
        # directly — only contrib and dangling do — so joining base
        # instead of ranks drops the per-iteration references to ranks_k
        # from 3 to 2 and reads the checkpoint instead of replaying the
        # update chain. Same rows (ranks_k is host-grain over exactly
        # base's hosts), same float expression — and the same shape as
        # the oracle's own update (FROM b LEFT JOIN c_i).
        ranks = (
            base.select("host", "out_degree", "_n")
            .join(contrib, F.col("host") == contrib.dst, "left")
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
            # per-iteration barrier (the r7 dual-reference lesson):
            # iteration k+1 references ranks_k TWICE (dangling,
            # contribution join), so an unbarriered chain recomputes
            # ranks_k O(2^(K-k)) times. EAGER localCheckpoint (the
            # BPE/LPA house pattern), not persist: a persist barrier
            # nests each iteration's full cached plan inside the next,
            # while the checkpoint truncates lineage to an ExistingRDD
            # scan. The cost is K-1 vertex-grain jobs at
            # plan-construction time — tiny frames (the bounded host
            # universe), the documented trade for iterative operators.
            # The FINAL iteration's frame is referenced only once (the
            # output join), so it skips the barrier.
        )
        if _it + 1 < int(n_iter):
            ranks = ranks.transform(materialize_barrier)
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
    lives on host ``h = doc_id % n_hosts`` and links to ``links_per_doc``
    hosts at ``(h*h + j*13 + 1) % n_hosts`` (the residue is squared —
    same value mod n_hosts as doc_id^2, without the int64 overflow a
    raw square hits past doc_id ~ 3e9); self-loops
    drop. The QUADRATIC dst term concentrates in-links on quadratic
    residues, so the graph has realistic authority skew and (at small
    corpora) genuinely dangling hosts — both code paths exercise.
    Everything is nonnegative integer arithmetic, so DuckDB replays
    the exact edge list."""
    j = F.explode(
        F.sequence(F.lit(0), F.lit(int(links_per_doc) - 1))
    ).alias("_j")
    # square the RESIDUE, not the raw id: (d % n)^2 = d^2 (mod n), but
    # d^2 itself overflows int64 past d ~ 3e9 (negative hosts on Spark,
    # a range error on the DuckDB replay)
    e = docs.select((F.col(id_col) % n_hosts).alias("_r"), j).select(
        F.col("_r").alias("src"),
        ((F.col("_r") * F.col("_r") + F.col("_j") * 13 + 1) % n_hosts).alias(
            "dst"
        ),
    )
    return e.filter(F.col("src") != F.col("dst"))


def crawl_frontier_priority(
    docs: DataFrame,
    n_hosts: int = 64,
    damping: float = 0.85,
    n_iter: int = 3,
    id_col: str = "doc_id",
) -> DataFrame:
    """Crawl-frontier prioritization (staged r14 wave 3): the schedule
    table a focused recrawl reads — per host, combine the three signals
    a frontier actually weighs (the Mercator/IRLbot lineage): link
    AUTHORITY (the :func:`pagerank` over :func:`host_link_graph`),
    observed DUPLICATION (the fraction of the host's pages whose
    canonical URL collides with an earlier page — recrawling dup-heavy
    hosts wastes budget), and mean crawl DEPTH (deep pages yield less).

        priority = round(pagerank * (1 - dup_rate) / mean_depth, 6)

    Synthetic per-doc signals follow the url_host_dedup construction:
    path key ``doc_id % 40`` (collides within a host by design), depth
    ``1 + doc_id % 4``. Everything except the final division/rounding
    is exact-integer or replayed PageRank arithmetic, so DuckDB
    reproduces the table bit-for-bit at 6dp.

    Scale shape: the doc-grain work is ONE keyed aggregate to host
    grain (dup flags via a host+path window is avoided — first-seen
    collision detection uses min(doc_id) per (host, path) broadcast
    back, bounded by the path-key universe); the PageRank chain adds
    its per-iteration keyed joins; the final assembly joins three
    host-grain frames (broadcastable at any corpus size)."""
    pr = pagerank(
        host_link_graph(docs, n_hosts=n_hosts),
        damping=damping,
        n_iter=n_iter,
    )
    pages = docs.select(
        (F.col(id_col) % n_hosts).alias("host"),
        (F.col(id_col) % 40).alias("_path"),
        F.col(id_col).alias("_id"),
        (1 + F.col(id_col) % 4).cast("double").alias("_depth"),
    )
    first_seen = pages.groupBy("host", "_path").agg(
        F.min("_id").alias("_first")
    )
    flagged = pages.join(F.broadcast(first_seen), ["host", "_path"]).select(
        "host",
        "_depth",
        (F.col("_id") != F.col("_first")).cast("long").alias("_dup"),
    )
    sig = flagged.groupBy("host").agg(
        F.count(F.lit(1)).cast("long").alias("n_pages"),
        F.round(F.sum("_dup") / F.count(F.lit(1)), 6).alias("dup_rate"),
        F.round(F.avg("_depth"), 6).alias("mean_depth"),
    )
    return (
        pr.join(sig, "host", "left")
        .filter(F.col("n_pages").isNotNull())
        .select(
            "host",
            "pagerank",
            "n_pages",
            "dup_rate",
            "mean_depth",
            F.round(
                F.col("pagerank")
                * (F.lit(1.0) - F.col("dup_rate"))
                / F.col("mean_depth"),
                6,
            ).alias("priority"),
        )
    )


def anchor_text_stats(
    docs: DataFrame,
    n_hosts: int = 64,
    links_per_doc: int = 3,
    top_k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Inbound anchor-text aggregation per target host (staged r14
    wave 3) — the classic web-graph relevance signal (anchor terms
    describe the TARGET better than its own page text; every web-scale
    retrieval stack aggregates them). Each synthetic link (the
    :func:`host_link_graph` edge construction, self-loops included
    here — a page may link its own host) carries as anchor the source
    doc's token at position ``(doc_id + j) % n_tokens``; per target
    host the top-``top_k`` anchors by count (count desc, token asc —
    total deterministic order) are kept.

    Scale shape: one tokenize pass, one (host, anchor)-keyed count
    aggregate (vocabulary-bounded), one per-host top-k via a
    PARTITIONED window over the aggregated grain. Returns (host,
    anchor, n_links, rank)."""
    from pyspark.sql import Window

    from datapipeline_spike_spark.functions.text import tokens

    j = F.explode(
        F.sequence(F.lit(0), F.lit(int(links_per_doc) - 1))
    ).alias("_j")
    base = docs.select(
        F.col(id_col).alias("_id"), tokens(text_col).alias("_toks")
    ).filter(F.size("_toks") > 0)
    links = base.select("_id", "_toks", j).select(
        (
            (
                (F.col("_id") % n_hosts) * (F.col("_id") % n_hosts)
                + F.col("_j") * 13
                + 1
            )
            % n_hosts
        ).alias("host"),
        F.element_at(
            "_toks",
            ((F.col("_id") + F.col("_j")) % F.size("_toks") + 1).cast("int"),
        ).alias("anchor"),
    )
    counts = links.groupBy("host", "anchor").agg(
        F.count(F.lit(1)).cast("long").alias("n_links")
    )
    w = Window.partitionBy("host").orderBy(
        F.desc("n_links"), F.asc("anchor")
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(top_k))
        .select("host", "anchor", "n_links", F.col("rank").cast("long").alias("rank"))
    )


def label_propagation_communities(
    edges: DataFrame,
    n_iter: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Synchronous label propagation (staged r14 wave 4; Raghavan 2007,
    the LPA variant GraphX ships): every vertex starts as its own
    label; each of ``n_iter`` rounds, a vertex adopts the label most
    frequent among its UNDIRECTED neighbors, ties broken by SMALLEST
    label (the deterministic tie rule that makes synchronous LPA
    engine-replayable — random tie-breaking is why reference
    implementations disagree). Community detection at web scale is the
    spam-farm / mirror-cluster signal a crawl pipeline reads next to
    PageRank: link farms collapse into one community.

    Exact arithmetic throughout: labels are vertex ids (longs), the
    argmax is (count desc, label asc) on integer counts — a DuckDB
    oracle replays every round bit-for-bit. Scale shape: per round ONE
    keyed join (undirected edge list ⋈ labels on the neighbor key) and
    ONE two-level aggregate ((vertex, label) counts -> per-vertex
    argmax via min_by over the struct (-count, label): minimizing
    (-count, label) is maximize-count-then-smallest-label, and
    negating the COUNT (always a long) instead of the label keeps the
    tie rule valid for ANY orderable label type, string hosts included
    — no window); the label frame is vertex-grain, broadcastable under
    AQE when small.

    Returns (host, community, n_members is NOT emitted — community
    sizes are a trivial downstream groupBy; keeping the vertex grain
    makes the result joinable back to pages)."""
    e = edges.select(
        F.col(src_col).alias("a"), F.col(dst_col).alias("b")
    ).filter(F.col("a") != F.col("b"))
    # persist the corpus-reduced DISTINCT undirected frame (r17, the
    # triangle_clustering/pagerank posture): it feeds the initial
    # label derivation AND every round's neighbor join (n_iter + 1
    # references, each otherwise re-running the corpus scan + union +
    # distinct — ReusedExchange measured 0 under AQE). MEASURED trade
    # at sf0.1: steady-state 0.86 -> 1.27 s (cache-read overhead on a
    # tiny corpus) vs 4 corpus passes -> 1 at scale, where the scan is
    # the cost. The labels chain itself is single-reference per round
    # (linear plan growth — no barrier needed at small n_iter; a
    # deep-iteration caller would checkpoint like the BPE loop).
    # Deliberate cache leak, session-rebuild/LRU bounded.
    und = e.union(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct().persist()
    labels = (
        und.select(F.col("a").alias("host"))
        .distinct()
        .select("host", F.col("host").alias("label"))
    )
    for _ in range(int(n_iter)):
        neigh = und.join(
            labels.select(F.col("host").alias("b"), "label"), "b"
        ).select("a", "label")
        counts = neigh.groupBy("a", "label").agg(
            F.count(F.lit(1)).alias("_c")
        )
        # argmax (count desc, label asc) without a window: min_by over
        # the orderable struct (-count, label) — minimizing (-count,
        # label) is maximize-count-then-smallest-label. Negating the
        # COUNT (always a long) instead of the label keeps the tie rule
        # valid for ANY orderable label type (string hosts included) —
        # the earlier -label form crashed on non-numeric vertex ids
        # (r15 pre-registration review)
        labels = counts.groupBy("a").agg(
            F.min_by("label", F.struct(-F.col("_c"), F.col("label"))).alias(
                "label"
            )
        ).select(F.col("a").alias("host"), "label")
    return labels.select("host", F.col("label").alias("community"))


def triangle_clustering(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Per-vertex triangle count + local clustering coefficient
    (staged r14 wave 5) — the third web-graph health signal next to
    :func:`pagerank` (authority) and
    :func:`label_propagation_communities` (communities): link farms
    and mirror rings are near-cliques, so abnormally high local
    clustering at high degree flags manufactured link neighborhoods
    (the TrustRank-adjacent heuristic).

    Semantics (exactly SQL-replayable): the graph is UNDIRECTED and
    simple (direction and multi-edges collapse, self-loops drop); a
    triangle {a, b, c} is counted via its ORIENTED form a < b < c —
    each triangle found exactly once, then credited to all three
    corners. clustering = round(2*T / (deg*(deg-1)), 6) for deg >= 2,
    NULL below (no possible wedge).

    Scale shape: the oriented edge list e< (a < b) joins itself TWICE
    on vertex keys — the standard distributed triangle enumeration;
    both joins are equi (never a cartesian) and the wedge explosion is
    bounded by sum(deg^2), the same envelope every bucketed self-join
    in this engine documents (degree-skewed graphs would salt the hot
    vertex exactly like lsh hot buckets — documented, not needed at
    the registered corpus's bounded degrees). Credit assembly is three
    unions of the tiny per-triangle frame + one keyed count.

    Returns (host, degree, triangles, clustering)."""
    e = edges.select(
        F.col(src_col).alias("a"), F.col(dst_col).alias("b")
    ).filter(F.col("a") != F.col("b"))
    # persist the corpus-reduced DISTINCT undirected frame (r17, found
    # in the registration plan gallery): it feeds the degree frame and
    # all THREE oriented-join branches — unpersisted, each branch
    # re-ran the full corpus scan + union + distinct (~6 independent
    # file scans; ReusedExchange measured 0 under AQE). After distinct
    # it is edge-universe-sized. MEASURED trade at sf0.1 (tiny corpus):
    # steady-state 0.71 -> 1.40 s — cache-read overhead dominates when
    # the scan is a 500-row parquet; at corpus scale the scan IS the
    # cost and 6 passes -> 1 is the 100 TB fix (the pagerank
    # precedent, which took the same trade). persist, not
    # localCheckpoint (the AQE toRdd lesson); deliberate cache leak,
    # session-rebuild/LRU bounded.
    und = e.union(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct().persist()
    deg = und.groupBy("a").agg(F.count(F.lit(1)).alias("degree"))
    lt = und.filter(F.col("a") < F.col("b"))
    # wedges a<b<c anchored at a, closed by the (b, c) edge
    wedge = lt.alias("ab").join(
        lt.select(F.col("a").alias("b"), F.col("b").alias("c")).alias("bc"),
        "b",
    )
    tri = wedge.join(
        lt.select(F.col("a"), F.col("b").alias("c")).alias("ac"),
        ["a", "c"],
    ).select("a", "b", "c")
    credit = (
        tri.select(F.col("a").alias("host"))
        .union(tri.select(F.col("b").alias("host")))
        .union(tri.select(F.col("c").alias("host")))
        .groupBy("host")
        .agg(F.count(F.lit(1)).cast("long").alias("triangles"))
    )
    return (
        deg.select(F.col("a").alias("host"), "degree")
        .join(credit, "host", "left")
        .select(
            "host",
            F.col("degree").cast("long").alias("degree"),
            F.coalesce("triangles", F.lit(0)).cast("long").alias("triangles"),
            F.when(
                F.col("degree") >= 2,
                F.round(
                    F.lit(2.0)
                    * F.coalesce("triangles", F.lit(0))
                    / (F.col("degree") * (F.col("degree") - 1)),
                    6,
                ),
            ).alias("clustering"),
        )
    )


def hits_hub_authority(
    edges: DataFrame,
    n_iter: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """HITS hubs and authorities (staged r17 wave 8; Kleinberg 1999
    "Authoritative sources in a hyperlinked environment"), the
    query-independent form — the second classic link-authority signal
    next to :func:`pagerank`, and the one that separates DIRECTORY
    pages (good hubs: they point at good authorities) from CONTENT
    pages (good authorities: pointed at by good hubs). A web-corpus
    curation stack uses the split where PageRank alone conflates them:
    hub-heavy link farms score high authority under naive in-degree
    but low under HITS because their in-links come from bad hubs.

    Semantics (each exactly replayable in SQL):

    - vertices V = distinct(src) ∪ distinct(dst); N = |V|; multi-edges
      collapse to the DISTINCT edge set (same rule as :func:`pagerank`)
    - h_0(v) = 1/N
    - per iteration: a_raw(v) = Σ_{(u,v)∈E} h(u), then a = a_raw / Σ
      a_raw (L1 normalization — chosen over the classical L2 because
      a plain sum replays bit-for-bit in SQL while sqrt(Σx²)
      introduces a second float-reduction; the FIXED POINT direction
      is identical, only the scale differs); h_raw(u) = Σ_{(u,v)∈E}
      a(v), h = h_raw / Σ h_raw. Vertices with no in-edges hold
      authority 0, no out-edges hold hub 0.
    - output: (host, hub, authority, out_degree, in_degree), scores
      6dp-rounded — the house float-reduction rule; only summation
      order is engine-sensitive underneath.

    Scale shape (the pagerank posture, doubled): each half-step is ONE
    keyed join (edges ⋈ scores) + ONE keyed aggregate + a 1-row L1
    total broadcast-crossed back (the BNLJ_OK 1-row-cross precedent);
    the edge frame is persist()ed so the corpus-derived DISTINCT runs
    once (deliberate cache leak, bounded by session-rebuild cadence /
    LRU); score frames are vertex-grain (broadcastable at any corpus
    size). Intermediate iterations are EAGER-localCheckpoint barriered
    (the r7 dual-reference lesson — each iteration references the
    previous frame through the raw join AND the normalization sum, so
    an unbarriered chain recomputes exponentially); the final
    iteration fuses into the output join unbarriered."""
    if int(n_iter) < 1:
        # the authority vector is undefined before the first half-step
        # (hub-only initial state), so there is no meaningful n_iter=0
        # result to return — unlike pagerank, whose r0 = 1/N is complete
        raise ValueError(f"hits_hub_authority needs n_iter >= 1, got {n_iter}")
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct().persist()
    verts = (
        e.select(F.col("src").alias("host"))
        .union(e.select(F.col("dst").alias("host")))
        .distinct()
    )
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_degree"))
    in_deg = e.groupBy("dst").agg(F.count(F.lit(1)).alias("in_degree"))
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
    # ONE eager checkpoint of the static vertex frame (r20, guide §2.4
    # — the pagerank posture): base is referenced by the hub seed, by
    # every half-step's left join (6 renders at n_iter=3), and by the
    # final output join; unbarriered, each render re-ran the
    # verts-union-distinct + two degree joins. Measured r20 isolate:
    # 105 -> ~30 jobs/run together with the per-half-step raw barrier
    # below.
    base = base.crossJoin(F.broadcast(n)).transform(materialize_barrier)
    hub = base.select("host", (F.lit(1.0) / F.col("_n")).alias("hub"))

    def _half_step(
        scores: DataFrame, score_col: str, edge_key: str, group_key: str,
        out_col: str,
    ) -> DataFrame:
        """One HITS half-step: push ``score_col`` across the edge set
        from ``edge_key`` to ``group_key``, then L1-normalize."""
        # EAGER checkpoint of the vertex-grain raw-mass frame (r20):
        # _raw is the half-step's dual reference — the L1 total AND the
        # normalization join both read it, so an unbarriered _raw
        # re-renders the edge join (and through it the whole previous
        # half-step chain) twice per half-step, compounding across the
        # 2*n_iter half-steps (measured 105 jobs/run at n_iter=3).
        # With raw barriered per half-step, the r18 per-iteration hub
        # checkpoint is redundant — every frame between barriers is now
        # referenced at most once, so the chain replay it guarded
        # against cannot occur (each half-step's lineage is one join +
        # one 1-row cross over ExistingRDD scans).
        raw = (
            e.join(
                scores.select(
                    F.col("host").alias(edge_key),
                    F.col(score_col).alias("_s"),
                ),
                edge_key,
            )
            .groupBy(group_key)
            .agg(F.sum("_s").alias("_raw"))
            .transform(materialize_barrier)
        )
        total = raw.select(
            F.coalesce(F.sum("_raw"), F.lit(0.0)).alias("_tot")
        )
        return (
            base.select("host")
            .join(raw, base.host == raw[group_key], "left")
            .drop(group_key)
            .crossJoin(F.broadcast(total))
            .select(
                "host",
                F.when(
                    F.col("_tot") > 0,
                    F.coalesce("_raw", F.lit(0.0)) / F.col("_tot"),
                )
                .otherwise(F.lit(0.0))
                .alias(out_col),
            )
        )

    auth = None
    for _it in range(int(n_iter)):
        auth = _half_step(hub, "hub", "src", "dst", "authority")
        hub = _half_step(auth, "authority", "dst", "src", "hub")
    assert auth is not None
    return (
        base.join(hub, "host")
        .join(auth, "host")
        .select(
            "host",
            F.round("hub", R).alias("hub"),
            F.round("authority", R).alias("authority"),
            F.col("out_degree").cast("long").alias("out_degree"),
            F.col("in_degree").cast("long").alias("in_degree"),
        )
    )


class KCoreNotConverged(RuntimeError):
    """k-core peeling exhausted its round budget before the survivor
    set stabilized — the honest failure mode (the
    ComponentsNotConverged posture: raise, never silently emit a
    half-peeled core)."""


def kcore_membership(
    edges: DataFrame,
    k: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    max_rounds: int = 64,
) -> DataFrame:
    """k-core membership via iterative peeling (staged r17 wave 9;
    Seidman 1983 "Network structure and minimum degree"; the
    Batagelj-Zaversnik peel expressed as Spark rounds) — the densest-
    region extractor a web-graph pipeline reads next to PageRank /
    LPA / clustering: the k-core is the maximal subgraph where every
    vertex keeps degree >= k AFTER all lower-degree vertices are
    removed, so raw-degree spam (a hub pointed at by throwaway pages)
    falls out while genuinely dense cores (link farms, true hub
    clusters) survive — the classic core-vs-periphery split.

    Semantics (engine-replayable): the graph is UNDIRECTED and simple
    (direction/multi-edges collapse, self-loops drop). s_0 = all
    vertices; round i keeps v in s_{i-1} with >= k neighbors INSIDE
    s_{i-1} (induced-subgraph degree). The fixpoint is the k-core;
    peeling is monotone-decreasing so a stable survivor COUNT is the
    fixpoint. Integer-only arithmetic throughout — a DuckDB oracle
    unrolls R rounds as a WITH chain and the differential proves
    convergence within R on the tested corpus.

    Scale shape: per round ONE keyed semi-join (the NEIGHBOR endpoint
    against the survivor set — vertex-grain build side, AQE
    broadcastable; the a-side join is provably redundant because
    peeling is monotone, see the loop comment) + ONE keyed degree
    aggregate; survivor frames are
    EAGER-localCheckpoint barriered (ITERATIVE lineage — the BPE/LPA
    truncation case, not the shared-subtree persist case) and the
    convergence check is a 1-row count per round (the
    connected-components driver-guard precedent — bounded driver
    data, never row collection). Raises :class:`KCoreNotConverged`
    past ``max_rounds`` instead of silently emitting a half-peeled
    core. Rounds needed = the graph's degeneracy-peel depth, in
    practice O(diameter)-ish — tiny for web host graphs.

    Returns (host, degree, in_kcore) — one row per ORIGINAL vertex:
    its full-graph degree and whether it survives in the k-core."""
    if k < 1:
        raise ValueError(f"kcore_membership needs k >= 1, got {k}")
    if max_rounds < 1:
        raise ValueError(f"kcore_membership needs max_rounds >= 1, got {max_rounds}")
    e = edges.select(
        F.col(src_col).alias("a"), F.col(dst_col).alias("b")
    ).filter(F.col("a") != F.col("b"))
    # the shared-subtree persist (pagerank/triangle posture): the
    # distinct undirected frame feeds every round's two semi-joins.
    # Deliberate cache leak, session-rebuild/LRU bounded.
    und = e.union(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct().persist()
    deg0 = und.groupBy("a").agg(F.count(F.lit(1)).alias("degree"))
    survivors = deg0.filter(F.col("degree") >= k).select(
        F.col("a").alias("host")
    )
    survivors = survivors.transform(materialize_barrier)
    prev = survivors.count()
    for _ in range(int(max_rounds)):
        if prev == 0:
            break
        # induced degree: ONE semi-join on the NEIGHBOR endpoint only
        # (r20, guide §2.4 — remove the redundant a-side join the r19
        # form carried): peeling is monotone, so a vertex outside
        # s_{i-1} can never re-qualify — if a was peeled at round j
        # (|N(a) ∩ s_{j-1}| < k) then s_{i-1} ⊆ s_{j-1} gives
        # |N(a) ∩ s_{i-1}| <= |N(a) ∩ s_{j-1}| < k, and at round 0
        # deg(a) < k bounds the induced count the same way. Counting
        # alive neighbors for EVERY a therefore reproduces exactly
        # {a ∈ s_{i-1} : induced_deg >= k} — one edge-frame pass and
        # one survivor broadcast per round instead of two.
        alive = und.join(survivors.select(F.col("host").alias("b")), "b")
        survivors = (
            alive.groupBy("a")
            .agg(F.count(F.lit(1)).alias("_d"))
            .filter(F.col("_d") >= k)
            .select(F.col("a").alias("host"))
            # iterative barrier: round i+1 references round i through
            # the semi-join AND the convergence count — the
            # dual-reference class; checkpoint (lineage truncation),
            # not persist
            .transform(materialize_barrier)
        )
        n = survivors.count()
        if n == prev:
            break
        prev = n
    else:
        raise KCoreNotConverged(
            f"k-core peel still shrinking after {max_rounds} rounds "
            f"(k={k}); raise max_rounds"
        )
    return (
        deg0.select(F.col("a").alias("host"), "degree")
        .join(
            survivors.select("host", F.lit(True).alias("in_kcore")),
            "host",
            "left",
        )
        .select(
            "host",
            F.col("degree").cast("long").alias("degree"),
            F.coalesce("in_kcore", F.lit(False)).alias("in_kcore"),
        )
    )
