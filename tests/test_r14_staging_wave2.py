"""r14 staged operators, WAVE 2 (register r16 — the r15 head budget is
fully committed, plans/__init__.py r15 notes): DuckDB differential
tests + planted-property checks for pagerank_host_authority,
code_detect_profile, license_detect_profile, matryoshka_recall_at_k,
audio_vad_segments, and curriculum_phase_plan — the same
pre-registration gauntlet every staged cohort runs (oracle parity
proven HERE, so registration is a catalog-entry move)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from datapipeline_spike_spark.plans.registry import load

SF = "/root/testdata/sf0.001"

_SQL_TOKS = (
    "list_filter(regexp_split_to_array(lower({c}), '[^a-z0-9'']+'),"
    " t -> t != '')"
)


def _con():
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


# --- pagerank_host_authority --------------------------------------------------

_SQL_PR_GRAPH = """
    e AS (
      SELECT DISTINCT doc_id % 64 AS src,
             ((doc_id % 64) * (doc_id % 64) + j * 13 + 1) % 64 AS dst
      FROM documents, (SELECT unnest(range(0, 3)) AS j)
      WHERE doc_id % 64
            != ((doc_id % 64) * (doc_id % 64) + j * 13 + 1) % 64
    ),
    v AS (SELECT src AS host FROM e UNION SELECT dst FROM e),
    od AS (SELECT src AS host, count(*) AS outd FROM e GROUP BY 1),
    ig AS (SELECT dst AS host, count(*) AS ind FROM e GROUP BY 1),
    b AS (SELECT v.host, coalesce(od.outd, 0) AS outd,
                 coalesce(ig.ind, 0) AS ind
          FROM v LEFT JOIN od USING (host) LEFT JOIN ig USING (host)),
    nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM b)
"""


def _sql_pr_iter(k: int) -> str:
    """r0 -> r{k} WITH-chain layers replaying operators.graph.pagerank:
    per iteration one dangling 1-row aggregate, one contribution
    aggregate over in-edges, one damped update."""
    parts = ["r0 AS (SELECT host, outd, 1.0 / nn.n AS rank FROM b, nn)"]
    for i in range(1, k + 1):
        p = i - 1
        parts.append(
            f"d{i} AS (SELECT coalesce(sum(rank), 0) AS dang FROM r{p} "
            f"WHERE outd = 0)"
        )
        parts.append(
            f"c{i} AS (SELECT e.dst AS host, sum(r.rank / r.outd) AS m "
            f"FROM e JOIN r{p} r ON e.src = r.host GROUP BY 1)"
        )
        parts.append(
            f"r{i} AS (SELECT b.host, b.outd, "
            f"(1 - 0.85) / nn.n + 0.85 * coalesce(c{i}.m, 0) "
            f"+ 0.85 * d{i}.dang / nn.n AS rank "
            f"FROM b LEFT JOIN c{i} USING (host), nn, d{i})"
        )
    return ",\n".join(parts)


SQL_PAGERANK = f"""
    WITH {_SQL_PR_GRAPH},
    {_sql_pr_iter(3)}
    SELECT b.host, round(r3.rank, 6) AS pagerank,
           CAST(b.outd AS BIGINT) AS out_degree,
           CAST(b.ind AS BIGINT) AS in_degree
    FROM b JOIN r3 USING (host)
"""


def test_pagerank_host_authority_matches_duckdb(spark):
    from datapipeline_spike_spark.operators.graph import (
        host_link_graph,
        pagerank,
    )

    got = {
        r["host"]: r.asDict()
        for r in pagerank(host_link_graph(load(spark, SF, "documents")))
        .collect()
    }
    want = _con().execute(SQL_PAGERANK).df()
    assert len(got) == len(want) > 0
    for _, w in want.iterrows():
        g = got[w["host"]]
        assert g["pagerank"] == pytest.approx(w["pagerank"], abs=1.5e-6)
        assert g["out_degree"] == int(w["out_degree"])
        assert g["in_degree"] == int(w["in_degree"])


def test_pagerank_literal_graph_vs_reference(spark):
    """4-node hand graph WITH a dangling node (3 has no out-edges) vs a
    pure-Python power iteration of the documented spec — proves the
    dangling-mass redistribution path the corpus graph may not
    exercise, and mass conservation."""
    from datapipeline_spike_spark.operators.graph import pagerank

    edges = [(0, 1), (0, 2), (1, 2), (2, 3), (1, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["host"]: r for r in pagerank(df, n_iter=3).collect()}

    n, d = 4, 0.85
    out_deg = {0: 2, 1: 2, 2: 1, 3: 0}
    rank = {h: 1.0 / n for h in range(4)}
    for _ in range(3):
        dang = sum(r for h, r in rank.items() if out_deg[h] == 0)
        contrib = {h: 0.0 for h in range(4)}
        for s, t in edges:
            contrib[t] += rank[s] / out_deg[s]
        rank = {
            h: (1 - d) / n + d * contrib[h] + d * dang / n for h in range(4)
        }
    assert sum(rank.values()) == pytest.approx(1.0)
    for h in range(4):
        assert got[h]["pagerank"] == pytest.approx(round(rank[h], 6))
    assert got[3]["out_degree"] == 0 and got[3]["in_degree"] == 2
    # the sink accumulated the most mass; the source the least
    assert got[3]["pagerank"] == max(r["pagerank"] for r in got.values())
    assert got[0]["pagerank"] == min(r["pagerank"] for r in got.values())


# --- code_detect_profile --------------------------------------------------------

SNIPPET_PY = (
    "def load(x): y = (x + 1) ; z = {\"k\": [1, 2]} ; return (y, z) ; "
    "import os ; class App(object): pass ; lambda q: (q * 2) >= 0"
)
SNIPPET_JS = (
    "function go(a) { var b = (a + 1); const c = { k: 1 }; "
    "let d = [2]; return b + c.k + d[0]; } "
    "function stop() { var e = 0; }"
)
SNIPPET_C = (
    "#include <stdio.h> int main(void) { int x = (1 + 2); "
    "printf(\"%d\", x); return (x == 3); }"
)

_SQL_CODE_PLANT = f"""
    planted AS (
      SELECT doc_id, source,
             CASE WHEN doc_id % 7 = 2 THEN text || ' ' ||
                  CASE doc_id % 3
                    WHEN 0 THEN '{SNIPPET_PY}'
                    WHEN 1 THEN '{SNIPPET_JS}'
                    ELSE '{SNIPPET_C}' END
                  ELSE text END AS text
      FROM documents
    )
"""


def _code_planted(spark):
    d = load(spark, SF, "documents")
    return d.select(
        "doc_id",
        "source",
        F.when(
            F.col("doc_id") % 7 == 2,
            F.concat(
                "text",
                F.lit(" "),
                F.when(F.col("doc_id") % 3 == 0, F.lit(SNIPPET_PY))
                .when(F.col("doc_id") % 3 == 1, F.lit(SNIPPET_JS))
                .otherwise(F.lit(SNIPPET_C)),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )


SQL_CODE_DETECT = f"""
    WITH {_SQL_CODE_PLANT},
    per_doc AS (
      SELECT source,
             length(text) AS nc,
             length(text) - length(translate(text, '{{}};=<>#()', '')) AS sym,
             len(regexp_extract_all(lower(text),
                 '\\b(def|import|class|lambda|elif)\\b')) AS kpy,
             len(regexp_extract_all(lower(text),
                 '\\b(function|var|const|let)\\b')) AS kjs,
             len(regexp_extract_all(lower(text),
                 '(#include|\\bprintf\\b|\\bvoid\\b|\\bint main\\b)')) AS kc
      FROM planted
    ),
    fam AS (
      SELECT source, nc, sym,
             CASE WHEN kpy >= kjs AND kpy >= kc AND kpy >= 2 THEN 'python'
                  WHEN kjs >= kc AND kjs >= 2 THEN 'js'
                  WHEN kc >= 2 THEN 'c'
                  ELSE 'none' END AS family,
             kpy + kjs + kc AS kw
      FROM per_doc WHERE nc > 0
    )
    SELECT source, family,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN family != 'none' AND sym * 50 > nc
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_code,
           round(avg(sym * 1.0 / nc), 6) AS mean_symbol_ratio,
           CAST(sum(kw) AS BIGINT) AS total_kw_hits
    FROM fam GROUP BY 1, 2
"""


def test_code_detect_profile_matches_duckdb(spark):
    from datapipeline_spike_spark.operators.detectors import (
        code_detect_profile,
    )

    got = {
        (r["source"], r["family"]): r.asDict()
        for r in code_detect_profile(_code_planted(spark)).collect()
    }
    want = _con().execute(SQL_CODE_DETECT).df()
    assert len(got) == len(want)
    fams = {f for _, f in got}
    assert {"python", "js", "c", "none"} <= fams
    for _, w in want.iterrows():
        g = got[(w["source"], w["family"])]
        assert g["n_docs"] == int(w["n_docs"])
        assert g["n_code"] == int(w["n_code"])
        assert g["mean_symbol_ratio"] == pytest.approx(
            w["mean_symbol_ratio"], abs=1.5e-6
        )
        assert g["total_kw_hits"] == int(w["total_kw_hits"])


def test_code_detect_planted_families(spark):
    """Each snippet classifies to its own family; keyword-rich but
    symbol-free prose detects the family but NOT is_code (the density
    gate); pure prose is 'none'."""
    from datapipeline_spike_spark.operators.detectors import (
        code_detect_profile,
    )

    rows = [
        (1, "s", "prose " + SNIPPET_PY),
        (2, "s", "prose " + SNIPPET_JS),
        (3, "s", "prose " + SNIPPET_C),
        (4, "s", "we def import class words with no symbols at all"),
        (5, "s", "plain prose about tables and joins"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {r["family"]: r for r in code_detect_profile(df).collect()}
    assert got["python"]["n_code"] == 1
    assert got["js"]["n_code"] == 1
    assert got["c"]["n_code"] == 1
    # density gate: def/import/class fire the battery but 0 symbols
    assert got["python"]["n_docs"] == 2  # snippet doc + symbol-free doc
    assert got["none"]["n_docs"] == 1 and got["none"]["n_code"] == 0


# --- license_detect_profile -----------------------------------------------------

_SQL_LIC_PLANT = """
    planted AS (
      SELECT doc_id, source,
             CASE WHEN doc_id % 11 IN (1, 4, 8)
                  THEN 'spdx-license-identifier: ' ||
                       CASE doc_id % 5
                         WHEN 0 THEN 'mit'
                         WHEN 1 THEN 'apache-2.0'
                         WHEN 2 THEN 'gpl-3.0-only'
                         WHEN 3 THEN 'bsd-3-clause'
                         ELSE 'cc-by-4.0' END || ' | ' || text
                  ELSE text END AS text
      FROM documents
    )
"""

SQL_LICENSE_DETECT = f"""
    WITH {_SQL_LIC_PLANT},
    det AS (
      SELECT source,
             CASE
               WHEN regexp_matches(lower(text),
                    'gpl-3\\.0|gnu general public license') THEN 'gpl-3.0'
               WHEN regexp_matches(lower(text),
                    'apache-2\\.0|apache license') THEN 'apache-2.0'
               WHEN regexp_matches(lower(text),
                    'bsd-3-clause|bsd license') THEN 'bsd-3-clause'
               WHEN regexp_matches(lower(text),
                    'cc-by-4\\.0|creative commons') THEN 'cc-by-4.0'
               WHEN regexp_matches(lower(text), '\\bmit\\b') THEN 'mit'
               ELSE 'none' END AS license
      FROM planted
    ),
    lab AS (
      SELECT source, license,
             license IN ('apache-2.0', 'bsd-3-clause', 'cc-by-4.0', 'mit')
               AS perm
      FROM det
    ),
    per_src AS (SELECT source, count(*) AS sd FROM lab GROUP BY 1)
    SELECT l.source, l.license,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN perm THEN 1 ELSE 0 END) AS BIGINT)
             AS n_permissive,
           round(count(*) * 1.0 / any_value(sd), 6) AS source_share
    FROM lab l JOIN per_src USING (source)
    GROUP BY 1, 2
"""


def _lic_planted(spark):
    d = load(spark, SF, "documents")
    lic = F.element_at(
        F.array(
            F.lit("mit"),
            F.lit("apache-2.0"),
            F.lit("gpl-3.0-only"),
            F.lit("bsd-3-clause"),
            F.lit("cc-by-4.0"),
        ),
        (F.col("doc_id") % 5 + 1).cast("int"),
    )
    return d.select(
        "doc_id",
        "source",
        F.when(
            (F.col("doc_id") % 11).isin(1, 4, 8),
            F.concat(
                F.lit("spdx-license-identifier: "),
                lic,
                F.lit(" | "),
                F.col("text"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )


def test_license_detect_profile_matches_duckdb(spark):
    from datapipeline_spike_spark.operators.detectors import (
        license_detect_profile,
    )

    got = {
        (r["source"], r["license"]): r.asDict()
        for r in license_detect_profile(_lic_planted(spark)).collect()
    }
    want = _con().execute(SQL_LICENSE_DETECT).df()
    assert len(got) == len(want)
    assert len({lic for _, lic in got}) == 6  # 5 licenses + none
    for _, w in want.iterrows():
        g = got[(w["source"], w["license"])]
        assert g["n_docs"] == int(w["n_docs"])
        assert g["n_permissive"] == int(w["n_permissive"])
        assert g["source_share"] == pytest.approx(
            w["source_share"], abs=1.5e-6
        )


def test_license_detect_priority_and_boundaries(spark):
    """Dual-mention texts classify to the FIRST (copyleft-first) match;
    'submit'/'limit' never fire the \\bmit\\b pattern."""
    from datapipeline_spike_spark.operators.detectors import (
        license_detect_profile,
    )

    rows = [
        (1, "s", "dual: mit license text under gnu general public license"),
        (2, "s", "please submit within the limit tomorrow"),
        (3, "s", "released under the mit license"),
        (4, "s", "see creative commons attribution"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        r["license"]: r["n_docs"] for r in license_detect_profile(df).collect()
    }
    assert got == {"gpl-3.0": 1, "none": 1, "mit": 1, "cc-by-4.0": 1}


# --- matryoshka_recall_at_k -----------------------------------------------------

SQL_MATRYOSHKA = """
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id < 5),
    c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv
          FROM embeddings),
    bf AS (
      SELECT query_id, neighbor_id
      FROM (SELECT query_id, neighbor_id,
                   row_number() OVER (PARTITION BY query_id
                     ORDER BY round(list_cosine_similarity(qv, cv), 6) DESC,
                              neighbor_id) AS rnk
            FROM c, q WHERE neighbor_id != query_id)
      WHERE rnk <= 5
    ),
    ms AS (SELECT CAST(unnest([8, 16]) AS INTEGER) AS m),
    tr AS (
      SELECT m, query_id, neighbor_id
      FROM (SELECT ms.m, query_id, neighbor_id,
                   row_number() OVER (PARTITION BY ms.m, query_id
                     ORDER BY round(list_cosine_similarity(
                         list_slice(qv, 1, ms.m),
                         list_slice(cv, 1, ms.m)), 6) DESC,
                              neighbor_id) AS rnk
            FROM c, q, ms WHERE neighbor_id != query_id)
      WHERE rnk <= 5
    )
    SELECT ms.m AS m_dims, bf.query_id,
           CAST(count(*) AS BIGINT) AS n_exact,
           CAST(sum(CASE WHEN tr.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_hits,
           round(sum(CASE WHEN tr.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                 * 1.0 / count(*), 6) AS recall_at_k
    FROM bf CROSS JOIN ms
    LEFT JOIN tr ON tr.m = ms.m AND tr.query_id = bf.query_id
                AND tr.neighbor_id = bf.neighbor_id
    GROUP BY 1, 2
"""


def test_matryoshka_recall_matches_duckdb(spark):
    from datapipeline_spike_spark.operators.similarity import (
        matryoshka_recall,
    )

    emb = load(spark, SF, "embeddings")
    got = {
        (r["m_dims"], r["query_id"]): r.asDict()
        for r in matryoshka_recall(
            emb, emb.filter(F.col("vec_id") < 5), k=5, dims=(8, 16)
        ).collect()
    }
    want = _con().execute(SQL_MATRYOSHKA).df()
    assert len(got) == len(want) == 10
    for _, w in want.iterrows():
        g = got[(w["m_dims"], w["query_id"])]
        assert g["n_exact"] == int(w["n_exact"])
        assert g["n_hits"] == int(w["n_hits"])
        assert g["recall_at_k"] == pytest.approx(
            w["recall_at_k"], abs=1.5e-6
        )


def test_matryoshka_full_width_is_perfect(spark):
    """Truncating to the full embedding width must reproduce the exact
    top-k — recall 1.0 for every query (the audit's sanity anchor)."""
    from datapipeline_spike_spark.operators.similarity import (
        matryoshka_recall,
    )

    emb = load(spark, SF, "embeddings")
    rows = matryoshka_recall(
        emb, emb.filter(F.col("vec_id") < 5), k=5, dims=(64,)
    ).collect()
    assert len(rows) == 5
    assert all(r["recall_at_k"] == 1.0 and r["n_exact"] == 5 for r in rows)


# --- audio_vad_segments ---------------------------------------------------------

SQL_VAD = """
    WITH xs AS (
      SELECT doc_id, i, i // 8 AS b,
             CASE WHEN (doc_id * 13 + (i // 8) * 7) % 3 != 0
                  THEN ((doc_id * 31 + i * 17) % 4001) - 2000
                  ELSE ((doc_id * 31 + i * 17) % 64) - 32 END AS x
      FROM (SELECT doc_id, unnest(range(0, 64 + (doc_id % 8) * 8)) AS i
            FROM documents)
    ),
    fe AS (SELECT doc_id, b, sum(x * x) AS energy FROM xs GROUP BY 1, 2),
    act AS (
      SELECT doc_id, b, energy,
             b - row_number() OVER (PARTITION BY doc_id ORDER BY b) AS grp
      FROM fe WHERE energy > 16384
    )
    SELECT doc_id AS media_id,
           CAST(min(b) AS BIGINT) AS seg_start_frame,
           CAST(count(*) AS BIGINT) AS n_frames,
           CAST(sum(energy) AS BIGINT) AS total_energy,
           round(sum(energy) * 1.0 / count(*), 6) AS mean_energy
    FROM act GROUP BY doc_id, grp
"""


def test_audio_vad_segments_match_duckdb(spark):
    """The full tier — synthesized gated WAV, REAL RIFF decode, frame
    energies, gaps-and-islands segmentation — vs a DuckDB replay from
    the regenerated waveform (never the container)."""
    from datapipeline_spike_spark.sources.multimodal import (
        audio_vad_segments,
        vad_media_from_documents,
    )

    got = {
        (r["media_id"], r["seg_start_frame"]): r.asDict()
        for r in audio_vad_segments(
            vad_media_from_documents(load(spark, SF, "documents"))
        ).collect()
    }
    want = _con().execute(SQL_VAD).df()
    assert len(got) == len(want) > 0
    for _, w in want.iterrows():
        g = got[(w["media_id"], w["seg_start_frame"])]
        assert g["n_frames"] == int(w["n_frames"])
        assert g["total_energy"] == int(w["total_energy"])
        assert g["mean_energy"] == pytest.approx(w["mean_energy"], abs=1.5e-6)


def test_audio_vad_planted_properties(spark):
    """Segments replay a pure-Python reference of the documented spec;
    silence-gated frames (energy <= 8 * 32^2 = 8192 < threshold) are
    NEVER inside a segment; a truncated payload contributes no rows."""
    from datapipeline_spike_spark.sources.multimodal import (
        audio_vad_segments,
        synthetic_wav_vad,
    )

    seeds = [3, 10, 21]
    media = spark.createDataFrame(
        [(s, synthetic_wav_vad(s, 64 + s % 8 * 8), "audio") for s in seeds],
        "media_id long, payload binary, media_type string",
    )
    got = sorted(
        (r["media_id"], r["seg_start_frame"], r["n_frames"], r["total_energy"])
        for r in audio_vad_segments(media).collect()
    )

    want = []
    for s in seeds:
        n = 64 + s % 8 * 8
        xs = [
            ((s * 31 + i * 17) % 4001) - 2000
            if (s * 13 + (i // 8) * 7) % 3 != 0
            else ((s * 31 + i * 17) % 64) - 32
            for i in range(n)
        ]
        energies = [
            sum(x * x for x in xs[b * 8 : b * 8 + 8]) for b in range(n // 8)
        ]
        b = 0
        while b < len(energies):
            if energies[b] > 16384:
                start = b
                tot = 0
                while b < len(energies) and energies[b] > 16384:
                    tot += energies[b]
                    b += 1
                want.append((s, start, b - start, tot))
            else:
                # the gate guarantees silence blocks stay silent
                assert (s * 13 + b * 7) % 3 == 0
                b += 1
    assert got == sorted(want)

    truncated = spark.createDataFrame(
        [(99, synthetic_wav_vad(99, 64)[:40], "audio")],
        "media_id long, payload binary, media_type string",
    )
    assert audio_vad_segments(truncated).count() == 0


# --- curriculum_phase_plan ------------------------------------------------------

SQL_CURRICULUM = f"""
    WITH t AS (SELECT source, doc_id,
                      {_SQL_TOKS.format(c='text')} AS toks FROM documents),
    s AS (SELECT source, doc_id, len(toks) AS nt,
                 list_sum(list_transform(toks, x -> length(x))) AS sumlen
          FROM t WHERE len(toks) > 0),
    d AS (SELECT source, doc_id, nt,
                 round(sumlen * 1.0 / nt, 6) AS diff FROM s),
    p AS (SELECT *, ntile(4) OVER (PARTITION BY source
                  ORDER BY diff ASC, doc_id ASC) AS phase FROM d),
    plan AS (
      SELECT source, phase,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(nt) AS BIGINT) AS token_budget,
             round(avg(diff), 6) AS mean_difficulty
      FROM p GROUP BY 1, 2
    )
    SELECT source, CAST(phase AS BIGINT) AS phase, n_docs, token_budget,
           mean_difficulty,
           CAST(row_number() OVER (ORDER BY phase, source) AS BIGINT)
             AS schedule_pos
    FROM plan
"""


def test_curriculum_phase_plan_matches_duckdb(spark):
    from datapipeline_spike_spark.operators.curation import (
        curriculum_phase_plan,
    )

    got = {
        (r["source"], r["phase"]): r.asDict()
        for r in curriculum_phase_plan(load(spark, SF, "documents")).collect()
    }
    want = _con().execute(SQL_CURRICULUM).df()
    assert len(got) == len(want) > 0
    for _, w in want.iterrows():
        g = got[(w["source"], w["phase"])]
        assert g["n_docs"] == int(w["n_docs"])
        assert g["token_budget"] == int(w["token_budget"])
        assert g["mean_difficulty"] == pytest.approx(
            w["mean_difficulty"], abs=1.5e-6
        )
        assert g["schedule_pos"] == int(w["schedule_pos"])


def test_curriculum_planted_phases(spark):
    """8 one-source docs with strictly increasing mean token length
    split 2/2/2/2 easy-to-hard; budgets are the exact token sums;
    schedule is phase-major."""
    from datapipeline_spike_spark.operators.curation import (
        curriculum_phase_plan,
    )

    rows = [
        (i, "a", " ".join(["x" * (i + 1)] * 3)) for i in range(8)
    ]  # doc i: 3 tokens of length i+1 -> difficulty i+1
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = sorted(
        (r["phase"], r["n_docs"], r["token_budget"], r["mean_difficulty"])
        for r in curriculum_phase_plan(df).collect()
    )
    assert got == [
        (1, 2, 6, 1.5),
        (2, 2, 6, 3.5),
        (3, 2, 6, 5.5),
        (4, 2, 6, 7.5),
    ]
    two = curriculum_phase_plan(
        df.withColumn(
            "source",
            F.when(F.col("doc_id") < 4, F.lit("a")).otherwise(F.lit("b")),
        )
    ).collect()
    pos = {(r["phase"], r["source"]): r["schedule_pos"] for r in two}
    assert pos[(1, "a")] < pos[(1, "b")] < pos[(2, "a")]


# --- physical-plan shape pins (the registered-query plan-audit rules,
# applied at staging time so registration can't inherit a regression) ---


def _plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _window_groups(plan: str):
    """Bracket-group counts for every Window node (3+ = partitioned,
    2 = the unpartitioned scale-killer)."""
    import re as _re

    out = []
    for line in plan.splitlines():
        s = line.lstrip(" +-:|*(0123456789)")
        if s.startswith("Window "):
            out.append(len(_re.findall(r"\[[^\]]*\]", s)))
    return out


def test_pagerank_plan_shape(spark):
    """Per-iteration joins are keyed (hash/sort-merge), never a
    cartesian; the only nested-loop crosses are the documented 1-row
    count/dangling broadcasts; no Python, no windows."""
    from datapipeline_spike_spark.operators.graph import (
        host_link_graph,
        pagerank,
    )

    plan = _plan_of(pagerank(host_link_graph(load(spark, SF, "documents"))))
    assert "CartesianProduct" not in plan
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                 "Window"):
        assert node not in plan, node


def test_detectors_plan_shape(spark):
    """code_detect is map-only to its rollup (no joins, no windows, no
    Python); license_detect adds only the broadcast per-source join."""
    from datapipeline_spike_spark.operators.detectors import (
        code_detect_profile,
        license_detect_profile,
    )

    code = _plan_of(code_detect_profile(_code_planted(spark)))
    for node in ("SortMergeJoin", "BroadcastHashJoin",
                 "BroadcastNestedLoopJoin", "CartesianProduct", "Window",
                 "BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in code, node
    lic = _plan_of(license_detect_profile(_lic_planted(spark)))
    assert "BroadcastHashJoin" in lic
    for node in ("SortMergeJoin", "CartesianProduct", "Window",
                 "BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in lic, node


def test_matryoshka_plan_shape(spark):
    """Every corpus-side scan joins the BROADCAST query set (the ANN
    audit contract) — no shuffled join anywhere, no Python; the top-k
    windows are partitioned by query."""
    from datapipeline_spike_spark.operators.similarity import (
        matryoshka_recall,
    )

    emb = load(spark, SF, "embeddings")
    plan = _plan_of(
        matryoshka_recall(emb, emb.filter(F.col("vec_id") < 5), k=5,
                          dims=(8, 16))
    )
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan, node
    assert all(g >= 3 for g in _window_groups(plan))


def test_vad_plan_shape(spark):
    """The decode is the one Arrow stage (MapInPandas); the islands
    window is PARTITIONED by clip; no joins."""
    from datapipeline_spike_spark.sources.multimodal import (
        audio_vad_segments,
        vad_media_from_documents,
    )

    plan = _plan_of(
        audio_vad_segments(
            vad_media_from_documents(load(spark, SF, "documents"))
        )
    )
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan
    for node in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct"):
        assert node not in plan, node
    groups = _window_groups(plan)
    assert groups and all(g >= 3 for g in groups)


def test_curriculum_plan_windows(spark):
    """The doc-grain ntile window is PARTITIONED by source; exactly one
    unpartitioned window exists and it runs on the (sources x phases)
    plan grain AFTER the aggregate (bounded by construction)."""
    from datapipeline_spike_spark.operators.curation import (
        curriculum_phase_plan,
    )

    plan = _plan_of(curriculum_phase_plan(load(spark, SF, "documents")))
    groups = _window_groups(plan)
    assert len(groups) == 2
    assert sorted(groups) == [2, 3]
    # the unpartitioned window must sit ABOVE the aggregate (plan grain)
    lines = plan.splitlines()
    win2 = next(
        i for i, line in enumerate(lines)
        if line.lstrip(" +-:|*(0123456789)").startswith("Window ")
        and len(__import__("re").findall(r"\[[^\]]*\]", line)) == 2
    )
    assert any("HashAggregate" in line for line in lines[win2:]), (
        "unpartitioned window not above the aggregate"
    )


# ============================ WAVE 3 =============================
# Staged later in r14 (register r16+): video_scene_cuts,
# crawl_frontier_priority, anchor_text_stats, span_corruption_plan —
# same gauntlet: full DuckDB differential + planted properties.


SQL_SCENE_CUTS = """
    WITH fb AS (
      SELECT doc_id, f, b,
             ((doc_id * 131 + (f // 3) * 37) * 11 + b * 29) % 256 AS v
      FROM (SELECT doc_id, unnest(range(0, 6 + (doc_id % 2) * 3)) AS f
            FROM documents),
           (SELECT unnest(range(0, 2)) AS b)
    ),
    d AS (
      SELECT a.doc_id, a.f, sum(64 * abs(a.v - p.v)) AS diff
      FROM fb a JOIN fb p
        ON p.doc_id = a.doc_id AND p.f = a.f - 1 AND p.b = a.b
      GROUP BY 1, 2
    ),
    fr AS (
      SELECT fb.doc_id, fb.f, d.diff
      FROM (SELECT DISTINCT doc_id, f FROM fb) fb
      LEFT JOIN d ON d.doc_id = fb.doc_id AND d.f = fb.f
    ),
    m AS (
      SELECT doc_id, f, diff,
             (f = 0 OR diff > 0) AS is_cut,
             sum(CASE WHEN f = 0 OR diff > 0 THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY f) AS shot
      FROM fr
    )
    SELECT doc_id AS media_id,
           CAST(shot - 1 AS BIGINT) AS shot_idx,
           CAST(min(f) AS BIGINT) AS start_frame,
           CAST(count(*) AS BIGINT) AS n_frames,
           CAST(max(CASE WHEN is_cut THEN diff END) AS BIGINT)
             AS cut_energy
    FROM m GROUP BY doc_id, shot
"""


def test_video_scene_cuts_match_duckdb(spark):
    """Scene-gated MJPEG synth -> REAL sample-table walk + baseline
    JPEG decode -> per-frame diffs -> running-cut shots, vs a DuckDB
    replay from the generative (seed, scene, block) pixel formula."""
    from datapipeline_spike_spark.sources.multimodal import (
        scene_media_from_documents,
        video_scene_cuts,
    )

    got = {
        (r["media_id"], r["shot_idx"]): r.asDict()
        for r in video_scene_cuts(
            scene_media_from_documents(load(spark, SF, "documents"))
        ).collect()
    }
    want = _con().execute(SQL_SCENE_CUTS).df()
    assert len(got) == len(want) > 0
    for _, w in want.iterrows():
        g = got[(w["media_id"], w["shot_idx"])]
        assert g["start_frame"] == int(w["start_frame"])
        assert g["n_frames"] == int(w["n_frames"])
        if w["cut_energy"] != w["cut_energy"]:  # NaN = shot 0
            assert g["cut_energy"] is None
        else:
            assert g["cut_energy"] == int(w["cut_energy"])


def test_video_scene_cuts_planted(spark):
    """3-frame scenes produce exactly n_frames/3 shots of 3 (when every
    boundary actually changes pixels — replayed in pure Python); a
    constant video is ONE shot; a truncated payload contributes no
    rows."""
    from datapipeline_spike_spark.sources.multimodal import (
        scene_media_from_documents,
        synthetic_scene_mp4,
        video_scene_cuts,
    )

    seeds = [4, 9]
    media = scene_media_from_documents(
        load(spark, SF, "documents").filter(F.col("doc_id").isin(seeds))
    )
    got = sorted(
        (r["media_id"], r["shot_idx"], r["start_frame"], r["n_frames"])
        for r in video_scene_cuts(media).collect()
    )
    want = []
    for s in seeds:
        n = 6 + s % 2 * 3
        shots = 0
        for f in range(n):
            if f == 0 or (
                f % 3 == 0
                # boundary diff > 0 iff the two scene pattern values
                # differ in at least one block
                and any(
                    ((s * 131 + (f // 3) * 37) * 11 + b * 29) % 256
                    != ((s * 131 + (f // 3 - 1) * 37) * 11 + b * 29) % 256
                    for b in range(2)
                )
            ):
                shots += 1
                want.append((s, shots - 1, f, 3))
    assert got == sorted(want)

    one_shot = spark.createDataFrame(
        [(7, synthetic_scene_mp4(7, 6, scene_len=6), "video")],
        "media_id long, payload binary, media_type string",
    )
    rows = video_scene_cuts(one_shot).collect()
    assert len(rows) == 1 and rows[0]["n_frames"] == 6
    truncated = spark.createDataFrame(
        [(8, synthetic_scene_mp4(8, 6)[:64], "video")],
        "media_id long, payload binary, media_type string",
    )
    assert video_scene_cuts(truncated).count() == 0


# --- crawl_frontier_priority ----------------------------------------------------

SQL_FRONTIER = f"""
    WITH {_SQL_PR_GRAPH},
    {_sql_pr_iter(3)},
    pr AS (SELECT b.host, round(r3.rank, 6) AS pagerank
           FROM b JOIN r3 USING (host)),
    pages AS (SELECT doc_id % 64 AS host, doc_id % 40 AS path,
                     doc_id AS id, CAST(1 + doc_id % 4 AS DOUBLE) AS depth
              FROM documents),
    fs AS (SELECT host, path, min(id) AS first FROM pages GROUP BY 1, 2),
    fl AS (SELECT p.host, p.depth,
                  CASE WHEN p.id != fs.first THEN 1 ELSE 0 END AS dup
           FROM pages p JOIN fs USING (host, path)),
    sig AS (SELECT host, CAST(count(*) AS BIGINT) AS n_pages,
                   round(sum(dup) * 1.0 / count(*), 6) AS dup_rate,
                   round(avg(depth), 6) AS mean_depth
            FROM fl GROUP BY 1)
    SELECT pr.host, pr.pagerank, sig.n_pages, sig.dup_rate,
           sig.mean_depth,
           round(pr.pagerank * (1 - sig.dup_rate) / sig.mean_depth, 6)
             AS priority
    FROM pr JOIN sig USING (host)
"""


def test_crawl_frontier_priority_matches_duckdb(spark):
    from datapipeline_spike_spark.operators.graph import (
        crawl_frontier_priority,
    )

    got = {
        r["host"]: r.asDict()
        for r in crawl_frontier_priority(
            load(spark, SF, "documents")
        ).collect()
    }
    want = _con().execute(SQL_FRONTIER).df()
    assert len(got) == len(want) > 0
    for _, w in want.iterrows():
        g = got[w["host"]]
        assert g["n_pages"] == int(w["n_pages"])
        for c in ("pagerank", "dup_rate", "mean_depth", "priority"):
            assert g[c] == pytest.approx(w[c], abs=1.5e-6), c


def test_crawl_frontier_internal_consistency(spark):
    """priority recomputes from the row's own published columns; dup
    rate stays in [0, 1) (a host's first page is never a dup); depth
    in [1, 4]."""
    from datapipeline_spike_spark.operators.graph import (
        crawl_frontier_priority,
    )

    rows = crawl_frontier_priority(load(spark, SF, "documents")).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["dup_rate"] < 1.0
        assert 1.0 <= r["mean_depth"] <= 4.0
        # Spark round() is HALF_UP; replay it explicitly (Python round
        # is banker's and flips exact .5e-6 boundaries)
        import math

        x = r["pagerank"] * (1 - r["dup_rate"]) / r["mean_depth"]
        assert r["priority"] == pytest.approx(
            math.floor(x * 1e6 + 0.5) / 1e6, abs=1e-9
        )


# --- anchor_text_stats ----------------------------------------------------------

SQL_ANCHORS = f"""
    WITH t AS (SELECT doc_id, {_SQL_TOKS.format(c='text')} AS toks
               FROM documents),
    b AS (SELECT doc_id, toks, len(toks) AS nt FROM t WHERE len(toks) > 0),
    l AS (
      SELECT ((doc_id % 64) * (doc_id % 64) + j * 13 + 1) % 64 AS host,
             toks[CAST((doc_id + j) % nt AS INT) + 1] AS anchor
      FROM b, (SELECT unnest(range(0, 3)) AS j)
    ),
    c AS (SELECT host, anchor, CAST(count(*) AS BIGINT) AS n_links
          FROM l GROUP BY 1, 2)
    SELECT host, anchor, n_links, CAST(rank AS BIGINT) AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY host
              ORDER BY n_links DESC, anchor) AS rank FROM c)
    WHERE rank <= 3
"""


def test_anchor_text_stats_match_duckdb(spark):
    from datapipeline_spike_spark.operators.graph import anchor_text_stats

    got = {
        (r["host"], r["rank"]): r.asDict()
        for r in anchor_text_stats(load(spark, SF, "documents")).collect()
    }
    want = _con().execute(SQL_ANCHORS).df()
    assert len(got) == len(want) > 0
    for _, w in want.iterrows():
        g = got[(w["host"], w["rank"])]
        assert g["anchor"] == w["anchor"]
        assert g["n_links"] == int(w["n_links"])


def test_anchor_text_planted(spark):
    """Hand corpus: every link from doc 8 carries a known token; ranks
    are 1..k with the count-desc/anchor-asc total order."""
    from datapipeline_spike_spark.operators.graph import anchor_text_stats

    # doc 8: toks = [alpha, beta, gamma]; links j=0,1,2 -> anchors
    # toks[(8+j) % 3 + 1] = toks[2+1]=gamma, toks[0+1]=alpha, toks[1+1]=beta
    df = spark.createDataFrame(
        [(8, "alpha beta gamma")], "doc_id long, text string"
    )
    rows = sorted(
        (r["host"], r["anchor"], r["n_links"], r["rank"])
        for r in anchor_text_stats(df).collect()
    )
    hosts = [(8 * 8 + j * 13 + 1) % 64 for j in range(3)]
    assert rows == sorted(
        [
            (hosts[0], "gamma", 1, 1),
            (hosts[1], "alpha", 1, 1),
            (hosts[2], "beta", 1, 1),
        ]
    )


# --- span_corruption_plan -------------------------------------------------------

SQL_SPAN_PLAN = f"""
    WITH t AS (SELECT doc_id,
                      CAST(len({_SQL_TOKS.format(c='text')}) AS BIGINT)
                        AS n_tokens
               FROM documents),
    b AS (SELECT doc_id, n_tokens FROM t WHERE n_tokens >= 2),
    p1 AS (SELECT doc_id, n_tokens,
                  CAST(greatest(1, least(
                      floor(n_tokens * 0.15 + 0.5), n_tokens - 1))
                    AS BIGINT) AS noise_tokens
           FROM b),
    p2 AS (SELECT *, CAST(greatest(1,
                  floor(noise_tokens / 3.0 + 0.5)) AS BIGINT) AS n_spans
           FROM p1)
    SELECT doc_id, n_tokens, noise_tokens, n_spans,
           CAST(n_tokens - noise_tokens + n_spans + 1 AS BIGINT)
             AS input_len,
           CAST(noise_tokens + n_spans + 1 AS BIGINT) AS target_len
    FROM p2
"""


def test_span_corruption_plan_matches_duckdb(spark):
    from datapipeline_spike_spark.operators.packing import (
        span_corruption_plan,
    )

    got = {
        r["doc_id"]: r.asDict()
        for r in span_corruption_plan(load(spark, SF, "documents")).collect()
    }
    want = _con().execute(SQL_SPAN_PLAN).df()
    assert len(got) == len(want) > 0
    for _, w in want.iterrows():
        g = got[w["doc_id"]]
        for c in ("n_tokens", "noise_tokens", "n_spans", "input_len",
                  "target_len"):
            assert g[c] == int(w[c]), c


def test_span_corruption_hand_cases(spark):
    """The documented arithmetic on pinned cases, incl. both clamps:
    n=10 -> noise 2, spans 1, input 10, target 4; n=2 -> the noise
    floor clamps up to 1 and the span floor to 1 (input 3, target 3);
    a 1-token doc is dropped."""
    from datapipeline_spike_spark.operators.packing import (
        span_corruption_plan,
    )

    df = spark.createDataFrame(
        [
            (1, " ".join(f"w{i}" for i in range(10))),
            (2, "a b"),
            (3, "solo"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in span_corruption_plan(df).collect()}
    assert set(got) == {1, 2}
    r1 = got[1]
    assert (r1["noise_tokens"], r1["n_spans"], r1["input_len"],
            r1["target_len"]) == (2, 1, 10, 4)
    r2 = got[2]
    assert (r2["noise_tokens"], r2["n_spans"], r2["input_len"],
            r2["target_len"]) == (1, 1, 3, 3)


def test_wave3_plan_shapes(spark):
    """Wave-3 pins: scene cuts = one Arrow decode + a partitioned
    window, no joins; frontier = keyed joins only (no cartesian, no
    Python, no data-grain window); anchors = partitioned window on the
    aggregated grain, no Python; span plan = strictly map-only."""
    from datapipeline_spike_spark.operators.graph import (
        anchor_text_stats,
        crawl_frontier_priority,
    )
    from datapipeline_spike_spark.operators.packing import (
        span_corruption_plan,
    )
    from datapipeline_spike_spark.sources.multimodal import (
        scene_media_from_documents,
        video_scene_cuts,
    )

    docs = load(spark, SF, "documents")

    scene = _plan_of(video_scene_cuts(scene_media_from_documents(docs)))
    assert "MapInPandas" in scene and "BatchEvalPython" not in scene
    for node in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct"):
        assert node not in scene, node
    assert all(g >= 3 for g in _window_groups(scene))

    frontier = _plan_of(crawl_frontier_priority(docs))
    assert "CartesianProduct" not in frontier
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                 "Window"):
        assert node not in frontier, node

    anchors = _plan_of(anchor_text_stats(docs))
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                 "SortMergeJoin", "BroadcastHashJoin", "CartesianProduct"):
        assert node not in anchors, node
    groups = _window_groups(anchors)
    assert groups and all(g >= 3 for g in groups)

    span = _plan_of(span_corruption_plan(docs))
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                 "SortMergeJoin", "BroadcastHashJoin",
                 "BroadcastNestedLoopJoin", "CartesianProduct", "Window"):
        assert node not in span, node


# ============================ WAVE 4 =============================
# label_propagation_communities, vocab_overlap_matrix,
# minhash_band_tuning — same gauntlet.


def _sql_lpa(k: int) -> str:
    parts = [
        """u AS (SELECT src AS a, dst AS b FROM e
                 UNION SELECT dst, src FROM e),
           l0 AS (SELECT DISTINCT a AS host, a AS label FROM u)"""
    ]
    for i in range(1, k + 1):
        p = i - 1
        parts.append(
            f"""n{i} AS (SELECT u.a, l.label, count(*) AS c
                 FROM u JOIN l{p} l ON u.b = l.host GROUP BY 1, 2),
               l{i} AS (SELECT a AS host, label FROM
                 (SELECT a, label, row_number() OVER (PARTITION BY a
                    ORDER BY c DESC, label ASC) AS rn FROM n{i})
                 WHERE rn = 1)"""
        )
    return ",\n".join(parts)


SQL_LPA = f"""
    WITH {_SQL_PR_GRAPH},
    {_sql_lpa(3)}
    SELECT host, label AS community FROM l3
"""


def test_label_propagation_matches_duckdb(spark):
    from datapipeline_spike_spark.operators.graph import (
        host_link_graph,
        label_propagation_communities,
    )

    got = {
        r["host"]: r["community"]
        for r in label_propagation_communities(
            host_link_graph(load(spark, SF, "documents"))
        ).collect()
    }
    want = _con().execute(SQL_LPA).df()
    assert len(got) == len(want) > 0
    for _, w in want.iterrows():
        assert got[w["host"]] == w["community"], w["host"]


def test_label_propagation_planted_communities(spark):
    """Two disjoint triangles each collapse to their min vertex id; the
    synchronous rounds replay a pure-Python reference on a path
    graph (deterministic smallest-label ties)."""
    from datapipeline_spike_spark.operators.graph import (
        label_propagation_communities,
    )

    tri = [(0, 1), (1, 2), (2, 0), (10, 11), (11, 12), (12, 10)]
    df = spark.createDataFrame(tri, "src long, dst long")
    got = {
        r["host"]: r["community"]
        for r in label_propagation_communities(df).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 10: 10, 11: 10, 12: 10}

    path = [(1, 2), (2, 3), (3, 4)]
    pdf = spark.createDataFrame(path, "src long, dst long")
    und = set()
    for a, b in path:
        und.add((a, b))
        und.add((b, a))
    labels = {v: v for v in {x for e in und for x in e}}
    for _ in range(3):
        counts: dict = {}
        for a, b in und:
            counts.setdefault(a, {})
            lab = labels[b]
            counts[a][lab] = counts[a].get(lab, 0) + 1
        labels = {
            a: min(
                (lab for lab in cs if cs[lab] == max(cs.values()))
            )
            for a, cs in counts.items()
        }
    got2 = {
        r["host"]: r["community"]
        for r in label_propagation_communities(pdf).collect()
    }
    assert got2 == labels


def test_label_propagation_string_vertex_ids(spark):
    """r15 pre-registration review: the tie-break negated the LABEL,
    which crashes on non-numeric vertex ids. The min_by((-count,
    label)) form is type-generic — two string triangles collapse to
    their lexicographically smallest member exactly like the long
    graph."""
    from datapipeline_spike_spark.operators.graph import (
        label_propagation_communities,
    )

    tri = [
        ("a.com", "b.com"), ("b.com", "c.com"), ("c.com", "a.com"),
        ("x.org", "y.org"), ("y.org", "z.org"), ("z.org", "x.org"),
    ]
    df = spark.createDataFrame(tri, "src string, dst string")
    got = {
        r["host"]: r["community"]
        for r in label_propagation_communities(df).collect()
    }
    assert got == {
        "a.com": "a.com", "b.com": "a.com", "c.com": "a.com",
        "x.org": "x.org", "y.org": "x.org", "z.org": "x.org",
    }


# --- vocab_overlap_matrix -------------------------------------------------------

SQL_VOCAB_OVERLAP = f"""
    WITH c AS (
      SELECT source, t, count(*) AS c
      FROM (SELECT source, unnest({_SQL_TOKS.format(c='text')}) AS t
            FROM documents)
      GROUP BY 1, 2
    ),
    v AS (SELECT source, t FROM
            (SELECT *, row_number() OVER (PARTITION BY source
               ORDER BY c DESC, t ASC) AS r FROM c)
          WHERE r <= 256),
    sz AS (SELECT source, count(*) AS v FROM v GROUP BY 1),
    i AS (SELECT a.source AS sa, b.source AS sb, count(*) AS n
          FROM v a JOIN v b ON a.t = b.t AND a.source < b.source
          GROUP BY 1, 2)
    SELECT sa.source AS source_a, sb.source AS source_b,
           CAST(sa.v AS BIGINT) AS v_a, CAST(sb.v AS BIGINT) AS v_b,
           CAST(coalesce(i.n, 0) AS BIGINT) AS n_common,
           round(coalesce(i.n, 0) * 1.0
                 / (sa.v + sb.v - coalesce(i.n, 0)), 6) AS jaccard
    FROM sz sa CROSS JOIN sz sb
    LEFT JOIN i ON i.sa = sa.source AND i.sb = sb.source
    WHERE sa.source < sb.source
"""


def test_vocab_overlap_matches_duckdb(spark):
    from datapipeline_spike_spark.operators.text_stats import (
        vocab_overlap_matrix,
    )

    got = {
        (r["source_a"], r["source_b"]): r.asDict()
        for r in vocab_overlap_matrix(load(spark, SF, "documents")).collect()
    }
    want = _con().execute(SQL_VOCAB_OVERLAP).df()
    assert len(got) == len(want) > 0
    for _, w in want.iterrows():
        g = got[(w["source_a"], w["source_b"])]
        assert g["v_a"] == int(w["v_a"]) and g["v_b"] == int(w["v_b"])
        assert g["n_common"] == int(w["n_common"])
        assert g["jaccard"] == pytest.approx(w["jaccard"], abs=1.5e-6)


def test_vocab_overlap_planted(spark):
    """Hand corpus: sources sharing half their vocab score 1/3
    (2 common / 6 union); a disjoint pair still appears with 0."""
    from datapipeline_spike_spark.operators.text_stats import (
        vocab_overlap_matrix,
    )

    rows = [
        (1, "a1", "alpha beta gamma delta"),
        (2, "b2", "gamma delta epsilon zeta"),
        (3, "c3", "eta theta iota kappa"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        (r["source_a"], r["source_b"]): r
        for r in vocab_overlap_matrix(df, vocab_size=4).collect()
    }
    assert len(got) == 3
    ab = got[("a1", "b2")]
    assert (ab["n_common"], ab["jaccard"]) == (2, pytest.approx(1 / 3, abs=1e-6))
    assert got[("a1", "c3")]["n_common"] == 0
    assert got[("a1", "c3")]["jaccard"] == 0.0


# --- minhash_band_tuning --------------------------------------------------------

SQL_BAND_TUNING = """
    SELECT CAST(128 AS BIGINT) AS n_hashes,
           CAST(b.bands AS BIGINT) AS bands,
           CAST(128 // b.bands AS BIGINT) AS rows_per_band,
           round(CAST(i * 0.05 AS DOUBLE), 6) AS s,
           round(1 - power(1 - power(i * 0.05, 128 // b.bands), b.bands), 6)
             AS p_candidate,
           round(power(1.0 / b.bands, 1.0 / (128 // b.bands)), 6)
             AS approx_threshold
    FROM (SELECT unnest(range(1, 129)) AS bands) b,
         (SELECT unnest(range(1, 20)) AS i)
    WHERE 128 % b.bands = 0
"""


def test_minhash_band_tuning_matches_duckdb(spark):
    from datapipeline_spike_spark.operators.sketches import (
        minhash_band_tuning,
    )

    got = {
        (r["bands"], r["s"]): r.asDict()
        for r in minhash_band_tuning(spark, n_hashes=128).collect()
    }
    want = _con().execute(SQL_BAND_TUNING).df()
    assert len(got) == len(want) > 0
    for _, w in want.iterrows():
        g = got[(w["bands"], w["s"])]
        assert g["rows_per_band"] == int(w["rows_per_band"])
        assert g["p_candidate"] == pytest.approx(w["p_candidate"], abs=1.5e-6)
        assert g["approx_threshold"] == pytest.approx(
            w["approx_threshold"], abs=1.5e-6
        )


def test_minhash_band_tuning_analytic_properties(spark):
    """The S-curve sanity anchors: b=1 -> p = s^n; r=1 (b=n) ->
    p = 1-(1-s)^n; p monotone in s for every factorization; the
    registered LSH default's threshold lands where its docstring
    claims."""
    from datapipeline_spike_spark.operators.sketches import (
        minhash_band_tuning,
    )

    rows = minhash_band_tuning(spark, n_hashes=16).collect()
    by = {}
    for r in rows:
        by.setdefault(r["bands"], []).append(r)
    for b, rs in by.items():
        rs.sort(key=lambda r: r["s"])
        ps = [r["p_candidate"] for r in rs]
        assert ps == sorted(ps), f"p not monotone for bands={b}"
    one = {r["s"]: r["p_candidate"] for r in by[1]}
    assert one[0.5] == pytest.approx(round(0.5**16, 6), abs=1e-6)
    full = {r["s"]: r["p_candidate"] for r in by[16]}
    assert full[0.5] == pytest.approx(round(1 - 0.5**16, 6), abs=1e-6)


def test_wave4_plan_shapes(spark):
    """Wave-4 pins: LPA rounds are keyed joins + two-level aggregates
    (no windows, no cartesian, no Python); vocab overlap's rank window
    is PARTITIONED and its only cross is the bounded sources x sources
    pair frame; band tuning is a pure generated-grid projection."""
    from datapipeline_spike_spark.operators.graph import (
        host_link_graph,
        label_propagation_communities,
    )
    from datapipeline_spike_spark.operators.sketches import (
        minhash_band_tuning,
    )
    from datapipeline_spike_spark.operators.text_stats import (
        vocab_overlap_matrix,
    )

    docs = load(spark, SF, "documents")

    lpa = _plan_of(label_propagation_communities(host_link_graph(docs)))
    assert "CartesianProduct" not in lpa
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                 "Window"):
        assert node not in lpa, node

    vo = _plan_of(vocab_overlap_matrix(docs))
    assert "CartesianProduct" not in vo
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in vo, node
    assert all(g >= 3 for g in _window_groups(vo))

    bt = _plan_of(minhash_band_tuning(spark))
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                 "SortMergeJoin", "Window", "CartesianProduct"):
        assert node not in bt, node


# ============================ WAVE 5 =============================
# triangle_clustering — same gauntlet.

SQL_TRIANGLES = f"""
    WITH {_SQL_PR_GRAPH},
    u AS (SELECT src AS a, dst AS b FROM e UNION SELECT dst, src FROM e),
    deg AS (SELECT a AS host, count(*) AS degree FROM u GROUP BY 1),
    lt AS (SELECT a, b FROM u WHERE a < b),
    tri AS (
      SELECT ab.a, ab.b, bc.b AS c
      FROM lt ab JOIN lt bc ON bc.a = ab.b
      JOIN lt ac ON ac.a = ab.a AND ac.b = bc.b
    ),
    cr AS (
      SELECT host, count(*) AS triangles FROM (
        SELECT a AS host FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
      ) GROUP BY 1
    )
    SELECT deg.host, CAST(deg.degree AS BIGINT) AS degree,
           CAST(coalesce(cr.triangles, 0) AS BIGINT) AS triangles,
           CASE WHEN deg.degree >= 2 THEN
             round(2.0 * coalesce(cr.triangles, 0)
                   / (deg.degree * (deg.degree - 1)), 6)
           END AS clustering
    FROM deg LEFT JOIN cr USING (host)
"""


def test_triangle_clustering_matches_duckdb(spark):
    from datapipeline_spike_spark.operators.graph import (
        host_link_graph,
        triangle_clustering,
    )

    got = {
        r["host"]: r.asDict()
        for r in triangle_clustering(
            host_link_graph(load(spark, SF, "documents"))
        ).collect()
    }
    want = _con().execute(SQL_TRIANGLES).df()
    assert len(got) == len(want) > 0
    assert any(v["triangles"] > 0 for v in got.values())
    for _, w in want.iterrows():
        g = got[w["host"]]
        assert g["degree"] == int(w["degree"])
        assert g["triangles"] == int(w["triangles"])
        if w["clustering"] != w["clustering"]:
            assert g["clustering"] is None
        else:
            assert g["clustering"] == pytest.approx(
                w["clustering"], abs=1.5e-6
            )


def test_triangle_clustering_planted(spark):
    """A 4-clique gives every vertex 3 triangles and clustering 1.0; a
    path vertex has clustering 0; a degree-1 leaf is NULL; direction
    and duplicate edges collapse."""
    from datapipeline_spike_spark.operators.graph import (
        triangle_clustering,
    )

    clique = [
        (a, b) for a in range(4) for b in range(4) if a != b
    ]  # all ordered pairs: direction + dup collapse must handle
    extra = [(3, 4), (4, 5)]  # a tail: 4 is a path vertex, 5 a leaf
    df = spark.createDataFrame(clique + extra, "src long, dst long")
    got = {r["host"]: r for r in triangle_clustering(df).collect()}
    for v in range(3):
        assert got[v]["triangles"] == 3 and got[v]["clustering"] == 1.0
    assert got[3]["degree"] == 4 and got[3]["triangles"] == 3
    assert got[3]["clustering"] == pytest.approx(0.5)  # 2*3/(4*3)
    assert got[4]["triangles"] == 0 and got[4]["clustering"] == 0.0
    assert got[5]["degree"] == 1 and got[5]["clustering"] is None


def test_triangle_plan_shape(spark):
    """Both triangle joins are equi joins (never cartesian/BNLJ), no
    Python, no windows."""
    from datapipeline_spike_spark.operators.graph import (
        host_link_graph,
        triangle_clustering,
    )

    plan = _plan_of(
        triangle_clustering(host_link_graph(load(spark, SF, "documents")))
    )
    for node in ("CartesianProduct", "BroadcastNestedLoopJoin",
                 "BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                 "Window"):
        assert node not in plan, node


# ============================ WAVE 6 =============================
# rrf_fuse / hybrid_rrf_retrieval — same gauntlet.

SQL_HYBRID_RRF = """
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id < 5),
    c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv
          FROM embeddings),
    full_r AS (
      SELECT query_id, neighbor_id, rnk AS rank
      FROM (SELECT query_id, neighbor_id,
                   row_number() OVER (PARTITION BY query_id
                     ORDER BY round(list_cosine_similarity(qv, cv), 6) DESC,
                              neighbor_id) AS rnk
            FROM c, q WHERE neighbor_id != query_id)
      WHERE rnk <= 10
    ),
    tr AS (
      SELECT query_id, neighbor_id, rnk AS rank
      FROM (SELECT query_id, neighbor_id,
                   row_number() OVER (PARTITION BY query_id
                     ORDER BY round(list_cosine_similarity(
                         list_slice(qv, 1, 8), list_slice(cv, 1, 8)), 6)
                       DESC, neighbor_id) AS rnk
            FROM c, q WHERE neighbor_id != query_id)
      WHERE rnk <= 10
    ),
    u AS (SELECT * FROM full_r UNION ALL SELECT * FROM tr),
    fused AS (
      SELECT query_id, neighbor_id,
             CAST(count(*) AS BIGINT) AS n_systems,
             round(sum(1.0 / (60 + rank)), 6) AS rrf_score
      FROM u GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id, n_systems, rrf_score,
           CAST(fr AS BIGINT) AS fused_rank
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY rrf_score DESC, neighbor_id) AS fr FROM fused)
    WHERE fr <= 5
"""


def test_hybrid_rrf_matches_duckdb(spark):
    from datapipeline_spike_spark.operators.similarity import (
        hybrid_rrf_retrieval,
    )

    emb = load(spark, SF, "embeddings")
    got = {
        (r["query_id"], r["fused_rank"]): r.asDict()
        for r in hybrid_rrf_retrieval(
            emb, emb.filter(F.col("vec_id") < 5)
        ).collect()
    }
    want = _con().execute(SQL_HYBRID_RRF).df()
    assert len(got) == len(want) == 25
    for _, w in want.iterrows():
        g = got[(w["query_id"], w["fused_rank"])]
        assert g["neighbor_id"] == w["neighbor_id"]
        assert g["n_systems"] == int(w["n_systems"])
        assert g["rrf_score"] == pytest.approx(w["rrf_score"], abs=1.5e-6)


def test_rrf_fusion_properties(spark):
    """Consensus beats single-system: a doc both retrievers return at
    modest ranks outranks a doc one retriever returns at rank 1
    (1/61+1/62 > 1/61); fusing a system with itself preserves its
    order; ties break by neighbor id."""
    from datapipeline_spike_spark.operators.similarity import rrf_fuse

    a = spark.createDataFrame(
        [(0, 100, 1), (0, 200, 2)],
        "query_id long, neighbor_id long, rank long",
    )
    b = spark.createDataFrame(
        [(0, 200, 1), (0, 300, 2)],
        "query_id long, neighbor_id long, rank long",
    )
    rows = {
        r["neighbor_id"]: r for r in rrf_fuse([a, b], k=3).collect()
    }
    # 200 appears in both (ranks 2 and 1) -> top fused
    assert rows[200]["fused_rank"] == 1 and rows[200]["n_systems"] == 2
    assert rows[100]["fused_rank"] == 2  # rank 1 in a, absent in b
    assert rows[300]["fused_rank"] == 3
    assert rows[200]["rrf_score"] == pytest.approx(
        round(1 / 62 + 1 / 61, 6), abs=1e-6
    )

    self_fused = rrf_fuse([a, a], k=2).collect()
    order = sorted(
        (r["fused_rank"], r["neighbor_id"]) for r in self_fused
    )
    assert order == [(1, 100), (2, 200)]


def test_rrf_plan_shape(spark):
    """Both retriever scans broadcast the query set; the fusion windows
    are partitioned; no shuffled joins, no Python."""
    from datapipeline_spike_spark.operators.similarity import (
        hybrid_rrf_retrieval,
    )

    emb = load(spark, SF, "embeddings")
    plan = _plan_of(
        hybrid_rrf_retrieval(emb, emb.filter(F.col("vec_id") < 5))
    )
    for node in ("CartesianProduct", "SortMergeJoin", "BatchEvalPython",
                 "ArrowEvalPython", "MapInPandas"):
        assert node not in plan, node
    assert all(g >= 3 for g in _window_groups(plan))


# ============================ WAVE 7 =============================
# chat_turn_stats / dpo_pair_plan (operators/sft.py) — same gauntlet.

_SQL_CHAT_PLANT = """
    chats AS (
      SELECT doc_id,
             array_to_string(list_transform(range(0, 2 + doc_id % 4),
               i -> CASE WHEN (i + CASE WHEN doc_id % 5 = 0 THEN 1
                                   ELSE 0 END) % 2 = 0
                         THEN 'user: ' ELSE 'assistant: ' END
                    || substr(text, 1 + i * 7, 40)), chr(10))
             || CASE WHEN doc_id % 7 = 3
                     THEN chr(10) || '### footer ad'
                     ELSE '' END AS text
      FROM documents
    )
"""


def _chat_planted(spark):
    d = load(spark, SF, "documents")
    turns = F.transform(
        F.sequence(F.lit(0), (F.col("doc_id") % 4 + 1).cast("int")),
        lambda i: F.concat(
            F.when(
                (
                    i
                    + F.when(F.col("doc_id") % 5 == 0, F.lit(1)).otherwise(
                        F.lit(0)
                    )
                )
                % 2
                == 0,
                F.lit("user: "),
            ).otherwise(F.lit("assistant: ")),
            F.col("text").substr(i * 7 + 1, F.lit(40)),
        ),
    )
    return d.select(
        "doc_id",
        F.concat(
            F.array_join(turns, "\n"),
            F.when(
                F.col("doc_id") % 7 == 3, F.lit("\n### footer ad")
            ).otherwise(F.lit("")),
        ).alias("text"),
    )


SQL_CHAT_STATS = f"""
    WITH {_SQL_CHAT_PLANT},
    lines AS (
      SELECT doc_id, u.pos AS pos, u.line AS line
      FROM (SELECT doc_id, unnest(list_transform(
              list_filter(list_transform(
                regexp_split_to_array(text, chr(10)), l -> trim(l)),
                l -> l != ''),
              (l, i) -> {{'pos': i - 1, 'line': l}})) AS u
            FROM chats)
    ),
    cls AS (
      SELECT doc_id, pos,
             CASE WHEN lower(line) LIKE 'user: %' THEN 'user'
                  WHEN lower(line) LIKE 'assistant: %' THEN 'assistant'
                  ELSE 'noise' END AS role,
             len(list_filter(regexp_split_to_array(lower(
                 CASE WHEN lower(line) LIKE 'user: %' THEN substr(line, 7)
                      WHEN lower(line) LIKE 'assistant: %'
                        THEN substr(line, 12)
                      ELSE line END),
                 '[^a-z0-9'']+'), t -> t != '')) AS ntok
      FROM lines
    ),
    seq AS (
      SELECT doc_id, pos, role, ntok,
             lag(role) OVER (PARTITION BY doc_id ORDER BY pos) AS prev,
             row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS tn
      FROM cls WHERE role != 'noise'
    ),
    agg AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_turns,
             CAST(sum(CASE WHEN role = 'user' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_user,
             CAST(sum(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_assistant,
             bool_and(CASE WHEN tn = 1 THEN role = 'user' END)
               AS starts_with_user,
             bool_and(CASE WHEN prev IS NOT NULL THEN role != prev
                           ELSE true END) AS strict_alternation,
             max_by(role, pos) AS last_role,
             CAST(sum(ntok) AS BIGINT) AS turn_tokens,
             CAST(sum(CASE WHEN role = 'assistant' THEN ntok ELSE 0 END)
               AS BIGINT) AS assistant_tokens
      FROM seq GROUP BY 1
    ),
    noise AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_noise_lines
      FROM cls WHERE role = 'noise' GROUP BY 1
    )
    SELECT a.doc_id, n_turns, n_user, n_assistant,
           coalesce(noise.n_noise_lines, 0) AS n_noise_lines,
           starts_with_user, strict_alternation,
           last_role = 'assistant' AS ends_with_assistant,
           turn_tokens, assistant_tokens,
           CASE WHEN turn_tokens > 0
                THEN round(assistant_tokens * 1.0 / turn_tokens, 6)
           END AS assistant_token_share,
           starts_with_user AND strict_alternation
             AND last_role = 'assistant' AND n_turns >= 2
             AND turn_tokens >= 1 AS is_valid
    FROM agg a LEFT JOIN noise USING (doc_id)
"""


def test_chat_turn_stats_match_duckdb(spark):
    from datapipeline_spike_spark.operators.sft import chat_turn_stats

    got = {
        r["doc_id"]: r.asDict()
        for r in chat_turn_stats(_chat_planted(spark)).collect()
    }
    want = _con().execute(SQL_CHAT_STATS).df()
    assert len(got) == len(want) > 0
    valid = sum(1 for _, w in want.iterrows() if w["is_valid"])
    assert 0 < valid < len(want)  # the plant mixes valid and invalid
    for _, w in want.iterrows():
        g = got[w["doc_id"]]
        for c in ("n_turns", "n_user", "n_assistant", "n_noise_lines",
                  "turn_tokens", "assistant_tokens"):
            assert g[c] == int(w[c]), (c, w["doc_id"])
        for c in ("starts_with_user", "strict_alternation",
                  "ends_with_assistant", "is_valid"):
            assert g[c] == bool(w[c]), (c, w["doc_id"])
        assert g["assistant_token_share"] == pytest.approx(
            w["assistant_token_share"], abs=1.5e-6
        )


def test_chat_turn_stats_planted(spark):
    """Literal transcripts: a clean 4-turn dialogue validates; an
    assistant-first one fails starts_with_user; a double-user run
    breaks alternation; noise lines count but never break a pair."""
    from datapipeline_spike_spark.operators.sft import chat_turn_stats

    rows = [
        (1, "user: hi there\nassistant: hello friend\n"
            "user: more words\nassistant: final answer"),
        (2, "assistant: i speak first\nuser: too late"),
        (3, "user: one\nuser: two in a row\nassistant: three"),
        (4, "user: hi\n### system banner\nassistant: hello"),
        (5, "no turns at all here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in chat_turn_stats(df).collect()}
    assert 5 not in got  # zero turns -> dropped (the doc is all noise)
    assert got[1]["is_valid"] and got[1]["n_turns"] == 4
    # content-only tokens: every turn carries 2 -> share 4/8
    assert got[1]["turn_tokens"] == 8 and got[1]["assistant_tokens"] == 4
    assert got[1]["assistant_token_share"] == pytest.approx(0.5, abs=1e-6)
    assert not got[2]["starts_with_user"] and not got[2]["is_valid"]
    assert not got[3]["strict_alternation"]
    assert got[4]["n_noise_lines"] == 1 and got[4]["strict_alternation"]
    assert got[4]["is_valid"]


def test_chat_turn_stats_zero_token_transcript(spark):
    """The ADVICE r14 semantics, pinned before the wave-7 hash freezes:
    a structurally-perfect transcript whose every turn tokenizes empty
    (punctuation-only content) reports NULL assistant_token_share AND
    is_valid=False — turn_tokens >= 1 is a validity conjunct, so the
    NULL share can never ride on a transcript marked valid."""
    from datapipeline_spike_spark.operators.sft import chat_turn_stats

    rows = [
        (1, "user: ???\nassistant: !!!"),       # alternating, all noise content
        (2, "user: real words\nassistant: ..."),  # assistant side empty only
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in chat_turn_stats(df).collect()}
    g1 = got[1]
    assert g1["starts_with_user"] and g1["strict_alternation"]
    assert g1["ends_with_assistant"] and g1["n_turns"] == 2
    assert g1["turn_tokens"] == 0
    assert g1["assistant_token_share"] is None
    assert not g1["is_valid"]
    # a zero-ASSISTANT share over nonzero turn tokens is 0.0, not NULL,
    # and stays valid: only the all-empty case abstains
    g2 = got[2]
    assert g2["turn_tokens"] == 2 and g2["assistant_tokens"] == 0
    assert g2["assistant_token_share"] == 0.0
    assert g2["is_valid"]


SQL_DPO = """
    WITH cand AS (
      SELECT doc_id % 50 AS prompt_id, doc_id AS cand_id,
             round(((doc_id * 37) % 1000) / 1000.0, 6) AS s
      FROM documents
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY prompt_id
                 ORDER BY s DESC, cand_id ASC) AS top,
             row_number() OVER (PARTITION BY prompt_id
                 ORDER BY s ASC, cand_id DESC) AS bot
      FROM cand
    )
    SELECT t.prompt_id, t.cand_id AS chosen_id, b.cand_id AS rejected_id,
           t.s AS chosen_score, b.s AS rejected_score,
           round(t.s - b.s, 6) AS margin
    FROM (SELECT * FROM ranked WHERE top = 1) t
    JOIN (SELECT * FROM ranked WHERE bot = 1) b
      USING (prompt_id)
    WHERE t.cand_id != b.cand_id AND round(t.s - b.s, 6) >= 0.1
"""


def test_dpo_pair_plan_matches_duckdb(spark):
    from datapipeline_spike_spark.operators.sft import dpo_pair_plan

    cand = load(spark, SF, "documents").select(
        (F.col("doc_id") % 50).alias("prompt_id"),
        F.col("doc_id").alias("cand_id"),
        (((F.col("doc_id") * 37) % 1000) / F.lit(1000.0)).alias("score"),
    )
    got = {
        r["prompt_id"]: r.asDict() for r in dpo_pair_plan(cand).collect()
    }
    want = _con().execute(SQL_DPO).df()
    assert len(got) == len(want) > 0
    for _, w in want.iterrows():
        g = got[w["prompt_id"]]
        assert g["chosen_id"] == w["chosen_id"]
        assert g["rejected_id"] == w["rejected_id"]
        assert g["margin"] == pytest.approx(w["margin"], abs=1.5e-6)


def test_dpo_pair_plan_planted(spark):
    """Top/bottom extremes with id tiebreaks; sub-floor margins and
    single-candidate prompts are dropped."""
    from datapipeline_spike_spark.operators.sft import dpo_pair_plan

    rows = [
        (1, 10, 0.9), (1, 11, 0.5), (1, 12, 0.2),   # clean pair 10 vs 12
        (2, 20, 0.55), (2, 21, 0.5),                 # margin 0.05 < floor
        (3, 30, 0.4),                                # single candidate
        (4, 40, 0.8), (4, 41, 0.8), (4, 42, 0.1),    # tie at top: id wins
    ]
    df = spark.createDataFrame(
        rows, "prompt_id long, cand_id long, score double"
    )
    got = {r["prompt_id"]: r for r in dpo_pair_plan(df).collect()}
    assert set(got) == {1, 4}
    assert (got[1]["chosen_id"], got[1]["rejected_id"]) == (10, 12)
    assert got[1]["margin"] == pytest.approx(0.7)
    assert (got[4]["chosen_id"], got[4]["rejected_id"]) == (40, 42)


def test_wave7_plan_shapes(spark):
    """chat stats: one doc-keyed aggregate + a transcript-partitioned
    window, no joins beyond the noise-count merge, no Python; dpo: ONE
    window pass (no candidate self-join), prompt-partitioned."""
    from datapipeline_spike_spark.operators.sft import (
        chat_turn_stats,
        dpo_pair_plan,
    )

    chat = _plan_of(chat_turn_stats(_chat_planted(spark)))
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                 "CartesianProduct", "BroadcastNestedLoopJoin"):
        assert node not in chat, node
    assert all(g >= 3 for g in _window_groups(chat))

    cand = load(spark, SF, "documents").select(
        (F.col("doc_id") % 50).alias("prompt_id"),
        F.col("doc_id").alias("cand_id"),
        (((F.col("doc_id") * 37) % 1000) / F.lit(1000.0)).alias("score"),
    )
    dpo = _plan_of(dpo_pair_plan(cand))
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                 "CartesianProduct", "BroadcastNestedLoopJoin",
                 "SortMergeJoin"):
        assert node not in dpo, node
    assert all(g >= 3 for g in _window_groups(dpo))
