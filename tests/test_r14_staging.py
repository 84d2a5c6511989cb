"""r14 staged operators (register r15): DuckDB differential tests +
planted-property checks for exact_substr_runs, cdc_chunk_dedup,
boilerplate_line_removal, url_canonical_dedup, the audio fingerprint
near-dup path, and bradley_terry_strengths — the same pre-registration
gauntlet every staged cohort runs (oracle parity proven HERE, so
registration is a catalog-entry move, not new verification surface)."""

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
_SQL_U01 = "(('0x' || substr(md5({k}), 1, 8))::BIGINT / 4294967296.0)"
_SQL_U01_DOC = _SQL_U01.format(k="CAST(doc_id AS VARCHAR)")


def _con():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    return con


# --- exact_substr_runs ----------------------------------------------------------

_SQL_PAGES_QUOTE = """
    pages AS (
      SELECT d.doc_id,
             CASE WHEN d.doc_id % 7 = 3 AND q.text IS NOT NULL
                  THEN d.text || ' ' || q.text
                  ELSE d.text END AS text
      FROM documents d LEFT JOIN documents q ON q.doc_id = d.doc_id - 1
    )
"""


def _quote_pages(spark):
    d = load(spark, SF, "documents")
    q = d.select((F.col("doc_id") + 1).alias("doc_id"), F.col("text").alias("_q"))
    return d.join(q, "doc_id", "left").select(
        "doc_id",
        F.when(
            (F.col("doc_id") % 7 == 3) & F.col("_q").isNotNull(),
            F.concat("text", F.lit(" "), "_q"),
        ).otherwise(F.col("text")).alias("text"),
    )


def test_exact_substr_runs_match_duckdb(spark):
    """The quoting plant (full predecessor text embedded) must surface
    as long maximal runs — vs a full DuckDB replay of positional
    k-grams, df cap, the diagonal gaps-and-islands run detection."""
    from datapipeline_spike_spark.operators.dedup import exact_substr_runs

    got = {
        (r["doc_id_a"], r["doc_id_b"], r["run_start_a"], r["run_start_b"]):
        r.asDict()
        for r in exact_substr_runs(_quote_pages(spark)).collect()
    }
    toks = _SQL_TOKS.format(c="text")
    want = _con().execute(
        f"""
        WITH {_SQL_PAGES_QUOTE},
        t AS (SELECT doc_id, {toks} AS toks FROM pages),
        g AS (
          SELECT doc_id, u.pos AS pos, u.h AS h
          FROM (
            SELECT doc_id, unnest(list_transform(
              range(1, len(toks) - 1),
              i -> {{'pos': i - 1,
                    'h': md5(array_to_string(toks[i:i+2], ' '))}})) AS u
            FROM t WHERE len(toks) >= 3
          )
        ),
        freq AS (SELECT h, count(*) AS df FROM
                  (SELECT DISTINCT doc_id, h FROM g) GROUP BY 1),
        cap AS (SELECT greatest(16, least(
                    CAST(ceil(0.02 * count(*)) AS BIGINT), 65536))
                  AS c FROM pages),
        kept AS (SELECT doc_id, pos, g.h FROM g JOIN freq USING (h), cap
                 WHERE df <= cap.c),
        m AS (
          SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
                 a.pos AS pa, b.pos AS pb, a.pos - b.pos AS diag
          FROM kept a JOIN kept b ON a.h = b.h AND a.doc_id < b.doc_id
        ),
        isl AS (
          SELECT *, pa - row_number() OVER (
                   PARTITION BY doc_id_a, doc_id_b, diag ORDER BY pa)
                 AS grp
          FROM m
        )
        SELECT doc_id_a, doc_id_b,
               CAST(min(pa) AS BIGINT) AS run_start_a,
               CAST(min(pb) AS BIGINT) AS run_start_b,
               CAST(count(*) AS BIGINT) AS run_grams,
               CAST(count(*) + 2 AS BIGINT) AS run_tokens
        FROM isl
        GROUP BY doc_id_a, doc_id_b, diag, grp
        HAVING count(*) >= 2
        """
    ).df()
    assert len(got) == len(want)
    assert len(got) > 0
    for _, w in want.iterrows():
        g = got[
            (w["doc_id_a"], w["doc_id_b"], w["run_start_a"], w["run_start_b"])
        ]
        assert g["run_grams"] == int(w["run_grams"])
        assert g["run_tokens"] == int(w["run_tokens"])


def test_exact_substr_planted_spans(spark):
    """A verbatim span shared by two docs is found with exact 0-based
    start positions and token length; an INSERTION before the copy
    shifts the start but not the length (the property fixed-offset
    blocking lacks); unrelated docs produce no runs; min_run_grams
    gates short matches."""
    from datapipeline_spike_spark.operators.dedup import exact_substr_runs

    span = "the quick brown fox jumps over the lazy dog tonight"
    rows = [
        (1, "intro words here " + span + " trailing bits"),
        (2, "alpha beta " + span + " gamma"),
        (3, "completely different text with no overlap at all whatsoever"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    runs = exact_substr_runs(df, df_cap=100).collect()
    hits = [r for r in runs if (r["doc_id_a"], r["doc_id_b"]) == (1, 2)]
    assert len(hits) == 1
    r = hits[0]
    # span = 10 tokens -> 8 trigrams; doc1 offset 3, doc2 offset 2
    assert r["run_start_a"] == 3 and r["run_start_b"] == 2
    assert r["run_grams"] == 8 and r["run_tokens"] == 10
    assert not any(3 in (x["doc_id_a"], x["doc_id_b"]) for x in runs)
    # a one-gram accidental match is below the default min_run_grams
    short = spark.createDataFrame(
        [(1, "aa bb cc xx yy"), (2, "zz aa bb cc qq")],
        "doc_id long, text string",
    )
    assert (
        exact_substr_runs(short, df_cap=100, min_run_grams=2).count() == 0
    )
    assert (
        exact_substr_runs(short, df_cap=100, min_run_grams=1).count() == 1
    )
    with pytest.raises(ValueError, match="df_cap_floor"):
        exact_substr_runs(df, df_cap_floor=10, df_cap_max=5)


# --- cdc_chunk_dedup ------------------------------------------------------------


def test_cdc_chunk_dedup_matches_duckdb(spark):
    from datapipeline_spike_spark.operators.dedup import cdc_chunk_dedup

    got = {
        r["doc_id"]: r.asDict()
        for r in cdc_chunk_dedup(load(spark, SF, "documents")).collect()
    }
    toks = _SQL_TOKS.format(c="text")
    want = _con().execute(
        f"""
        WITH t AS (SELECT doc_id, {toks} AS toks FROM documents),
        tok AS (
          SELECT doc_id, u.pos AS pos, u.tok AS tok
          FROM (
            SELECT doc_id, unnest(list_transform(
              range(1, len(toks) + 1),
              i -> {{'pos': i - 1, 'tok': toks[i]}})) AS u
            FROM t WHERE len(toks) > 0
          )
        ),
        fl AS (
          SELECT *, CASE WHEN substr(md5(tok), 1, 1) IN ('0', '1')
                         THEN 1 ELSE 0 END AS f
          FROM tok
        ),
        c AS (
          SELECT *, sum(f) OVER (PARTITION BY doc_id ORDER BY pos) - f
                 AS chunk
          FROM fl
        ),
        ch AS (
          SELECT doc_id, chunk, count(*) AS ctoks,
                 md5(string_agg(tok, ' ' ORDER BY pos)) AS fp
          FROM c GROUP BY 1, 2
        ),
        occ AS (SELECT fp, count(*) AS occ FROM ch GROUP BY 1)
        SELECT doc_id,
               CAST(sum(ctoks) AS BIGINT) AS n_tokens,
               CAST(count(*) AS BIGINT) AS n_chunks,
               CAST(sum(CASE WHEN occ >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_dup_chunks,
               CAST(sum(CASE WHEN occ >= 2 THEN ctoks ELSE 0 END) AS BIGINT)
                 AS dup_tokens,
               round(sum(CASE WHEN occ >= 2 THEN ctoks ELSE 0 END) * 1.0
                     / sum(ctoks), 6) AS dup_token_fraction
        FROM ch JOIN occ USING (fp)
        GROUP BY 1
        """
    ).df()
    assert len(got) == len(want)
    for _, w in want.iterrows():
        g = got[w["doc_id"]]
        for c in ("n_tokens", "n_chunks", "n_dup_chunks", "dup_tokens"):
            assert g[c] == int(w[c]), (w["doc_id"], c)
        assert g["dup_token_fraction"] == pytest.approx(
            w["dup_token_fraction"], abs=2e-6
        )


def test_cdc_shift_resistance(spark):
    """The CDC property itself: doc 2 = junk prefix + doc 1's text.
    Fixed-size blocking would misalign every block after the prefix;
    content-defined boundaries realign immediately, so (almost) all of
    doc 1's token mass is detected as duplicated."""
    from datapipeline_spike_spark.operators.dedup import cdc_chunk_dedup

    base = " ".join(f"tok{i} item{i} value{i}" for i in range(40))
    rows = [(1, base), (2, "prefix junk words " + base)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in cdc_chunk_dedup(df).collect()}
    # everything from the first shared boundary onward matches: the
    # only possibly-unshared chunks are each doc's first chunk
    assert out[1]["dup_token_fraction"] > 0.8
    assert out[2]["dup_token_fraction"] > 0.8
    assert out[1]["n_dup_chunks"] >= out[1]["n_chunks"] - 1
    # disjoint docs share nothing
    solo = spark.createDataFrame(
        [(1, base), (2, "wholly unrelated content stream here")],
        "doc_id long, text string",
    )
    souts = {r["doc_id"]: r for r in cdc_chunk_dedup(solo).collect()}
    assert souts[2]["dup_tokens"] == 0


# --- boilerplate_line_removal ---------------------------------------------------


def _lined_pages(spark):
    d = load(spark, SF, "documents")
    return d.select(
        "doc_id",
        F.concat(
            F.lit("common banner line\n"),
            F.lit("section "),
            (F.col("doc_id") % 5).cast("string"),
            F.lit(" promo\n"),
            F.col("text"),
        ).alias("text"),
    )


_SQL_LINED = """
    pages AS (
      SELECT doc_id,
             'common banner line' || chr(10) || 'section ' ||
             CAST(doc_id % 5 AS VARCHAR) || ' promo' || chr(10) || text
               AS text
      FROM documents
    )
"""


def test_boilerplate_removal_matches_duckdb(spark):
    from datapipeline_spike_spark.operators.quality import (
        boilerplate_line_removal,
    )

    got = {
        r["doc_id"]: r.asDict()
        for r in boilerplate_line_removal(_lined_pages(spark)).collect()
    }
    want = _con().execute(
        f"""
        WITH {_SQL_LINED},
        l0 AS (
          SELECT doc_id,
                 list_filter(list_transform(string_split(text, chr(10)),
                             x -> trim(x)), x -> x != '') AS ls
          FROM pages
        ),
        lines AS (
          SELECT doc_id, u.pos AS pos, u.line AS line,
                 md5(u.line) AS fp
          FROM (
            SELECT doc_id, unnest(list_transform(
              range(1, len(ls) + 1),
              i -> {{'pos': i - 1, 'line': ls[i]}})) AS u
            FROM l0 WHERE len(ls) > 0
          )
        ),
        dfreq AS (
          SELECT fp, count(*) AS df
          FROM (SELECT DISTINCT doc_id, fp FROM lines) GROUP BY 1
        ),
        nd AS (SELECT count(*) AS n FROM pages),
        marked AS (
          SELECT fp, df >= greatest(2, CAST(ceil(0.05 * n) AS BIGINT)) AS bp
          FROM dfreq, nd
        )
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_lines,
               CAST(sum(CASE WHEN bp THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_removed,
               round(sum(CASE WHEN bp THEN 1 ELSE 0 END) * 1.0 / count(*),
                     6) AS removed_fraction,
               md5(coalesce(string_agg(CASE WHEN NOT bp THEN line END,
                                       chr(10) ORDER BY pos), ''))
                 AS kept_fp
        FROM lines JOIN marked USING (fp)
        GROUP BY 1
        """
    ).df()
    assert len(got) == len(want)
    for _, w in want.iterrows():
        g = got[w["doc_id"]]
        assert g["n_lines"] == int(w["n_lines"])
        assert g["n_removed"] == int(w["n_removed"])
        assert g["removed_fraction"] == pytest.approx(
            w["removed_fraction"], abs=2e-6
        )
        assert g["kept_fp"] == w["kept_fp"], w["doc_id"]
    # the plant actually removed the banner + group lines everywhere
    assert all(g["n_removed"] >= 2 for g in got.values())


def test_boilerplate_planted_semantics(spark):
    """df >= max(floor, ceil(frac*n)) lines vanish; unique lines stay
    in original order; a fully-boilerplate doc fingerprints md5('');
    intra-doc repeats of a rare line do NOT inflate its df."""
    import hashlib

    from datapipeline_spike_spark.operators.quality import (
        boilerplate_line_removal,
    )

    rows = [
        (i, "shared banner\nunique line " + str(i) + "\nshared banner")
        for i in range(1, 9)
    ]
    rows += [(9, "shared banner"), (10, "rare\nrare\nrare")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in boilerplate_line_removal(df, df_frac=0.5).collect()
    }
    # banner df = 9 of 10 docs >= ceil(0.5*10): removed; both copies
    assert out[1]["n_lines"] == 3 and out[1]["n_removed"] == 2
    assert out[1]["kept_fp"] == hashlib.md5(b"unique line 1").hexdigest()
    # doc 9 is all boilerplate: the empty-join fingerprint
    assert out[9]["kept_fp"] == hashlib.md5(b"").hexdigest()
    assert out[9]["removed_fraction"] == 1.0
    # 'rare' appears 3x but in ONE doc: df=1 < threshold -> kept
    assert out[10]["n_removed"] == 0


# --- url_canonical_dedup --------------------------------------------------------


def _url_docs(spark):
    d = load(spark, SF, "documents")
    scheme = F.when(F.col("doc_id") % 3 == 0, F.lit("HTTPS")).otherwise(
        F.lit("http")
    )
    www = F.when(F.col("doc_id") % 2 == 0, F.lit("WWW.")).otherwise(F.lit(""))
    port = (
        F.when(
            F.col("doc_id") % 4 == 0,
            F.when(F.col("doc_id") % 3 == 0, F.lit(":443")).otherwise(
                F.lit(":80")
            ),
        )
        .when(F.col("doc_id") % 5 == 0, F.lit(":8080"))
        .otherwise(F.lit(""))
    )
    trail = F.when(F.col("doc_id") % 6 == 0, F.lit("/")).otherwise(F.lit(""))
    fb = F.when(F.col("doc_id") % 8 == 0, F.lit("&fbclid=xyz")).otherwise(
        F.lit("")
    )
    frag = F.when(F.col("doc_id") % 9 == 0, F.lit("#frag")).otherwise(
        F.lit("")
    )
    url = F.concat(
        scheme,
        F.lit("://"),
        www,
        F.lit("Site"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".Example.COM"),
        port,
        F.lit("/Path/"),
        (F.col("doc_id") % 5).cast("string"),
        trail,
        F.lit("?utm_source=feed&b="),
        (F.col("doc_id") % 3).cast("string"),
        F.lit("&a="),
        (F.col("doc_id") % 2).cast("string"),
        fb,
        frag,
    )
    return d.select("doc_id", url.alias("url"))


_SQL_URLS = """
    urls AS (
      SELECT doc_id,
        (CASE WHEN doc_id % 3 = 0 THEN 'HTTPS' ELSE 'http' END) || '://' ||
        (CASE WHEN doc_id % 2 = 0 THEN 'WWW.' ELSE '' END) ||
        'Site' || CAST(doc_id % 7 AS VARCHAR) || '.Example.COM' ||
        (CASE WHEN doc_id % 4 = 0 THEN
               (CASE WHEN doc_id % 3 = 0 THEN ':443' ELSE ':80' END)
              WHEN doc_id % 5 = 0 THEN ':8080' ELSE '' END) ||
        '/Path/' || CAST(doc_id % 5 AS VARCHAR) ||
        (CASE WHEN doc_id % 6 = 0 THEN '/' ELSE '' END) ||
        '?utm_source=feed&b=' || CAST(doc_id % 3 AS VARCHAR) ||
        '&a=' || CAST(doc_id % 2 AS VARCHAR) ||
        (CASE WHEN doc_id % 8 = 0 THEN '&fbclid=xyz' ELSE '' END) ||
        (CASE WHEN doc_id % 9 = 0 THEN '#frag' ELSE '' END) AS url
      FROM documents
    )
"""

_SQL_CANON = """
    parsed AS (
      SELECT doc_id, url,
        lower(regexp_extract(url,
          '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(\\?[^#]*)?(#.*)?$',
          1)) AS scheme,
        regexp_replace(lower(regexp_extract(url,
          '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(\\?[^#]*)?(#.*)?$',
          2)), '^www\\.', '') AS host1,
        regexp_extract(url,
          '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(\\?[^#]*)?(#.*)?$',
          3) AS path0,
        regexp_extract(url,
          '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(\\?[^#]*)?(#.*)?$',
          4) AS qs
      FROM urls
    ),
    canon AS (
      SELECT doc_id, url,
        scheme || '://' ||
        (CASE WHEN scheme = 'http' AND host1 LIKE '%:80'
              THEN regexp_replace(host1, ':80$', '')
              WHEN scheme = 'https' AND host1 LIKE '%:443'
              THEN regexp_replace(host1, ':443$', '')
              ELSE host1 END) ||
        (CASE WHEN path0 = '' THEN '/'
              WHEN len(path0) > 1 AND path0 LIKE '%/'
              THEN regexp_replace(path0, '/$', '')
              ELSE path0 END) ||
        (CASE WHEN len(list_filter(string_split(
                    regexp_replace(qs, '^\\?', ''), '&'),
                p -> p != '' AND NOT regexp_matches(p,
                    '(?i)^(utm_[a-z]+|fbclid|gclid|ref)(=|$)'))) > 0
              THEN '?' || array_to_string(list_sort(list_filter(
                    string_split(regexp_replace(qs, '^\\?', ''), '&'),
                    p -> p != '' AND NOT regexp_matches(p,
                        '(?i)^(utm_[a-z]+|fbclid|gclid|ref)(=|$)'))), '&')
              ELSE '' END) AS canonical_url
      FROM parsed
      WHERE scheme != ''
    )
"""


def test_url_canonical_dedup_matches_duckdb(spark):
    from datapipeline_spike_spark.operators.html import url_canonical_dedup

    got = {
        r["doc_id"]: r.asDict()
        for r in url_canonical_dedup(_url_docs(spark)).collect()
    }
    want = _con().execute(
        f"""
        WITH {_SQL_URLS},
        {_SQL_CANON},
        g AS (
          SELECT canonical_url, count(*) AS group_size,
                 min(doc_id) AS rep
          FROM canon GROUP BY 1
        )
        SELECT c.doc_id, c.url, c.canonical_url,
               CAST(g.group_size AS BIGINT) AS group_size,
               c.doc_id = g.rep AS is_canonical
        FROM canon c JOIN g USING (canonical_url)
        """
    ).df()
    assert len(got) == len(want)
    for _, w in want.iterrows():
        g = got[w["doc_id"]]
        assert g["canonical_url"] == w["canonical_url"], w["doc_id"]
        assert g["group_size"] == int(w["group_size"])
        assert bool(g["is_canonical"]) == bool(w["is_canonical"])
    # the plant really collapses case/www/port/tracking variants
    assert any(g["group_size"] > 1 for g in got.values())


def test_url_canonicalization_planted_rules(spark):
    from datapipeline_spike_spark.operators.html import url_canonical_dedup

    rows = [
        (1, "HTTP://WWW.Example.COM:80/a/b/?utm_source=x&z=1&a=2#frag"),
        (2, "http://example.com/a/b?a=2&z=1"),
        (3, "https://example.com:443/a/b?a=2&z=1"),  # https default port
        (4, "not a url at all"),
        (5, "http://example.com"),  # empty path -> /
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {r["doc_id"]: r for r in url_canonical_dedup(df).collect()}
    # 1 and 2 collapse: case, www, :80, trailing slash, utm, order, frag
    assert out[1]["canonical_url"] == out[2]["canonical_url"]
    assert out[1]["canonical_url"] == "http://example.com/a/b?a=2&z=1"
    # 3 differs only by scheme (https != http) — but its :443 is gone
    assert out[3]["canonical_url"] == "https://example.com/a/b?a=2&z=1"
    assert 4 not in out  # unparseable excluded
    assert out[5]["canonical_url"] == "http://example.com/"
    assert out[1]["group_size"] == 2 and out[1]["is_canonical"]
    assert not out[2]["is_canonical"]


# --- audio fingerprint near-dup path --------------------------------------------


def _sql_audio_words(limit: int) -> str:
    """Per-doc (w0, w1) fingerprint words replayed from the planted
    waveform: frame energies are exact integer sums of |sample| over
    64-sample frames, bit f = e[f+1] > e[f]."""
    sample = (
        "abs((((i * i * (2 * fam + 3) + 5 * i"
        " + CASE WHEN i % 7 = 0 THEN jit ELSE 0 END) % 4001) - 2000))"
    )
    return f"""
    m AS (
      SELECT doc_id, CAST(doc_id % 16 AS BIGINT) AS fam,
             CAST((doc_id // 16) % 4 AS BIGINT) AS jit
      FROM documents WHERE doc_id < {limit}
    ),
    es AS (
      SELECT doc_id,
             list_transform(range(0, 65), f ->
               list_sum(list_transform(range(f * 64, (f + 1) * 64),
                 i -> {sample}))) AS e
      FROM m
    ),
    hx AS (
      SELECT doc_id,
             list_sum(list_transform(range(0, 32), f ->
               CASE WHEN e[f + 2] > e[f + 1]
                    THEN (1::BIGINT << f) ELSE 0 END)) AS w0,
             list_sum(list_transform(range(32, 64), f ->
               CASE WHEN e[f + 2] > e[f + 1]
                    THEN (1::BIGINT << (f - 32)) ELSE 0 END)) AS w1
      FROM es
    )"""


def test_audio_fingerprint_decode_matches_python_replay(spark):
    """decode_audio_fingerprint (real WAV bytes: RIFF walk + int16
    unpack + frame energies) equals the pure-Python fingerprint of the
    regenerated waveform for every doc."""
    from datapipeline_spike_spark.sources.multimodal import (
        audio_family_media_from_documents,
        decode_audio_fingerprint,
        fingerprint_bits_from_samples,
    )

    d = load(spark, SF, "documents").filter(F.col("doc_id") < 64)
    got = {
        r["media_id"]: (r["fp_w0"], r["fp_w1"])
        for r in decode_audio_fingerprint(
            audio_family_media_from_documents(d)
        ).collect()
    }
    assert len(got) == 64
    for doc_id in got:
        fam, jit = doc_id % 16, (doc_id // 16) % 4
        n = 64 * (65 + fam % 4)
        xs = [
            ((i * i * (2 * fam + 3) + 5 * i + (jit if i % 7 == 0 else 0))
             % 4001) - 2000
            for i in range(n)
        ]
        bits = fingerprint_bits_from_samples(xs)
        assert got[doc_id] == (bits & 0xFFFFFFFF, bits >> 32), doc_id


def test_audio_fingerprint_corrupt_payloads_yield_null(spark):
    """Short clips (< 65 frames), non-PCM bytes, and truncated data
    chunks yield NULL words, never a crash."""
    from datapipeline_spike_spark.sources.multimodal import (
        decode_audio_fingerprint,
        synthetic_wav_pattern,
    )

    ok = synthetic_wav_pattern(seed=1, n_samples=65 * 64)
    short = synthetic_wav_pattern(seed=1, n_samples=100)
    rows = [(1, ok), (2, short), (3, b"not audio")]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r for r in decode_audio_fingerprint(df).collect()}
    assert out[1]["fp_w0"] is not None
    assert out[2]["fp_w0"] is None and out[2]["fp_w1"] is None
    assert out[3]["fp_w0"] is None


def test_audio_neardup_pairs_match_duckdb(spark):
    """The full staged query — planted family WAVs -> real decode ->
    the GENERIC banded-Hamming join (dedup.dhash_neardup_pairs reused
    unchanged on fingerprint words) — vs the DuckDB replay."""
    from datapipeline_spike_spark.operators.dedup import dhash_neardup_pairs
    from datapipeline_spike_spark.sources.multimodal import (
        audio_family_media_from_documents,
        decode_audio_fingerprint,
    )

    d = load(spark, SF, "documents").filter(F.col("doc_id") < 128)
    fp = decode_audio_fingerprint(audio_family_media_from_documents(d))
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dhash_neardup_pairs(
            fp, w0_col="fp_w0", w1_col="fp_w1"
        ).collect()
    }
    want = _con().execute(
        f"""
        WITH {_sql_audio_words(128)},
        bands AS (
          SELECT doc_id, w0, w1, 0 AS band_idx, w0 & 255 AS band_val FROM hx
          UNION ALL SELECT doc_id, w0, w1, 1, (w0 >> 8) & 255 FROM hx
          UNION ALL SELECT doc_id, w0, w1, 2, (w0 >> 16) & 255 FROM hx
          UNION ALL SELECT doc_id, w0, w1, 3, (w0 >> 24) & 255 FROM hx
          UNION ALL SELECT doc_id, w0, w1, 4, w1 & 255 FROM hx
          UNION ALL SELECT doc_id, w0, w1, 5, (w1 >> 8) & 255 FROM hx
          UNION ALL SELECT doc_id, w0, w1, 6, (w1 >> 16) & 255 FROM hx
          UNION ALL SELECT doc_id, w0, w1, 7, (w1 >> 24) & 255 FROM hx
        ),
        cand AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                 CAST(bit_count(xor(a.w0, b.w0))
                      + bit_count(xor(a.w1, b.w1)) AS INT) AS hamming
          FROM bands a JOIN bands b
            ON a.band_idx = b.band_idx AND a.band_val = b.band_val
           AND a.doc_id < b.doc_id
        )
        SELECT id_a, id_b, hamming FROM cand WHERE hamming <= 6
        """
    ).df()
    assert len(got) == len(want)
    assert len(got) > 0
    for _, w in want.iterrows():
        assert got[(w["id_a"], w["id_b"])] == int(w["hamming"])
    # exact plants: same (fam, jitter) -> hamming 0; never cross-family
    for (a, b), h in got.items():
        assert a % 16 == b % 16
        if (a // 16) % 4 == (b // 16) % 4:
            assert h == 0


# --- bradley_terry_strengths ----------------------------------------------------


def _match_log(spark):
    from datapipeline_spike_spark.operators.sampling import hash_u01

    d = load(spark, SF, "documents").select("doc_id")
    ia = F.col("doc_id") % 8
    ib = (F.col("doc_id") / 8).cast("long") % 8
    u = hash_u01("doc_id")
    p = (ia + 1) / (ia + ib + 2)  # BT-consistent: s_i = i + 1
    return d.filter(ia != ib).select(
        F.concat(F.lit("m"), ia.cast("string")).alias("item_a"),
        F.concat(F.lit("m"), ib.cast("string")).alias("item_b"),
        (u < p).cast("long").alias("wins_a"),
        (u >= p).cast("long").alias("wins_b"),
    )


_SQL_MATCHES = f"""
    matches AS (
      SELECT 'm' || CAST(doc_id % 8 AS VARCHAR) AS item_a,
             'm' || CAST((doc_id // 8) % 8 AS VARCHAR) AS item_b,
             CASE WHEN {_SQL_U01_DOC} <
                  (doc_id % 8 + 1) * 1.0
                  / (doc_id % 8 + (doc_id // 8) % 8 + 2)
                  THEN 1 ELSE 0 END AS wins_a,
             CASE WHEN {_SQL_U01_DOC} <
                  (doc_id % 8 + 1) * 1.0
                  / (doc_id % 8 + (doc_id // 8) % 8 + 2)
                  THEN 0 ELSE 1 END AS wins_b
      FROM documents WHERE doc_id % 8 != (doc_id // 8) % 8
    )
"""


def _sql_bt(iters: int = 20) -> str:
    chain = f"""
    WITH {_SQL_MATCHES},
    pr AS (
      SELECT least(item_a, item_b) AS lo, greatest(item_a, item_b) AS hi,
             sum(CASE WHEN item_a <= item_b THEN wins_a ELSE wins_b END)
               AS wlo,
             sum(CASE WHEN item_a <= item_b THEN wins_b ELSE wins_a END)
               AS whi
      FROM matches WHERE item_a != item_b GROUP BY 1, 2
      HAVING sum(wins_a) + sum(wins_b) > 0
    ),
    per AS (
      SELECT item, sum(n) AS games, sum(w) AS wins FROM (
        SELECT lo AS item, wlo + whi AS n, wlo AS w FROM pr
        UNION ALL SELECT hi, wlo + whi, whi FROM pr
      ) GROUP BY 1
    ),
    base AS (
      SELECT list(item ORDER BY item) AS its,
             list(CAST(wins AS DOUBLE) ORDER BY item) AS ws,
             list({{'g': games, 'w': wins}} ORDER BY item) AS meta
      FROM per
    ),
    plist AS (
      SELECT list({{'ia': list_position(its, lo),
                   'ib': list_position(its, hi),
                   'n': CAST(wlo + whi AS DOUBLE)}}) AS pl
      FROM pr, base GROUP BY its
    ),
    s0 AS (
      SELECT its, ws, meta, pl,
             list_transform(its, x -> round(1.0 / len(its), 6)) AS a
      FROM base, plist
    )"""
    for t in range(iters):
        chain += f""",
    s{t}d AS (
      SELECT *, list_transform(range(1, len(its) + 1), i ->
        list_sum(list_transform(pl, p ->
          CASE WHEN p.ia = i OR p.ib = i
               THEN p.n / (a[p.ia] + a[p.ib]) ELSE 0.0 END))) AS d
      FROM s{t}
    ),
    s{t}u AS (
      SELECT *, list_transform(range(1, len(its) + 1), i ->
        CASE WHEN d[i] > 0 THEN ws[i] / d[i] ELSE 0.0 END) AS u
      FROM s{t}d
    ),
    s{t}z AS (SELECT *, list_sum(u) AS z FROM s{t}u),
    s{t + 1} AS (
      SELECT its, ws, meta, pl,
             list_transform(u, x -> round(x / z, 6)) AS a
      FROM s{t}z
    )"""
    return chain + f"""
    SELECT unnest(its) AS item,
           CAST(unnest(list_transform(meta, m2 -> m2.g)) AS BIGINT)
             AS n_games,
           CAST(unnest(list_transform(meta, m2 -> m2.w)) AS BIGINT)
             AS n_wins,
           unnest(a) AS strength
    FROM s{iters}
    """


def test_bradley_terry_matches_duckdb(spark):
    from datapipeline_spike_spark.operators.preference import (
        bradley_terry_strengths,
    )

    got = {
        r["item"]: r.asDict()
        for r in bradley_terry_strengths(_match_log(spark)).collect()
    }
    want = _con().execute(_sql_bt()).df()
    assert len(got) == len(want)
    for _, w in want.iterrows():
        g = got[w["item"]]
        assert g["n_games"] == int(w["n_games"])
        assert g["n_wins"] == int(w["n_wins"])
        assert g["strength"] == pytest.approx(w["strength"], abs=2e-6)
    assert sum(r["strength"] for r in got.values()) == pytest.approx(
        1.0, abs=1e-4
    )


def test_bradley_terry_planted_dynamics(spark):
    """A dominant item takes most of the mass; a symmetric 1-1 pair
    splits evenly; a zero-win item converges to 0; both orientations
    of the same pair fold together; iters < 1 is a contract error."""
    from datapipeline_spike_spark.operators.preference import (
        bradley_terry_strengths,
    )

    rows = [
        ("a", "b", 9, 1),
        ("b", "a", 1, 9),   # same pair, flipped orientation
        ("a", "c", 10, 0),  # c never wins
        ("b", "c", 5, 0),
    ]
    df = spark.createDataFrame(
        rows, "item_a string, item_b string, wins_a long, wins_b long"
    )
    out = {r["item"]: r for r in bradley_terry_strengths(df).collect()}
    assert out["a"]["n_games"] == 30 and out["a"]["n_wins"] == 28
    assert out["b"]["n_games"] == 25 and out["b"]["n_wins"] == 7
    assert out["c"]["n_games"] == 15 and out["c"]["n_wins"] == 0
    assert out["a"]["strength"] > out["b"]["strength"] > out["c"]["strength"]
    assert out["c"]["strength"] < 0.01
    even = spark.createDataFrame(
        [("x", "y", 3, 3)],
        "item_a string, item_b string, wins_a long, wins_b long",
    )
    e = {r["item"]: r for r in bradley_terry_strengths(even).collect()}
    assert e["x"]["strength"] == pytest.approx(0.5, abs=1e-6)
    assert e["y"]["strength"] == pytest.approx(0.5, abs=1e-6)
    with pytest.raises(ValueError, match="iters"):
        bradley_terry_strengths(df, iters=0)


# --- oov_rate_profile -----------------------------------------------------------


def test_oov_rate_matches_duckdb(spark):
    from datapipeline_spike_spark.operators.text_stats import oov_rate_profile

    got = {
        r["doc_id"]: r.asDict()
        for r in oov_rate_profile(
            load(spark, SF, "documents"), vocab_size=256
        ).collect()
    }
    toks = _SQL_TOKS.format(c="text")
    want = _con().execute(
        f"""
        WITH tok AS (
          SELECT doc_id, unnest({toks}) AS t FROM documents
        ),
        occ AS (SELECT doc_id, t, count(*) AS n FROM tok GROUP BY 1, 2),
        vocab AS (
          SELECT t FROM (
            SELECT t, sum(n) AS c FROM occ GROUP BY 1
            ORDER BY c DESC, t ASC LIMIT 256
          )
        ),
        fl AS (
          SELECT occ.doc_id, occ.n,
                 vocab.t IS NOT NULL AS in_v
          FROM occ LEFT JOIN vocab ON occ.t = vocab.t
        )
        SELECT doc_id,
               CAST(sum(n) AS BIGINT) AS n_tokens,
               CAST(sum(CASE WHEN in_v THEN 0 ELSE n END) AS BIGINT)
                 AS oov_tokens,
               round(sum(CASE WHEN in_v THEN 0 ELSE n END) * 1.0 / sum(n),
                     6) AS oov_rate,
               CAST(sum(CASE WHEN in_v THEN 0 ELSE 1 END) AS BIGINT)
                 AS distinct_oov
        FROM fl GROUP BY 1
        """
    ).df()
    assert len(got) == len(want)
    for _, w in want.iterrows():
        g = got[w["doc_id"]]
        for c in ("n_tokens", "oov_tokens", "distinct_oov"):
            assert g[c] == int(w[c]), (w["doc_id"], c)
        assert g["oov_rate"] == pytest.approx(w["oov_rate"], abs=2e-6)


def test_oov_planted_semantics(spark):
    """Tokens inside the top-V vocabulary score 0 OOV; a doc made of
    corpus-unique tokens scores 1.0; the vocabulary boundary tie-break
    is (count desc, token asc) — deterministic."""
    from datapipeline_spike_spark.operators.text_stats import oov_rate_profile

    rows = [(i, "common words everywhere always") for i in range(1, 9)]
    rows += [(9, "zzyzx qwxyz vvvvq")]  # corpus-unique tokens
    rows += [(10, "common words zzyzx zzyzx")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r for r in oov_rate_profile(df, vocab_size=4).collect()
    }
    # vocab = the 4 tokens with count 8+ (common/words/everywhere/always)
    assert out[1]["oov_rate"] == 0.0
    assert out[9]["oov_rate"] == 1.0 and out[9]["distinct_oov"] == 3
    # doc 10: 2 in-vocab + 2 copies of one OOV token
    assert out[10]["n_tokens"] == 4 and out[10]["oov_tokens"] == 2
    assert out[10]["distinct_oov"] == 1
    assert out[10]["oov_rate"] == pytest.approx(0.5, abs=1e-6)


# --- char_entropy_profile -------------------------------------------------------


def test_char_entropy_matches_duckdb(spark):
    from datapipeline_spike_spark.operators.text_stats import (
        char_entropy_profile,
    )

    got = {
        r["doc_id"]: r.asDict()
        for r in char_entropy_profile(
            load(spark, SF, "documents")
        ).collect()
    }
    want = _con().execute(
        """
        WITH g AS (
          SELECT doc_id, unnest(list_transform(
                   range(1, length(text)),
                   i -> substr(text, CAST(i AS INT), 2))) AS bg
          FROM documents WHERE length(text) >= 2
        ),
        cnt AS (SELECT doc_id, bg, count(*) AS n FROM g GROUP BY 1, 2)
        SELECT doc_id,
               CAST(sum(n) AS BIGINT) AS n_bigrams,
               CAST(count(*) AS BIGINT) AS distinct_bigrams,
               round(ln(sum(n)) - sum(n * ln(n)) / sum(n), 6) AS entropy,
               CASE WHEN count(*) > 1 THEN
                 round((ln(sum(n)) - sum(n * ln(n)) / sum(n))
                       / ln(count(*)), 6) END AS entropy_norm
        FROM cnt GROUP BY 1
        """
    ).df()
    assert len(got) == len(want)
    for _, w in want.iterrows():
        g = got[w["doc_id"]]
        assert g["n_bigrams"] == int(w["n_bigrams"])
        assert g["distinct_bigrams"] == int(w["distinct_bigrams"])
        assert g["entropy"] == pytest.approx(w["entropy"], abs=2e-6)
        if g["entropy_norm"] is None:
            assert w["distinct_bigrams"] <= 1
        else:
            assert g["entropy_norm"] == pytest.approx(
                w["entropy_norm"], abs=2e-6
            )


def test_char_entropy_planted_tails(spark):
    """Degenerate repetition scores ~0; a base64-looking blob scores
    near its uniform maximum (entropy_norm -> 1); natural-ish text sits
    between; single-bigram docs get NULL entropy_norm and H = 0."""
    import math

    from datapipeline_spike_spark.operators.text_stats import (
        char_entropy_profile,
    )

    blob = "".join(
        "abcdefghijklmnopqrstuvwxyzABCDEF"[(7 * i * i + 3 * i) % 32]
        for i in range(400)
    )
    rows = [
        (1, "a" * 200),
        (2, blob),
        (3, "the cat sat on the mat and the dog sat on the log again"),
        (4, "xy"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in char_entropy_profile(df).collect()}
    assert out[1]["entropy"] == 0.0 and out[1]["distinct_bigrams"] == 1
    assert out[1]["entropy_norm"] is None
    assert out[2]["entropy_norm"] > 0.9
    assert out[2]["entropy"] > out[3]["entropy"] > out[1]["entropy"]
    assert out[4]["n_bigrams"] == 1 and out[4]["entropy"] == 0.0
    # absolute value check on the degenerate-uniform case: 200 'a's ->
    # 199 identical bigrams -> H = ln(199) - 199*ln(199)/199 = 0
    assert math.isclose(out[1]["entropy"], 0.0, abs_tol=1e-9)


# --- r14 review regressions ------------------------------------------------------


def test_exact_substr_df_is_document_frequency(spark):
    """r14 review: df was counted over positional postings, so one
    spammy page repeating a gram 20+ times pushed it past the cap even
    at document-frequency 2, hiding its cross-document copy. df is now
    distinct-doc; the verbatim run must be reported."""
    from datapipeline_spike_spark.operators.dedup import exact_substr_runs

    phrase = "alpha beta gamma delta"
    rows = [
        (1, " ".join([phrase] * 25)),          # spammy intra-doc repeats
        (2, "intro " + phrase + " outro end"),  # one clean copy
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    runs = exact_substr_runs(df, df_cap=5, min_run_grams=2).collect()
    assert any(
        (r["doc_id_a"], r["doc_id_b"]) == (1, 2) and r["run_tokens"] >= 4
        for r in runs
    ), runs


def test_cdc_rejects_non_hex_boundary_set(spark):
    from datapipeline_spike_spark.operators.dedup import cdc_chunk_dedup

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="boundary_hex"):
        cdc_chunk_dedup(df, boundary_hex=("A", "B"))  # uppercase
    with pytest.raises(ValueError, match="boundary_hex"):
        cdc_chunk_dedup(df, boundary_hex=())


def test_bradley_terry_empty_input_yields_empty_frame(spark):
    """r14 review: sequence(1, 0) descends to [1, 0], which used to
    manufacture two all-NULL phantom items from an empty match log."""
    from datapipeline_spike_spark.operators.preference import (
        bradley_terry_strengths,
    )

    empty = spark.createDataFrame(
        [], "item_a string, item_b string, wins_a long, wins_b long"
    )
    assert bradley_terry_strengths(empty).collect() == []
    # self-matches only -> also empty after the filter
    selfy = spark.createDataFrame(
        [("x", "x", 1, 0)],
        "item_a string, item_b string, wins_a long, wins_b long",
    )
    assert bradley_terry_strengths(selfy).collect() == []


def test_url_tracking_params_case_insensitive_and_valueless(spark):
    """r14 review: UTM_Source=x (mixed case) and bare fbclid (no '=')
    must strip like their canonical forms."""
    from datapipeline_spike_spark.operators.html import url_canonical_dedup

    rows = [
        (1, "http://site.com/p?UTM_Source=mail&a=1"),
        (2, "http://site.com/p?a=1&fbclid"),
        (3, "http://site.com/p?a=1"),
        (4, "http://site.com/p?reference=7&a=1"),  # NOT a tracking param
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {r["doc_id"]: r for r in url_canonical_dedup(df).collect()}
    assert (
        out[1]["canonical_url"] == out[2]["canonical_url"]
        == out[3]["canonical_url"] == "http://site.com/p?a=1"
    )
    assert out[1]["group_size"] == 3
    # 'reference' must survive: the rule anchors on the full param name
    assert out[4]["canonical_url"] == "http://site.com/p?a=1&reference=7"


def test_audio_fingerprint_fuzz_never_crashes(spark):
    """Fuzz contract for the staged audio decode (the PNG/HDF5 fuzz
    posture): truncations, bit flips, and random prefixes of a valid
    WAV must yield a row with either a correct or NULL fingerprint —
    never an exception inside the scan. Deterministic corpus (seeded
    positions), one Spark pass over all ~120 mutants."""
    import struct as _struct

    from datapipeline_spike_spark.sources.multimodal import (
        decode_audio_fingerprint,
        synthetic_wav_pattern,
    )

    base = synthetic_wav_pattern(seed=11, n_samples=65 * 64)
    mutants: list[tuple[int, bytes]] = [(0, base)]
    mid = 1
    for cut in range(1, 41):  # truncations across the whole container
        mutants.append((mid, base[: len(base) * cut // 41]))
        mid += 1
    for k in range(40):  # deterministic single-byte corruptions
        pos = (k * 7919 + 13) % len(base)
        b = bytearray(base)
        b[pos] ^= 1 << (k % 8)
        mutants.append((mid, bytes(b)))
        mid += 1
    for k in range(40):  # garbage prefixes / suffixes
        junk = bytes((k * 31 + j) % 256 for j in range(k + 1))
        mutants.append((mid, junk + base if k % 2 else base + junk))
        mid += 1
    df = spark.createDataFrame(mutants, "media_id long, payload binary")
    rows = decode_audio_fingerprint(df).collect()  # must not raise
    assert len(rows) == len(mutants)
    by_id = {r["media_id"]: r for r in rows}
    assert by_id[0]["fp_w0"] is not None  # the pristine clip decodes
    for r in rows:  # NULL-ness is always PAIRED (w0 null <=> w1 null)
        assert (r["fp_w0"] is None) == (r["fp_w1"] is None)
