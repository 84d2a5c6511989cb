"""Unit tests for the PII-redaction, segment-dedup, and sequence-packing
operators (the round-3 scrubbing / line-dedup / packing additions)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datapipeline_spike_spark.operators.dedup import segment_dedup_profile
from datapipeline_spike_spark.operators.packing import pack_sequences
from datapipeline_spike_spark.operators.redaction import redact_pii


def test_redact_pii_counts_and_masks_each_kind(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a.b-c_d@ex.co and e@f.org now"),
            (2, "host 10.0.0.1 peer 192.168.255.254"),
            (3, "ssn 123-45-6789 phone 555-867-5309"),
            (4, "nothing sensitive here"),
            (5, None),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in redact_pii(df).collect()}
    assert (rows[1].n_email, rows[1].n_ipv4) == (2, 0)
    assert "[EMAIL]" in rows[1].redacted_text and "@" not in rows[1].redacted_text
    assert rows[2].n_ipv4 == 2 and rows[2].redacted_text.count("[IP]") == 2
    assert (rows[3].n_ssn, rows[3].n_phone) == (1, 1)
    assert "[SSN]" in rows[3].redacted_text and "[PHONE]" in rows[3].redacted_text
    assert rows[4].clean and rows[4].n_pii == 0
    assert rows[4].redacted_text == "nothing sensitive here"
    # null text propagates as null, not a crash or a phantom match
    assert rows[5].redacted_text is None


def test_redact_pii_email_pass_shields_dotted_domain_from_ipv4():
    # The dotted digits inside an email's host must be redacted as part
    # of the email, never half-eaten by the IPv4 pass.
    from datapipeline_spike_spark.operators.redaction import PII_PATTERNS

    assert [k for k, _, _ in PII_PATTERNS][:2] == ["email", "ipv4"]


def test_segment_dedup_flags_planted_copies(spark):
    words = [f"w{i}" for i in range(8)]
    base = " ".join(words * 2)  # 16 tokens -> two 8-token segments
    df = spark.createDataFrame(
        [(1, base), (2, base), (3, base), (4, " ".join(f"u{i}" for i in range(16)))],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in segment_dedup_profile(df, seg_tokens=8).collect()}
    # docs 1-3 are verbatim copies: every segment shared and (df=3) boilerplate
    for d in (1, 2, 3):
        assert out[d].n_segments == 2
        assert out[d].n_shared == 2 and out[d].n_boilerplate == 2
        assert out[d].shared_ratio == 1.0
    # doc 4 is unique
    assert out[4].n_shared == 0 and out[4].n_boilerplate == 0


def test_pack_sequences_accounting_invariants(spark):
    rows = [
        (d, i, t, d % 2)
        for d in range(6)
        for i, t in enumerate([64, 64, 64, 17][: (d % 4) + 1])
    ]
    df = spark.createDataFrame(rows, "doc_id long, chunk_idx int, chunk_tokens int, shard int")
    packed = pack_sequences(df, budget=100).collect()
    assert len(packed) == len(rows)  # every chunk assigned exactly once
    for r in packed:
        assert 0 <= r.seq_pos < 100
        end = r.seq_id * 100 + r.seq_pos + r.chunk_tokens - 1
        assert r.straddle == (end >= (r.seq_id + 1) * 100)
    # within each shard the chunks tile the token stream exactly
    for shard in (0, 1):
        sh = sorted(
            (r for r in packed if r.shard == shard),
            key=lambda r: (r.doc_id, r.chunk_idx),
        )
        offset = 0
        for r in sh:
            assert r.seq_id * 100 + r.seq_pos == offset
            offset += r.chunk_tokens


def test_pack_sequences_invariant_under_partitioning(spark):
    rows = [(d, i, 30 + (d * 7 + i) % 40, d % 3) for d in range(20) for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, chunk_idx int, chunk_tokens int, shard int")
    a = {(r.doc_id, r.chunk_idx): (r.seq_id, r.seq_pos) for r in pack_sequences(df).collect()}
    b = {
        (r.doc_id, r.chunk_idx): (r.seq_id, r.seq_pos)
        for r in pack_sequences(df.repartition(7, "chunk_idx")).collect()
    }
    assert a == b


def test_pack_sequences_rejects_bad_budget(spark):
    df = spark.createDataFrame([(1, 0, 5, 0)], "doc_id long, chunk_idx int, chunk_tokens int, shard int")
    import pytest

    with pytest.raises(ValueError):
        pack_sequences(df, budget=0)
