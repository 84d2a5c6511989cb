"""Unit tests for the round-gating tools themselves (tools/preflight.py
type audit): the HUGEINT-class hash-risk detector must flag exactly the
divergences the driver's hash is sensitive to."""

from __future__ import annotations

import sys

import pyarrow as pa

sys.path.insert(0, "/root/repo/tools")

from preflight import _canon_arrow_type, _canon_spark_type, type_audit  # noqa: E402


def test_canonical_type_classes():
    assert _canon_spark_type("bigint") == _canon_spark_type("int") == "int"
    assert _canon_spark_type("double") == "float"
    assert _canon_spark_type("timestamp_ntz") == "ts" == _canon_spark_type("timestamp")
    assert _canon_arrow_type(pa.decimal128(38, 0)) == "decimal"
    assert _canon_arrow_type(pa.int64()) == "int"
    assert _canon_arrow_type(pa.large_string()) == _canon_arrow_type(pa.string()) == "str"
    assert _canon_arrow_type(pa.timestamp("us")) == "ts"


def test_type_audit_flags_hugeint_vs_bigint():
    """The round-3 hash-mismatch class: DuckDB sum() widening to
    HUGEINT (arrow decimal128) against a Spark bigint column must be
    flagged; matching columns must not."""
    spark_dtypes = [("n_tokens", "bigint"), ("ratio", "double"), ("doc_id", "bigint")]
    oracle_schema = pa.schema(
        [
            pa.field("n_tokens", pa.decimal128(38, 0)),  # HUGEINT
            pa.field("ratio", pa.float64()),
            pa.field("doc_id", pa.int64()),
        ]
    )
    risks = type_audit(spark_dtypes, oracle_schema)
    assert len(risks) == 1 and "n_tokens" in risks[0] and "decimal" in risks[0]


def test_type_audit_ignores_extra_oracle_columns():
    risks = type_audit([("a", "bigint")], pa.schema([pa.field("b", pa.int64())]))
    assert risks == []


def test_unpartitioned_window_detector():
    """The r8 audit rule: flag Window nodes with no partition spec; a
    partitioned-but-unordered window (aggregate over the whole frame
    per key) prints the same number of bracket groups and must NOT be
    flagged — the discriminator is ASC/DESC NULLS tokens in group 2."""
    from tools.plan_audit import _unpartitioned_windows

    part_ordered = (
        "Window [row_number() windowspecdefinition(a#1, b#2 ASC NULLS FIRST, "
        "specifiedwindowframe(RowFrame, unboundedpreceding$(), currentrow$())) "
        "AS r#3], [a#1], [b#2 ASC NULLS FIRST]"
    )
    part_unordered = (
        "Window [count(1) windowspecdefinition(a#1, specifiedwindowframe("
        "RowFrame, unboundedpreceding$(), unboundedfollowing$())) AS n#2L], [a#1]"
    )
    unpart_ordered = (
        "Window [row_number() windowspecdefinition(b#2 ASC NULLS FIRST, "
        "specifiedwindowframe(RowFrame, unboundedpreceding$(), currentrow$())) "
        "AS r#3], [b#2 ASC NULLS FIRST]"
    )
    assert _unpartitioned_windows(part_ordered) == 0
    assert _unpartitioned_windows(part_unordered) == 0
    assert _unpartitioned_windows(unpart_ordered) == 1
    assert _unpartitioned_windows("\n".join([part_ordered, unpart_ordered] * 2)) == 2
    # WindowGroupLimit lines must not confuse the node matcher
    assert _unpartitioned_windows(
        "WindowGroupLimit [a#1], [b#2 ASC NULLS FIRST], row_number(), 40, Final"
    ) == 0
