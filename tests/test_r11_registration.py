"""r11 registration gate: the six r10-staged operators are now REGISTRY
entries (plans/catalog_r11). This keeps running the SAME differential
comparison the pre-handoff gate uses (tools/check_oracle.compare) —
against the REGISTRY entries, so the local evidence survives the move
(the r9 precedent, tests/test_r9_staging.py) — plus the three ADVICE
r10 contract fixes: the verdict-matrix arity guard, the zero-token
mixture-group contract, and the OCHK continuation-cycle guard."""

from __future__ import annotations

import importlib.util
import struct
import sys

import duckdb
import pytest
from pyspark.sql import functions as F

from datapipeline_spike_spark.plans import REGISTRY  # noqa: F401  (imports catalog_r11)
from datapipeline_spike_spark.plans.catalog_r11 import R11_REGISTERED
from datapipeline_spike_spark.plans.registry import TABLES


def _compare_fn():
    spec = importlib.util.spec_from_file_location(
        "check_oracle", "/root/repo/tools/check_oracle.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("check_oracle", mod)
    spec.loader.exec_module(mod)
    return mod.compare


@pytest.fixture(scope="module")
def oracle_con(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()


def test_r11_moves_are_all_registered():
    assert len(R11_REGISTERED) == 6
    missing = [n for n in R11_REGISTERED if n not in REGISTRY]
    assert not missing, missing


@pytest.mark.parametrize("name", sorted(R11_REGISTERED))
def test_registered_query_matches_oracle(spark, sf_dir, oracle_con, name):
    q = REGISTRY[name]
    sdf = q.spark(spark, sf_dir).toPandas()
    assert q.oracle is not None  # all six ship full-value oracles
    odf = oracle_con.execute(q.oracle).df()
    problems = _compare_fn()(name, sdf, odf)
    assert not problems, problems


# --- ADVICE r10 contract fixes ------------------------------------------------


def test_verdict_matrix_rejects_single_column(spark):
    """ADVICE r10: fewer than 2 verdict columns used to crash with
    IndexError(rows[0]); now a typed contract error."""
    from datapipeline_spike_spark.operators.text_stats import (
        verdict_agreement_matrix,
    )

    df = spark.range(4).select((F.col("id") % 2 == 0).alias("a"))
    with pytest.raises(ValueError, match="at least 2 verdict columns"):
        verdict_agreement_matrix(df, ["a"])
    with pytest.raises(ValueError, match="at least 2 verdict columns"):
        verdict_agreement_matrix(df, [])


def test_temperature_mixture_zero_token_group_stays_visible(spark):
    """ADVICE r10: a group whose tokens sum to 0 used to go NULL
    (ln(0)) and silently vanish from the kept-count draw. Contract now:
    the group STAYS in the plan with p = 0, epochs = 0 (NOT max_epochs
    — Spark's least() skips NULLs), nothing sampled."""
    from datapipeline_spike_spark.operators.sampling import (
        temperature_mixture_plan,
    )

    rows = [(i, "real", 100) for i in range(10)] + [
        (100 + i, "empty", 0) for i in range(3)
    ]
    d = spark.createDataFrame(rows, "doc_id long, lang string, tk long")
    out = {
        r["lang"]: r
        for r in temperature_mixture_plan(
            d, budget_frac=0.5, tau=0.5, max_epochs=4.0
        ).collect()
    }
    assert set(out) == {"real", "empty"}  # zero-token group visible
    e = out["empty"]
    assert e["n_docs"] == 3 and e["n_tokens"] == 0
    assert e["p"] == 0.0 and e["epochs"] == 0.0 and e["sampling_rate"] == 0.0
    assert e["n_kept_docs"] == 0 and e["kept_tokens"] == 0
    r = out["real"]
    assert r["p"] == 1.0  # the only weighted group takes the whole share
    assert r["epochs"] > 0


def test_ochk_continuation_cycle_fails_loud():
    """ADVICE r10: a crafted continuation chain that revisits a block
    must raise Hdf5FormatError, not loop unboundedly (lake payloads are
    untrusted input)."""
    from datapipeline_spike_spark.sources.hdf5_native import (
        UNDEF,
        Hdf5FormatError,
        lookup3,
        read_h5_datasets,
    )

    # v3 superblock + root OHDR whose only message is a continuation
    # pointing BACK at the root OHDR itself (the tightest cycle)
    ohdr_addr = 48
    body = struct.pack("<QQ", ohdr_addr, 24)  # caddr = own block
    root_msgs = struct.pack("<BHB", 0x10, len(body), 0) + body
    head = b"OHDR" + struct.pack("<BBI", 2, 0x02, len(root_msgs))
    oh = head + root_msgs
    oh += struct.pack("<I", lookup3(oh))
    sb = b"\x89HDF\r\n\x1a\n" + struct.pack("<BBBB", 3, 8, 8, 0)
    sb += struct.pack("<QQQQ", 0, UNDEF, ohdr_addr + len(oh), ohdr_addr)
    sb += struct.pack("<I", lookup3(sb))
    with pytest.raises(Hdf5FormatError, match="cycle"):
        read_h5_datasets(sb + oh)
