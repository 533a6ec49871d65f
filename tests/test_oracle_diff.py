"""Differential tests: every registered workload query vs its DuckDB
oracle — the local version of the driver's t2 gate."""

from __future__ import annotations

import pytest

from hudi_rs_spark.workloads import load_all
from tests.oracle import compare, duckdb_run

SPECS = load_all()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(spark, sf_dir, name):
    spec = SPECS[name]
    df = spec.build(spark, sf_dir)
    if spec.oracle is None:
        assert df.count() >= 0  # rows-only check
        return
    oracle = duckdb_run(spec.oracle, sf_dir)
    problems = compare(df, oracle)
    assert not problems, f"{name}: " + "; ".join(problems)
