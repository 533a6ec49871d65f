"""q2/q11 differential tests over the synthesized partsupp table —
same value-hash oracle harness as the registry gate (the driver's
testdata lacks partsupp, so these live here instead of the registry;
see workloads/partsupp.py)."""

from __future__ import annotations

import pytest

from hudi_rs_spark.workloads import partsupp as P
from tests.oracle import compare, duckdb_run


class TestSynthesizedPartsupp:
    def test_partsupp_matches_cte(self, spark, sf_dir):
        df = P.partsupp_df(spark, sf_dir)
        oracle = duckdb_run(P.PARTSUPP_CTE + "SELECT * FROM partsupp", sf_dir)
        problems = compare(df, oracle)
        assert not problems, "; ".join(problems)

    def test_four_suppliers_per_part(self, spark, sf_dir):
        df = P.partsupp_df(spark, sf_dir)
        counts = df.groupBy("ps_partkey").count().select("count").distinct().collect()
        assert {r["count"] for r in counts} <= {3, 4}  # modulo collisions allowed

    def test_suppkeys_join_supplier(self, spark, sf_dir):
        from hudi_rs_spark.workloads.tables import load

        ps = P.partsupp_df(spark, sf_dir)
        s = load(spark, sf_dir, "supplier")
        dangling = ps.join(
            s, ps.ps_suppkey == s.s_suppkey, "left_anti"
        ).count()
        assert dangling == 0


@pytest.mark.parametrize(
    "build,sql",
    [
        (P.q2_min_cost_supplier, P.Q2_SQL),
        (P.q11_important_stock, P.Q11_SQL),
    ],
    ids=["q2_min_cost_supplier", "q11_important_stock"],
)
def test_query_matches_oracle(spark, sf_dir, build, sql):
    df = build(spark, sf_dir)
    oracle = duckdb_run(sql, sf_dir)
    assert len(oracle) > 0  # a filter that selects nothing proves nothing
    problems = compare(df, oracle)
    assert not problems, "; ".join(problems)
