"""Q5 supplier-side strategy: broadcast searchsorted probe vs third
hash_join must produce identical results (and match DuckDB)."""
import duckdb
import pytest

SF = "/root/testdata/sf0.001"

Q5_SQL = """
SELECT n_name,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                * CAST(ROUND((1 - l_discount) * 100) AS BIGINT)) AS DOUBLE)
       / 10000.0 AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1996-01-01'
  AND c_nationkey = s_nationkey
GROUP BY n_name ORDER BY revenue DESC, n_name
"""


@pytest.fixture(scope="module")
def oracle():
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "orders",
              "lineitem"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    return con.execute(Q5_SQL).df()


def _run(limit):
    from lucene_ray.pipelines.shuffle_join import local_supplier_volume
    t = local_supplier_volume(SF, supplier_broadcast_limit=limit)
    return t.to_pandas() if hasattr(t, "to_pandas") else t


def test_q5_broadcast_path(ray_session, oracle):
    got = _run(50_000_000)
    assert got.reset_index(drop=True).equals(oracle.reset_index(drop=True))


def test_q5_shuffle_path(ray_session, oracle):
    got = _run(0)
    assert got.reset_index(drop=True).equals(oracle.reset_index(drop=True))
