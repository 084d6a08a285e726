"""Driver-contract conformance: queries() vs oracle_sql() via DuckDB at
sf0.001 (the same comparison shape the driver runs at sf0.01)."""

import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"

# cheap, fully-oracled subset (the standalone scripts/check_contract.py runs
# everything including the heavy ANN/minhash paths)
SUBSET = [
    "ft_term_hits_join",
    "ft_term_hits_after_delete",
    "ft_term_freqs_hash",
    "ft_bool_and_hits",
    "ft_bool_or_not_hits",
    "ft_bool_msm_hits",
    "ft_keyword_filter",
    "ft_regexp_hits",
    "ft_suggest_s",
    "ft_spell_joib",
    "ft_phrase_hits",
    "ft_phrase_slop_hits",
    "ft_snippet_join",
    "ft_prefix_hits",
    "ft_doc_freq_top20",
    "ft_collection_stats",
    "dedup_exact",
    "dedup_embedding_pairs",
    "ft_join_parent_counts",
    "ft_expr_topk",
    "percolate_matches",
    "text_shingle_top20",
    "text_shingle_profile",
    "text_token_stats",
    "text_quality",
    "ann_cosine_top10",
    "agg_lineitem_pricing",
    "join_orders_per_nation",
    "sort_top_orders",
    "events_tumbling_daily",
    "events_top_users",
    "events_session_windows",
    "events_sliding_counts",
    "join_order_revenue",
    "ft_highlight_join",
    "part_price_stats",
    "distinct_order_priorities",
    "filter_high_value_orders",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].astype(np.float64).round(6)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _to_pandas(x):
    import pyarrow as pa

    import ray.data

    if isinstance(x, pa.Table):
        return x.to_pandas()
    if isinstance(x, ray.data.Dataset):
        return x.to_pandas()
    return x


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(ray_session, con, name):
    import __ray_entry__ as entrymod

    got = _normalize(_to_pandas(entrymod.queries()[name](SF)))
    exp = _normalize(con.execute(entrymod.oracle_sql()[name]).df())
    assert list(got.columns) == list(exp.columns)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_all_queries_run_and_oracles_are_subset(ray_session):
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    assert set(entrymod.oracle_sql()) <= set(qs)
    # rows-only queries at least execute and return a well-formed result
    for name in ["dedup_minhash_pairs", "dedup_simhash_sigs", "dedup_simhash_pairs",
                 "dedup_embedding_pairs_lsh", "text_langid",
                 "ann_ivf_top10", "ann_hnsw_top10", "ft_bm25_top10_customer",
                 "ft_join_parent_scored", "ft_expr_rescore_join",
                 "text_approx_distinct_tokens"]:
        out = _to_pandas(qs[name](SF))
        assert out is not None and len(out.columns) > 0
