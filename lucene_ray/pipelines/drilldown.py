"""Faceted drill-down / drill-sideways navigation.

Behavioral reference: Lucene's facet module —
``DrillDownQuery`` (lucene/facet/src/java/org/apache/lucene/facet/
DrillDownQuery.java): the base query AND one scoreless FILTER clause per
selected dimension (served here by the keyword-field ``dim:value`` terms);
``DrillSideways`` (facet/DrillSideways.java): for each selected dimension,
facet counts are computed with the filters of all OTHER dimensions applied
(so the UI can show what the sibling values of a selected facet would
yield), while unselected dimensions count against the fully filtered set.

Everything runs on the distributed match path (ShardPool actors) with
facet values read column-pruned from the docmap.
"""

from __future__ import annotations

from collections import Counter

import pyarrow as pa

from lucene_ray.pipelines.fulltext import _all_matches, documents_index
from lucene_ray.search.query import BooleanQuery, TermQuery


def _facet_counts_for(sf_dir: str, q, facet_col: str) -> Counter:
    # per-segment counting inside the shard actors (FacetsCollector shape);
    # only label partials reach the driver
    from lucene_ray.pipelines.fulltext import _pool

    reader = documents_index(sf_dir)
    agg = _pool(reader).facets([(0, q)], facet_col)[0]
    return Counter({label: v[0] for label, v in agg.items()})


def _drill_query(term: str, filters: dict, skip_dim: str | None = None):
    flt = [TermQuery(f"{dim}:{val}") for dim, val in sorted(filters.items())
           if dim != skip_dim]
    return BooleanQuery(must=[TermQuery(term)], filter=flt)


def drill_down(sf_dir: str, term: str, filters: dict, facet_col: str) -> pa.Table:
    """Hits of ``term`` restricted by keyword filters (DrillDownQuery),
    faceted over ``facet_col``: (facet value, n_docs) sorted by value."""
    counts = _facet_counts_for(sf_dir, _drill_query(term, filters), facet_col)
    keys = sorted(counts)
    return pa.table(
        {
            facet_col: pa.array(keys, pa.string()),
            "n_docs": pa.array([counts[k] for k in keys], pa.int64()),
        }
    )


def drill_sideways(sf_dir: str, term: str, filters: dict,
                   dims: tuple) -> pa.Table:
    """DrillSideways counts: one (dim, value, n_docs) row per facet value,
    where a SELECTED dim's counts drop its own filter (keeping the others)
    and unselected dims count against the fully filtered hit set. Sorted by
    (dim, value)."""
    out_dim, out_val, out_n = [], [], []
    for dim in sorted(dims):
        skip = dim if dim in filters else None
        counts = _facet_counts_for(sf_dir, _drill_query(term, filters, skip), dim)
        for val in sorted(counts):
            out_dim.append(dim)
            out_val.append(val)
            out_n.append(counts[val])
    return pa.table(
        {
            "dim": pa.array(out_dim, pa.string()),
            "value": pa.array(out_val, pa.string()),
            "n_docs": pa.array(out_n, pa.int64()),
        }
    )
