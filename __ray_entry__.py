"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship pipeline (inverted-index build + BM25 search)
on sf0.001. ``queries()`` exposes one callable per implemented operator from
SURVEY.md §2 plus the training-data-pipeline extensions (dedup, ANN, text
analysis); ``oracle_sql()`` gives the DuckDB-equivalent SQL for every
SQL-expressible entry (scored BM25 / MinHash / SimHash / IVF / langid are
rows-only — float32 Lucene arithmetic and sketch internals are not
SQL-expressible; they are validated by the exhaustive-oracle pytest suite).

Ray is initialised by the driver BEFORE this module is imported: nothing here
calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import numpy as np

from lucene_ray.ops.curate import fmix32_sql as _fmix32_sql
from lucene_ray.ops.curate import hex_threshold as _hex_thr

# Shared tokenizer CTE — must mirror lucene_ray.analysis.CodeTokenizer:
# lowercase, split on [^a-z0-9_]+, drop empties (255-char split path never
# triggers on these tables).
_TOKS = (
    "WITH toks AS (SELECT doc_id, unnest(string_split_regex(lower(text), "
    "'[^a-z0-9_]+')) AS tok FROM documents) "
)
_TOKLIST = (
    "list_filter(string_split_regex(lower(text), '[^a-z0-9_]+'), x -> x <> '')"
)
# (doc_id, tok, pos) token-position CTE — the aligned-unnest zip used by the
# positional oracles (spans / intervals / passages)
_PT = (
    "WITH tl AS (SELECT doc_id, " + _TOKLIST + " AS l FROM documents), "
    "pt AS (SELECT doc_id, unnest(l) AS tok, unnest(range(len(l))) AS pos "
    "FROM tl) "
)

# SmallFloat byte4 length quantization (SmallFloat.java:103-165) as shift
# arithmetic: values < 24 exact; above, keep 4 significant bits of (dl-24)
_LOSSY_DL = (
    "CASE WHEN dl < 24 THEN dl ELSE 24 + "
    "(((dl - 24) >> (CASE WHEN dl - 24 < 8 THEN 0 "
    "ELSE CAST(floor(log2(dl - 24)) AS INT) - 3 END)) "
    "<< (CASE WHEN dl - 24 < 8 THEN 0 "
    "ELSE CAST(floor(log2(dl - 24)) AS INT) - 3 END)) END"
)


def _bm25_cte(terms: list[str]) -> str:
    """CTEs ending in ``sc(doc_id, tok, s)``: the engine's float32-exact
    BM25 per (doc, query term). DuckDB's FLOAT arithmetic is true float32
    (verified bit-identical against the numpy scorer on every doc at every
    sf), idf/avgdl take the same double-then-single-cast path as
    BM25Similarity.java:101-117, and document length goes through the
    byte4 quantization exactly as the norm byte does. This makes the scored
    top-k entries fully SQL-checkable: ranks AND round(score, 6) values."""
    toks = ", ".join(f"'{t}'" for t in terms)
    return (
        "WITH tl AS (SELECT doc_id, " + _TOKLIST + " AS l FROM documents), "
        "d AS (SELECT doc_id, len(l)::BIGINT AS dl FROM tl), "
        "stats AS (SELECT count(*)::BIGINT AS n, sum(dl)::BIGINT AS sttf, "
        "CAST(sum(dl)::DOUBLE / count(*) AS FLOAT) AS avgdl FROM d), "
        "toks AS (SELECT doc_id, unnest(l) AS tok FROM tl), "
        f"tf AS (SELECT doc_id, tok, count(*)::BIGINT AS tf FROM toks "
        f"WHERE tok IN ({toks}) GROUP BY doc_id, tok), "
        "dfs AS (SELECT tok, count(*)::BIGINT AS df FROM tf GROUP BY tok), "
        "idfs AS (SELECT tok, CAST(ln(1 + ((SELECT n FROM stats) - df + 0.5) "
        "/ (df + 0.5)) AS FLOAT) AS idf FROM dfs), "
        f"ninv AS (SELECT doc_id, CAST(1.0 AS FLOAT) / (CAST(1.2 AS FLOAT) * "
        f"((CAST(1.0 AS FLOAT) - CAST(0.75 AS FLOAT)) + CAST(0.75 AS FLOAT) * "
        f"CAST({_LOSSY_DL} AS FLOAT) / (SELECT avgdl FROM stats))) AS ninv "
        "FROM d), "
        "sc AS (SELECT tf.doc_id, tf.tok, "
        "idfs.idf - idfs.idf / (CAST(1.0 AS FLOAT) + CAST(tf AS FLOAT) * "
        "ninv.ninv) AS s FROM tf JOIN idfs USING (tok) JOIN ninv USING (doc_id)) "
    )

# derived HEAD text-field token list (pipelines/fulltext.HEAD_CHARS chars of
# text — both sides derive the field identically, so boundary-cut tokens
# match too)
_HEAD_TOKLIST = (
    "list_filter(string_split_regex(lower(substr(text, 1, 80)), "
    "'[^a-z0-9_]+'), x -> x <> '')"
)


def _bm25_head_cte(terms: list[str]) -> str:
    """_bm25_cte over the derived HEAD text field: per-field collection
    stats (avgdl = the FIELD's sumTotalTermFreq / doc count), per-field
    byte4-quantized lengths — certifying IndexConfig.text_cols' per-field
    norms + CollectionStatistics float32-exactly in SQL."""
    toks = ", ".join(f"'{t}'" for t in terms)
    return (
        "WITH tl AS (SELECT doc_id, " + _HEAD_TOKLIST + " AS l FROM documents), "
        "d AS (SELECT doc_id, len(l)::BIGINT AS dl FROM tl), "
        "stats AS (SELECT count(*)::BIGINT AS n, "
        "CAST(sum(dl)::DOUBLE / count(*) AS FLOAT) AS avgdl FROM d), "
        "toks AS (SELECT doc_id, unnest(l) AS tok FROM tl), "
        f"tf AS (SELECT doc_id, tok, count(*)::BIGINT AS tf FROM toks "
        f"WHERE tok IN ({toks}) GROUP BY doc_id, tok), "
        "dfs AS (SELECT tok, count(*)::BIGINT AS df FROM tf GROUP BY tok), "
        "idfs AS (SELECT tok, CAST(ln(1 + ((SELECT n FROM stats) - df + 0.5) "
        "/ (df + 0.5)) AS FLOAT) AS idf FROM dfs), "
        f"ninv AS (SELECT doc_id, CAST(1.0 AS FLOAT) / (CAST(1.2 AS FLOAT) * "
        f"((CAST(1.0 AS FLOAT) - CAST(0.75 AS FLOAT)) + CAST(0.75 AS FLOAT) * "
        f"CAST({_LOSSY_DL} AS FLOAT) / (SELECT avgdl FROM stats))) AS ninv "
        "FROM d), "
        "sc AS (SELECT tf.doc_id, tf.tok, "
        "idfs.idf - idfs.idf / (CAST(1.0 AS FLOAT) + CAST(tf AS FLOAT) * "
        "ninv.ninv) AS s FROM tf JOIN idfs USING (tok) JOIN ninv USING (doc_id)) "
    )


# shared n-gram-Jaccard CTE chain (3-shingles, exact set Jaccard)
_NGRAM_CTES = (
    "tl AS (SELECT doc_id, list_filter(string_split_regex(lower(text), "
    "'[^a-z0-9_]+'), x -> x <> '') AS l FROM documents), "
    "sh AS (SELECT DISTINCT doc_id, unnest("
    "CASE WHEN len(l) < 3 THEN [array_to_string(l, ' ')] "
    "ELSE list_transform(generate_series(1, len(l) - 2), "
    "i -> array_to_string(l[i:i+2], ' ')) END) AS s "
    "FROM tl WHERE len(l) > 0), "
    "sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1), "
    "it AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c "
    "FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)"
)


# geo oracle pieces: derived customer points + haversine to the pinned
# center (48.85, 2.35) on the mean-radius sphere (ops/geo.EARTH_RADIUS_M)
_GEO_PTS = (
    "WITH pts AS (SELECT c_custkey, "
    "((c_custkey * 7919) % 18000) / 100.0 - 90.0 AS lat, "
    "((c_custkey * 104729) % 36000) / 100.0 - 180.0 AS lon FROM customer) "
)
_GEO_DIST = (
    "2.0 * 6371008.7714 * asin(least(1.0, sqrt("
    "pow(sin((radians(48.85) - radians(lat)) / 2), 2) + "
    "cos(radians(lat)) * cos(radians(48.85)) * "
    "pow(sin(radians(2.35 - lon) / 2), 2))))"
)


def _shape_sql() -> dict:
    """Indexed-shape oracles: replay the engine's division-free
    orientation arithmetic (ops/geo.segment_box_intersects /
    triangle_within_box) with the SAME operation order and the SAME
    pre-computed edge constants, so float64 results are bit-identical."""
    from lucene_ray.pipelines.geo import (INTERSECT_BOX, SEG_MULTS,
                                          TRI_MULTS, WITHIN_BOX)

    def lat(m, ck="c_custkey"):
        return f"(({ck} * {m}) % 18000) / 100.0 - 90.0"

    def lon(m, ck="c_custkey"):
        return f"(({ck} * {m}) % 36000) / 100.0 - 180.0"

    my1, mx1, my2, mx2 = SEG_MULTS
    seg_cte = (
        "WITH seg AS (SELECT c_custkey, "
        f"{lat(my1)} AS y1, {lon(mx1)} AS x1, "
        f"{lat(my2)} AS y2, {lon(mx2)} AS x2 FROM customer) "
    )
    min_lat, max_lat, min_lon, max_lon = INTERSECT_BOX
    corners = [(min_lon, min_lat), (max_lon, min_lat),
               (max_lon, max_lat), (min_lon, max_lat)]
    inside = (
        f"(y1 > {min_lat!r} AND y1 < {max_lat!r} AND "
        f"x1 > {min_lon!r} AND x1 < {max_lon!r}) OR "
        f"(y2 > {min_lat!r} AND y2 < {max_lat!r} AND "
        f"x2 > {min_lon!r} AND x2 < {max_lon!r})"
    )
    crossings = []
    for i in range(4):
        ax, ay = corners[i]
        bx, by = corners[(i + 1) % 4]
        # constants the numpy kernel forms once per edge
        dbx, dby = bx - ax, by - ay
        d12 = (f"((x2 - x1) * ({ay!r} - y1) - (y2 - y1) * ({ax!r} - x1)) * "
               f"((x2 - x1) * ({by!r} - y1) - (y2 - y1) * ({bx!r} - x1))")
        d34 = (f"({dbx!r} * (y1 - {ay!r}) - {dby!r} * (x1 - {ax!r})) * "
               f"({dbx!r} * (y2 - {ay!r}) - {dby!r} * (x2 - {ax!r}))")
        crossings.append(f"(({d12}) < 0.0 AND ({d34}) < 0.0)")
    intersects = (
        seg_cte + "SELECT c_custkey FROM seg WHERE (" + inside + ") OR "
        + " OR ".join(crossings) + " ORDER BY c_custkey"
    )

    w_lat, w_lat2, w_lon, w_lon2 = WITHIN_BOX
    vert_preds = []
    for my1_, mx1_, my2_, mx2_, my3_, mx3_ in TRI_MULTS:
        for m_lat, m_lon in ((my1_, mx1_), (my2_, mx2_), (my3_, mx3_)):
            vert_preds.append(
                f"({lat(m_lat)}) > {w_lat!r} AND ({lat(m_lat)}) < {w_lat2!r} "
                f"AND ({lon(m_lon)}) > {w_lon!r} AND ({lon(m_lon)}) < {w_lon2!r}"
            )
    within = ("SELECT c_custkey FROM customer WHERE "
              + " AND ".join(vert_preds) + " ORDER BY c_custkey")

    # segment vs POLYGON intersects: endpoint even-odd crossing counts
    # (point_in_polygon's exact expression) OR a strict-sign edge crossing
    # — identical float64 arithmetic as ops/geo.segment_polygon_intersects
    from lucene_ray.pipelines.geo import SHAPE_POLY_LATS, SHAPE_POLY_LONS

    def _pip(lat_e: str, lon_e: str) -> str:
        terms = []
        nv = len(SHAPE_POLY_LATS)
        for i in range(nv):
            yi, xi = SHAPE_POLY_LATS[i], SHAPE_POLY_LONS[i]
            yj, xj = SHAPE_POLY_LATS[i - 1], SHAPE_POLY_LONS[i - 1]
            if yi == yj:
                continue
            terms.append(
                f"(CASE WHEN (({yi!r} > {lat_e}) <> ({yj!r} > {lat_e})) AND "
                f"{lon_e} < ({xj!r} - {xi!r}) * ({lat_e} - {yi!r}) / "
                f"({yj!r} - {yi!r}) + {xi!r} THEN 1 ELSE 0 END)")
        return "(" + " + ".join(terms) + ") % 2 = 1"

    poly_cross = []
    nv = len(SHAPE_POLY_LATS)
    for i in range(nv):
        ay, ax = SHAPE_POLY_LATS[i - 1], SHAPE_POLY_LONS[i - 1]
        by, bx = SHAPE_POLY_LATS[i], SHAPE_POLY_LONS[i]
        dbx, dby = bx - ax, by - ay
        d12 = (f"((x2 - x1) * ({ay!r} - y1) - (y2 - y1) * ({ax!r} - x1)) * "
               f"((x2 - x1) * ({by!r} - y1) - (y2 - y1) * ({bx!r} - x1))")
        d34 = (f"({dbx!r} * (y1 - {ay!r}) - {dby!r} * (x1 - {ax!r})) * "
               f"({dbx!r} * (y2 - {ay!r}) - {dby!r} * (x2 - {ax!r}))")
        poly_cross.append(f"(({d12}) < 0.0 AND ({d34}) < 0.0)")
    poly_intersects = (
        seg_cte + "SELECT c_custkey FROM seg WHERE ("
        + _pip("y1", "x1") + ") OR (" + _pip("y2", "x2") + ") OR "
        + " OR ".join(poly_cross) + " ORDER BY c_custkey"
    )
    return {"geo_shape_intersects_hits": intersects,
            "geo_shape_within_hits": within,
            "geo_shape_polygon_hits": poly_intersects}


def entry() -> Any:
    """Flagship: build the inverted index over sf0.001 documents via the Ray
    Data pipeline, serve the pinned query battery, return the hits table."""
    import pyarrow as pa

    from lucene_ray.pipelines import fulltext as ft

    sf_dir = "/root/testdata/sf0.001"
    parts = []
    for term in ["join", "hash", "customer"]:
        t = ft.bm25_topk(sf_dir, term, 10)
        parts.append(t.append_column("query", pa.array([term] * len(t), pa.string())))
    return pa.concat_tables(parts)


def _q(fn: Callable[[str], Any]) -> Callable[[str], Any]:
    return fn


def queries() -> dict[str, Callable[[str], Any]]:
    from lucene_ray.ops import ann, dedup, hnsw, packing, quantiles, shingles, sketch, text
    from lucene_ray.ops import multimodal as mm
    from lucene_ray.ops import quality as qual
    from lucene_ray.pipelines import fulltext as ft
    from lucene_ray.pipelines import mlt
    from lucene_ray.pipelines import relational as rel
    from lucene_ray.pipelines.drilldown import drill_down, drill_sideways
    from lucene_ray.pipelines.prepare import prepare_corpus
    from lucene_ray.pipelines.highlight import highlight_first, passages_top
    from lucene_ray.pipelines.joins import block_join, join_to_parent
    from lucene_ray.pipelines.percolate import percolate
    from lucene_ray.pipelines.rescore import expression_rescore, expression_topk
    from lucene_ray.pipelines.shuffle_join import (
        local_supplier_volume,
        order_revenue,
    )
    from lucene_ray.pipelines.windows import session_windows, sliding_window_counts
    from lucene_ray.pipelines import geo as geo_pipe

    import ray.data

    def _docs(sf_dir):
        return ray.data.read_parquet(f"{sf_dir}/documents.parquet")

    def _wdf_decorated(sf_dir):
        # append a deterministic camelCase/digit/possessive tail per doc
        # (the test tables are all-lowercase, so the word_delimiter grammar
        # needs injected structure to be differentially tested — same
        # decoration pattern as text_redact_pii)
        import pyarrow as pa
        import pyarrow.compute as pc2

        def dec(b: "pa.Table") -> "pa.Table":
            tail = pc2.binary_join_element_wise(
                pa.array([" DocID"] * len(b), pa.string()),
                pc2.cast(b.column("doc_id"), pa.string()),
                pa.array(["XMLTag iPhone4S O'Brien's"] * len(b), pa.string()),
                "",
            )
            new_text = pc2.binary_join_element_wise(
                pc2.cast(b.column("text"), pa.string()), tail, ""
            )
            return b.set_column(
                b.schema.get_field_index("text"), "text", new_text
            )

        return _docs(sf_dir).map_batches(dec, batch_format="pyarrow")

    def _emb(sf_dir):
        return ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")

    def _query_vec(sf_dir):
        import pyarrow.parquet as pq

        t = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
        v = t.loc[t["vec_id"] == 0, "embedding"].iloc[0]
        return np.asarray(v, dtype=np.float64)[None, :]

    def _ann(sf_dir):
        out = ann.knn_brute(_emb(sf_dir), _query_vec(sf_dir), k=10)
        return out.select(["rank", "vec_id"])

    def _ann_ivf(sf_dir):
        import hashlib
        import os

        src = f"{sf_dir}/embeddings.parquet"
        key = hashlib.md5(f"{src}:{os.path.getmtime(src)}:v2".encode()).hexdigest()[:16]
        ivf_dir = f"/tmp/lucene_ray_cache/ivf-{key}"
        if os.path.exists(os.path.join(ivf_dir, "ivf_meta.json")):
            idx = ann.IvfIndex.open(ivf_dir)
        else:
            idx = ann.IvfIndex.build(_emb(sf_dir), ivf_dir, n_clusters=8, iters=3)
        return idx.search(_query_vec(sf_dir), k=10, nprobe=4).select(["rank", "vec_id"])

    def _ann_binary(sf_dir):
        import hashlib
        import os

        src = f"{sf_dir}/embeddings.parquet"
        key = hashlib.md5(f"{src}:{os.path.getmtime(src)}:bq-v1".encode()).hexdigest()[:16]
        d = f"/tmp/lucene_ray_cache/bq-{key}"
        if os.path.exists(os.path.join(d, "bq_meta.json")):
            idx = ann.BinaryQuantIndex.open(d)
        else:
            idx = ann.BinaryQuantIndex.build(_emb(sf_dir), d)
        return idx.search(_query_vec(sf_dir), k=10,
                          oversample=5).select(["rank", "vec_id"])

    def _ann_int4(sf_dir):
        import hashlib
        import os

        src = f"{sf_dir}/embeddings.parquet"
        key = hashlib.md5(f"{src}:{os.path.getmtime(src)}:i4-v1".encode()).hexdigest()[:16]
        d = f"/tmp/lucene_ray_cache/int4-{key}"
        if os.path.exists(os.path.join(d, "int4_meta.json")):
            idx = ann.Int4Index.open(d)
        else:
            idx = ann.Int4Index.build(_emb(sf_dir), d)
        return idx.search(_query_vec(sf_dir), k=10,
                          oversample=3).select(["rank", "vec_id"])

    def _ann_pq(sf_dir):
        import hashlib
        import os

        from lucene_ray.ops.pq import PqIndex

        src = f"{sf_dir}/embeddings.parquet"
        key = hashlib.md5(f"{src}:{os.path.getmtime(src)}:pq-v1".encode()).hexdigest()[:16]
        pq_dir = f"/tmp/lucene_ray_cache/pq-{key}"
        if os.path.exists(os.path.join(pq_dir, "pq.json")):
            idx = PqIndex.open(pq_dir)
        else:
            idx = PqIndex.build(_emb(sf_dir), pq_dir, m=8, k=256, iters=3)
        return idx.search(_query_vec(sf_dir), k=10, oversample=4,
                          source_parquet=src).select(["rank", "vec_id"])

    def _ann_ivfpq(sf_dir):
        import hashlib
        import os

        from lucene_ray.ops.pq import IvfPqIndex

        src = f"{sf_dir}/embeddings.parquet"
        key = hashlib.md5(f"{src}:{os.path.getmtime(src)}:ivfpq-v1".encode()).hexdigest()[:16]
        d = f"/tmp/lucene_ray_cache/ivfpq-{key}"
        if os.path.exists(os.path.join(d, "pqcodes", "pq.json")):
            idx = IvfPqIndex.open(d)
        else:
            idx = IvfPqIndex.build(_emb(sf_dir), d, n_clusters=8, m=8,
                                   k=256, iters=3)
        return idx.search(_query_vec(sf_dir), k=10, nprobe=4,
                          oversample=4).select(["rank", "vec_id"])

    def _classify_nb(sf_dir):
        from lucene_ray.ops.classify import classify_documents

        return classify_documents(sf_dir)

    def _ann_ivf_quantized(sf_dir):
        import hashlib
        import os

        src = f"{sf_dir}/embeddings.parquet"
        key = hashlib.md5(f"{src}:{os.path.getmtime(src)}:q8-v1".encode()).hexdigest()[:16]
        ivf_dir = f"/tmp/lucene_ray_cache/ivfq-{key}"
        if os.path.exists(os.path.join(ivf_dir, "ivf_meta.json")):
            idx = ann.IvfIndex.open(ivf_dir)
        else:
            idx = ann.IvfIndex.build(_emb(sf_dir), ivf_dir, n_clusters=8, iters=3)
        return idx.search_quantized(
            _query_vec(sf_dir), k=10, nprobe=4
        ).select(["rank", "vec_id"])

    def _ann_hnsw(sf_dir):
        import hashlib
        import os

        src = f"{sf_dir}/embeddings.parquet"
        key = hashlib.md5(f"{src}:{os.path.getmtime(src)}:v1".encode()).hexdigest()[:16]
        hdir = f"/tmp/lucene_ray_cache/hnsw-{key}"
        if os.path.exists(os.path.join(hdir, "hnsw_meta.json")):
            idx = hnsw.HnswIndex.open(hdir)
        else:
            idx = hnsw.HnswIndex.build(_emb(sf_dir), hdir, m=12, ef_construction=80,
                                       blocks=2)
        return idx.search(_query_vec(sf_dir), k=10, ef=80).select(["rank", "vec_id"])

    def _ids_table(ds, col="doc_id"):
        import pyarrow as _pa

        out = []
        for b in ds.iter_batches(batch_format="pyarrow"):
            out.extend(b.column(col).to_pylist())
        return _pa.table({col: _pa.array(sorted(out), _pa.int64())})

    def _sample_hash(sf_dir):
        from lucene_ray.ops.curate import sample_by_hash

        return _ids_table(sample_by_hash(_docs(sf_dir), hex_lt="2a"))

    def _sample_stratified(sf_dir):
        from lucene_ray.ops.curate import sample_stratified

        return _ids_table(sample_stratified(
            _docs(sf_dir), {"en": "80", "fr": "40", "de": "20"}))

    def _domain_cap(sf_dir):
        import pyarrow as _pa

        from lucene_ray.ops.curate import cap_per_group

        kept = cap_per_group(_docs(sf_dir), 40, group_col="source")
        t = _pa.Table.from_pandas(
            kept.select_columns(["doc_id", "source"]).to_pandas(),
            preserve_index=False)
        return t.sort_by("doc_id")

    def _decontaminate(sf_dir):
        import pyarrow as _pa

        from lucene_ray.ops.curate import benchmark_shingles, decontaminate

        def _is_bench(batch, invert=False):
            import numpy as _np

            ids = _np.asarray(batch.column("doc_id"))
            m = (ids % 50 == 0)
            return batch.filter(_pa.array(~m if invert else m))

        docs = _docs(sf_dir)
        sh = benchmark_shingles(
            docs.map_batches(_is_bench, batch_format="pyarrow"))
        train = docs.map_batches(
            lambda b: _is_bench(b, invert=True), batch_format="pyarrow")
        return _ids_table(decontaminate(train, sh, invert=True))

    def _contamination_frac(sf_dir):
        import numpy as _np
        import pyarrow as _pa

        from lucene_ray.ops.curate import benchmark_shingles, contamination_scores

        def _is_bench(batch, invert=False):
            ids = _np.asarray(batch.column("doc_id"))
            m = (ids % 50 == 0)
            return batch.filter(_pa.array(~m if invert else m))

        import ray as _ray

        docs = _docs(sf_dir)
        sh = benchmark_shingles(
            docs.map_batches(_is_bench, batch_format="pyarrow"))
        train = docs.map_batches(
            lambda b: _is_bench(b, invert=True), batch_format="pyarrow")
        out = contamination_scores(train, sh)
        t = _pa.concat_tables(
            [r for r in (_ray.get(x) for x in out.to_arrow_refs()) if len(r)])
        return t.sort_by("doc_id")

    def _score_r6(t):
        import pyarrow as _pa
        import pyarrow.compute as _pc

        s = _pc.round(_pc.cast(t.column("score"), _pa.float64()),
                      ndigits=6, round_mode="half_towards_infinity")
        return t.drop_columns(["score"]).append_column("score_r6", s)

    def _percolate(sf_dir, scored=False):
        regs = [
            ("has_join", "join"),
            ("join_and_hash", "join AND hash"),
            ("phrase_batch_window", '"batch window"'),
            ("gamma_or_scan_not_join", "scan NOT join"),
        ]
        t = percolate(_docs(sf_dir), regs, scored=scored).to_pandas()
        t = t.sort_values(["doc_id", "query"]).reset_index(drop=True)
        import pyarrow as _pa

        out = _pa.Table.from_pandas(t, preserve_index=False)
        return _score_r6(out) if scored else out

    def _percolate_1k(sf_dir):
        """Presearcher scale surface: 1,000 registered queries, of which
        only the handful whose anchor terms occur in a batch are evaluated
        (Monitor/Presearcher.java:33). Matches == _percolate's 4 real
        queries, so the same DuckDB oracle certifies it."""
        from lucene_ray.search.query import TermQuery

        regs = [(f"absent_{i}", TermQuery(f"zzzabsentterm{i}"))
                for i in range(996)]
        regs += [
            ("has_join", "join"),
            ("join_and_hash", "join AND hash"),
            ("phrase_batch_window", '"batch window"'),
            ("gamma_or_scan_not_join", "scan NOT join"),
        ]
        t = percolate(_docs(sf_dir), regs).to_pandas()
        t = t.sort_values(["doc_id", "query"]).reset_index(drop=True)
        import pyarrow as _pa

        return _pa.Table.from_pandas(t, preserve_index=False)

    return {
        # --- full-text engine (index build + query ops, SURVEY §2.5/2.7/2.9) ---
        "ft_term_hits_join": _q(lambda sf: ft.term_hits(sf, "join")),
        # NRT replication (replicator/nrt/ReplicaNode): commit point synced
        # to a replica dir (incremental, crc-verified), served from there
        "ft_term_hits_replica": _q(lambda sf: ft.replica_term_hits(sf, "join")),
        "ft_term_hits_after_delete": _q(
            lambda sf: ft.term_hits_after_delete(sf, "join")
        ),
        "ft_term_freqs_hash": _q(lambda sf: ft.term_freqs(sf, "hash")),
        "ft_bool_and_hits": _q(lambda sf: ft.bool_hits(sf, must=("join", "hash", "scan"))),
        "ft_bool_or_not_hits": _q(
            lambda sf: ft.bool_hits(sf, should=("join", "hash"), must_not=("scan",))
        ),
        "ft_bool_msm_hits": _q(
            lambda sf: ft.bool_hits(sf, should=("join", "hash", "scan"),
                                    minimum_should_match=2)
        ),
        # keyword field (StringField analog): atomic lang:en term AND a
        # content-field term, both served from the same postings
        "ft_keyword_filter": _q(
            lambda sf: ft.bool_hits(sf, must=("lang:en", "join"))
        ),
        "ft_regexp_hits": _q(lambda sf: ft.regexp_hits(sf, "jo.*n")),
        # uax29 (multilingual) grammar build path; == code grammar on the
        # pure-ASCII test corpus, so the shared-token oracle is exact
        "ft_uax29_term_hits": _q(lambda sf: ft.uax29_term_hits(sf, "join")),
        # WB6/7 + WB11/12 joiner rules over a derived joiner-bearing corpus
        # ("join" -> " o'join ", "scan" -> " 3.14 "): the probe terms exist
        # ONLY if the joiners hold; the split fragments must hit nothing
        "ft_uax29_joiner_hits": _q(ft.uax29_joiner_hits),
        # Viterbi costed-lattice dict segmentation over the injected 東京都
        # ambiguity: 京都/東 hit (min-cost path), 東京/都 (the MaxMatch
        # segmentation) must contribute NO rows
        "ft_dict_viterbi_hits": _q(ft.dict_viterbi_hits),
        # dictionary decompounding ('hash' -> ' donaudampfschiff ' with the
        # 3-morpheme dictionary): subwords injected at the compound's
        # position, original kept
        "ft_decompound_hits": _q(ft.decompound_hits),
        # leading wildcard *qzx as PrefixQuery('xzq…') over the
        # ReverseStringFilter mirror index ('scan' -> ' wunderqzx ')
        "ft_suffix_wildcard_hits": _q(ft.suffix_wildcard_hits),
        # index-time multi-word synonym ('new york' -> 'ny', flattened):
        # contraction term + still-matching source phrase
        "ft_phrase_synonym_hits": _q(ft.phrase_synonym_hits),
        # Arabic light10 pack ('hash' -> ' الكتاب '): the bare stem كتاب
        # hits exactly the injected docs (normalize + article strip)
        "ft_arabic_stem_hits": _q(ft.arabic_stem_hits),
        # GermanLightStemmer pack end-to-end (golden-verified stemmer;
        # injected 'häusern' must index as the bare stem 'haus')
        "ft_german_light_hits": _q(ft.german_light_stem_hits),
        # full-RSLP Portuguese pack end-to-end ('balões' -> 'bal')
        "ft_rslp_stem_hits": _q(ft.rslp_stem_hits),
        # CommonGrams: 'the_fast' one-term lookup == adjacent pair oracle
        "ft_common_grams_hits": _q(ft.common_grams_hits),
        # CJK bigram grammar (CJKBigramFilter) over a derived han-run twin
        # of the corpus; tf of one interior bigram == substring count of
        # the ASCII source token, replayed exactly in SQL
        "ft_cjk_bigram_hits": _q(lambda sf: ft.cjk_bigram_tf(sf, "本語")),
        # ICU-style Unicode folding: accented injected tokens ('Jöín') must
        # fold back to their ASCII source or the tf oracle breaks
        "ft_folded_hits": _q(lambda sf: ft.folded_tf(sf, "join")),
        "ft_suggest_s": _q(lambda sf: ft.suggest_terms(sf, "s", 10)),
        # infix suggester (AnalyzingInfixSuggester: match anywhere)
        "ft_suggest_infix": _q(lambda sf: ft.suggest_infix(sf, "er", 10)),
        # MoreLikeThis: top tf*idf terms of doc 7 OR'd into a query
        "ft_mlt_hits": _q(ft.mlt_hits),
        # FreeTextSuggester: bigram-LM continuation of prefix 's' after
        # context token 'hash', stupid-backoff (ALPHA=0.4) to the unigram
        "ft_suggest_freetext": _q(
            lambda sf: ft.freetext_suggest(sf, "hash", "s", 10)),
        "ft_spell_joib": _q(lambda sf: ft.spell_correct(sf, "joib", 2, 5)),
        # (ft_spellcheck below exercises the same DirectSpellChecker
        # comparator on an input that IS a dictionary term, proving the
        # self-exclusion + dist-tie ranking)
        # span family (queries/spans): position algebra surfaces
        "ft_span_first_hits": _q(lambda sf: ft.span_first_hits(sf, "join", 10)),
        "ft_span_near_hits": _q(
            lambda sf: ft.span_near_hits(sf, ["batch", "window"], slop=2)
        ),
        "ft_span_near_unordered": _q(
            lambda sf: ft.span_near_hits(sf, ["batch", "window"], slop=2,
                                         in_order=False)
        ),
        "ft_span_not_hits": _q(lambda sf: ft.span_not_hits(sf, "scan", "join")),
        # ContextSuggestField: completions ranked by in-context doc count
        "ft_suggest_context": _q(
            lambda sf: ft.suggest_terms_in_context(sf, "s", "lang", "fr", 10)
        ),
        # ComplexPhraseQueryParser: phrase with embedded wildcard + group
        "ft_complex_phrase_hits": _q(
            lambda sf: ft.complex_phrase_hits(sf, "(scan table) val*", slop=1)
        ),
        # surround parser (queryparser/surround): W/N distance ops with
        # numeric prefix (slop = distance-1), prefix + infix forms,
        # truncation expanding to span-OR, boolean composition
        "ft_surround_w_hits": _q(
            lambda sf: ft.surround_hits(sf, "3W(table, value)")
        ),
        "ft_surround_n_hits": _q(lambda sf: ft.surround_hits(sf, "scan N row")),
        "ft_surround_trunc_hits": _q(
            lambda sf: ft.surround_hits(sf, "2w(tab*, value)")
        ),
        "ft_surround_bool_hits": _q(
            lambda sf: ft.surround_hits(sf, "and(join, or(hash, merge))")
        ),
        # DisjunctionMaxQuery: union hit set (exact), scored top-k rows-only
        "ft_dismax_hits": _q(lambda sf: ft.dismax_hits(sf, ["join", "hash"], 0.3)),
        "ft_dismax_top10": _q(
            lambda sf: _score_r6(ft.dismax_topk(sf, ["join", "hash"], 0.1))
        ),
        # CommonTermsQuery (queries/CommonTermsQuery.java): df-classified
        # terms — rare terms gate the hit set, common terms only boost;
        # all-common degenerates to a conjunction. Hit sets exact; top-k
        # float32-exact (clause-ordered fold).
        "ft_common_terms_hits": _q(
            lambda sf: ft.common_terms_hits(sf, ["join", "batch", "dup"], 0.5)
        ),
        "ft_common_terms_conj_hits": _q(
            lambda sf: ft.common_terms_hits(sf, ["join", "batch"], 0.5)
        ),
        "ft_common_terms_top10": _q(
            lambda sf: _score_r6(
                ft.common_terms_topk(sf, ["join", "batch", "dup"], 0.5, 10)
            )
        ),
        # SynonymQuery (core/search): blended-term scoring — similarity
        # fires once per doc with freq = sum of per-term freqs, pseudo-term
        # stats df = max / ttf = sum. Hit set AND float32 top-k both exact.
        "ft_synonym_query_hits": _q(
            lambda sf: ft.synonym_hits(sf, ["hash", "merge"])
        ),
        "ft_synonym_query_top10": _q(
            lambda sf: _score_r6(ft.synonym_topk(sf, ["hash", "merge"]))
        ),
        # FeatureField (core/document): static-feature score function over a
        # numeric doc-values column as a SHOULD clause — w*ln(scaling + S)
        # added to the BM25 term score (float32-exact)
        "ft_feature_log_top10": _q(
            lambda sf: _score_r6(
                ft.feature_bool_topk(sf, "join", "n_chars", "log", 0.5, 1.0)
            )
        ),
        # TermInSetQuery (core/search): constant-score terms-dict set filter
        "ft_term_in_set_hits": _q(
            lambda sf: ft.term_in_set_hits(sf, ["dup", "bloom", "window"])
        ),
        # DiversifiedTopDocsCollector (misc/search): BM25 top-k with at most
        # N hits per key — per-segment constrained partials, driver re-merge
        "ft_diversified_top10": _q(
            lambda sf: _score_r6(ft.diversified_topk(sf, "join", "lang", 10, 2))
        ),
        # SimpleQueryParser (queryparser/simple): error-tolerant human
        # syntax — '+' AND, '|' OR, '-' NOT, phrases, prefix, precedence
        "ft_simple_query_hits": _q(
            lambda sf: ft.simple_query_hits(sf, "join + (hash | scan) + -merge")
        ),
        "ft_simple_query_mixed_hits": _q(
            lambda sf: ft.simple_query_hits(sf, '"batch window" | cust*')
        ),
        # numeric doc-values: range query, range+term filter, range facets
        # updateNumericDocValue: n_chars zeroed for lang='fr' docs via a
        # dv-update generation; range query reads the overlay and bypasses
        # the now-stale zone maps
        "ft_numeric_range_dv_update": _q(
            lambda sf: ft.numeric_range_after_dv_update(sf, 200, 400)
        ),
        "ft_numeric_range_hits": _q(
            lambda sf: ft.numeric_range_hits(sf, "n_chars", 200, 400)
        ),
        "ft_term_numeric_filter": _q(
            lambda sf: ft.numeric_range_hits(sf, "n_chars", 200, 400, term="join")
        ),
        "ft_facet_nchars_ranges": _q(
            lambda sf: ft.facet_numeric_ranges(sf, "join", "n_chars", [0, 200, 400])
        ),
        # equi-weight dynamic ranges (DynamicRangeUtil, unit weights)
        "ft_facet_dynamic_ranges": _q(
            lambda sf: ft.facet_dynamic_ranges(sf, "merge", "n_chars", 5)
        ),
        "ft_numeric_set_hits": _q(
            lambda sf: ft.numeric_set_hits(sf, "n_chars", [250, 301, 999])
        ),
        # classic-parser range syntax end-to-end (field:[a TO b])
        "ft_parsed_range_hits": _q(
            lambda sf: ft.parsed_hits(sf, "join AND n_chars:[200 TO 400]")
        ),
        # query-time Sort(SortField(n_chars, reverse)) — exact
        "ft_sort_by_field_top10": _q(
            lambda sf: ft.sort_by_field_topk(sf, "join", "n_chars", 10)
        ),
        # TotalHitCountCollector surface — exact
        "ft_count_join_or_hash": _q(lambda sf: ft.hit_count(sf, "join OR hash")),
        # grouping module: top-2 per lang by BM25 (rows-only, float32 scores)
        "ft_grouped_bm25_by_lang": _q(
            lambda sf: _score_r6(ft.grouped_bm25_topk(sf, "join", "lang", 2))
        ),
        # scoreless FILTER clause (Occur.FILTER): ranking from the scoring
        # clause only — rows-only scored surface
        "ft_filtered_bm25_top10": _q(
            lambda sf: _score_r6(
                ft.filtered_bm25_topk(sf, "customer", "n_chars", 200, 500))
        ),
        # term vectors (IndexReader.getTermVector)
        "ft_term_vector_doc7": _q(lambda sf: ft.term_vector(sf, 7)),
        "ft_phrase_hits": _q(lambda sf: ft.phrase_hits(sf, ["batch", "window"])),
        # MultiPhraseQuery: alternatives per position + phrase-prefix
        "ft_multi_phrase_hits": _q(
            lambda sf: ft.multi_phrase_hits(sf, [("hash", "merge"), ("join",)])
        ),
        "ft_phrase_prefix_hits": _q(
            lambda sf: ft.phrase_prefix_hits(sf, ["batch"], "win")
        ),
        # CommonTermsQuery rewrite: rare terms required, common demoted
        "ft_common_terms_hits": _q(
            lambda sf: ft.common_terms_hits(sf, ["the", "dup"], 0.4)
        ),
        "ft_common_terms_all_common": _q(
            lambda sf: ft.common_terms_hits(sf, ["the", "join"], 0.4)
        ),
        "ft_phrase_slop_hits": _q(
            lambda sf: ft.phrase_hits(sf, ["batch", "window"], slop=3)
        ),
        "ft_prefix_hits": _q(lambda sf: ft.prefix_hits(sf, "cust")),
        "ft_wildcard_hits": _q(lambda sf: ft.wildcard_hits(sf, "s?an")),
        "ft_fuzzy_hits": _q(lambda sf: ft.fuzzy_hits(sf, "joib", 1)),
        "ft_range_hits": _q(lambda sf: ft.range_hits(sf, "filter", "hash")),
        "ft_doc_freq_top20": _q(lambda sf: ft.doc_freq_topk(sf, 20)),
        "ft_collection_stats": _q(ft.collection_stats),
        "ft_bm25_top10_customer": _q(
            lambda sf: _score_r6(ft.bm25_topk(sf, "customer", 10))
        ),
        "ft_bm25_top10_bool": _q(
            lambda sf: _score_r6(ft.bm25_topk(sf, "join AND vector", 10))
        ),
        # XML query syntax (queryparser/xml CoreParser element set)
        "ft_xml_query_hits": _q(lambda sf: ft.xml_query_hits(sf, (
            '<BooleanQuery>'
            '<Clause occurs="must"><TermQuery>Join</TermQuery></Clause>'
            '<Clause occurs="mustNot"><TermQuery>scan</TermQuery></Clause>'
            '<Clause occurs="filter"><PointRangeQuery fieldName="n_chars" '
            'lowerTerm="200" upperTerm="900"/></Clause>'
            '</BooleanQuery>'
        ))),
        # non-default Similarities through the seam, served by the pool
        # (scorers ship in the plan): DFR InB2 + Axiomatic F2EXP
        "ft_dfr_top10": _q(
            lambda sf: _score_r6(ft.similarity_topk(sf, "customer", "dfr_inb2"))
        ),
        "ft_axiomatic_top10": _q(
            lambda sf: _score_r6(
                ft.similarity_topk(sf, "customer", "axiomatic_f2exp"))
        ),
        "ft_dfi_top10": _q(
            lambda sf: _score_r6(ft.similarity_topk(sf, "customer",
                                                    "dfi_chi2"))
        ),
        "ft_ib_top10": _q(
            lambda sf: _score_r6(ft.similarity_topk(sf, "customer",
                                                    "ib_ll_df_h1"))
        ),
        "ft_multisim_top10": _q(
            lambda sf: _score_r6(ft.similarity_topk(sf, "customer",
                                                    "multi_rawtf_ib"))
        ),
        "ft_rawtf_top10": _q(
            lambda sf: _score_r6(ft.similarity_topk(sf, "customer",
                                                    "raw_tf"))
        ),
        # round-5 similarity grid: one float32-exact oracle per family
        # axis (DFR basic models x after-effects x normalizations, IB
        # SPL+TTF, Axiomatic variants, IndriDirichlet)
        "ft_dfr_g_top10": _q(
            lambda sf: _score_r6(ft.similarity_topk(sf, "customer",
                                                    "dfr_g_l_h1"))
        ),
        "ft_dfr_ine_top10": _q(
            lambda sf: _score_r6(ft.similarity_topk(sf, "customer",
                                                    "dfr_ine_b_h2"))
        ),
        "ft_dfr_ifz_top10": _q(
            lambda sf: _score_r6(ft.similarity_topk(sf, "customer",
                                                    "dfr_if_b_z"))
        ),
        "ft_dfr_h3_top10": _q(
            lambda sf: _score_r6(ft.similarity_topk(sf, "customer",
                                                    "dfr_in_l_h3"))
        ),
        "ft_ib_spl_top10": _q(
            lambda sf: _score_r6(ft.similarity_topk(sf, "customer",
                                                    "ib_spl_ttf_h2"))
        ),
        "ft_axiomatic_f1exp_top10": _q(
            lambda sf: _score_r6(ft.similarity_topk(sf, "customer",
                                                    "axiomatic_f1exp"))
        ),
        "ft_axiomatic_f1log_top10": _q(
            lambda sf: _score_r6(ft.similarity_topk(sf, "customer",
                                                    "axiomatic_f1log"))
        ),
        "ft_axiomatic_f2log_top10": _q(
            lambda sf: _score_r6(ft.similarity_topk(sf, "customer",
                                                    "axiomatic_f2log"))
        ),
        "ft_axiomatic_f3exp_top10": _q(
            lambda sf: _score_r6(ft.similarity_topk(sf, "customer",
                                                    "axiomatic_f3exp"))
        ),
        "ft_axiomatic_f3log_top10": _q(
            lambda sf: _score_r6(ft.similarity_topk(sf, "customer",
                                                    "axiomatic_f3log"))
        ),
        "ft_indri_top10": _q(
            lambda sf: _score_r6(ft.similarity_topk(sf, "customer",
                                                    "indri_dirichlet"))
        ),
        # bigram shingles (ShingleFilter): phrase-as-single-term lookup
        "ft_shingle_hits": _q(
            lambda sf: ft.shingle_term_hits(sf, "batch window")
        ),
        # WordBreakSpellChecker: split/join did-you-mean over the term dict
        "ft_word_break": _q(lambda sf: ft.word_break_suggest(sf, "batchwindow")),
        "ft_word_combine": _q(
            lambda sf: ft.word_combine_suggest(sf, ["win", "dow", "val", "ue"])
        ),
        # char filter (HTMLStripCharFilter + correctOffset): the decorated
        # column strips back to the plain text exactly, so hits must equal
        # the plain tokenization's hits
        "ft_html_term_hits": _q(lambda sf: ft.html_term_hits(sf, "table")),
        # pattern grammar (PatternTokenizer): regex-match tokens
        "ft_pattern_term_hits": _q(lambda sf: ft.pattern_term_hits(sf, "merge")),
        # --- multi-field text (IndexConfig.text_cols — TextField analog) ---
        # hit set across (text, head): 'sl' is a boundary-CUT head token, so
        # it can ONLY match via the head field — the oracle genuinely
        # exercises the second field's postings
        "ft_multifield_hits": _q(
            lambda sf: ft.multifield_hits(sf, ["vector", "sl"])
        ),
        # scored top-10 in the HEAD field: per-field norms + avgdl,
        # float32-exact in SQL (_bm25_head_cte)
        "ft_textfield_top10": _q(
            lambda sf: _score_r6(ft.textfield_topk(sf, "vector", 10))
        ),
        # PerFieldSimilarityWrapper: content term scored BM25, head-field
        # term scored RawTF, one SHOULD query (per-term sim dispatch)
        "ft_perfield_sim_top10": _q(
            lambda sf: _score_r6(ft.perfield_sim_topk(sf, "vector", 10))
        ),
        # FunctionScoreQuery: scores replaced by an expression over _score
        # and doc values (queries/function surface)
        "ft_function_score_top10": _q(
            lambda sf: _score_r6(ft.function_score_topk(
                sf, "merge", "_score * 0.5 + (n_chars % 97)", 10))
        ),
        # --- dedup family ---
        "dedup_exact": _q(lambda sf: dedup.exact_dedup(_docs(sf))),
        "dedup_minhash_pairs": _q(
            lambda sf: dedup.minhash_lsh_pairs(_docs(sf), jaccard_threshold=0.5)
        ),
        # EXACT n-gram Jaccard via prefix filtering (SSJoin/PPJoin) — the
        # oracle-checkable sibling of the MinHash estimate
        # substring-duplication profile (Lee et al. dedup shape at shingle
        # granularity): fraction of a doc's distinct 3-gram shingles found
        # in >= 2 distinct docs
        "dedup_substring_stats": _q(
            lambda sf: dedup.substring_dup_stats(_docs(sf), k=3)
        ),
        "dedup_ngram_jaccard": _q(
            lambda sf: dedup.ngram_jaccard_pairs(_docs(sf), threshold=0.5)
        ),
        # duplicate CLUSTERS (connected components of the exact-Jaccard pair
        # graph, cluster_id = min member) — the keep-one-per-cluster step
        "dedup_ngram_clusters": _q(
            lambda sf: dedup.ngram_jaccard_clusters(_docs(sf), threshold=0.5)
        ),
        "dedup_simhash_sigs": _q(lambda sf: dedup.simhash_signatures(_docs(sf))),
        "dedup_simhash_pairs": _q(lambda sf: dedup.simhash_pairs(_docs(sf))),
        # exact block-pair path — verifiable against a DuckDB cross join
        "dedup_embedding_pairs": _q(
            lambda sf: dedup.embedding_near_dup(_emb(sf), threshold=0.45)
        ),
        # hyperplane-LSH bucketed path (the approximate 100-TB shape)
        "dedup_embedding_pairs_lsh": _q(
            lambda sf: dedup.embedding_near_dup(_emb(sf), threshold=0.45, method="lsh")
        ),
        "dedup_embedding_clusters": _q(
            lambda sf: dedup.embedding_near_dup_clusters(_emb(sf), threshold=0.45)
        ),
        # flagship composition: quality filter -> exact dedup -> near-dup
        # cluster prune, streaming end-to-end (pipelines/prepare.py)
        "pipeline_prepare_corpus": _q(
            lambda sf: prepare_corpus(_docs(sf))
        ),
        # --- text analysis ---
        "text_token_stats": _q(lambda sf: text.doc_token_stats(_docs(sf))),
        "text_wdf_token_stats": _q(
            lambda sf: text.doc_token_stats(_wdf_decorated(sf),
                                            grammar="word_delimiter")
        ),
        # CCNet-style LM quality scoring: mean Laplace-smoothed unigram
        # log-prob under a reference-subcorpus (lang='en') model
        "text_lm_quality": _q(lambda sf: text.unigram_lm_score(_docs(sf))),
        "text_quality": _q(lambda sf: text.quality_score(_docs(sf))),
        "text_langid": _q(lambda sf: text.lang_id(_docs(sf))),
        "text_bpe_token_count": _q(lambda sf: text.bpe_token_count(_docs(sf))),
        # tumbling-window top-k entities by event count (daily windows)
        "events_windowed_top3": _q(
            lambda sf: __import__(
                "lucene_ray.ops.windows", fromlist=["windowed_topk"]
            ).windowed_topk(ray.data.read_parquet(f"{sf}/events.parquet"),
                            86_400_000_000, k=3)
        ),
        # weekly cohort retention triangle (distinct users per cohort/offset)
        "events_retention": _q(
            lambda sf: __import__(
                "lucene_ray.ops.windows", fromlist=["retention"]
            ).retention(ray.data.read_parquet(f"{sf}/events.parquet"))
        ),
        # ordered funnel: greedy earliest-match per step, strict ts ordering
        "events_funnel_depths": _q(
            lambda sf: __import__(
                "lucene_ray.ops.windows", fromlist=["funnel"]
            ).funnel(ray.data.read_parquet(f"{sf}/events.parquet"),
                     ["view", "click", "purchase"])
        ),
        # quality-aware token-budget selection: best docs by unique-token
        # ratio until the cumulative token budget is crossed
        "curate_token_budget": _q(
            lambda sf: __import__(
                "lucene_ray.ops.curate", fromlist=["select_token_budget"]
            ).select_token_budget(_docs(sf), 20_000)
        ),
        # per-GROUP token budgets (domain mixture: "x tokens of en, y of de")
        "curate_token_budget_grouped": _q(
            lambda sf: __import__(
                "lucene_ray.ops.curate",
                fromlist=["select_token_budget_grouped"]
            ).select_token_budget_grouped(
                _docs(sf), {"en": 8000, "de": 4000}, "lang")
        ),
        # graded contamination fraction per train doc vs the benchmark
        # shingle set (same benchmark split as curate_decontaminate)
        "curate_contamination_frac": _q(
            lambda sf: _contamination_frac(sf)
        ),
        # PII scrubbing: emails/IPv4s/phones -> typed placeholders, one RE2
        # pass per class (deterministically planted from doc_id — the test
        # corpus has no organic PII; the oracle replays decoration + chain)
        "text_redact_pii": _q(lambda sf: text.redact_pii(_docs(sf))),
        # GPT-style sequence packing: concat token streams in doc_id order,
        # chunk into 128-token sequences; one row per (sequence, doc) overlap
        # with doc-local spans. Two passes, no shuffle, per-partition bases.
        "pack_sequences": _q(
            lambda sf: packing.pack_concat_chunks(sf + "/documents.parquet", 128)
        ),
        "pack_sequence_stats": _q(
            lambda sf: packing.pack_stats(sf + "/documents.parquet", 128)
        ),
        # greedy no-split packing: docs fill a sequence until the next one
        # would overflow (oversize docs truncated to seq_len)
        "pack_greedy": _q(
            lambda sf: packing.pack_greedy(sf + "/documents.parquet", 128)
        ),
        # association facets: per-label SUM/MAX of a per-doc value over the
        # matching docs (TaxonomyFacetIntAssociations)
        "ft_facet_assoc": _q(
            lambda sf: ft.facet_associations(sf, "join", "lang", "n_chars")
        ),
        # Gopher/C4-style quality heuristics (ops/quality.py): integer-exact
        # per-doc counters and the integer-space keep filter — one streaming
        # map_batches each, bit-exact against the DuckDB oracle
        "quality_gopher_metrics": _q(
            lambda sf: qual.quality_metrics(_docs(sf)).select_columns(
                ["doc_id", "n_words", "sum_wlen", "n_alpha_words",
                 "n_symbols", "n_lines", "n_bullet_lines",
                 "n_ellipsis_lines", "stop_hits", "n_distinct_lines",
                 "top2_num", "top2_den"]
            )
        ),
        "quality_gopher_keep": _q(
            lambda sf: qual.quality_filter(
                # corpus-tuned bounds (synthetic docs have ~1 stopword and
                # ~55 words median); oracle twin hard-codes the same numbers
                _docs(sf),
                thresholds=qual.QualityThresholds(min_words=30, min_stop_hits=1),
            ).select_columns(["doc_id"])
        ),
        "ft_facet_lang": _q(lambda sf: ft.facet_counts(sf, "join", "lang")),
        # facet module: DrillDownQuery + DrillSideways over keyword dims
        "ft_drilldown_source": _q(
            lambda sf: drill_down(sf, "join", {"lang": "en"}, "source")
        ),
        "ft_drillsideways": _q(
            lambda sf: drill_sideways(sf, "join", {"lang": "en"},
                                      ("lang", "source"))
        ),
        "ft_snippet_join": _q(lambda sf: ft.snippet_first_occurrence(sf, "join")),
        # JoinUtil score modes (None and Max both exact-SQL: max over
        # float32 child scores is order-independent)
        "ft_join_parent_counts": _q(
            lambda sf: join_to_parent(sf, "join", "lang", score_mode="none")
        ),
        "ft_join_parent_scored": _q(
            lambda sf: join_to_parent(sf, "join", "lang", score_mode="max")
        ),
        # index-time doc blocks (addDocuments) + ToParentBlockJoinQuery
        "ft_blockjoin_counts": _q(
            lambda sf: block_join(sf, "merge", "count")
        ),
        # inverse block join: parents (block-LAST docs) matching the query
        # expand to their blocks' child docs (ToChildBlockJoinQuery.java:35)
        "ft_blockjoin_children": _q(
            lambda sf: __import__(
                "lucene_ray.pipelines.joins", fromlist=["block_join_children"]
            ).block_join_children(sf, "merge")
        ),
        # per-doc minimum-should-match from a doc-values formula
        # (sandbox CoveringQuery.java:47 LongValuesSource)
        "ft_covering_hits": _q(
            lambda sf: ft.covering_hits(sf, ["merge", "sort", "join"],
                                        "1 + (n_chars % 3)")
        ),
        "ft_blockjoin_scored": _q(
            lambda sf: block_join(sf, "merge", "avg")
        ),
        # analysis chain (token_filters): index-time synonym injection means
        # querying 'fast' also hits docs containing only 'slow'
        "ft_synonym_hits": _q(lambda sf: ft.analyzed_hits(sf, "fast")),
        # Porter stemming both sides: 'customer' analyzes to 'custom' on the
        # query AND build side (equivalence class on this vocab = itself)
        "ft_stemmed_hits": _q(lambda sf: ft.analyzed_hits(sf, "customer")),
        # edge-ngram autocomplete: typed prefix as one TermQuery against the
        # gram-expanded index == PrefixQuery hit set (min<=len(prefix)<=max)
        "ft_autocomplete_hits": _q(lambda sf: ft.autocomplete_hits(sf, "cust")),
        # language pack (analysis zoo): EnglishAnalyzer shape — stopwords +
        # minimal s-stemmer both sides, so 'customers' matches 'customer' docs
        "ft_lang_en_hits": _q(lambda sf: ft.lang_pack_hits(sf, "customers", "en")),
        # MoreLikeThis (queries/mlt): deterministic tf*idf term selection,
        # exact hit set of the expanded OR query, float32-exact scored top-k
        "mlt_terms_doc7": _q(lambda sf: mlt.interesting_terms(sf, 7)),
        "mlt_hits_doc7": _q(lambda sf: mlt.more_like_this_hits(sf, 7)),
        "mlt_top10_doc7": _q(
            lambda sf: _score_r6(mlt.more_like_this_topk(sf, 7, 10))
        ),
        # expressions module: sort-by-formula (exact) + score-by-formula
        "ft_expr_topk": _q(
            lambda sf: expression_topk(sf, "ln(length + 1) + (doc_id % 7) * 0.01", 10)
        ),
        "ft_expr_rescore_join": _q(
            lambda sf: expression_rescore(sf, "join", "_score * 0.5 + ln(length + 1)", 10)
        ),
        # percolator: standing queries vs the document stream
        "percolate_matches": _q(_percolate),
        # scored percolation: one-doc BM25 per match (Monitor ScoringMatch
        # via MemoryIndex semantics — N=1/df=1, norm-independent, so the
        # float32 scores are SQL-exact)
        "percolate_scored": _q(lambda sf: _percolate(sf, scored=True)),
        "percolate_1k_queries": _q(_percolate_1k),
        # shingle/ngram analysis family
        "text_shingle_top20": _q(lambda sf: shingles.shingle_counts(_docs(sf), 2, 20)),
        "text_shingle_profile": _q(lambda sf: shingles.doc_shingle_sets(_docs(sf), 2)),
        # multimodal plumbing (deterministic stub decoder; schema/actor real)
        "mm_decode_images": _q(
            lambda sf: mm.decode_images(
                ray.data.from_arrow(mm.make_fake_media_table(200))
            )
        ),
        "mm_frame_sample": _q(
            lambda sf: mm.sample_frames(
                ray.data.from_arrow(mm.make_fake_media_table(100, kind="video")),
                frames_per_clip=4,
            )
        ),
        # REAL pure-numpy codecs: PPM decode/resize/features, WAV features
        "mm_decode_ppm": _q(
            lambda sf: mm.decode_images(
                ray.data.from_arrow(mm.make_ppm_media_table(200))
            )
        ),
        "mm_decode_wav": _q(
            lambda sf: mm.decode_audio(
                ray.data.from_arrow(mm.make_wav_media_table(200))
            )
        ),
        # --- similarity search ---
        "ann_cosine_top10": _q(_ann),
        # corpus clustering (spherical k-means, deterministic seeded init;
        # iterative — no SQL twin, validated by tests/test_cluster.py)
        "ann_cluster_embeddings": _q(
            lambda sf: ann.cluster_embeddings(_emb(sf), n_clusters=8)
        ),
        "ann_ivf_top10": _q(_ann_ivf),
        # product quantization (Jegou et al. TPAMI 2011): ADC scan over
        # M-byte codes + exact float rescore; rows-only (recall-oracle
        # pytest covers accuracy, as for IVF/HNSW)
        "ann_pq_top10": _q(_ann_pq),
        # binary quantization (sign bits around the centroid, 32x smaller
        # scan, Hamming candidates + exact float rescore)
        "ann_binary_top10": _q(_ann_binary),
        "ann_int4_top10": _q(_ann_int4),
        # IVF-PQ: coarse bucket pruning + M-byte ADC scan + exact rescore
        # from the probed buckets only (rows-only: nprobe makes the hit set
        # approximate in general; recall asserted by pytest)
        "ann_ivfpq_top10": _q(_ann_ivfpq),
        "ann_hnsw_top10": _q(_ann_hnsw),
        # --- relational operators over the TPC-H-ish tables ---
        "agg_lineitem_pricing": _q(rel.lineitem_pricing_summary),
        "join_orders_per_nation": _q(rel.orders_per_nation),
        "sort_top_orders": _q(rel.top_orders),
        "events_tumbling_daily": _q(rel.events_tumbling_daily),
        # --- temporal/windowed custom operators (ops/windows.py) ---
        "events_sessions": _q(rel.events_sessions),
        "events_asof_purchase_click": _q(rel.events_asof_purchase_click),
        "events_signup_followups": _q(rel.events_signup_followups),
        "events_top_users": _q(rel.top_users_by_events),
        "events_distinct_users_per_type": _q(rel.distinct_users_per_type),
        # mergeable per-group HLL (approximate distinct users per type;
        # deterministic sketch, rows-only)
        "events_approx_users_per_type": _q(
            lambda sf: sketch.approx_distinct_grouped(
                ray.data.read_parquet(f"{sf}/events.parquet"),
                "event_type", "user_id",
            )
        ),
        # exact discrete quantiles via bounded value-histogram shuffle
        "events_value_quantiles": _q(
            lambda sf: quantiles.value_quantiles(
                ray.data.read_parquet(f"{sf}/events.parquet"), "value"
            )
        ),
        "events_median_by_type": _q(
            lambda sf: quantiles.grouped_value_quantiles(
                ray.data.read_parquet(f"{sf}/events.parquet"),
                "event_type", "value", q=0.5,
            )
        ),
        "events_session_windows": _q(session_windows),
        "events_sliding_counts": _q(sliding_window_counts),
        # large-large shuffle join (neither side broadcast)
        "join_order_revenue": _q(order_revenue),
        # TPC-H Q5 shape: two chained LARGE-LARGE hash joins + broadcast
        # supplier lookup + local-supplier predicate + per-nation sums
        "join_q5_local_supplier": _q(local_supplier_volume),
        # offsets-consuming highlighter (fragment around first occurrence)
        "ft_highlight_join": _q(lambda sf: highlight_first(sf, "join", width=20)),
        # mergeable-sketch approximate distinct (HyperLogLog, deterministic)
        "text_approx_distinct_tokens": _q(
            lambda sf: sketch.approx_distinct_tokens(_docs(sf))
        ),
        "part_price_stats": _q(rel.supplier_part_stats),
        "distinct_order_priorities": _q(rel.distinct_order_priorities),
        "grouped_topk_orders": _q(rel.grouped_topk_orders),
        "sampled_avg_quantity": _q(rel.sampled_avg_quantity),
        "filter_high_value_orders": _q(rel.filter_high_value_orders),
        # --- corpus curation (training-data pipeline ops) ---
        "curate_sample_hash": _q(_sample_hash),
        # per-domain cap (RefinedWeb-style): deterministic n smallest
        # fmix32(doc_id) per source, exact window-function twin
        "curate_domain_cap": _q(_domain_cap),
        "curate_sample_stratified": _q(_sample_stratified),
        "curate_decontaminate": _q(_decontaminate),
        # --- geo (LatLonPoint family over derived customer points) ---
        "geo_box_hits": _q(geo_pipe.geo_box_hits),
        "geo_distance_hits": _q(geo_pipe.geo_distance_hits),
        "geo_knn_top10": _q(geo_pipe.geo_knn_top10),
        # LatLonPoint.newPolygonQuery: non-convex chevron, even-odd crossing
        "geo_polygon_hits": _q(geo_pipe.geo_polygon_hits),
        # LatLonPoint.newDistanceFeatureQuery: boost*pivot/(pivot+distance)
        "geo_distance_feature_top10": _q(geo_pipe.geo_distance_feature_top10),
        # indexed shapes (LatLonShape.newBoxQuery): segment INTERSECTS /
        # every-tessellation-triangle WITHIN over derived per-doc geometry
        "geo_shape_intersects_hits": _q(geo_pipe.geo_shape_intersects_hits),
        "geo_shape_within_hits": _q(geo_pipe.geo_shape_within_hits),
        # LatLonShape.newPolygonQuery INTERSECTS over segment tessellations
        "geo_shape_polygon_hits": _q(geo_pipe.geo_shape_polygon_hits),
        # --- intervals (minimal-interval queries, intervals/IntervalQuery) ---
        "ft_interval_ordered_hits": _q(
            lambda sf: ft.interval_ordered_hits(sf, ["table", "row", "filter"])
        ),
        "ft_interval_maxgaps": _q(
            lambda sf: ft.interval_ordered_hits(sf, ["table", "row", "filter"],
                                                max_gaps=2)
        ),
        "ft_interval_unordered_hits": _q(
            lambda sf: ft.interval_unordered_hits(sf, ["window", "batch"],
                                                  max_gaps=1)
        ),
        "ft_interval_containing_hits": _q(
            lambda sf: ft.interval_containing_hits(sf, ["table", "filter"], "row")
        ),
        # --- hierarchical taxonomy facets (facet/taxonomy) ---
        "ft_facet_path_top": _q(lambda sf: ft.facet_path_counts(sf, "join")),
        "ft_drilldown_path_hits": _q(
            lambda sf: ft.drilldown_path_hits(sf, "join", "src3/en")
        ),
        # --- passage highlighter (uhighlight.UnifiedHighlighter shape) ---
        "ft_passages_top": _q(
            lambda sf: passages_top(sf, ["join", "hash"], window=32, n_passages=2)
        ),
        # BM25-weighted passages (PassageScorer.java:63-104, float32-exact;
        # token-unit adaptation documented in highlight.passages_bm25)
        "ft_passages_bm25": _q(
            lambda sf: __import__(
                "lucene_ray.pipelines.highlight",
                fromlist=["passages_bm25"]).passages_bm25(
                    sf, ["join", "hash"], window=32, n_passages=2)
        ),
        # --- per-position payloads (DelimitedPayloadTokenFilter +
        # PayloadScoreQuery with Sum/Max payload functions — queries/
        # payloads/PayloadScoreQuery.java): derived corpus annotates token
        # at position p as tok|((p*31+len)%101); the index stores one vbyte
        # payload per posting position (pay_enc stream) ---
        "ft_payload_sum": _q(lambda sf: ft.payload_term_scores(sf, "spark", "sum")),
        "ft_payload_max": _q(lambda sf: ft.payload_term_scores(sf, "spark", "max")),
        # --- fuzzy suggester (suggest/analyzing.FuzzySuggester shape) ---
        "ft_suggest_fuzzy": _q(lambda sf: ft.suggest_fuzzy(sf, "hach", 10, 1)),
        # --- did-you-mean (suggest/spell.DirectSpellChecker shape) ---
        "ft_spellcheck": _q(lambda sf: ft.spell_correct(sf, "par", 2, 5)),
        # --- classification module (SimpleNaiveBayesClassifier analog):
        # train on 80% of documents, predict lang of the held-out 20% ---
        "classify_nb_lang": _q(_classify_nb),
        # kNN classifier (KNearestNeighborClassifier.java:52): MLT top-10
        # neighbors -> per-class boost = sum(score/maxScore), /sumdoc
        "classify_knn_doc7": _q(
            lambda sf: __import__(
                "lucene_ray.ops.classify", fromlist=["knn_classify"]
            ).knn_classify(sf, 7, 10)
        ),
        # QueryRescorer sugar: top-30 'join' re-scored by 'hash' at weight 2
        "rescore_query_top10": _q(
            lambda sf: _score_r6(
                __import__(
                    "lucene_ray.pipelines.rescore", fromlist=["query_rescore_topk"]
                ).query_rescore_topk(sf, "join", "hash", 2.0, 30, 10)
            )
        ),
        # --- scalar-quantized ANN (int8 scan + float rescore; rows-only:
        # recall>=0.9 + exact-rescore parity live in tests/test_ann.py) ---
        "ann_ivf_quantized_top10": _q(_ann_ivf_quantized),
    }


# Gopher-quality oracle: integer counters per document, shared by the
# metrics and keep oracles (lucene_ray/ops/quality.py is the Ray twin).
# chr(8226) = '•' (bullet), chr(1) = pair separator, chr(10) = '\n'.
_QUALITY_BASE = (
    "WITH w AS (SELECT doc_id, "
    "list_filter(regexp_split_to_array(text, '[ \\t\\n\\r]+'), "
    "x -> length(x) > 0) AS ws, "
    "string_split(text, chr(10)) AS ls, text FROM documents), "
    "base AS (SELECT doc_id, len(ws)::BIGINT AS n_words, "
    "coalesce(list_sum(list_transform(ws, x -> length(x))), 0)::BIGINT "
    "AS sum_wlen, "
    "len(list_filter(ws, x -> regexp_matches(x, '[a-zA-Z]')))::BIGINT "
    "AS n_alpha_words, "
    "((length(text) - length(replace(text, '#', ''))) + "
    "(length(text) - length(replace(text, '...', ''))) / 3)::BIGINT "
    "AS n_symbols, len(ls)::BIGINT AS n_lines, "
    "len(list_filter(ls, x -> regexp_matches(x, '^[-*' || chr(8226) || ']')"
    "))::BIGINT AS n_bullet_lines, "
    "len(list_filter(ls, x -> x LIKE '%...'))::BIGINT AS n_ellipsis_lines, "
    "len(list_intersect(list_distinct(ws), "
    "['the','be','to','of','and','that','have','with']))::BIGINT "
    "AS stop_hits, "
    "len(list_distinct(ls))::BIGINT AS n_distinct_lines FROM w), "
    "pairs AS (SELECT w.doc_id, ws[i] || chr(1) || ws[i+1] AS pair "
    "FROM w, UNNEST(range(1, len(ws))) AS t(i)), "
    "pcnt AS (SELECT doc_id, pair, count(*) AS c FROM pairs GROUP BY 1, 2), "
    "tg AS (SELECT doc_id, max(c)::BIGINT AS top2_num, "
    "sum(c)::BIGINT AS top2_den FROM pcnt GROUP BY 1), "
    "qmetrics AS (SELECT b.*, coalesce(tg.top2_num, 0)::BIGINT AS top2_num, "
    "coalesce(tg.top2_den, 0)::BIGINT AS top2_den "
    "FROM base b LEFT JOIN tg USING (doc_id)) "
)


def oracle_sql() -> dict[str, str]:
    out = {
        "ft_term_hits_join": _TOKS
        + "SELECT DISTINCT doc_id FROM toks WHERE tok = 'join' ORDER BY doc_id",
        # a synced replica must serve the primary's exact hit set
        "ft_term_hits_replica": _TOKS
        + "SELECT DISTINCT doc_id FROM toks WHERE tok = 'join' ORDER BY doc_id",
        "ft_term_hits_after_delete": _TOKS
        + "SELECT DISTINCT doc_id FROM toks WHERE tok = 'join' "
        "AND doc_id % 7 <> 0 ORDER BY doc_id",
        "ft_term_freqs_hash": _TOKS
        + "SELECT doc_id, count(*)::BIGINT AS tf FROM toks WHERE tok = 'hash' "
        "GROUP BY doc_id ORDER BY doc_id",
        "ft_bool_and_hits": _TOKS
        + "SELECT doc_id FROM toks WHERE tok IN ('join','hash','scan') "
        "GROUP BY doc_id HAVING count(DISTINCT tok) = 3 ORDER BY doc_id",
        "ft_bool_or_not_hits": _TOKS
        + "SELECT DISTINCT doc_id FROM toks WHERE tok IN ('join','hash') "
        "AND doc_id NOT IN (SELECT doc_id FROM toks WHERE tok = 'scan') "
        "ORDER BY doc_id",
        "ft_bool_msm_hits": _TOKS
        + "SELECT doc_id FROM toks WHERE tok IN ('join','hash','scan') "
        "GROUP BY doc_id HAVING count(DISTINCT tok) >= 2 ORDER BY doc_id",
        "ft_keyword_filter": _TOKS
        + "SELECT DISTINCT t.doc_id FROM toks t JOIN documents d USING (doc_id) "
        "WHERE t.tok = 'join' AND d.lang = 'en' ORDER BY doc_id",
        "ft_regexp_hits": _TOKS
        + "SELECT DISTINCT doc_id FROM toks WHERE regexp_full_match(tok, 'jo.*n') "
        "ORDER BY doc_id",
        "ft_uax29_term_hits": _TOKS
        + "SELECT DISTINCT doc_id FROM toks WHERE tok = 'join' ORDER BY doc_id",
        # joiner-bearing derived corpus (pipelines/fulltext.JOINER_SUBS):
        # an injected "o'join" / "3.14" token exists exactly where the raw
        # text contains the replaced substring; the split fragments (join /
        # scan / 14) must not exist, so they contribute NO rows
        "ft_uax29_joiner_hits": (
            "SELECT * FROM ("
            "SELECT '3.14' AS term, doc_id FROM documents "
            "WHERE contains(text, 'scan') "
            "UNION ALL "
            "SELECT 'o''join' AS term, doc_id FROM documents "
            "WHERE contains(text, 'join')"
            ") ORDER BY term, doc_id"
        ),
        # Viterbi dict grammar ('merge' -> 東京都, costed lexicon picks
        # 東|京都): both lattice terms hit the merge-containing docs, the
        # MaxMatch terms contribute nothing
        "ft_dict_viterbi_hits": (
            "SELECT * FROM ("
            "SELECT '京都' AS term, doc_id FROM documents "
            "WHERE contains(text, 'merge') "
            "UNION ALL "
            "SELECT '東' AS term, doc_id FROM documents "
            "WHERE contains(text, 'merge')"
            ") ORDER BY term, doc_id"
        ),
        # CommonGrams: docs with an adjacent (the, fast) token pair — or a
        # literal the_fast identifier (the code grammar keeps '_' in
        # tokens, so such a token is the same term the gram produces)
        "ft_common_grams_hits": (
            "WITH tl AS (SELECT doc_id, " + _TOKLIST + " AS l FROM documents) "
            "SELECT doc_id FROM tl WHERE len(list_filter("
            "generate_series(1, len(l) - 1), "
            "i -> l[i] = 'the' AND l[i+1] = 'fast')) > 0 "
            "OR list_contains(l, 'the_fast') "
            "ORDER BY doc_id"
        ),
        # Arabic pack: stem hits == 'hash'-bearing docs
        "ft_arabic_stem_hits": (
            "SELECT doc_id FROM documents WHERE contains(text, 'hash') "
            "ORDER BY doc_id"
        ),
        # de_light pack: 'häusern' injected at every 'sort' substring stems
        # to 'haus' (fold + ern strip), so the hit set IS the trigger set
        "ft_german_light_hits": (
            "SELECT doc_id FROM documents WHERE contains(text, 'sort') "
            "ORDER BY doc_id"
        ),
        # pt_rslp pack: 'balões' injected at every 'scan' substring runs
        # the full RSLP flow to 'bal'
        "ft_rslp_stem_hits": (
            "SELECT doc_id FROM documents WHERE contains(text, 'scan') "
            "ORDER BY doc_id"
        ),
        # multi-word synonym: both the contraction 'ny' and the source
        # phrase 'new york' hit exactly the 'hash'-bearing docs ('york'
        # never occurs naturally, so the adjacent pair is injection-only)
        "ft_phrase_synonym_hits": (
            "SELECT * FROM ("
            "SELECT 'ny' AS term, doc_id FROM documents "
            "WHERE contains(text, 'hash') "
            "UNION ALL "
            "SELECT 'new york' AS term, doc_id FROM documents "
            "WHERE contains(text, 'hash')"
            ") ORDER BY term, doc_id"
        ),
        # reversed mirror field: *qzx hits exactly the docs whose raw text
        # contains 'scan' (the only source of qzx-suffixed tokens)
        "ft_suffix_wildcard_hits": (
            "SELECT doc_id FROM documents WHERE contains(text, 'scan') "
            "ORDER BY doc_id"
        ),
        # dictionary decompounding: the compound token and each of its
        # three dictionary morphemes hit exactly the 'hash'-bearing docs
        "ft_decompound_hits": (
            "SELECT * FROM ("
            "SELECT t.term, d.doc_id FROM documents d CROSS JOIN (VALUES "
            "('donau'), ('dampf'), ('schiff'), ('donaudampfschiff')) "
            "t(term) WHERE contains(d.text, 'hash')"
            ") ORDER BY term, doc_id"
        ),
        # tf of the interior bigram 本語 of the injected run 日本語学
        # ('hash' -> 日本語学): exactly one per substring occurrence of
        # 'hash' — seams between adjacent injections can only produce
        # 学日/学中/人日/人中, never 本語 (see pipelines/fulltext.CJK_SUBS)
        "ft_cjk_bigram_hits": (
            "SELECT doc_id, CAST((length(text) - length(replace(text, "
            "'hash', ''))) / 4 AS BIGINT) AS tf FROM documents "
            "WHERE position('hash' IN text) > 0 ORDER BY doc_id"),
        # every 'join' substring became the accented standalone token
        # 'Jöín' (strip_accents(lower(..)) = 'join' — the same fold the
        # engine's ICUFoldingFilter performs), so tf('join') over the
        # folded index == substring count of 'join' in the raw text
        "ft_folded_hits": (
            "WITH j AS (SELECT trim(strip_accents(lower(' Jöín '))) AS t) "
            "SELECT doc_id, CAST((length(text) - length(replace(text, j.t, "
            "''))) / length(j.t) AS BIGINT) AS tf "
            "FROM documents, j WHERE position(j.t IN text) > 0 "
            "ORDER BY doc_id"),
        "ft_suggest_s": _TOKS
        + "SELECT tok AS term, count(DISTINCT doc_id)::BIGINT AS doc_freq "
        "FROM toks WHERE tok LIKE 's%' GROUP BY tok "
        "ORDER BY doc_freq DESC, term LIMIT 10",
        "ft_suggest_infix": _TOKS
        + "SELECT tok AS term, count(DISTINCT doc_id)::BIGINT AS doc_freq "
        "FROM toks WHERE contains(tok, 'er') GROUP BY tok "
        "ORDER BY doc_freq DESC, term LIMIT 10",
        # MoreLikeThis: source-doc terms with tf>=2 and df>=5, top-5 by
        # tf * (ln(N/(df+1)) + 1) (ties by term), OR'd — hit set
        "ft_mlt_hits": _PT
        + ", srctf AS (SELECT tok, count(*)::BIGINT AS c FROM pt "
        "WHERE doc_id = 7 GROUP BY tok HAVING count(*) >= 2), "
        "dfs AS (SELECT tok, count(DISTINCT doc_id)::BIGINT AS df FROM pt "
        "WHERE tok IN (SELECT tok FROM srctf) GROUP BY tok), "
        "nn AS (SELECT count(*)::DOUBLE AS n FROM documents), "
        "sel AS (SELECT s.tok FROM srctf s JOIN dfs USING (tok) "
        "WHERE dfs.df >= 5 ORDER BY s.c * (ln((SELECT n FROM nn) / "
        "(dfs.df + 1.0)) + 1.0) DESC, s.tok LIMIT 5) "
        "SELECT DISTINCT doc_id FROM pt WHERE tok IN (SELECT tok FROM sel) "
        "ORDER BY doc_id",
        # two-stage like the engine: top-50 candidates by GLOBAL df, then
        # ranked by in-context (lang='fr') doc count
        # stupid-backoff continuation: bigram P(w|'hash') when the bigram
        # exists, else 0.4 * unigram P(w); same float64 op order as the
        # engine (CAST .. / CAST, then the 0.4 product), round half-away
        "ft_suggest_freetext": _PT
        + ", uni AS (SELECT tok, count(*)::BIGINT AS c FROM pt GROUP BY tok), "
        "tot AS (SELECT count(*)::BIGINT AS t FROM pt), "
        "bi AS (SELECT a.tok AS ta, b.tok AS tb, count(*)::BIGINT AS c "
        "FROM pt a JOIN pt b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1 "
        "GROUP BY ta, tb), "
        "ctx AS (SELECT c FROM uni WHERE tok = 'hash'), "
        "cand AS (SELECT u.tok, CASE WHEN b.c IS NOT NULL AND ctx.c > 0 "
        "THEN CAST(b.c AS DOUBLE) / CAST(ctx.c AS DOUBLE) "
        "ELSE 0.4 * (CAST(u.c AS DOUBLE) / CAST(tot.t AS DOUBLE)) END AS s "
        "FROM uni u LEFT JOIN bi b ON b.tb = u.tok AND b.ta = 'hash' "
        "CROSS JOIN ctx CROSS JOIN tot WHERE u.tok LIKE 's%') "
        "SELECT tok AS term, round(s, 9) AS score_r9 FROM cand "
        "ORDER BY s DESC, term LIMIT 10",
        "ft_suggest_context": _TOKS
        + ", cand AS (SELECT tok FROM (SELECT tok, "
        "count(DISTINCT doc_id) AS gdf FROM toks "
        "WHERE tok LIKE 's%' AND tok NOT LIKE '%:%' GROUP BY tok "
        "ORDER BY gdf DESC, tok LIMIT 50)) "
        "SELECT tok AS term, count(DISTINCT t.doc_id)::BIGINT AS doc_freq "
        "FROM toks t JOIN documents d USING (doc_id) JOIN cand USING (tok) "
        "WHERE d.lang = 'fr' "
        "GROUP BY tok ORDER BY doc_freq DESC, term LIMIT 10",
        "ft_spell_joib": _TOKS
        + "SELECT tok AS term, levenshtein(tok, 'joib')::BIGINT AS dist, "
        "count(DISTINCT doc_id)::BIGINT AS doc_freq FROM toks "
        "WHERE tok <> '' AND tok <> 'joib' "
        "GROUP BY tok HAVING levenshtein(tok, 'joib') <= 2 "
        "ORDER BY dist, doc_freq DESC, term LIMIT 5",
        "ft_phrase_hits": (
            "SELECT doc_id FROM documents WHERE regexp_matches(lower(text), "
            "'(^|[^a-z0-9_])batch[^a-z0-9_]+window([^a-z0-9_]|$)') ORDER BY doc_id"
        ),
        # per position: alternatives unioned, then consecutive-position join
        "ft_multi_phrase_hits": (
            "WITH tl AS (SELECT doc_id, list_filter(string_split_regex(lower(text), "
            "'[^a-z0-9_]+'), x -> x <> '') AS l FROM documents), "
            "pt AS (SELECT doc_id, unnest(l) AS tok, unnest(range(len(l))) AS pos FROM tl) "
            "SELECT DISTINCT a.doc_id FROM pt a JOIN pt b USING (doc_id) "
            "WHERE a.tok IN ('hash', 'merge') AND b.tok = 'join' "
            "AND b.pos = a.pos + 1 ORDER BY doc_id"
        ),
        "ft_phrase_prefix_hits": (
            "WITH tl AS (SELECT doc_id, list_filter(string_split_regex(lower(text), "
            "'[^a-z0-9_]+'), x -> x <> '') AS l FROM documents), "
            "pt AS (SELECT doc_id, unnest(l) AS tok, unnest(range(len(l))) AS pos FROM tl) "
            "SELECT DISTINCT a.doc_id FROM pt a JOIN pt b USING (doc_id) "
            "WHERE a.tok = 'batch' AND b.tok LIKE 'win%' "
            "AND b.pos = a.pos + 1 ORDER BY doc_id"
        ),
        # rare terms (df <= 0.4*N) are MUST; if none are rare, plain OR
        "ft_common_terms_hits": _TOKS
        + ", dfs AS (SELECT tok, count(DISTINCT doc_id) AS df FROM toks "
        "WHERE tok IN ('the', 'dup') GROUP BY tok), "
        "rare AS (SELECT tok FROM dfs "
        "WHERE df <= 0.4 * (SELECT count(*) FROM documents)) "
        "SELECT doc_id FROM toks WHERE tok IN ('the', 'dup') GROUP BY doc_id "
        "HAVING count(DISTINCT CASE WHEN tok IN (SELECT tok FROM rare) "
        "THEN tok END) = (SELECT count(*) FROM rare) ORDER BY doc_id",
        # when NO term classifies rare, CommonTermsQuery degenerates to a
        # conjunction over the common terms (CommonTermsQuery.java:175-183)
        # — the HAVING must then require ALL query terms, not >= 0 rare ones
        "ft_common_terms_all_common": _TOKS
        + ", dfs AS (SELECT tok, count(DISTINCT doc_id) AS df FROM toks "
        "WHERE tok IN ('the', 'join') GROUP BY tok), "
        "rare AS (SELECT tok FROM dfs "
        "WHERE df <= 0.4 * (SELECT count(*) FROM documents)) "
        "SELECT doc_id FROM toks WHERE tok IN ('the', 'join') GROUP BY doc_id "
        "HAVING CASE WHEN (SELECT count(*) FROM rare) = 0 "
        "THEN count(DISTINCT tok) = (SELECT count(*) FROM dfs) "
        "ELSE count(DISTINCT CASE WHEN tok IN (SELECT tok FROM rare) "
        "THEN tok END) = (SELECT count(*) FROM rare) END ORDER BY doc_id",
        # span [pos, pos+1) ends at pos+1 <= 10
        "ft_span_first_hits": (
            "WITH tl AS (SELECT doc_id, list_filter(string_split_regex(lower(text), "
            "'[^a-z0-9_]+'), x -> x <> '') AS l FROM documents), "
            "pt AS (SELECT doc_id, unnest(l) AS tok, unnest(range(len(l))) AS pos FROM tl) "
            "SELECT DISTINCT doc_id FROM pt WHERE tok = 'join' AND pos <= 9 "
            "ORDER BY doc_id"
        ),
        # ordered near, slop=2: window strictly after batch, gap pb-pa-1 <= 2
        "ft_span_near_hits": (
            "WITH tl AS (SELECT doc_id, list_filter(string_split_regex(lower(text), "
            "'[^a-z0-9_]+'), x -> x <> '') AS l FROM documents), "
            "pt AS (SELECT doc_id, unnest(l) AS tok, unnest(range(len(l))) AS pos FROM tl) "
            "SELECT DISTINCT a.doc_id FROM pt a JOIN pt b USING (doc_id) "
            "WHERE a.tok = 'batch' AND b.tok = 'window' "
            "AND b.pos - a.pos BETWEEN 1 AND 3 ORDER BY doc_id"
        ),
        # unordered, slop=2: |pb - pa| - 1 <= 2 (positions always differ)
        "ft_span_near_unordered": (
            "WITH tl AS (SELECT doc_id, list_filter(string_split_regex(lower(text), "
            "'[^a-z0-9_]+'), x -> x <> '') AS l FROM documents), "
            "pt AS (SELECT doc_id, unnest(l) AS tok, unnest(range(len(l))) AS pos FROM tl) "
            "SELECT DISTINCT a.doc_id FROM pt a JOIN pt b USING (doc_id) "
            "WHERE a.tok = 'batch' AND b.tok = 'window' "
            "AND abs(b.pos - a.pos) BETWEEN 1 AND 3 ORDER BY doc_id"
        ),
        # a scan occurrence survives unless it begins the bigram 'scan join'
        "ft_span_not_hits": (
            "WITH tl AS (SELECT doc_id, list_filter(string_split_regex(lower(text), "
            "'[^a-z0-9_]+'), x -> x <> '') AS l FROM documents), "
            "pt AS (SELECT doc_id, unnest(l) AS tok, unnest(range(len(l))) AS pos FROM tl) "
            "SELECT DISTINCT p.doc_id FROM pt p WHERE p.tok = 'scan' AND NOT EXISTS "
            "(SELECT 1 FROM pt b WHERE b.doc_id = p.doc_id AND b.tok = 'join' "
            "AND b.pos = p.pos + 1) ORDER BY doc_id"
        ),
        # CommonTermsQuery hit sets: the df classification runs IN SQL (df >
        # ceil(0.5 * N) => high), so the oracle follows the engine's live-
        # stats rewrite at any sf. Low terms present => docs with >= 1 low
        # term (required SHOULD sub-clause, msm 1); no low terms => docs
        # with ALL terms (conjunction rewrite). Query-terms absent from the
        # corpus classify low but can never match.
        "ft_common_terms_hits": _TOKS
        + ", n AS (SELECT count(*)::BIGINT AS n FROM documents), "
        "qdf AS (SELECT tok, count(DISTINCT doc_id)::BIGINT AS df FROM toks "
        "WHERE tok IN ('join', 'batch', 'dup') GROUP BY tok), "
        "hi AS (SELECT tok FROM qdf WHERE df > ceil(0.5 * (SELECT n FROM n))), "
        "lo AS (SELECT tok FROM qdf WHERE tok NOT IN (SELECT tok FROM hi)), "
        "nhi AS (SELECT count(*)::BIGINT AS c FROM hi) "
        "SELECT doc_id FROM ("
        "SELECT DISTINCT doc_id FROM toks WHERE tok IN (SELECT tok FROM lo) "
        "AND (SELECT c FROM nhi) < 3 "
        "UNION "
        "SELECT doc_id FROM (SELECT doc_id, count(DISTINCT tok) AS ct FROM toks "
        "WHERE tok IN ('join', 'batch', 'dup') GROUP BY doc_id) "
        "WHERE ct = 3 AND (SELECT c FROM nhi) = 3"
        ") ORDER BY doc_id",
        "ft_common_terms_conj_hits": _TOKS
        + ", n AS (SELECT count(*)::BIGINT AS n FROM documents), "
        "qdf AS (SELECT tok, count(DISTINCT doc_id)::BIGINT AS df FROM toks "
        "WHERE tok IN ('join', 'batch') GROUP BY tok), "
        "hi AS (SELECT tok FROM qdf WHERE df > ceil(0.5 * (SELECT n FROM n))), "
        "lo AS (SELECT tok FROM qdf WHERE tok NOT IN (SELECT tok FROM hi)), "
        "nhi AS (SELECT count(*)::BIGINT AS c FROM hi) "
        "SELECT doc_id FROM ("
        "SELECT DISTINCT doc_id FROM toks WHERE tok IN (SELECT tok FROM lo) "
        "AND (SELECT c FROM nhi) < 2 "
        "UNION "
        "SELECT doc_id FROM (SELECT doc_id, count(DISTINCT tok) AS ct FROM toks "
        "WHERE tok IN ('join', 'batch') GROUP BY doc_id) "
        "WHERE ct = 2 AND (SELECT c FROM nhi) = 2"
        ") ORDER BY doc_id",
        # SimpleQueryParser: join + (hash|scan) + -merge — all-MUST clauses;
        # the negation is the (NOT merge AND matchall) wrapper, i.e. just
        # NOT merge on the hit set
        "ft_simple_query_hits": _TOKS
        + ", j AS (SELECT DISTINCT doc_id FROM toks WHERE tok = 'join'), "
        "hs AS (SELECT DISTINCT doc_id FROM toks WHERE tok IN ('hash', 'scan')), "
        "m AS (SELECT DISTINCT doc_id FROM toks WHERE tok = 'merge') "
        "SELECT doc_id FROM j WHERE doc_id IN (SELECT doc_id FROM hs) "
        "AND doc_id NOT IN (SELECT doc_id FROM m) ORDER BY doc_id",
        # SimpleQueryParser: "batch window" | cust* — exact phrase OR prefix
        "ft_simple_query_mixed_hits": (
            "WITH tl AS (SELECT doc_id, list_filter(string_split_regex(lower(text), "
            "'[^a-z0-9_]+'), x -> x <> '') AS l FROM documents), "
            "pt AS (SELECT doc_id, unnest(l) AS tok, unnest(range(len(l))) AS pos FROM tl) "
            "SELECT doc_id FROM ("
            "SELECT DISTINCT a.doc_id FROM pt a JOIN pt b USING (doc_id) "
            "WHERE a.tok = 'batch' AND b.tok = 'window' AND b.pos = a.pos + 1 "
            "UNION "
            "SELECT DISTINCT doc_id FROM pt WHERE tok LIKE 'cust%'"
            ") ORDER BY doc_id"
        ),
        "ft_dismax_hits": _TOKS
        + "SELECT DISTINCT doc_id FROM toks WHERE tok IN ('join', 'hash') "
        "ORDER BY doc_id",
        "ft_synonym_query_hits": _TOKS
        + "SELECT DISTINCT doc_id FROM toks WHERE tok IN ('hash', 'merge') "
        "ORDER BY doc_id",
        "ft_complex_phrase_hits": _PT
        + "SELECT DISTINCT a.doc_id FROM pt a JOIN pt b USING (doc_id) "
        "WHERE a.tok IN ('scan', 'table') AND b.tok LIKE 'val%' "
        "AND b.pos - a.pos BETWEEN 1 AND 2 ORDER BY doc_id",
        "ft_surround_w_hits": _PT
        + "SELECT DISTINCT a.doc_id FROM pt a JOIN pt b USING (doc_id) "
        "WHERE a.tok = 'table' AND b.tok = 'value' "
        "AND b.pos - a.pos BETWEEN 1 AND 3 ORDER BY doc_id",
        "ft_surround_n_hits": _PT
        + "SELECT DISTINCT a.doc_id FROM pt a JOIN pt b USING (doc_id) "
        "WHERE a.tok = 'scan' AND b.tok = 'row' "
        "AND abs(b.pos - a.pos) = 1 ORDER BY doc_id",
        "ft_surround_trunc_hits": _PT
        + "SELECT DISTINCT a.doc_id FROM pt a JOIN pt b USING (doc_id) "
        "WHERE a.tok LIKE 'tab%' AND b.tok = 'value' "
        "AND b.pos - a.pos BETWEEN 1 AND 2 ORDER BY doc_id",
        "ft_surround_bool_hits": _TOKS
        + "SELECT doc_id FROM (SELECT DISTINCT doc_id FROM toks "
        "WHERE tok = 'join') WHERE doc_id IN "
        "(SELECT doc_id FROM toks WHERE tok IN ('hash', 'merge')) "
        "ORDER BY doc_id",
        "ft_term_in_set_hits": _TOKS
        + "SELECT DISTINCT doc_id FROM toks WHERE tok IN ('dup', 'bloom', "
        "'window') ORDER BY doc_id",
        "ft_numeric_range_hits": (
            "SELECT doc_id FROM documents WHERE n_chars BETWEEN 200 AND 400 "
            "ORDER BY doc_id"
        ),
        "ft_numeric_range_dv_update": (
            "SELECT doc_id FROM documents WHERE "
            "(CASE WHEN lang = 'fr' THEN 0 ELSE n_chars END) "
            "BETWEEN 200 AND 400 ORDER BY doc_id"
        ),
        "ft_term_numeric_filter": _TOKS
        + "SELECT DISTINCT t.doc_id FROM toks t JOIN documents d USING (doc_id) "
        "WHERE t.tok = 'join' AND d.n_chars BETWEEN 200 AND 400 ORDER BY doc_id",
        "ft_parsed_range_hits": _TOKS
        + "SELECT DISTINCT t.doc_id FROM toks t JOIN documents d USING (doc_id) "
        "WHERE t.tok = 'join' AND d.n_chars BETWEEN 200 AND 400 ORDER BY doc_id",
        "ft_facet_nchars_ranges": _TOKS
        + ", hits AS (SELECT DISTINCT doc_id FROM toks WHERE tok = 'join'), "
        "j AS (SELECT n_chars FROM documents JOIN hits USING (doc_id)) "
        "SELECT '[0,200)' AS range, (SELECT count(*) FROM j "
        "WHERE n_chars >= 0 AND n_chars < 200)::BIGINT AS n_docs "
        "UNION ALL SELECT '[200,400)', (SELECT count(*) FROM j "
        "WHERE n_chars >= 200 AND n_chars < 400)::BIGINT "
        "UNION ALL SELECT '[400,inf)', (SELECT count(*) FROM j "
        "WHERE n_chars >= 400)::BIGINT",
        # DynamicRangeUtil with unit weights: the greedy accu >= target
        # split reduces to value-sorted chunks of ceil(n / min(5, n)) items
        "ft_facet_dynamic_ranges": _TOKS
        + ", hits AS (SELECT DISTINCT doc_id FROM toks WHERE tok = 'merge'), "
        "v AS (SELECT d.n_chars AS val, "
        "row_number() OVER (ORDER BY d.n_chars) - 1 AS rn, "
        "count(*) OVER () AS n FROM documents d JOIN hits USING (doc_id)), "
        "p AS (SELECT val, rn // CAST(ceil(CAST(n AS DOUBLE) / "
        "LEAST(5, n)) AS BIGINT) AS range_idx FROM v) "
        "SELECT range_idx, count(*)::BIGINT AS n_docs, "
        "count(*)::BIGINT AS weight, min(val)::BIGINT AS min_value, "
        "max(val)::BIGINT AS max_value, "
        "CAST(sum(val) AS DOUBLE) / count(*) AS centroid "
        "FROM p GROUP BY 1 ORDER BY 1",
        "ft_numeric_set_hits": (
            "SELECT doc_id FROM documents WHERE n_chars IN (250, 301, 999) "
            "ORDER BY doc_id"
        ),
        "ft_sort_by_field_top10": _TOKS
        + "SELECT d.doc_id, d.n_chars FROM documents d "
        "JOIN (SELECT DISTINCT doc_id FROM toks WHERE tok = 'join') h "
        "USING (doc_id) ORDER BY d.n_chars DESC, d.doc_id LIMIT 10",
        "ft_count_join_or_hash": _TOKS
        + "SELECT count(DISTINCT doc_id)::BIGINT AS n_hits FROM toks "
        "WHERE tok IN ('join', 'hash')",
        "ft_term_vector_doc7": _TOKS
        + "SELECT tok AS term, count(*)::BIGINT AS tf FROM toks "
        "WHERE doc_id = 7 AND tok <> '' GROUP BY tok ORDER BY term",
        # sloppy hit-set: exists (pa, pb) with |(pb - 1) - pa| <= slop —
        # equivalent to the engine's nearest-anchor matcher for 2 terms
        "ft_phrase_slop_hits": (
            "WITH tl AS (SELECT doc_id, list_filter(string_split_regex(lower(text), "
            "'[^a-z0-9_]+'), x -> x <> '') AS l FROM documents), "
            "pt AS (SELECT doc_id, unnest(l) AS tok, unnest(range(len(l))) AS pos FROM tl) "
            "SELECT DISTINCT a.doc_id FROM pt a JOIN pt b USING (doc_id) "
            "WHERE a.tok = 'batch' AND b.tok = 'window' "
            "AND (b.pos - 1 - a.pos) BETWEEN -3 AND 3 ORDER BY doc_id"
        ),
        "ft_prefix_hits": _TOKS
        + "SELECT DISTINCT doc_id FROM toks WHERE tok LIKE 'cust%' ORDER BY doc_id",
        "ft_wildcard_hits": _TOKS
        + "SELECT DISTINCT doc_id FROM toks WHERE tok LIKE 's_an' ORDER BY doc_id",
        "ft_fuzzy_hits": _TOKS
        + "SELECT DISTINCT doc_id FROM toks WHERE levenshtein(tok, 'joib') <= 1 "
        "ORDER BY doc_id",
        "ft_range_hits": _TOKS
        + "SELECT DISTINCT doc_id FROM toks WHERE tok BETWEEN 'filter' AND 'hash' "
        "ORDER BY doc_id",
        "ft_facet_lang": (
            "WITH hits AS (SELECT DISTINCT doc_id FROM (SELECT doc_id, "
            "unnest(string_split_regex(lower(text), '[^a-z0-9_]+')) AS tok "
            "FROM documents) WHERE tok = 'join') "
            "SELECT lang, count(*)::BIGINT AS n_docs FROM documents "
            "WHERE doc_id IN (SELECT doc_id FROM hits) GROUP BY lang ORDER BY lang"
        ),
        "ft_drilldown_source": _TOKS
        + ", h AS (SELECT DISTINCT doc_id FROM toks WHERE tok = 'join') "
        "SELECT source, count(*)::BIGINT AS n_docs FROM documents "
        "JOIN h USING (doc_id) WHERE lang = 'en' GROUP BY source ORDER BY source",
        "ft_drillsideways": _TOKS
        + ", h AS (SELECT DISTINCT doc_id FROM toks WHERE tok = 'join') "
        "SELECT * FROM ("
        "SELECT 'lang' AS dim, lang AS value, count(*)::BIGINT AS n_docs "
        "FROM documents JOIN h USING (doc_id) GROUP BY 2 "
        "UNION ALL "
        "SELECT 'source', source, count(*)::BIGINT "
        "FROM documents JOIN h USING (doc_id) WHERE lang = 'en' GROUP BY 2"
        ") ORDER BY dim, value",
        # offsets consumer: first occurrence of the token at a word boundary;
        # start = chars before the match in lower(text) (engine offsets are
        # char offsets into the lowercased text)
        "ft_snippet_join": (
            "WITH hits AS (SELECT doc_id FROM (SELECT doc_id, "
            "unnest(string_split_regex(lower(text), '[^a-z0-9_]+')) AS tok "
            "FROM documents) WHERE tok = 'join' GROUP BY doc_id) "
            "SELECT d.doc_id, "
            "length(regexp_extract(lower(d.text), "
            "'^(.*?(^|[^a-z0-9_]))join([^a-z0-9_]|$)', 1, 's'))::BIGINT AS start_offset, "
            "length(regexp_extract(lower(d.text), "
            "'^(.*?(^|[^a-z0-9_]))join([^a-z0-9_]|$)', 1, 's'))::BIGINT + 4 AS end_offset "
            "FROM documents d JOIN hits USING (doc_id) ORDER BY d.doc_id"
        ),
        "ft_join_parent_counts": _TOKS
        + "SELECT d.lang AS parent, count(*)::BIGINT AS n_children "
        "FROM documents d JOIN (SELECT DISTINCT doc_id FROM toks WHERE tok = 'join') h "
        "USING (doc_id) GROUP BY 1 ORDER BY parent",
        # index-time blocks keyed by source; each source = one block at test
        # partition sizes, so block-join counts == group-by-source counts
        "ft_blockjoin_counts": _TOKS
        + "SELECT d.source AS parent, count(*)::BIGINT AS n_children "
        "FROM documents d JOIN (SELECT DISTINCT doc_id FROM toks WHERE tok = 'merge') h "
        "USING (doc_id) GROUP BY 1 ORDER BY parent",
        # inverse block join: block-last doc per source = max doc_id (stable
        # sort by block_col keeps file order within a block); parents whose
        # text matches expand to the block's other docs
        "ft_blockjoin_children": _TOKS
        + ", last AS (SELECT source, max(doc_id) AS pid FROM documents "
        "GROUP BY source), "
        "par AS (SELECT l.source, l.pid FROM last l JOIN "
        "(SELECT DISTINCT doc_id FROM toks WHERE tok = 'merge') h "
        "ON h.doc_id = l.pid) "
        "SELECT d.doc_id FROM documents d JOIN par p USING (source) "
        "WHERE d.doc_id <> p.pid ORDER BY d.doc_id",
        # CoveringQuery: n matching clauses >= 1 + (n_chars % 3) per doc
        "ft_covering_hits": _TOKS
        + ", ct AS (SELECT doc_id, "
        "max(CASE WHEN tok = 'merge' THEN 1 ELSE 0 END) + "
        "max(CASE WHEN tok = 'sort' THEN 1 ELSE 0 END) + "
        "max(CASE WHEN tok = 'join' THEN 1 ELSE 0 END) AS n "
        "FROM toks GROUP BY doc_id) "
        "SELECT d.doc_id FROM documents d JOIN ct USING (doc_id) "
        "WHERE ct.n >= 1 + (d.n_chars % 3) ORDER BY d.doc_id",
        "ft_synonym_hits": _TOKS
        + "SELECT DISTINCT doc_id FROM toks WHERE tok IN ('fast', 'slow') "
        "ORDER BY doc_id",
        "ft_stemmed_hits": _TOKS
        + "SELECT DISTINCT doc_id FROM toks WHERE tok = 'customer' "
        "ORDER BY doc_id",
        "ft_autocomplete_hits": _TOKS
        + "SELECT DISTINCT doc_id FROM toks WHERE tok LIKE 'cust%' "
        "ORDER BY doc_id",
        # English minimal s-stemmer applied to every token (strip final 's'
        # from len>=4 words unless it follows 'u'/'s' — EnglishMinimalStemmer
        # rules); no en stopword stems to 'customer', so the stop filter
        # cannot change this hit set
        "ft_lang_en_hits": _TOKS
        + "SELECT DISTINCT doc_id FROM toks WHERE tok <> '' AND "
        "(CASE WHEN length(tok) >= 4 AND substr(tok, length(tok), 1) = 's' "
        "AND substr(tok, length(tok) - 1, 1) NOT IN ('u', 's') "
        "THEN substr(tok, 1, length(tok) - 1) ELSE tok END) = 'customer' "
        "ORDER BY doc_id",
        # MLT createQueue(): candidates tf>=2 in the source doc, df>=5 in the
        # collection, score = tf * (1 + ln(N / (df + 1))), top 25 by
        # (score desc, term asc)
        "mlt_terms_doc7": _TOKS
        + ", src AS (SELECT tok, count(*)::BIGINT AS tf FROM toks "
        "WHERE doc_id = 7 AND tok <> '' GROUP BY tok HAVING count(*) >= 2), "
        "dfs AS (SELECT tok, count(DISTINCT doc_id)::BIGINT AS df FROM toks "
        "WHERE tok IN (SELECT tok FROM src) GROUP BY tok), "
        "nd AS (SELECT count(*) AS n FROM documents) "
        "SELECT s.tok AS term, s.tf, d.df, "
        "round(s.tf * (1 + ln((SELECT n FROM nd) / (d.df + 1.0))), 6) AS score "
        "FROM src s JOIN dfs d USING (tok) WHERE d.df >= 5 "
        "ORDER BY s.tf * (1 + ln((SELECT n FROM nd) / (d.df + 1.0))) DESC, s.tok "
        "LIMIT 25",
        "mlt_hits_doc7": _TOKS
        + ", src AS (SELECT tok, count(*) AS tf FROM toks "
        "WHERE doc_id = 7 AND tok <> '' GROUP BY tok HAVING count(*) >= 2), "
        "dfs AS (SELECT tok, count(DISTINCT doc_id) AS df FROM toks "
        "WHERE tok IN (SELECT tok FROM src) GROUP BY tok), "
        "nd AS (SELECT count(*) AS n FROM documents), "
        "sel AS (SELECT s.tok AS term FROM src s JOIN dfs d USING (tok) "
        "WHERE d.df >= 5 "
        "ORDER BY s.tf * (1 + ln((SELECT n FROM nd) / (d.df + 1.0))) DESC, s.tok "
        "LIMIT 25) "
        "SELECT DISTINCT doc_id FROM toks "
        "WHERE tok IN (SELECT term FROM sel) AND doc_id <> 7 ORDER BY doc_id",
        "ft_expr_topk": (
            f"SELECT doc_id, round(ln(len({_TOKLIST}) + 1) + (doc_id % 7) * 0.01, 6) "
            f"AS expr_value FROM documents "
            f"ORDER BY ln(len({_TOKLIST}) + 1) + (doc_id % 7) * 0.01 DESC, doc_id "
            "LIMIT 10"
        ),
        "percolate_scored": _PT
        + ", tf AS (SELECT doc_id, tok, count(*)::BIGINT AS f FROM pt WHERE tok IN ('join', 'hash', 'scan') GROUP BY 1, 2), "
        "pj AS (SELECT doc_id, f FROM tf WHERE tok = 'join'), "
        "ph AS (SELECT doc_id, f FROM tf WHERE tok = 'hash'), "
        "ps AS (SELECT doc_id, f FROM tf WHERE tok = 'scan'), "
        "pf AS (SELECT a.doc_id, count(*)::BIGINT AS f FROM pt a JOIN pt b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1 WHERE a.tok = 'batch' AND b.tok = 'window' GROUP BY 1), "
        "sc AS ("
        "SELECT doc_id, 'has_join' AS query, (CAST(ln(1 + 0.5/1.5) AS FLOAT) - CAST(ln(1 + 0.5/1.5) AS FLOAT) / (CAST(1.0 AS FLOAT) + CAST(f AS FLOAT) * (CAST(1.0 AS FLOAT) / CAST(1.2 AS FLOAT)))) AS s FROM pj "
        "UNION ALL SELECT pj.doc_id, 'join_and_hash', (CAST(ln(1 + 0.5/1.5) AS FLOAT) - CAST(ln(1 + 0.5/1.5) AS FLOAT) / (CAST(1.0 AS FLOAT) + CAST(pj.f AS FLOAT) * (CAST(1.0 AS FLOAT) / CAST(1.2 AS FLOAT)))) + (CAST(ln(1 + 0.5/1.5) AS FLOAT) - CAST(ln(1 + 0.5/1.5) AS FLOAT) / (CAST(1.0 AS FLOAT) + CAST(ph.f AS FLOAT) * (CAST(1.0 AS FLOAT) / CAST(1.2 AS FLOAT)))) FROM pj JOIN ph USING (doc_id) "
        "UNION ALL SELECT doc_id, 'phrase_batch_window', (CAST(2.0 * CAST(ln(1 + 0.5/1.5) AS FLOAT) AS FLOAT) - CAST(2.0 * CAST(ln(1 + 0.5/1.5) AS FLOAT) AS FLOAT) / (CAST(1.0 AS FLOAT) + CAST(f AS FLOAT) * (CAST(1.0 AS FLOAT) / CAST(1.2 AS FLOAT)))) FROM pf "
        "UNION ALL SELECT ps.doc_id, 'gamma_or_scan_not_join', (CAST(ln(1 + 0.5/1.5) AS FLOAT) - CAST(ln(1 + 0.5/1.5) AS FLOAT) / (CAST(1.0 AS FLOAT) + CAST(ps.f AS FLOAT) * (CAST(1.0 AS FLOAT) / CAST(1.2 AS FLOAT)))) FROM ps WHERE ps.doc_id NOT IN (SELECT doc_id FROM pj)"
        ") "
        "SELECT doc_id, query, round(s::DOUBLE, 6) AS score_r6 FROM sc ORDER BY doc_id, query",
        "percolate_matches": _TOKS
        + ", j AS (SELECT DISTINCT doc_id FROM toks WHERE tok = 'join'), "
        "h AS (SELECT DISTINCT doc_id FROM toks WHERE tok = 'hash'), "
        "s AS (SELECT DISTINCT doc_id FROM toks WHERE tok = 'scan') "
        "SELECT * FROM ("
        "SELECT doc_id, 'has_join' AS query FROM j "
        "UNION ALL SELECT doc_id, 'join_and_hash' FROM j "
        "WHERE doc_id IN (SELECT doc_id FROM h) "
        "UNION ALL SELECT doc_id, 'phrase_batch_window' FROM documents "
        "WHERE regexp_matches(lower(text), "
        "'(^|[^a-z0-9_])batch[^a-z0-9_]+window([^a-z0-9_]|$)') "
        "UNION ALL SELECT doc_id, 'gamma_or_scan_not_join' FROM s "
        "WHERE doc_id NOT IN (SELECT doc_id FROM j)"
        ") ORDER BY doc_id, query",
        # unigram LM with Laplace smoothing: p(tok) = (cnt+1)/(total+V)
        # over the lang='en' reference; unseen tokens take cnt=0 (the same
        # formula), so a LEFT JOIN + coalesce replays the engine exactly
        "text_lm_quality": (
            f"WITH tl AS (SELECT doc_id, {_TOKLIST} AS l FROM documents), "
            "t AS (SELECT doc_id, unnest(l) AS tok FROM tl), "
            "ref AS (SELECT tok, count(*)::BIGINT AS n FROM t "
            "JOIN documents USING (doc_id) WHERE lang = 'en' GROUP BY tok), "
            "tot AS (SELECT sum(n) AS total, count(*) AS v FROM ref), "
            "sc AS (SELECT t.doc_id, ln((coalesce(r.n, 0) + 1)::DOUBLE "
            "/ (tot.total + tot.v)) AS lp FROM t "
            "LEFT JOIN ref r USING (tok) CROSS JOIN tot), "
            "agg AS (SELECT doc_id, count(*)::BIGINT AS n_tokens, "
            "round(avg(lp), 6) AS avg_logprob FROM sc GROUP BY doc_id) "
            "SELECT tl.doc_id, coalesce(a.n_tokens, 0) AS n_tokens, "
            "coalesce(a.avg_logprob, 0.0) AS avg_logprob "
            "FROM tl LEFT JOIN agg a USING (doc_id) ORDER BY tl.doc_id"
        ),
        "dedup_substring_stats": (
            "WITH tl AS (SELECT doc_id, list_filter(string_split_regex(lower(text), "
            "'[^a-z0-9_]+'), x -> x <> '') AS l FROM documents), "
            "pt AS (SELECT doc_id, unnest(l) AS tok, unnest(range(len(l))) AS pos FROM tl), "
            "sh AS (SELECT a.doc_id, a.tok || ' ' || b.tok || ' ' || c.tok AS s "
            "FROM pt a JOIN pt b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1 "
            "JOIN pt c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2), "
            "dsh AS (SELECT DISTINCT doc_id, s FROM sh), "
            "cnt AS (SELECT s, count(*) AS nd FROM dsh GROUP BY s) "
            "SELECT d.doc_id, count(*)::BIGINT AS n_unique_shingles, "
            "sum(CASE WHEN c.nd >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_dup_shingles, "
            "round(sum(CASE WHEN c.nd >= 2 THEN 1 ELSE 0 END)::DOUBLE "
            "/ count(*), 6) AS dup_fraction "
            "FROM dsh d JOIN cnt c USING (s) GROUP BY 1 ORDER BY 1"
        ),
        "text_shingle_top20": (
            "WITH tl AS (SELECT doc_id, list_filter(string_split_regex(lower(text), "
            "'[^a-z0-9_]+'), x -> x <> '') AS l FROM documents), "
            "pt AS (SELECT doc_id, unnest(l) AS tok, unnest(range(len(l))) AS pos FROM tl) "
            "SELECT a.tok || ' ' || b.tok AS shingle, count(*)::BIGINT AS n "
            "FROM pt a JOIN pt b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1 "
            "GROUP BY 1 ORDER BY n DESC, shingle LIMIT 20"
        ),
        "text_shingle_profile": (
            "WITH tl AS (SELECT doc_id, list_filter(string_split_regex(lower(text), "
            "'[^a-z0-9_]+'), x -> x <> '') AS l FROM documents), "
            "pt AS (SELECT doc_id, unnest(l) AS tok, unnest(range(len(l))) AS pos FROM tl), "
            "sh AS (SELECT a.doc_id, a.tok || ' ' || b.tok AS s "
            "FROM pt a JOIN pt b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1) "
            "SELECT t.doc_id, coalesce(x.n_sh, 0)::BIGINT AS n_shingles, "
            "coalesce(x.n_u, 0)::BIGINT AS n_unique_shingles FROM tl t "
            "LEFT JOIN (SELECT doc_id, count(*) AS n_sh, count(DISTINCT s) AS n_u "
            "FROM sh GROUP BY doc_id) x USING (doc_id) ORDER BY t.doc_id"
        ),
        "ft_doc_freq_top20": _TOKS
        + "SELECT tok AS term, count(DISTINCT doc_id)::BIGINT AS doc_freq "
        "FROM toks WHERE tok <> '' GROUP BY tok "
        "ORDER BY doc_freq DESC, term LIMIT 20",
        "ft_collection_stats": (
            "SELECT (SELECT count(*) FROM documents)::BIGINT AS doc_count, "
            "(SELECT count(*) FROM (SELECT unnest(string_split_regex(lower(text), "
            "'[^a-z0-9_]+')) AS tok FROM documents) WHERE tok <> '')::BIGINT "
            "AS sum_total_term_freq"
        ),
        "dedup_exact": (
            "SELECT min(doc_id)::BIGINT AS doc_id FROM documents GROUP BY text "
            "ORDER BY doc_id"
        ),
        "dedup_ngram_jaccard": (
            f"WITH {_NGRAM_CTES} "
            "SELECT id_a, id_b, round(c / (sa.n + sb.n - c), 6) AS jaccard "
            "FROM it JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b "
            "WHERE c / (sa.n + sb.n - c) >= 0.5 ORDER BY id_a, id_b"
        ),
        # transitive closure of the >= 0.5 pair graph; cluster = min member
        "dedup_ngram_clusters": (
            f"WITH RECURSIVE {_NGRAM_CTES}, "
            "p AS (SELECT id_a, id_b "
            "FROM it JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b "
            "WHERE c / (sa.n + sb.n - c) >= 0.5), "
            "edges AS (SELECT id_a AS u, id_b AS v FROM p "
            "UNION SELECT id_b, id_a FROM p), "
            "reach(u, v) AS (SELECT u, u FROM (SELECT DISTINCT u FROM edges) "
            "UNION SELECT e.u, r.v FROM edges e JOIN reach r ON r.u = e.v) "
            "SELECT u AS doc_id, min(v)::BIGINT AS cluster_id FROM reach "
            "GROUP BY u ORDER BY doc_id"
        ),
        "events_distinct_users_per_type": (
            "SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_users "
            "FROM events GROUP BY event_type ORDER BY event_type"
        ),
        "dedup_embedding_pairs": (
            "SELECT a.vec_id AS id_a, b.vec_id AS id_b, "
            "round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
            "CAST(b.embedding AS DOUBLE[])), 6) AS cosine "
            "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
            "WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
            "CAST(b.embedding AS DOUBLE[])) >= 0.45 ORDER BY id_a, id_b"
        ),
        "dedup_embedding_clusters": (
            "WITH RECURSIVE p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b "
            "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
            "WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
            "CAST(b.embedding AS DOUBLE[])) >= 0.45), "
            "edges AS (SELECT id_a AS u, id_b AS v FROM p "
            "UNION SELECT id_b, id_a FROM p), "
            "reach(u, v) AS (SELECT u, u FROM (SELECT DISTINCT u FROM edges) "
            "UNION SELECT e.u, r.v FROM edges e JOIN reach r ON r.u = e.v) "
            "SELECT u AS doc_id, min(v)::BIGINT AS cluster_id FROM reach "
            "GROUP BY u ORDER BY doc_id"
        ),
        # quality (>=30 tokens, alpha ratio >= 0.55) -> min-id per text ->
        # transitive closure of >=0.5-Jaccard pairs, keep cluster minima
        "pipeline_prepare_corpus": (
            "WITH RECURSIVE q AS (SELECT doc_id, text FROM documents "
            f"WHERE len({_TOKLIST}) >= 30 "
            "AND length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) "
            ">= 0.55 * length(text)), "
            "e AS (SELECT min(doc_id) AS doc_id FROM q GROUP BY text), "
            "e2 AS (SELECT q.doc_id, q.text FROM q JOIN e USING (doc_id)), "
            "tl AS (SELECT doc_id, list_filter(string_split_regex(lower(text), "
            "'[^a-z0-9_]+'), x -> x <> '') AS l FROM e2), "
            "sh AS (SELECT DISTINCT doc_id, unnest("
            "CASE WHEN len(l) < 3 THEN [array_to_string(l, ' ')] "
            "ELSE list_transform(generate_series(1, len(l) - 2), "
            "i -> array_to_string(l[i:i+2], ' ')) END) AS s "
            "FROM tl WHERE len(l) > 0), "
            "sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1), "
            "it AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c "
            "FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2), "
            "p AS (SELECT id_a, id_b "
            "FROM it JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b "
            "WHERE c / (sa.n + sb.n - c) >= 0.5), "
            "edges AS (SELECT id_a AS u, id_b AS v FROM p "
            "UNION SELECT id_b, id_a FROM p), "
            "reach(u, v) AS (SELECT u, u FROM (SELECT DISTINCT u FROM edges) "
            "UNION SELECT ed.u, r.v FROM edges ed JOIN reach r ON r.u = ed.v), "
            "cl AS (SELECT u AS doc_id, min(v) AS cid FROM reach GROUP BY u) "
            "SELECT doc_id FROM e WHERE doc_id NOT IN "
            "(SELECT doc_id FROM cl WHERE doc_id <> cid) ORDER BY doc_id"
        ),
        "text_token_stats": (
            f"SELECT doc_id, len({_TOKLIST})::BIGINT AS n_tokens, "
            f"len(list_distinct({_TOKLIST}))::BIGINT AS n_unique_tokens, "
            f"md5(array_to_string({_TOKLIST}, ' ')) AS fingerprint "
            "FROM documents ORDER BY doc_id"
        ),
        # word_delimiter grammar replayed exactly in SQL: possessive-'s
        # removal (applied twice — chains like 's's consume their trailing
        # context), then case/acronym/digit boundary spaces, then lowercase
        # split on non-alnum; fuzz-verified identical to the tokenizer
        "text_wdf_token_stats": (
            "WITH d AS (SELECT doc_id, text || ' DocID' || "
            "CAST(doc_id AS VARCHAR) || 'XMLTag iPhone4S O''Brien''s' "
            "AS t FROM documents), "
            "w AS (SELECT doc_id, list_filter(string_split_regex(lower("
            "regexp_replace(regexp_replace(regexp_replace(regexp_replace("
            "regexp_replace(regexp_replace(t, "
            "'''[sS]([^A-Za-z0-9]|$)', '\\1', 'g'), "
            "'''[sS]([^A-Za-z0-9]|$)', '\\1', 'g'), "
            "'([a-z])([A-Z])', '\\1 \\2', 'g'), "
            "'([A-Z])([A-Z][a-z])', '\\1 \\2', 'g'), "
            "'([A-Za-z])([0-9])', '\\1 \\2', 'g'), "
            "'([0-9])([A-Za-z])', '\\1 \\2', 'g')"
            "), '[^a-z0-9]+'), x -> x <> '') AS l FROM d) "
            "SELECT doc_id, len(l)::BIGINT AS n_tokens, "
            "len(list_distinct(l))::BIGINT AS n_unique_tokens, "
            "md5(array_to_string(l, ' ')) AS fingerprint "
            "FROM w ORDER BY doc_id"
        ),
        # langid heuristic replayed exactly: marker-stopword ratio per lang
        # (DOUBLE division), argmax with first-max-wins over the engine's
        # dict order en,es,fr,de via a >= cascade, 'en' when all ratios are
        # zero, then the CJK override (>5% of chars in U+4E00..U+9FFF)
        "text_langid": (
            "WITH tl AS (SELECT doc_id, " + _TOKLIST + " AS l FROM documents), "
            "tot AS (SELECT doc_id, greatest(1, len(l))::DOUBLE AS nt FROM tl), "
            "toks AS (SELECT doc_id, unnest(l) AS tok FROM tl), "
            "m AS (SELECT doc_id, "
            "sum(CASE WHEN tok IN ('the','and','of','to','a','in','is','it',"
            "'that','for') THEN 1 ELSE 0 END)::DOUBLE AS c_en, "
            "sum(CASE WHEN tok IN ('el','la','de','que','y','en','un','por',"
            "'con','los') THEN 1 ELSE 0 END)::DOUBLE AS c_es, "
            "sum(CASE WHEN tok IN ('le','la','de','et','un','les','des','est',"
            "'que','pour') THEN 1 ELSE 0 END)::DOUBLE AS c_fr, "
            "sum(CASE WHEN tok IN ('der','die','und','das','von','mit','ist',"
            "'den','ein','zu') THEN 1 ELSE 0 END)::DOUBLE AS c_de "
            "FROM toks GROUP BY doc_id), "
            "r AS (SELECT tl.doc_id, "
            "coalesce(c_en, 0) / nt AS r_en, coalesce(c_es, 0) / nt AS r_es, "
            "coalesce(c_fr, 0) / nt AS r_fr, coalesce(c_de, 0) / nt AS r_de "
            "FROM tl JOIN tot USING (doc_id) LEFT JOIN m USING (doc_id)), "
            "base AS (SELECT doc_id, CASE "
            "WHEN greatest(r_en, r_es, r_fr, r_de) = 0 THEN 'en' "
            "WHEN r_en >= r_es AND r_en >= r_fr AND r_en >= r_de THEN 'en' "
            "WHEN r_es >= r_fr AND r_es >= r_de THEN 'es' "
            "WHEN r_fr >= r_de THEN 'fr' ELSE 'de' END AS lp FROM r), "
            "cjk AS (SELECT doc_id, length(regexp_replace(text, "
            "'[^\\x{4e00}-\\x{9fff}]', '', 'g'))::DOUBLE AS nc, "
            "greatest(1, length(text))::DOUBLE AS lc FROM documents) "
            "SELECT b.doc_id, CASE WHEN c.nc > 0.05 * c.lc THEN 'zh' "
            "ELSE b.lp END AS lang_pred "
            "FROM base b JOIN cjk c USING (doc_id) ORDER BY doc_id"
        ),
        "text_quality": (
            "SELECT doc_id, length(text)::BIGINT AS n_chars, "
            f"len({_TOKLIST})::BIGINT AS n_tokens, "
            "length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))::BIGINT AS n_alpha_chars, "
            "length(regexp_replace(text, '[^0-9]', '', 'g'))::BIGINT AS n_digit_chars, "
            f"coalesce(list_max(list_transform({_TOKLIST}, x -> length(x))), 0)::BIGINT "
            "AS max_token_len FROM documents ORDER BY doc_id"
        ),
        "events_windowed_top3": (
            "WITH c AS (SELECT (epoch_us(ts) // 86400000000) * 86400000000 "
            "AS window_start, user_id, count(*)::BIGINT AS n_events "
            "FROM events GROUP BY 1, 2), "
            "r AS (SELECT window_start, user_id, n_events, "
            "row_number() OVER (PARTITION BY window_start "
            "ORDER BY n_events DESC, user_id)::BIGINT AS rank FROM c) "
            "SELECT window_start::BIGINT AS window_start, rank, user_id, "
            "n_events FROM r WHERE rank <= 3 "
            "ORDER BY window_start, rank"
        ),
        "events_retention": (
            "WITH w AS (SELECT DISTINCT user_id, "
            "epoch_us(date_trunc('week', ts))::BIGINT AS wk FROM events), "
            "f AS (SELECT user_id, min(wk) AS cohort FROM w GROUP BY user_id) "
            "SELECT f.cohort AS cohort_week, "
            "((w.wk - f.cohort) // (7 * 86400000000))::BIGINT AS week_offset, "
            "count(*)::BIGINT AS n_users "
            "FROM w JOIN f USING (user_id) GROUP BY 1, 2 ORDER BY 1, 2"
        ),
        # sequential greedy funnel: each step's earliest event strictly
        # after the previous step's matched event
        "events_funnel_depths": (
            "WITH u AS (SELECT DISTINCT user_id FROM events), "
            "s1 AS (SELECT user_id, min(ts) AS t1 FROM events "
            "WHERE event_type = 'view' GROUP BY user_id), "
            "s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e "
            "JOIN s1 USING (user_id) WHERE e.event_type = 'click' "
            "AND e.ts > s1.t1 GROUP BY e.user_id), "
            "s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e "
            "JOIN s2 USING (user_id) WHERE e.event_type = 'purchase' "
            "AND e.ts > s2.t2 GROUP BY e.user_id) "
            "SELECT u.user_id, CASE WHEN t3 IS NOT NULL THEN 3 "
            "WHEN t2 IS NOT NULL THEN 2 WHEN t1 IS NOT NULL THEN 1 "
            "ELSE 0 END::BIGINT AS steps_completed "
            "FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id) "
            "LEFT JOIN s3 USING (user_id) ORDER BY user_id"
        ),
        # running token sum over (quality desc, doc_id) strictly BEFORE the
        # row < budget keeps the budget-crossing straggler, as the engine does
        "curate_token_budget": (
            f"WITH tl AS (SELECT doc_id, {_TOKLIST} AS l FROM documents), "
            "st AS (SELECT doc_id, len(l)::BIGINT AS n_tokens, "
            "len(list_distinct(l))::BIGINT AS n_unique FROM tl "
            "WHERE len(l) > 0), "
            "r AS (SELECT doc_id, n_tokens, "
            "n_unique::DOUBLE / n_tokens::DOUBLE AS q FROM st), "
            "c AS (SELECT doc_id, n_tokens, coalesce(sum(n_tokens) OVER ("
            "ORDER BY q DESC, doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND "
            "1 PRECEDING), 0) AS before FROM r) "
            "SELECT doc_id, n_tokens FROM c WHERE before < 20000 "
            "ORDER BY doc_id"
        ),
        # per-group running-sum budgets (window PARTITION BY the group)
        "curate_token_budget_grouped": (
            f"WITH tl AS (SELECT doc_id, lang, {_TOKLIST} AS l FROM documents), "
            "st AS (SELECT doc_id, lang, len(l)::BIGINT AS n_tokens, "
            "len(list_distinct(l))::BIGINT AS n_unique FROM tl "
            "WHERE len(l) > 0), "
            "r AS (SELECT doc_id, lang, n_tokens, "
            "n_unique::DOUBLE / n_tokens::DOUBLE AS q FROM st), "
            "c AS (SELECT doc_id, lang, n_tokens, coalesce(sum(n_tokens) "
            "OVER (PARTITION BY lang ORDER BY q DESC, doc_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
            "AS before FROM r), "
            "b(blang, budget) AS (VALUES ('en', 8000), ('de', 4000)) "
            "SELECT doc_id, lang AS grp, n_tokens FROM c "
            "JOIN b ON b.blang = c.lang WHERE before < budget "
            "ORDER BY doc_id"
        ),
        # graded contamination: distinct-3-shingle overlap fraction per
        # train doc vs the doc_id%50==0 benchmark slice
        "curate_contamination_frac": (
            "WITH tl AS (SELECT doc_id, " + _TOKLIST + " AS l FROM documents), "
            "sh AS (SELECT DISTINCT doc_id, "
            "unnest(list_transform(generate_series(1, len(l) - 2), "
            "i -> array_to_string(l[i:i+2], ' '))) AS s FROM tl "
            "WHERE len(l) >= 3), "
            "bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 50 = 0), "
            "agg AS (SELECT doc_id, count(*)::BIGINT AS n_shingles, "
            "sum(CASE WHEN s IN (SELECT s FROM bench) THEN 1 ELSE 0 END)"
            "::BIGINT AS n_hit FROM sh WHERE doc_id % 50 <> 0 "
            "GROUP BY doc_id) "
            "SELECT d.doc_id, coalesce(a.n_shingles, 0) AS n_shingles, "
            "coalesce(a.n_hit, 0) AS n_hit, "
            "coalesce(a.n_hit::DOUBLE / a.n_shingles, 0.0) AS frac "
            "FROM documents d LEFT JOIN agg a USING (doc_id) "
            "WHERE d.doc_id % 50 <> 0 ORDER BY d.doc_id"
        ),
        # decoration derived from doc_id exactly as ops/text.redact_pii
        # plants it; each class counted on the text state it is applied to,
        # then replaced globally — identical RE2 patterns in the same order
        "text_redact_pii": (
            "WITH dec AS (SELECT doc_id, text || ' contact user' || doc_id "
            "|| '@mail' || (doc_id % 7) || '.example.com from ' "
            "|| (10 + doc_id % 240) || '.' || (doc_id % 256) || '.' "
            "|| ((doc_id * 3) % 256) || '.' || ((doc_id * 7) % 256) "
            "|| ' or +1-555-' || (1000 + doc_id % 9000) AS t FROM documents), "
            "d1 AS (SELECT doc_id, t, regexp_replace(t, "
            "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g') "
            "AS t1 FROM dec), "
            "d2 AS (SELECT doc_id, t, t1, regexp_replace(t1, "
            "'\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g') "
            "AS t2 FROM d1), "
            "d3 AS (SELECT doc_id, t, t1, t2, regexp_replace(t2, "
            "'\\+1-555-\\d{4}\\b', '<PHONE>', 'g') AS t3 FROM d2) "
            "SELECT doc_id, "
            "len(regexp_extract_all(t, "
            "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))::BIGINT "
            "AS n_emails, "
            "len(regexp_extract_all(t1, "
            "'\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b'))::BIGINT AS n_ips, "
            "len(regexp_extract_all(t2, '\\+1-555-\\d{4}\\b'))::BIGINT "
            "AS n_phones, t3 AS redacted FROM d3 ORDER BY doc_id"
        ),
        # concat-chunk packing: global token stream in doc_id order, chunked
        # at 128; a doc spanning [s, e) overlaps sequences s//128 .. (e-1)//128
        "pack_sequences": (
            f"WITH tl AS (SELECT doc_id, {_TOKLIST} AS l FROM documents), "
            "c AS (SELECT doc_id, len(l)::BIGINT AS n FROM tl), "
            "cum AS (SELECT doc_id, n, coalesce(sum(n) OVER (ORDER BY doc_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT "
            "AS s FROM c), "
            "d AS (SELECT doc_id, n, s, s + n AS e FROM cum WHERE n > 0), "
            "x AS (SELECT doc_id, s, e, unnest(generate_series(s // 128, "
            "(e - 1) // 128)) AS seq_id FROM d) "
            "SELECT seq_id::BIGINT AS seq_id, doc_id, "
            "(greatest(s, seq_id * 128) - s)::BIGINT AS tok_start, "
            "(least(e, (seq_id + 1) * 128) - s)::BIGINT AS tok_end "
            "FROM x ORDER BY seq_id, doc_id"
        ),
        "pack_sequence_stats": (
            f"WITH tl AS (SELECT doc_id, {_TOKLIST} AS l FROM documents), "
            "c AS (SELECT doc_id, len(l)::BIGINT AS n FROM tl), "
            "cum AS (SELECT doc_id, n, coalesce(sum(n) OVER (ORDER BY doc_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT "
            "AS s FROM c), "
            "d AS (SELECT doc_id, n, s, s + n AS e FROM cum WHERE n > 0), "
            "x AS (SELECT doc_id, s, e, unnest(generate_series(s // 128, "
            "(e - 1) // 128)) AS seq_id FROM d) "
            "SELECT seq_id::BIGINT AS seq_id, count(*)::BIGINT AS n_docs, "
            "sum(least(e, (seq_id + 1) * 128) - greatest(s, seq_id * 128))"
            "::BIGINT AS n_tokens "
            "FROM x GROUP BY seq_id ORDER BY seq_id"
        ),
        # greedy fill as a recursive CTE over bin boundaries: each step
        # finds the last doc whose cumulative capped length fits the bin
        "pack_greedy": (
            f"WITH RECURSIVE tl AS (SELECT doc_id, {_TOKLIST} AS l "
            "FROM documents), "
            "c AS (SELECT doc_id, len(l)::BIGINT AS n FROM tl WHERE len(l) > 0), "
            "d AS (SELECT doc_id, least(n, 128) AS cap, "
            "row_number() OVER (ORDER BY doc_id)::BIGINT AS i FROM c), "
            "cum AS (SELECT doc_id, cap, i, sum(cap) OVER (ORDER BY i)::BIGINT "
            "AS cs FROM d), "
            "rec(bin, last_i, base) AS ("
            "SELECT -1::BIGINT, 0::BIGINT, 0::BIGINT "
            "UNION ALL "
            "SELECT r.bin + 1, "
            "greatest(r.last_i + 1, (SELECT coalesce(max(i), 0) FROM cum "
            "WHERE i > r.last_i AND cs - r.base <= 128)), "
            "(SELECT cs FROM cum WHERE i = greatest(r.last_i + 1, "
            "(SELECT coalesce(max(i), 0) FROM cum WHERE i > r.last_i "
            "AND cs - r.base <= 128))) "
            "FROM rec r WHERE r.last_i < (SELECT max(i) FROM cum)), "
            "bins AS (SELECT bin, last_i, lag(last_i, 1, 0) OVER "
            "(ORDER BY bin) AS prev_i FROM rec WHERE bin >= 0) "
            "SELECT bins.bin AS seq_id, cum.doc_id, cum.cap AS n_tokens "
            "FROM bins JOIN cum ON cum.i > bins.prev_i AND cum.i <= bins.last_i "
            "ORDER BY seq_id, doc_id"
        ),
        "ft_facet_assoc": _TOKS
        + ", hits AS (SELECT DISTINCT doc_id FROM toks WHERE tok = 'join') "
        "SELECT lang, sum(n_chars)::BIGINT AS sum_value, "
        "max(n_chars)::BIGINT AS max_value, count(*)::BIGINT AS n_docs "
        "FROM documents JOIN hits USING (doc_id) GROUP BY lang "
        "ORDER BY sum_value DESC, lang",
        "quality_gopher_metrics": _QUALITY_BASE
        + "SELECT * FROM qmetrics ORDER BY doc_id",
        # integer-space thresholds: min_words=30, mean_wlen in [3,10],
        # alpha>=4/5, symbols<=1/10, bullet<=9/10, ellipsis<=3/10,
        # stop_hits>=1, dup_lines<=3/10, top2gram<=1/5 — identical
        # rationals to the QualityThresholds passed in queries()
        "quality_gopher_keep": _QUALITY_BASE
        + "SELECT doc_id FROM qmetrics WHERE n_words >= 30 "
        "AND n_words <= 100000 "
        "AND sum_wlen >= 3 * n_words AND sum_wlen <= 10 * n_words "
        "AND 5 * n_alpha_words >= 4 * n_words "
        "AND 10 * n_symbols <= n_words "
        "AND 10 * n_bullet_lines <= 9 * n_lines "
        "AND 10 * n_ellipsis_lines <= 3 * n_lines "
        "AND stop_hits >= 1 "
        "AND 10 * (n_lines - n_distinct_lines) <= 3 * n_lines "
        "AND 5 * top2_num <= top2_den "
        "ORDER BY doc_id",
        # PQ with exact rescore recovers the exact brute top-10 whenever the
        # true top-10 survive the ADC candidate stage (recall 1.0 at the
        # contract scales, asserted — the oversampled rescore contract)
        "ann_pq_top10": (
            "SELECT row_number() OVER (ORDER BY list_cosine_similarity("
            "CAST(embedding AS DOUBLE[]), (SELECT CAST(embedding AS DOUBLE[]) "
            "FROM embeddings WHERE vec_id = 0)) DESC, vec_id)::BIGINT AS rank, "
            "vec_id FROM embeddings "
            "ORDER BY list_cosine_similarity(CAST(embedding AS DOUBLE[]), "
            "(SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)) "
            "DESC, vec_id LIMIT 10"
        ),
        # binary quantization with exact rescore recovers the exact brute
        # top-10 whenever the true top-10 survive the Hamming candidate
        # stage (recall 1.0 at the contract scales, asserted)
        "ann_binary_top10": (
            "SELECT row_number() OVER (ORDER BY list_cosine_similarity("
            "CAST(embedding AS DOUBLE[]), (SELECT CAST(embedding AS DOUBLE[]) "
            "FROM embeddings WHERE vec_id = 0)) DESC, vec_id)::BIGINT AS rank, "
            "vec_id FROM embeddings "
            "ORDER BY list_cosine_similarity(CAST(embedding AS DOUBLE[]), "
            "(SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)) "
            "DESC, vec_id LIMIT 10"
        ),
        "ann_cosine_top10": (
            "SELECT row_number() OVER (ORDER BY list_cosine_similarity("
            "CAST(embedding AS DOUBLE[]), (SELECT CAST(embedding AS DOUBLE[]) "
            "FROM embeddings WHERE vec_id = 0)) DESC, vec_id)::BIGINT AS rank, "
            "vec_id FROM embeddings "
            "ORDER BY list_cosine_similarity(CAST(embedding AS DOUBLE[]), "
            "(SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)) "
            "DESC, vec_id LIMIT 10"
        ),
        "agg_lineitem_pricing": (
            "SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty, "
            "round(sum(l_extendedprice), 2) AS sum_base_price, "
            "round(sum(round(l_extendedprice * (1 - l_discount), 4)), 4) AS sum_disc_price, "
            "count(*)::BIGINT AS count_order, "
            "round(sum(l_quantity) / count(*), 4) AS avg_qty "
            "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02' "
            "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"
        ),
        "join_orders_per_nation": (
            "SELECT n_name, count(*)::BIGINT AS order_count FROM orders "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN nation ON c_nationkey = n_nationkey "
            "GROUP BY n_name ORDER BY n_name"
        ),
        "sort_top_orders": (
            "SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice FROM orders "
            "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"
        ),
        "events_tumbling_daily": (
            "SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, "
            "count(*)::BIGINT AS n_events, round(sum(round(value, 6)), 6) AS sum_value "
            "FROM events GROUP BY 1, 2 ORDER BY event_type, day"
        ),
        "events_top_users": (
            "SELECT user_id, count(*)::BIGINT AS n_events FROM events "
            "GROUP BY user_id ORDER BY n_events DESC, user_id LIMIT 10"
        ),
        # session windows: break when the gap to the previous event of the
        # same user exceeds 30 min; session_id 0-based per user
        "events_sessions": (
            "WITH o AS (SELECT user_id, ts, event_id, "
            "CASE WHEN ts - lag(ts) OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id) "
            "> INTERVAL '30 minutes' THEN 1 ELSE 0 END AS brk FROM events), "
            "s AS (SELECT user_id, ts, sum(brk) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_id "
            "FROM o) "
            "SELECT user_id, session_id::BIGINT AS session_id, "
            "min(ts) AS session_start, max(ts) AS session_end, "
            "count(*)::BIGINT AS n_events FROM s GROUP BY user_id, session_id "
            "ORDER BY user_id, session_id"
        ),
        # as-of LEFT join; right side pre-deduped to one row per (user, ts)
        # by max(event_id) — the engine's deterministic tie-break
        "events_asof_purchase_click": (
            "WITH p AS (SELECT event_id, ts, user_id FROM events "
            "WHERE event_type = 'purchase'), "
            "c AS (SELECT user_id, ts, max(event_id) AS event_id FROM events "
            "WHERE event_type = 'click' GROUP BY user_id, ts) "
            "SELECT p.user_id, p.ts, p.event_id, c.ts AS r_ts, "
            "c.event_id AS r_event_id "
            "FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts "
            "ORDER BY p.user_id, p.ts, p.event_id"
        ),
        # banded range join: events strictly after a signup, within 30 min
        "events_signup_followups": (
            "SELECT s.user_id, s.event_id, s.ts, e.event_id AS r_event_id, "
            "e.ts AS r_ts FROM (SELECT * FROM events "
            "WHERE event_type = 'signup') s JOIN events e "
            "ON e.user_id = s.user_id AND e.ts > s.ts "
            "AND e.ts <= s.ts + INTERVAL '30 minutes' "
            "ORDER BY s.user_id, s.event_id, r_event_id"
        ),
        # discrete quantile: smallest rounded value with cumcount >= ceil(q*n)
        "events_value_quantiles": (
            "WITH h AS (SELECT round(value, 2) AS v, count(*) AS c FROM events "
            "GROUP BY 1), t AS (SELECT sum(c) AS n FROM h), "
            "cum AS (SELECT v, sum(c) OVER (ORDER BY v) AS cs FROM h) "
            "SELECT q, (SELECT min(v) FROM cum "
            "WHERE cs >= greatest(1, ceil(q * (SELECT n FROM t)))) AS value "
            "FROM (VALUES (0.25), (0.5), (0.75), (0.9)) qs(q) ORDER BY q"
        ),
        "events_median_by_type": (
            "WITH h AS (SELECT event_type, round(value, 2) AS v, count(*) AS c "
            "FROM events GROUP BY 1, 2), "
            "t AS (SELECT event_type, sum(c) AS n FROM h GROUP BY 1), "
            "cum AS (SELECT event_type, v, "
            "sum(c) OVER (PARTITION BY event_type ORDER BY v) AS cs FROM h) "
            "SELECT t.event_type, (SELECT min(v) FROM cum "
            "WHERE cum.event_type = t.event_type "
            "AND cs >= greatest(1, ceil(0.5 * t.n))) AS value "
            "FROM t ORDER BY t.event_type"
        ),
        "events_session_windows": (
            "WITH g AS (SELECT user_id, ts, CASE WHEN ts - lag(ts) OVER "
            "(PARTITION BY user_id ORDER BY ts) > INTERVAL 30 MINUTE OR "
            "lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL THEN 1 ELSE 0 END "
            "AS new_s FROM events), "
            "s AS (SELECT user_id, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts "
            "ROWS UNBOUNDED PRECEDING) AS sid FROM g) "
            "SELECT user_id, max(sid)::BIGINT AS n_sessions, "
            "max(cnt)::BIGINT AS max_session_events, sum(cnt)::BIGINT AS n_events FROM "
            "(SELECT user_id, sid, count(*) AS cnt FROM s GROUP BY user_id, sid) "
            "GROUP BY user_id ORDER BY user_id"
        ),
        "events_sliding_counts": (
            "WITH w AS (SELECT event_type, "
            "to_timestamp((epoch_us(ts) // 86400000000 - s.i) * 86400)::TIMESTAMP "
            "AS window_start FROM events, (SELECT unnest(range(7)) AS i) s "
            "WHERE epoch_us(ts) // 86400000000 - s.i >= 0) "
            "SELECT event_type, strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start, "
            "count(*)::BIGINT AS n_events FROM w "
            "GROUP BY 1, 2 ORDER BY event_type, window_start"
        ),
        "join_q5_local_supplier": (
            "SELECT n_name, sum(CAST(round(l_extendedprice * "
            "(1 - l_discount) * 10000) AS BIGINT))::DOUBLE / 10000 "
            "AS revenue "
            "FROM customer, orders, lineitem, supplier, nation, region "
            "WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey "
            "AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey "
            "AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey "
            "AND r_name = 'ASIA' "
            "AND o_orderdate >= TIMESTAMP '1995-01-01' "
            "AND o_orderdate < TIMESTAMP '1996-01-01' "
            "GROUP BY n_name ORDER BY revenue DESC, n_name"
        ),
        "join_order_revenue": (
            "SELECT o_orderkey, round(sum(round(l_extendedprice * (1 - l_discount), 4)), 4) "
            "AS revenue, count(*)::BIGINT AS n_items "
            "FROM orders JOIN lineitem ON o_orderkey = l_orderkey "
            "GROUP BY o_orderkey ORDER BY revenue DESC, o_orderkey LIMIT 10"
        ),
        "ft_highlight_join": (
            "WITH hits AS (SELECT doc_id FROM (SELECT doc_id, "
            "unnest(string_split_regex(lower(text), '[^a-z0-9_]+')) AS tok "
            "FROM documents) WHERE tok = 'join' GROUP BY doc_id), "
            "st AS (SELECT d.doc_id, lower(d.text) AS lt, "
            "length(regexp_extract(lower(d.text), "
            "'^(.*?(^|[^a-z0-9_]))join([^a-z0-9_]|$)', 1, 's')) AS s "
            "FROM documents d JOIN hits USING (doc_id)) "
            "SELECT doc_id, s::BIGINT AS start_offset, (s + 4)::BIGINT AS end_offset, "
            "substring(lt, greatest(1, s - 20 + 1), (s + 4 + 20) - greatest(0, s - 20)) "
            "AS fragment FROM st ORDER BY doc_id"
        ),
        "part_price_stats": (
            "SELECT p_type, count(*)::BIGINT AS n_parts, "
            "round(min(p_retailprice), 2) AS min_price, "
            "round(max(p_retailprice), 2) AS max_price, "
            "round(avg(p_retailprice), 4) AS avg_price "
            "FROM part GROUP BY p_type ORDER BY p_type"
        ),
        "distinct_order_priorities": (
            "SELECT DISTINCT o_orderpriority FROM orders ORDER BY o_orderpriority"
        ),
        "grouped_topk_orders": (
            "SELECT o_orderpriority, o_orderkey, round(o_totalprice, 2) AS o_totalprice "
            "FROM (SELECT *, row_number() OVER (PARTITION BY o_orderpriority "
            "ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders) "
            "WHERE rn <= 3 ORDER BY o_orderpriority, o_totalprice DESC, o_orderkey"
        ),
        # GPT-2-style pretokenization count: DuckDB's RE2 implements the
        # identical leftmost-first alternation, verified mismatch-free
        # against Python re on every doc
        "text_bpe_token_count": (
            "SELECT doc_id, len(regexp_extract_all(text, "
            "'''(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^\\sA-Za-z0-9]+|\\s+'"
            ")) AS n_bpe_tokens FROM documents ORDER BY doc_id"
        ),
        # deterministic fmix32-keyed sample (rate = 0x1a/256): the SQL
        # replays the engine's vectorized xor/shift/multiply mix bit-exactly
        # (fmix32_sql); l_quantity is integer-valued so the double mean is
        # order-independent and exact on both sides
        "sampled_avg_quantity": (
            "SELECT round(avg(l_quantity), 4) AS avg_qty_sampled FROM lineitem "
            f"WHERE {_fmix32_sql('l_orderkey * 8 + l_linenumber')} < "
            f"{_hex_thr('1a')}"
        ),
        "filter_high_value_orders": (
            "SELECT o_orderpriority, count(*)::BIGINT AS n_orders FROM orders "
            "WHERE o_orderstatus = 'O' AND o_totalprice > 100000 "
            "GROUP BY o_orderpriority ORDER BY o_orderpriority"
        ),
        # curation: deterministic fmix32-keyed sampling (SQL replays the
        # engine's integer mix bit-exactly); shingle contamination vs the
        # doc_id%50==0 "benchmark" slice (exact string shingles)
        "curate_sample_hash": (
            "SELECT doc_id FROM documents WHERE "
            f"{_fmix32_sql('doc_id')} < {_hex_thr('2a')} ORDER BY doc_id"
        ),
        "curate_domain_cap": (
            "SELECT doc_id, source FROM ("
            "SELECT doc_id, source, row_number() OVER ("
            f"PARTITION BY source ORDER BY {_fmix32_sql('doc_id')}, doc_id"
            ") AS rn FROM documents) WHERE rn <= 40 ORDER BY doc_id"
        ),
        "curate_sample_stratified": (
            "SELECT doc_id FROM documents WHERE "
            f"{_fmix32_sql('doc_id')} < "
            f"CASE lang WHEN 'en' THEN {_hex_thr('80')} "
            f"WHEN 'fr' THEN {_hex_thr('40')} "
            f"WHEN 'de' THEN {_hex_thr('20')} ELSE 0 END ORDER BY doc_id"
        ),
        "curate_decontaminate": (
            "WITH tl AS (SELECT doc_id, " + _TOKLIST + " AS l FROM documents), "
            "sh AS (SELECT DISTINCT doc_id, "
            "unnest(list_transform(generate_series(1, len(l) - 2), "
            "i -> array_to_string(l[i:i+2], ' '))) AS s FROM tl "
            "WHERE len(l) >= 3) "
            "SELECT DISTINCT doc_id FROM sh WHERE doc_id % 50 <> 0 "
            "AND s IN (SELECT s FROM sh WHERE doc_id % 50 = 0) "
            "ORDER BY doc_id"
        ),
        # geo: derived points (same integer derivation as pipelines/geo.py);
        # every pinned constant leaves km-wide decision margins at all sfs,
        # so numpy-vs-DuckDB ulp noise cannot flip a hit or a rank
        "geo_box_hits": _GEO_PTS
        + "SELECT c_custkey FROM pts WHERE lat >= -30.0 AND lat <= 30.0 "
        "AND (lon >= 100.0 OR lon <= -160.0) ORDER BY c_custkey",
        "geo_distance_hits": _GEO_PTS
        + f"SELECT c_custkey FROM pts WHERE {_GEO_DIST} <= 2000000.0 "
        "ORDER BY c_custkey",
        "geo_knn_top10": _GEO_PTS
        + f"SELECT row_number() OVER (ORDER BY d, c_custkey) AS rank, "
        f"c_custkey FROM (SELECT c_custkey, {_GEO_DIST} AS d FROM pts) "
        "ORDER BY d, c_custkey LIMIT 10",
        # distance feature: float64 pivot/(pivot+d) narrowed once to float32
        "geo_distance_feature_top10": _GEO_PTS
        + f"SELECT row_number() OVER (ORDER BY d, c_custkey) AS rank, "
        f"c_custkey, round(CAST(CAST(1000000.0 / (1000000.0 + d) AS REAL) "
        f"AS DOUBLE), 6) AS score_r6 "
        f"FROM (SELECT c_custkey, {_GEO_DIST} AS d FROM pts) "
        "ORDER BY d, c_custkey LIMIT 10",
        # even-odd crossing count replayed edge-by-edge — identical float64
        # expression shape as ops/geo.point_in_polygon
        "geo_polygon_hits": _GEO_PTS
        + "SELECT c_custkey FROM pts WHERE ("
        + " + ".join(
            f"(CASE WHEN (({yi} > lat) <> ({yj} > lat)) AND "
            f"lon < ({xj} - {xi}) * (lat - {yi}) / ({yj} - {yi}) + {xi} "
            "THEN 1 ELSE 0 END)"
            for (yi, xi), (yj, xj) in (
                lambda vs: [(vs[i], vs[i - 1]) for i in range(len(vs))]
            )([(-10.0, -30.0), (55.0, 0.0), (-10.0, 30.0), (20.0, 0.0)])
        )
        + ") % 2 = 1 ORDER BY c_custkey",
        # intervals: for UNIT terms an ordered chain's total gap depends
        # only on its ends (p_last - p_first - (k-1)), so doc-hit level
        # minimal-interval semantics reduce to an increasing-positions join
        "ft_interval_ordered_hits": _PT
        + "SELECT DISTINCT a.doc_id FROM pt a JOIN pt b USING (doc_id) "
        "JOIN pt c USING (doc_id) WHERE a.tok = 'table' AND b.tok = 'row' "
        "AND c.tok = 'filter' AND b.pos > a.pos AND c.pos > b.pos "
        "ORDER BY doc_id",
        "ft_interval_maxgaps": _PT
        + "SELECT DISTINCT a.doc_id FROM pt a JOIN pt b USING (doc_id) "
        "JOIN pt c USING (doc_id) WHERE a.tok = 'table' AND b.tok = 'row' "
        "AND c.tok = 'filter' AND b.pos > a.pos AND c.pos > b.pos "
        "AND c.pos - a.pos - 2 <= 2 ORDER BY doc_id",
        "ft_interval_unordered_hits": _PT
        + "SELECT DISTINCT a.doc_id FROM pt a JOIN pt b USING (doc_id) "
        "WHERE a.tok = 'window' AND b.tok = 'batch' "
        "AND abs(a.pos - b.pos) - 1 <= 1 ORDER BY doc_id",
        # containing: MINIMAL ordered (table, filter) pairs = first 'filter'
        # after each 'table', keeping per end only the LATEST start; hit iff
        # some 'row' position lies inside [start, end]
        "ft_interval_containing_hits": _PT
        + ", pairs AS (SELECT a.doc_id, a.pos AS s, min(b.pos) AS e "
        "FROM pt a JOIN pt b USING (doc_id) "
        "WHERE a.tok = 'table' AND b.tok = 'filter' AND b.pos > a.pos "
        "GROUP BY a.doc_id, a.pos), "
        "minimal AS (SELECT doc_id, max(s) AS s, e FROM pairs "
        "GROUP BY doc_id, e) "
        "SELECT DISTINCT m.doc_id FROM minimal m JOIN pt r USING (doc_id) "
        "WHERE r.tok = 'row' AND r.pos >= m.s AND r.pos <= m.e "
        "ORDER BY doc_id",
        # hierarchical taxonomy facets over the derived path
        # cat = source/lang/(long|short by n_chars >= 300)
        "ft_facet_path_top": _TOKS
        + ", cat AS (SELECT doc_id, source || '/' || lang || '/' || "
        "CASE WHEN n_chars >= 300 THEN 'long' ELSE 'short' END AS c "
        "FROM documents), "
        "hits AS (SELECT DISTINCT doc_id FROM toks WHERE tok = 'join'), "
        "lv AS (SELECT doc_id, unnest([split_part(c, '/', 1), "
        "split_part(c, '/', 1) || '/' || split_part(c, '/', 2), c]) AS path "
        "FROM cat JOIN hits USING (doc_id)) "
        "SELECT path, count(*)::BIGINT AS n_docs FROM lv "
        "GROUP BY path ORDER BY path",
        "ft_drilldown_path_hits": _TOKS
        + "SELECT DISTINCT t.doc_id FROM toks t JOIN documents d USING (doc_id) "
        "WHERE t.tok = 'join' AND d.source = 'src3' AND d.lang = 'en' "
        "ORDER BY doc_id",
        # per-position payloads: the derived corpus annotates the token at
        # position p as tok|((p*31+len(tok))%101), so the payload of every
        # occurrence is pure (pos, token) arithmetic the _PT CTE replays
        "ft_payload_sum": _PT
        + "SELECT doc_id, SUM((pos*31 + length(tok)) % 101)::BIGINT AS pay "
        "FROM pt WHERE tok = 'spark' GROUP BY doc_id ORDER BY doc_id",
        "ft_payload_max": _PT
        + "SELECT doc_id, MAX((pos*31 + length(tok)) % 101)::BIGINT AS pay "
        "FROM pt WHERE tok = 'spark' GROUP BY doc_id ORDER BY doc_id",
        # passage highlighter: fixed 32-token windows, score = query-term
        # occurrences, rank (n desc, passage asc), top 2 per doc
        "ft_passages_top": _PT
        + ", pc AS (SELECT doc_id, (pos // 32)::BIGINT AS passage, "
        "count(*)::BIGINT AS n_matches FROM pt "
        "WHERE tok IN ('join', 'hash') GROUP BY doc_id, pos // 32), "
        "rk AS (SELECT doc_id, passage, n_matches, row_number() OVER "
        "(PARTITION BY doc_id ORDER BY n_matches DESC, passage ASC)::BIGINT "
        "AS rank FROM pc) "
        "SELECT doc_id, passage, n_matches, rank FROM rk WHERE rank <= 2 "
        "ORDER BY doc_id, rank",
        # BM25-weighted passages (PassageScorer.java:63-104): the engine's
        # exact float32 operation order — weight's REAL numDocs then double
        # log then REAL cast, all-REAL tf, REAL products summed in DOUBLE,
        # REAL position norm, final REAL cast. Token units, pivot 14.
        "ft_passages_bm25": _PT
        + ", pc2 AS (SELECT doc_id, (pos // 32)::BIGINT AS passage, tok, "
        "count(*)::BIGINT AS n FROM pt WHERE tok IN ('join', 'hash') "
        "GROUP BY doc_id, pos // 32, tok), "
        "dl AS (SELECT doc_id, len(l)::BIGINT AS dlen FROM tl), "
        "tt AS (SELECT doc_id, tok, sum(n)::BIGINT AS ttf FROM pc2 "
        "GROUP BY doc_id, tok), "
        "w AS (SELECT tt.doc_id, tt.tok, "
        "(CAST(1.2 AS REAL) + CAST(1 AS REAL)) * CAST(ln(1.0 + "
        "(CAST(CAST(1 AS REAL) + CAST(dlen AS REAL) / CAST(14 AS REAL) "
        "AS DOUBLE) + 0.5) / (ttf + 0.5)) AS REAL) AS w32 "
        "FROM tt JOIN dl USING (doc_id)), "
        "nc AS (SELECT CAST(1.2 AS REAL) * ((CAST(1 AS REAL) - "
        "CAST(0.75 AS REAL)) + CAST(0.75 AS REAL) * (CAST(32 AS REAL) / "
        "CAST(14 AS REAL))) AS c), "
        "ct AS (SELECT p.doc_id, p.passage, CAST(CAST(p.n AS REAL) / "
        "(CAST(p.n AS REAL) + (SELECT c FROM nc)) * w.w32 AS DOUBLE) "
        "AS contrib FROM pc2 p JOIN w ON p.doc_id = w.doc_id "
        "AND p.tok = w.tok), "
        "sc2 AS (SELECT doc_id, passage, CAST(sum(contrib) * "
        "CAST(CAST(1 AS REAL) + CAST(1 AS REAL) / CAST(ln(CAST("
        "CAST(14 AS REAL) + CAST(passage * 32 AS REAL) AS DOUBLE)) AS REAL) "
        "AS DOUBLE) AS REAL) AS s FROM ct GROUP BY doc_id, passage), "
        "rk2 AS (SELECT doc_id, passage, s, row_number() OVER "
        "(PARTITION BY doc_id ORDER BY s DESC, passage ASC)::BIGINT AS rank "
        "FROM sc2) "
        "SELECT doc_id, passage, rank, round(s::DOUBLE, 6) AS score_r6 "
        "FROM rk2 WHERE rank <= 2 ORDER BY doc_id, rank",
        # fuzzy suggester: dictionary terms whose first-4-chars prefix is
        # within 1 edit of the (analyzed) typed text, by doc_freq desc
        "ft_suggest_fuzzy": _TOKS
        + "SELECT tok AS term, count(DISTINCT doc_id)::BIGINT AS doc_freq "
        "FROM toks WHERE tok <> '' GROUP BY tok "
        "HAVING levenshtein('hach', substr(tok, 1, 4)) <= 1 "
        "ORDER BY doc_freq DESC, term LIMIT 10",
        # multinomial NB with add-one smoothing; integer-count model so the
        # argmax is reproducible in SQL (ties broken by class name asc)
        "classify_nb_lang": (
            "WITH train AS (SELECT * FROM documents WHERE doc_id % 5 <> 0), "
            "test AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0), "
            "tt0 AS (SELECT lang, unnest(string_split_regex(lower(text), "
            "'[^a-z0-9_]+')) AS tok FROM train), "
            "tt AS (SELECT lang, tok, count(*)::DOUBLE AS cnt FROM tt0 "
            "WHERE tok <> '' GROUP BY 1, 2), "
            "cls AS (SELECT lang, count(*)::DOUBLE AS n_docs FROM train "
            "GROUP BY 1), "
            "tot AS (SELECT lang, sum(cnt) AS n_tok FROM tt GROUP BY 1), "
            "v AS (SELECT count(DISTINCT tok)::DOUBLE AS vsize FROM tt), "
            "n AS (SELECT count(*)::DOUBLE AS n FROM train), "
            "q AS (SELECT doc_id, unnest(string_split_regex(lower(text), "
            "'[^a-z0-9_]+')) AS tok FROM test), "
            "qq AS (SELECT doc_id, tok FROM q WHERE tok <> ''), "
            "contrib AS (SELECT qq.doc_id, c.lang, "
            "sum(ln(coalesce(tt.cnt, 0) + 1)) AS s_num, "
            "count(*)::DOUBLE AS n_tok_doc FROM qq CROSS JOIN cls c "
            "LEFT JOIN tt ON tt.lang = c.lang AND tt.tok = qq.tok "
            "GROUP BY 1, 2), "
            "scored AS (SELECT t.doc_id, c.lang, "
            "ln(c.n_docs / (SELECT n FROM n)) + coalesce(ct.s_num, 0) "
            "- coalesce(ct.n_tok_doc, 0) * ln(tot.n_tok + "
            "(SELECT vsize FROM v)) AS score FROM test t CROSS JOIN cls c "
            "JOIN tot ON tot.lang = c.lang LEFT JOIN contrib ct "
            "ON ct.doc_id = t.doc_id AND ct.lang = c.lang) "
            "SELECT doc_id, lang AS pred_lang FROM (SELECT doc_id, lang, "
            "row_number() OVER (PARTITION BY doc_id "
            "ORDER BY score DESC, lang) AS rn FROM scored) "
            "WHERE rn = 1 ORDER BY doc_id"
        ),
        # DirectSpellChecker: full-term edit distance, dist asc then df desc
        "ft_spellcheck": _TOKS
        + "SELECT * FROM (SELECT tok AS term, "
        "levenshtein('par', tok)::BIGINT AS dist, "
        "count(DISTINCT doc_id)::BIGINT AS doc_freq "
        "FROM toks WHERE tok <> '' AND tok <> 'par' GROUP BY tok) "
        "WHERE dist <= 2 ORDER BY dist, doc_freq DESC, term LIMIT 5",
    }
    # indexed shapes: generated from the same pinned constants the engine
    # uses (lucene_ray.pipelines.geo), operation order mirrored
    out.update(_shape_sql())
    # 996 absent-term standing queries prune to zero evaluations per batch;
    # the 4 real ones match exactly as in percolate_matches
    out["percolate_1k_queries"] = out["percolate_matches"]
    # scored BM25 top-k: float32-exact in SQL (_bm25_cte) — ranks AND
    # round(score, 6) both verified against DuckDB
    out["ft_bm25_top10_customer"] = _bm25_cte(["customer"]) + (
        "SELECT * FROM (SELECT doc_id, row_number() OVER "
        "(ORDER BY s DESC, doc_id)::BIGINT AS rank, "
        "round(s::DOUBLE, 6) AS score_r6 FROM sc) "
        "WHERE rank <= 10 ORDER BY rank"
    )
    # XML query: must join, not scan, filter 200 <= n_chars <= 900
    out["ft_xml_query_hits"] = _TOKS + (
        "SELECT DISTINCT t.doc_id FROM toks t JOIN documents d "
        "USING (doc_id) WHERE t.tok = 'join' "
        "AND d.n_chars BETWEEN 200 AND 900 "
        "AND t.doc_id NOT IN (SELECT doc_id FROM toks WHERE tok = 'scan') "
        "ORDER BY t.doc_id"
    )
    # similarity-seam scored oracles: double math + byte4-lossy dl + one
    # final float cast, exactly the engine's scorer pipelines
    _sim_base = (
        "WITH tl AS (SELECT doc_id, " + _TOKLIST + " AS l FROM documents), "
        "d AS (SELECT doc_id, len(l)::BIGINT AS dl FROM tl), "
        "stats AS (SELECT count(*)::DOUBLE AS n, "
        "sum(dl)::DOUBLE / count(*) AS avgdl FROM d), "
        "toks AS (SELECT doc_id, unnest(l) AS tok FROM tl), "
        "tf AS (SELECT doc_id, count(*)::BIGINT AS tf FROM toks "
        "WHERE tok = 'customer' GROUP BY doc_id), "
        "agg AS (SELECT count(*)::DOUBLE AS df, sum(tf)::DOUBLE AS F FROM tf), "
        f"ld AS (SELECT doc_id, CAST({_LOSSY_DL} AS DOUBLE) AS dl2 FROM d), "
    )
    _rank_tail = (
        "SELECT * FROM (SELECT doc_id, row_number() OVER "
        "(ORDER BY s DESC, doc_id)::BIGINT AS rank, "
        "round(s::DOUBLE, 6) AS score_r6 FROM sc) "
        "WHERE rank <= 10 ORDER BY rank"
    )
    out["ft_dfr_top10"] = _sim_base + (
        "tfn AS (SELECT tf.doc_id, tf.tf::DOUBLE * "
        "log2(1.0 + (SELECT avgdl FROM stats) / ld.dl2) AS tfn "
        "FROM tf JOIN ld USING (doc_id)), "
        "sc AS (SELECT doc_id, CAST(greatest(0.0, "
        "((SELECT F FROM agg) + 1.0) / ((SELECT df FROM agg) * (tfn + 1.0)) "
        "* tfn * log2(((SELECT n FROM stats) + 1.0) / "
        "((SELECT df FROM agg) + 0.5))) AS REAL) AS s FROM tfn) "
    ) + _rank_tail
    out["ft_axiomatic_top10"] = _sim_base + (
        "sc AS (SELECT tf.doc_id, CAST(greatest(0.0, "
        "(tf.tf::DOUBLE / (tf.tf::DOUBLE + 0.5 + 0.5 * ld.dl2 / "
        "(SELECT avgdl FROM stats))) * "
        "pow(((SELECT n FROM stats) + 1.0) / (SELECT df FROM agg), 0.35)"
        ") AS REAL) AS s FROM tf JOIN ld USING (doc_id)) "
    ) + _rank_tail
    # DFI chi-squared: expected = (F+1)*dl2/(T+1) with T = total tokens
    # (lossless, the engine uses sum_total_term_freq); zero at or below
    # expectation, else log2(chi2 + 1) — same double order as DFIScorer
    out["ft_dfi_top10"] = _sim_base + (
        "tot AS (SELECT sum(dl)::DOUBLE AS T FROM d), "
        "sc AS (SELECT tf.doc_id, CAST(CASE WHEN tf.tf::DOUBLE <= "
        "((SELECT F FROM agg) + 1.0) * ld.dl2 / ((SELECT T FROM tot) + 1.0) "
        "THEN 0.0 ELSE "
        "log2((tf.tf::DOUBLE - ((SELECT F FROM agg) + 1.0) * ld.dl2 / "
        "((SELECT T FROM tot) + 1.0)) * (tf.tf::DOUBLE - "
        "((SELECT F FROM agg) + 1.0) * ld.dl2 / ((SELECT T FROM tot) + 1.0)) "
        "/ (((SELECT F FROM agg) + 1.0) * ld.dl2 / "
        "((SELECT T FROM tot) + 1.0)) + 1.0) END AS REAL) AS s "
        "FROM tf JOIN ld USING (doc_id)) "
    ) + _rank_tail
    # IB LL/DF/H1: lambda float32 round-trip (LambdaDF is a Java float),
    # tfn = tf * 1 * (avgdl / dl2), s = -ln(lambda / (tfn + lambda))
    out["ft_ib_top10"] = _sim_base + (
        "lam AS (SELECT CAST(CAST(((SELECT df FROM agg) + 1.0) / "
        "((SELECT n FROM stats) + 1.0) AS REAL) AS DOUBLE) AS l), "
        "sc AS (SELECT tf.doc_id, CAST(greatest(0.0, "
        "-ln((SELECT l FROM lam) / (tf.tf::DOUBLE * 1.0 * "
        "((SELECT avgdl FROM stats) / ld.dl2) + (SELECT l FROM lam)))"
        ") AS REAL) AS s FROM tf JOIN ld USING (doc_id)) "
    ) + _rank_tail
    # raw tf as the score
    out["ft_rawtf_top10"] = _sim_base + (
        "sc AS (SELECT doc_id, CAST(tf AS REAL) AS s FROM tf) "
    ) + _rank_tail
    # MultiSimilarity(RawTF, IB LL/DF/H1): float32(tf) + float32(ib) with
    # one more float32 cast — the _SumScorer accumulation order
    out["ft_multisim_top10"] = _sim_base + (
        "lam AS (SELECT CAST(CAST(((SELECT df FROM agg) + 1.0) / "
        "((SELECT n FROM stats) + 1.0) AS REAL) AS DOUBLE) AS l), "
        "sc AS (SELECT tf.doc_id, CAST("
        "CAST(tf.tf AS REAL) + CAST(greatest(0.0, "
        "-ln((SELECT l FROM lam) / (tf.tf::DOUBLE * 1.0 * "
        "((SELECT avgdl FROM stats) / ld.dl2) + (SELECT l FROM lam)))"
        ") AS REAL) AS REAL) AS s FROM tf JOIN ld USING (doc_id)) "
    ) + _rank_tail
    # ---- round-5 similarity grid (float32-exact: double pipeline, same
    # operation order as the GridScorer kernels, one REAL cast) ----
    _N = "(SELECT n FROM stats)"
    _AVG = "(SELECT avgdl FROM stats)"
    _DF = "(SELECT df FROM agg)"
    _F = "(SELECT F FROM agg)"
    _T = "(SELECT T FROM tot)"
    _tot = "tot AS (SELECT sum(dl)::DOUBLE AS T FROM d), "
    # DFR G x L x H1 (c=1): lam=(F+1)/(N+F+1); tfn=tf*(avgdl/dl);
    # s = (B2 - (B2-A)/(1+tfn)) * 1
    out["ft_dfr_g_top10"] = _sim_base + (
        f"g AS (SELECT log2(({_F} + 1.0) / ({_N} + ({_F} + 1.0)) + 1.0) AS A, "
        f"log2((1.0 + ({_F} + 1.0) / ({_N} + ({_F} + 1.0))) / "
        f"(({_F} + 1.0) / ({_N} + ({_F} + 1.0)))) AS B2), "
        "sc AS (SELECT tf.doc_id, CAST(((SELECT B2 FROM g) - "
        "((SELECT B2 FROM g) - (SELECT A FROM g)) / "
        f"(1.0 + (tf.tf::DOUBLE * 1.0) * ({_AVG} / ld.dl2))) * 1.0 AS REAL) "
        "AS s FROM tf JOIN ld USING (doc_id)) "
    ) + _rank_tail
    # DFR Ine x B x H2 (c=1): ne=N*(1-((N-1)/N)^F);
    # A=log2((N+1)/(ne+0.5)); ae=(F+2)/(df+1); tfn=tf*log2(1+avgdl/dl)
    out["ft_dfr_ine_top10"] = _sim_base + (
        f"ine AS (SELECT log2(({_N} + 1.0) / ({_N} * (1.0 - "
        f"pow(({_N} - 1.0) / {_N}, {_F})) + 0.5)) AS A, "
        f"({_F} + 2.0) / ({_DF} + 1.0) AS ae), "
        "sc AS (SELECT tf.doc_id, CAST((SELECT A FROM ine) * "
        "(SELECT ae FROM ine) * (1.0 - 1.0 / (1.0 + tf.tf::DOUBLE * "
        f"log2(1.0 + {_AVG} / ld.dl2))) AS REAL) AS s "
        "FROM tf JOIN ld USING (doc_id)) "
    ) + _rank_tail
    # DFR IF x B x Z (z=float32(0.3)): A=log2(1+(N+1)/(F+0.5));
    # ae=(F+2)/(df+1); tfn=tf*pow(avgdl/dl, z)
    out["ft_dfr_ifz_top10"] = _sim_base + (
        f"ifz AS (SELECT log2(1.0 + ({_N} + 1.0) / ({_F} + 0.5)) AS A, "
        f"({_F} + 2.0) / ({_DF} + 1.0) AS ae), "
        "sc AS (SELECT tf.doc_id, CAST((SELECT A FROM ifz) * "
        "(SELECT ae FROM ifz) * (1.0 - 1.0 / (1.0 + tf.tf::DOUBLE * "
        f"pow({_AVG} / ld.dl2, CAST(0.3 AS REAL)))) AS REAL) AS s "
        "FROM tf JOIN ld USING (doc_id)) "
    ) + _rank_tail
    # DFR In x L x H3 (mu=800): prior = FLOAT32 mu*((F+1f)/(T+1f))
    # (NormalizationH3's float fields), tfn=(tf+prior)/(dl+mu)*mu;
    # A=log2((N+1)/(df+0.5)); ae=1
    out["ft_dfr_h3_top10"] = _sim_base + _tot + (
        f"h3 AS (SELECT log2(({_N} + 1.0) / ({_DF} + 0.5)) AS A, "
        f"CAST(CAST(800 AS REAL) * ((CAST({_F} AS REAL) + CAST(1 AS REAL)) "
        f"/ (CAST({_T} AS REAL) + CAST(1 AS REAL))) AS DOUBLE) AS prior), "
        "sc AS (SELECT tf.doc_id, CAST((SELECT A FROM h3) * 1.0 * "
        "(1.0 - 1.0 / (1.0 + (tf.tf::DOUBLE + (SELECT prior FROM h3)) "
        "/ (ld.dl2 + 800.0) * 800.0)) AS REAL) AS s "
        "FROM tf JOIN ld USING (doc_id)) "
    ) + _rank_tail
    # IB SPL x TTF x H2 (c=1): lam=float32((F+1)/(N+1));
    # tfn=tf*log2(1+avgdl/dl); q=1-1/(tfn+1);
    # s=-ln((lam^q - lam)/(1 - lam))
    out["ft_ib_spl_top10"] = _sim_base + (
        f"lam AS (SELECT CAST(CAST(({_F} + 1.0) / ({_N} + 1.0) AS REAL) "
        "AS DOUBLE) AS l), "
        "tfn AS (SELECT tf.doc_id, tf.tf::DOUBLE * "
        f"log2(1.0 + {_AVG} / ld.dl2) AS t FROM tf JOIN ld USING (doc_id)), "
        "sc AS (SELECT doc_id, CAST(-ln((pow((SELECT l FROM lam), "
        "1.0 - 1.0 / (t + 1.0)) - (SELECT l FROM lam)) / "
        "(1.0 - (SELECT l FROM lam))) AS REAL) AS s FROM tfn) "
    ) + _rank_tail
    # Axiomatic variants (s=0.25, k=float32(0.35), queryLen=1):
    _AX_TF = "(1.0 + ln(1.0 + ln(tf.tf::DOUBLE + 1.0)))"
    _AX_LN = f"(({_AVG} + 0.25) / ({_AVG} + ld.dl2 * 0.25))"
    _AX_IDF_EXP = f"pow(({_N} + 1.0) / {_DF}, CAST(0.35 AS REAL))"
    _AX_IDF_LOG = f"ln(({_N} + 1.0) / {_DF})"
    out["ft_axiomatic_f1exp_top10"] = _sim_base + (
        "sc AS (SELECT tf.doc_id, CAST(greatest(0.0, "
        f"{_AX_TF} * {_AX_LN} * {_AX_IDF_EXP} * 1.0) AS REAL) AS s "
        "FROM tf JOIN ld USING (doc_id)) "
    ) + _rank_tail
    out["ft_axiomatic_f1log_top10"] = _sim_base + (
        "sc AS (SELECT tf.doc_id, CAST(greatest(0.0, "
        f"{_AX_TF} * {_AX_LN} * {_AX_IDF_LOG} * 1.0) AS REAL) AS s "
        "FROM tf JOIN ld USING (doc_id)) "
    ) + _rank_tail
    out["ft_axiomatic_f2log_top10"] = _sim_base + (
        "sc AS (SELECT tf.doc_id, CAST(greatest(0.0, "
        "tf.tf::DOUBLE / (tf.tf::DOUBLE + 0.25 + 0.25 * ld.dl2 / "
        f"{_AVG}) * {_AX_IDF_LOG} * 1.0) AS REAL) AS s "
        "FROM tf JOIN ld USING (doc_id)) "
    ) + _rank_tail
    # F3: gamma=(dl-1)*0.25*1/avgdl, clamped AFTER the boost multiply
    out["ft_axiomatic_f3exp_top10"] = _sim_base + (
        "sc AS (SELECT tf.doc_id, CAST(greatest(0.0, "
        f"({_AX_TF} * {_AX_IDF_EXP} - (ld.dl2 - 1.0) * 0.25 * 1.0 / "
        f"{_AVG}) * 1.0) AS REAL) AS s FROM tf JOIN ld USING (doc_id)) "
    ) + _rank_tail
    out["ft_axiomatic_f3log_top10"] = _sim_base + (
        "sc AS (SELECT tf.doc_id, CAST(greatest(0.0, "
        f"({_AX_TF} * {_AX_IDF_LOG} - (ld.dl2 - 1.0) * 0.25 * 1.0 / "
        f"{_AVG}) * 1.0) AS REAL) AS s FROM tf JOIN ld USING (doc_id)) "
    ) + _rank_tail
    # IndriDirichlet (mu=2000): p=F/T (no +1), UNCLAMPED log — scores are
    # negative; boost is ignored by the reference's score()
    out["ft_indri_top10"] = _sim_base + _tot + (
        "sc AS (SELECT tf.doc_id, CAST(ln((tf.tf::DOUBLE + 2000.0 * "
        f"({_F} / {_T})) / (ld.dl2 + 2000.0)) AS REAL) AS s "
        "FROM tf JOIN ld USING (doc_id)) "
    ) + _rank_tail
    # bigram shingle hit set == token adjacency (positional CTE)
    out["ft_shingle_hits"] = _PT + (
        "SELECT DISTINCT a.doc_id FROM pt a JOIN pt b "
        "ON b.doc_id = a.doc_id AND b.pos = a.pos + 1 "
        "WHERE a.tok = 'batch' AND b.tok = 'window' ORDER BY a.doc_id"
    )
    # WordBreakSpellChecker: substr split enumeration + df table
    out["ft_word_break"] = _TOKS + (
        ", dfs AS (SELECT tok, count(DISTINCT doc_id)::BIGINT AS df "
        "FROM toks GROUP BY tok), "
        "cand AS (SELECT substr('batchwindow', 1, i) AS a, "
        "substr('batchwindow', i + 1) AS b "
        "FROM UNNEST(range(2, 10)) AS t(i)) "
        "SELECT a AS left_part, b AS right_part, "
        "(da.df + db.df)::BIGINT AS freq_sum "
        "FROM cand JOIN dfs da ON da.tok = a JOIN dfs db ON db.tok = b "
        "ORDER BY freq_sum DESC, a LIMIT 5"
    )
    # combinations: the run enumeration is a pure function of the input
    # terms (win dow val ue), replayed literally; dictionary df decides
    out["ft_word_combine"] = _TOKS + (
        ", dfs AS (SELECT tok, count(DISTINCT doc_id)::BIGINT AS df "
        "FROM toks GROUP BY tok), "
        "cand(start, length, combined) AS (VALUES "
        "(0, 2, 'window'), (0, 3, 'windowval'), (0, 4, 'windowvalue'), "
        "(1, 2, 'dowval'), (1, 3, 'dowvalue'), (2, 2, 'value')) "
        "SELECT start::BIGINT AS start, length::BIGINT AS length, combined, "
        "dfs.df AS doc_freq "
        "FROM cand JOIN dfs ON dfs.tok = combined "
        "ORDER BY doc_freq DESC, start LIMIT 5"
    )
    # html_strip over the invertible decoration == plain tokenization
    out["ft_html_term_hits"] = _TOKS + (
        "SELECT DISTINCT doc_id FROM toks WHERE tok = 'table' ORDER BY doc_id"
    )
    # pattern grammar: replay the regex split (letters-only runs)
    out["ft_pattern_term_hits"] = (
        "WITH tl AS (SELECT doc_id, list_filter(string_split_regex("
        "lower(text), '[^a-z]+'), x -> x <> '') AS l FROM documents), "
        "toks AS (SELECT doc_id, unnest(l) AS tok FROM tl) "
        "SELECT DISTINCT doc_id FROM toks WHERE tok = 'merge' ORDER BY doc_id"
    )
    # multi-field: union of token membership across text + derived head
    out["ft_multifield_hits"] = (
        "WITH tl AS (SELECT doc_id, " + _TOKLIST + " AS l, "
        + _HEAD_TOKLIST + " AS hl FROM documents) "
        "SELECT doc_id FROM tl "
        "WHERE len(list_intersect(l, ['vector', 'sl'])) > 0 "
        "OR len(list_intersect(hl, ['vector', 'sl'])) > 0 ORDER BY doc_id"
    )
    # per-field BM25 over the head text field, float32-exact
    out["ft_textfield_top10"] = _bm25_head_cte(["vector"]) + (
        "SELECT * FROM (SELECT doc_id, row_number() OVER "
        "(ORDER BY s DESC, doc_id)::BIGINT AS rank, "
        "round(s::DOUBLE, 6) AS score_r6 FROM sc) "
        "WHERE rank <= 10 ORDER BY rank"
    )
    # PerFieldSimilarityWrapper: BM25(content) + RawTF(head tf), SHOULD
    # union with per-side zero fill — per-term similarity dispatch
    out["ft_perfield_sim_top10"] = _bm25_cte(["vector"]) + (
        ", ht AS (SELECT doc_id, count(*)::BIGINT AS tf FROM "
        "(SELECT doc_id, unnest(" + _HEAD_TOKLIST + ") AS tok "
        "FROM documents) WHERE tok = 'vector' GROUP BY doc_id), "
        "ps AS (SELECT COALESCE(sc.doc_id, ht.doc_id) AS doc_id, "
        "COALESCE(sc.s, CAST(0 AS FLOAT)) + "
        "COALESCE(CAST(ht.tf AS FLOAT), CAST(0 AS FLOAT)) AS s "
        "FROM sc FULL OUTER JOIN ht ON sc.doc_id = ht.doc_id) "
        "SELECT * FROM (SELECT doc_id, row_number() OVER "
        "(ORDER BY s DESC, doc_id)::BIGINT AS rank, "
        "round(s::DOUBLE, 6) AS score_r6 FROM ps) "
        "WHERE rank <= 10 ORDER BY rank"
    )
    # FunctionScoreQuery: float64 expression over (float32 _score, dv),
    # narrowed once to float32 — same op order as the engine's evaluate
    out["ft_function_score_top10"] = _bm25_cte(["merge"]) + (
        ", fs AS (SELECT sc.doc_id, CAST(CAST(sc.s AS DOUBLE) * 0.5 + "
        "(d.n_chars % 97) AS REAL) AS s FROM sc "
        "JOIN documents d USING (doc_id)) "
        "SELECT * FROM (SELECT doc_id, row_number() OVER "
        "(ORDER BY s DESC, doc_id)::BIGINT AS rank, "
        "round(s::DOUBLE, 6) AS score_r6 FROM fs) "
        "WHERE rank <= 10 ORDER BY rank"
    )
    out["ft_bm25_top10_bool"] = _bm25_cte(["join", "vector"]) + (
        ", pairs AS (SELECT a.doc_id, a.s + b.s AS s FROM sc a "
        "JOIN sc b USING (doc_id) WHERE a.tok = 'join' AND b.tok = 'vector') "
        "SELECT * FROM (SELECT doc_id, row_number() OVER "
        "(ORDER BY s DESC, doc_id)::BIGINT AS rank, "
        "round(s::DOUBLE, 6) AS score_r6 FROM pairs) "
        "WHERE rank <= 10 ORDER BY rank"
    )
    # SynonymQuery: ONE similarity invocation per doc with freq = sum of
    # per-term freqs (integral at unit boosts, so order-exact), idf from the
    # pseudo-term stats df = max over terms (SynonymWeight :213-231)
    out["ft_synonym_query_top10"] = (
        "WITH tl AS (SELECT doc_id, " + _TOKLIST + " AS l FROM documents), "
        "d AS (SELECT doc_id, len(l)::BIGINT AS dl FROM tl), "
        "stats AS (SELECT count(*)::BIGINT AS n, "
        "CAST(sum(dl)::DOUBLE / count(*) AS FLOAT) AS avgdl FROM d), "
        "toks AS (SELECT doc_id, unnest(l) AS tok FROM tl), "
        "tf AS (SELECT doc_id, tok, count(*)::BIGINT AS tf FROM toks "
        "WHERE tok IN ('hash', 'merge') GROUP BY doc_id, tok), "
        "fs AS (SELECT doc_id, sum(tf)::BIGINT AS f FROM tf GROUP BY doc_id), "
        "dfx AS (SELECT max(df) AS df FROM "
        "(SELECT tok, count(*)::BIGINT AS df FROM tf GROUP BY tok)), "
        "idfv AS (SELECT CAST(ln(1 + ((SELECT n FROM stats) - df + 0.5) "
        "/ (df + 0.5)) AS FLOAT) AS idf FROM dfx), "
        f"ninv AS (SELECT doc_id, CAST(1.0 AS FLOAT) / (CAST(1.2 AS FLOAT) * "
        f"((CAST(1.0 AS FLOAT) - CAST(0.75 AS FLOAT)) + CAST(0.75 AS FLOAT) * "
        f"CAST({_LOSSY_DL} AS FLOAT) / (SELECT avgdl FROM stats))) AS ninv "
        "FROM d), "
        "sc AS (SELECT fs.doc_id, (SELECT idf FROM idfv) - "
        "(SELECT idf FROM idfv) / (CAST(1.0 AS FLOAT) + CAST(f AS FLOAT) * "
        "ninv.ninv) AS s FROM fs JOIN ninv USING (doc_id)) "
        "SELECT * FROM (SELECT doc_id, row_number() OVER "
        "(ORDER BY s DESC, doc_id)::BIGINT AS rank, "
        "round(s::DOUBLE, 6) AS score_r6 FROM sc) "
        "WHERE rank <= 10 ORDER BY rank"
    )
    # FeatureField log function as a SHOULD clause beside a scored term:
    # fs = (float)(0.5 * ln(1 + n_chars)) — double math, single cast
    # (LogFunction.score, FeatureField.java:337-339); the boolean SHOULD
    # accumulator adds term-then-feature in float32 (executor._eval_bool)
    out["ft_feature_log_top10"] = _bm25_cte(["join"]) + (
        ", fb AS (SELECT doc_id, CAST(0.5 * ln(1.0 + n_chars) AS FLOAT) AS fs "
        "FROM documents WHERE n_chars > 0), "
        "comb AS (SELECT fb.doc_id, CASE WHEN sc.s IS NOT NULL "
        "THEN sc.s + fb.fs ELSE fb.fs END AS s "
        "FROM fb LEFT JOIN sc ON sc.doc_id = fb.doc_id) "
        "SELECT * FROM (SELECT doc_id, row_number() OVER "
        "(ORDER BY s DESC, doc_id)::BIGINT AS rank, "
        "round(s::DOUBLE, 6) AS score_r6 FROM comb) "
        "WHERE rank <= 10 ORDER BY rank"
    )
    out["ft_dismax_top10"] = _bm25_cte(["join", "hash"]) + (
        ", ds AS (SELECT doc_id, "
        "coalesce(max(CASE WHEN tok = 'join' THEN s END), CAST(0.0 AS FLOAT)) AS sj, "
        "coalesce(max(CASE WHEN tok = 'hash' THEN s END), CAST(0.0 AS FLOAT)) AS sh "
        "FROM sc GROUP BY doc_id), "
        "dm AS (SELECT doc_id, greatest(sj, sh) + CAST(0.1 AS FLOAT) * "
        "((sj + sh) - greatest(sj, sh)) AS s FROM ds) "
        "SELECT * FROM (SELECT doc_id, row_number() OVER "
        "(ORDER BY s DESC, doc_id)::BIGINT AS rank, "
        "round(s::DOUBLE, 6) AS score_r6 FROM dm) "
        "WHERE rank <= 10 ORDER BY rank"
    )
    # CommonTermsQuery scored top-k: the executor evaluates MUST(low) then
    # SHOULD(high) onto a float32 accumulator; the high sub-clause folds
    # join then batch on ITS OWN accumulator first (executor._eval_bool) —
    # so s = sd + (sj + sb), all FLOAT ops. Classification hardcoded to the
    # test corpus's stable dfs (dup ~5% rare; join/batch ~80% common at
    # every sf); the dynamic-classification twin is ft_common_terms_hits.
    out["ft_common_terms_top10"] = _bm25_cte(["dup", "join", "batch"]) + (
        ", pv AS (SELECT doc_id, "
        "max(CASE WHEN tok = 'dup' THEN s END) AS sd, "
        "max(CASE WHEN tok = 'join' THEN s END) AS sj, "
        "max(CASE WHEN tok = 'batch' THEN s END) AS sb "
        "FROM sc GROUP BY doc_id), "
        "scored AS (SELECT doc_id, "
        "CASE WHEN sj IS NOT NULL AND sb IS NOT NULL THEN sd + (sj + sb) "
        "WHEN sj IS NOT NULL THEN sd + sj "
        "WHEN sb IS NOT NULL THEN sd + sb ELSE sd END AS s "
        "FROM pv WHERE sd IS NOT NULL) "
        "SELECT * FROM (SELECT doc_id, row_number() OVER "
        "(ORDER BY s DESC, doc_id)::BIGINT AS rank, "
        "round(s::DOUBLE, 6) AS score_r6 FROM scored) "
        "WHERE rank <= 10 ORDER BY rank"
    )
    # DiversifiedTopDocsCollector: per-key row_number caps each lang at 2,
    # then the global top-10 — float32-exact per-doc term scores
    out["ft_diversified_top10"] = _bm25_cte(["join"]) + (
        ", ranked AS (SELECT sc.doc_id, dd.lang, s, row_number() OVER "
        "(PARTITION BY dd.lang ORDER BY s DESC, sc.doc_id) AS rk "
        "FROM sc JOIN documents dd ON sc.doc_id = dd.doc_id), "
        "kept AS (SELECT doc_id, lang, s FROM ranked WHERE rk <= 2) "
        "SELECT * FROM (SELECT doc_id, lang, row_number() OVER "
        "(ORDER BY s DESC, doc_id)::BIGINT AS rank, "
        "round(s::DOUBLE, 6) AS score_r6 FROM kept) "
        "WHERE rank <= 10 ORDER BY rank"
    )
    out["ft_filtered_bm25_top10"] = _bm25_cte(["customer"]) + (
        "SELECT * FROM (SELECT sc.doc_id, row_number() OVER "
        "(ORDER BY s DESC, sc.doc_id)::BIGINT AS rank, "
        "round(s::DOUBLE, 6) AS score_r6 FROM sc "
        "JOIN documents dd ON sc.doc_id = dd.doc_id "
        "WHERE dd.n_chars >= 200 AND dd.n_chars <= 500) "
        "WHERE rank <= 10 ORDER BY rank"
    )
    out["ft_grouped_bm25_by_lang"] = _bm25_cte(["join"]) + (
        "SELECT * FROM (SELECT dd.lang, sc.doc_id, row_number() OVER "
        "(PARTITION BY dd.lang ORDER BY s DESC, sc.doc_id)::BIGINT AS rank, "
        "round(s::DOUBLE, 6) AS score_r6 FROM sc "
        "JOIN documents dd ON sc.doc_id = dd.doc_id) "
        "WHERE rank <= 2 ORDER BY lang, rank"
    )
    # scored JOIN surfaces: max over children is order-independent in
    # float32; blockjoin avg sums child scores in float64 then downcasts to
    # float32 (the downcast absorbs sum-order ulps), matching
    # executor._eval_blockjoin exactly. Verified bit-identical vs the engine
    # at sf0.001/0.01/0.1.
    out["ft_join_parent_scored"] = _bm25_cte(["join"]) + (
        "SELECT dd.lang AS parent, count(*)::BIGINT AS n_children, "
        "round(max(s)::DOUBLE, 6) AS score "
        "FROM sc JOIN documents dd USING (doc_id) "
        "GROUP BY dd.lang ORDER BY parent"
    )
    out["ft_blockjoin_scored"] = _bm25_cte(["merge"]) + (
        ", agg AS (SELECT dd.source AS parent, count(*)::BIGINT AS n_children, "
        "CAST(sum(s::DOUBLE) / count(*) AS FLOAT) AS sf "
        "FROM sc JOIN documents dd USING (doc_id) GROUP BY dd.source) "
        "SELECT parent, n_children, round(sf::DOUBLE, 6) AS score "
        "FROM agg ORDER BY parent"
    )
    # two-phase rescore: BM25 top-100 window (s desc, doc_id asc), then the
    # expression evaluated in DOUBLE over the window — 'length' binds to the
    # token-list length (d.dl), as in ft_expr_topk
    out["ft_expr_rescore_join"] = _bm25_cte(["join"]) + (
        ", cand AS (SELECT doc_id, s FROM "
        "(SELECT doc_id, s, row_number() OVER (ORDER BY s DESC, doc_id) AS r "
        "FROM sc) WHERE r <= 100), "
        "ev AS (SELECT cand.doc_id, s::DOUBLE * 0.5 + ln(d.dl + 1) AS v "
        "FROM cand JOIN d USING (doc_id)) "
        "SELECT * FROM (SELECT doc_id, row_number() OVER "
        "(ORDER BY v DESC, doc_id)::BIGINT AS rank, round(v, 6) AS expr_value "
        "FROM ev) WHERE rank <= 10 ORDER BY rank"
    )
    # MoreLikeThis scored top-k, float32-exact: term selection (tf>=2, df>=5,
    # score = tf*(1+ln(N/(df+1))), top-25 by score desc/term asc), then the
    # executor's sequential float32 fold of per-term BM25 contributions IN
    # SELECTION ORDER reproduced with list_reduce; top-11 by (s desc, doc_id),
    # source doc dropped, first 10 ranked.
    mlt_kept_cte = (
        "WITH tl AS (SELECT doc_id, " + _TOKLIST + " AS l FROM documents), "
        "d AS (SELECT doc_id, len(l)::BIGINT AS dl FROM tl), "
        "stats AS (SELECT count(*)::BIGINT AS n, "
        "CAST(sum(dl)::DOUBLE / count(*) AS FLOAT) AS avgdl FROM d), "
        "toks AS (SELECT doc_id, unnest(l) AS tok FROM tl), "
        "src AS (SELECT tok, count(*)::BIGINT AS tf FROM toks "
        "WHERE doc_id = 7 AND tok <> '' GROUP BY tok HAVING count(*) >= 2), "
        "dfall AS (SELECT tok, count(DISTINCT doc_id)::BIGINT AS df FROM toks "
        "JOIN src USING (tok) GROUP BY tok), "
        "selt AS (SELECT src.tok, src.tf * (1.0 + ln((SELECT n FROM stats)::DOUBLE "
        "/ (dfall.df + 1.0))) AS mscore FROM src JOIN dfall USING (tok) "
        "WHERE dfall.df >= 5 ORDER BY mscore DESC, src.tok LIMIT 25), "
        "sel AS (SELECT tok, row_number() OVER (ORDER BY mscore DESC, tok) AS r "
        "FROM selt), "
        "tf AS (SELECT doc_id, tok, count(*)::BIGINT AS tf FROM toks "
        "JOIN sel USING (tok) GROUP BY doc_id, tok), "
        "dfs AS (SELECT tok, count(*)::BIGINT AS df FROM tf GROUP BY tok), "
        "idfs AS (SELECT tok, CAST(ln(1 + ((SELECT n FROM stats) - df + 0.5) "
        "/ (df + 0.5)) AS FLOAT) AS idf FROM dfs), "
        "ninv AS (SELECT doc_id, CAST(1.0 AS FLOAT) / (CAST(1.2 AS FLOAT) * "
        "((CAST(1.0 AS FLOAT) - CAST(0.75 AS FLOAT)) + CAST(0.75 AS FLOAT) * "
        "CAST(" + _LOSSY_DL + " AS FLOAT) / (SELECT avgdl FROM stats))) AS ninv "
        "FROM d), "
        "sc AS (SELECT tf.doc_id, tf.tok, "
        "idfs.idf - idfs.idf / (CAST(1.0 AS FLOAT) + CAST(tf AS FLOAT) * "
        "ninv.ninv) AS s FROM tf JOIN idfs USING (tok) JOIN ninv USING (doc_id)), "
        "folded AS (SELECT doc_id, list_reduce(list(s ORDER BY sel.r), "
        "(a, b) -> CAST(a + b AS FLOAT)) AS s FROM sc JOIN sel USING (tok) "
        "GROUP BY doc_id), "
        "top AS (SELECT doc_id, s FROM folded ORDER BY s DESC, doc_id LIMIT 11), "
        "kept AS (SELECT doc_id, s FROM top WHERE doc_id <> 7 "
        "ORDER BY s DESC, doc_id LIMIT 10) "
    )
    out["mlt_top10_doc7"] = mlt_kept_cte + (
        "SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id)::BIGINT "
        "AS rank, round(s::DOUBLE, 6) AS score_r6 FROM kept ORDER BY rank"
    )
    # KNearestNeighborClassifier: classes of the MLT top-10 neighbors,
    # boost = sum(score/maxScore) (float32 division, double accumulation),
    # final = boost/sumdoc (Java's k/ sumdoc<k correction folded), ties
    # (score desc, class asc); compared at 6 decimals
    out["classify_knn_doc7"] = mlt_kept_cte + (
        ", cls AS (SELECT kept.doc_id, kept.s, documents.lang FROM kept "
        "JOIN documents USING (doc_id)), "
        "mx AS (SELECT max(s) AS m FROM cls), "
        "agg AS (SELECT lang, count(*)::BIGINT AS cnt, "
        "sum(CAST(s / (SELECT m FROM mx) AS DOUBLE)) AS boost "
        "FROM cls GROUP BY lang), "
        "tot AS (SELECT sum(cnt) AS sumdoc FROM agg) "
        "SELECT lang AS class, row_number() OVER (ORDER BY "
        "boost / (SELECT sumdoc FROM tot) DESC, lang)::BIGINT AS rank, "
        "round(boost / (SELECT sumdoc FROM tot), 6) AS score_r6, "
        "cnt AS n_neighbors FROM agg ORDER BY rank"
    )
    # QueryRescorer sugar: first-pass top-30 'join' hits, combined =
    # (float)(s_join::double + 2.0 * s_hash::double) where hash matches,
    # re-ranked top-10 — QueryRescorer.java:167-181 arithmetic
    out["rescore_query_top10"] = _bm25_cte(["join", "hash"]) + (
        ", pv AS (SELECT doc_id, "
        "max(CASE WHEN tok = 'join' THEN s END) AS sj, "
        "max(CASE WHEN tok = 'hash' THEN s END) AS sh FROM sc GROUP BY doc_id), "
        "win AS (SELECT doc_id, sj, sh FROM pv WHERE sj IS NOT NULL "
        "ORDER BY sj DESC, doc_id LIMIT 30), "
        "comb AS (SELECT doc_id, CAST(CASE WHEN sh IS NOT NULL "
        "THEN sj::DOUBLE + 2.0 * sh::DOUBLE ELSE sj::DOUBLE END AS FLOAT) AS s "
        "FROM win) "
        "SELECT * FROM (SELECT doc_id, row_number() OVER "
        "(ORDER BY s DESC, doc_id)::BIGINT AS rank, "
        "round(s::DOUBLE, 6) AS score_r6 FROM comb) "
        "WHERE rank <= 10 ORDER BY rank"
    )
    return out
