"""Flagship corpus-preparation pipeline (pipelines/prepare.py)."""

import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def test_quality_filter_rules(ray_session):
    import ray.data

    from lucene_ray.pipelines.prepare import quality_filter

    t = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([
            "short text",                       # too few tokens
            " ".join(["token"] * 40),           # passes both rules
            " ".join(["1234"] * 40),            # enough tokens, no alpha
        ], pa.string()),
    })
    out = quality_filter(ray.data.from_arrow(t), min_tokens=30,
                         min_alpha_ratio=0.55).to_pandas()
    assert out["doc_id"].tolist() == [1]


def test_prepare_corpus_matches_duckdb(ray_session):
    import duckdb

    import ray.data

    from lucene_ray.pipelines.prepare import prepare_corpus

    got = prepare_corpus(ray.data.read_parquet(f"{SF}/documents.parquet")) \
        .column("doc_id").to_pylist()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    toklist = ("list_filter(string_split_regex(lower(text), '[^a-z0-9_]+'), "
               "x -> x <> '')")
    want = [r[0] for r in con.execute(
        "WITH RECURSIVE q AS (SELECT doc_id, text FROM documents "
        f"WHERE len({toklist}) >= 30 "
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
        "p AS (SELECT id_a, id_b FROM it "
        "JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b "
        "WHERE c / (sa.n + sb.n - c) >= 0.5), "
        "edges AS (SELECT id_a AS u, id_b AS v FROM p "
        "UNION SELECT id_b, id_a FROM p), "
        "reach(u, v) AS (SELECT u, u FROM (SELECT DISTINCT u FROM edges) "
        "UNION SELECT ed.u, r.v FROM edges ed JOIN reach r ON r.u = ed.v), "
        "cl AS (SELECT u AS doc_id, min(v) AS cid FROM reach GROUP BY u) "
        "SELECT doc_id FROM e WHERE doc_id NOT IN "
        "(SELECT doc_id FROM cl WHERE doc_id <> cid) ORDER BY doc_id"
    ).fetchall()]
    assert got == want
    assert 0 < len(got) < 500  # every stage dropped something


def test_prepare_corpus_writes_partitioned_output(ray_session):
    import ray.data

    from lucene_ray.pipelines.prepare import prepare_corpus

    out_dir = "/tmp/lucene_ray_test_prepared"
    shutil.rmtree(out_dir, ignore_errors=True)
    kept = prepare_corpus(ray.data.read_parquet(f"{SF}/documents.parquet"),
                          out_dir=out_dir)
    written = pq.read_table(out_dir)
    assert sorted(written.column("doc_id").to_pylist()) == \
        kept.column("doc_id").to_pylist()
    # full rows survive (schema preserved), not just ids
    assert "text" in written.schema.names
    shutil.rmtree(out_dir, ignore_errors=True)
