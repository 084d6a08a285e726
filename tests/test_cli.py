"""CLI entrypoint (`python -m lucene_ray.cli ...`) — the ray-job-submit
surface. Drives main() in-process over a small corpus end-to-end:
build -> stats -> search -> count -> delete -> add -> compact."""

import json

import pyarrow.parquet as pq
import pytest

from lucene_ray.cli import main
from lucene_ray.fixtures import make_corpus


@pytest.fixture(scope="module")
def cli_env(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    corpus = make_corpus(300, seed=77)
    pq.write_table(corpus.slice(0, 200), str(d / "a.parquet"),
                   row_group_size=50)
    pq.write_table(corpus.slice(200), str(d / "b.parquet"),
                   row_group_size=50)
    return d, corpus


def _lines(capsys):
    return [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]


def test_cli_build_stats_search(cli_env, capsys):
    d, corpus = cli_env
    idx = str(d / "idx")
    rc = main(["build", "--source", str(d / "a.parquet"), "--index", idx,
               "--rows-per-partition", "100", "--partitions-per-segment", "2"])
    assert rc == 0
    out = _lines(capsys)[-1]
    assert out["doc_count"] == 200

    assert main(["stats", "--index", idx]) == 0
    st = _lines(capsys)[-1]
    assert st["doc_count"] == 200 and st["partitions"] == 2

    assert main(["search", "--index", idx, "--query", "import", "-k", "3",
                 "--fields", "path"]) == 0
    rows = _lines(capsys)
    assert rows[-1]["total_hits"] > 0
    assert rows[0]["rank"] == 1 and "path" in rows[0]["doc"]

    assert main(["count", "--index", idx, "--query", "import AND return"]) == 0
    n = int(capsys.readouterr().out.strip())
    assert n > 0


def test_cli_delete_add_compact(cli_env, capsys):
    d, corpus = cli_env
    idx = str(d / "idx2")
    main(["build", "--source", str(d / "a.parquet"), "--index", idx,
          "--rows-per-partition", "100", "--partitions-per-segment", "2",
          "--id-cols", "repo,path,commit,lang",  # delete-by-term reads stored cols
          "--keyword-cols", "lang"])
    capsys.readouterr()

    langs = corpus.slice(0, 200).column("lang").to_pylist()
    n_py = sum(1 for l in langs if l == "py")
    assert main(["count", "--index", idx, "--query", "lang:py"]) == 0
    assert int(capsys.readouterr().out.strip()) == n_py

    assert main(["delete", "--index", idx, "--col", "lang",
                 "--values", "py"]) == 0
    out = _lines(capsys)[-1]
    assert out["deleted_total"] == n_py

    assert main(["count", "--index", idx, "--query", "lang:py"]) == 0
    assert int(capsys.readouterr().out.strip()) == 0

    assert main(["add", "--index", idx, "--source", str(d / "b.parquet")]) == 0
    out = _lines(capsys)[-1]
    assert out["doc_count"] == 300

    assert main(["compact", "--index", idx]) == 0  # tiered auto (may no-op)
    capsys.readouterr()

    # deleted docs stay invisible through add+compact; the added file's
    # py docs ARE visible (tombstones bind to doc ids, not values)
    added_py = sum(1 for l in corpus.slice(200).column("lang").to_pylist()
                   if l == "py")
    assert main(["count", "--index", idx, "--query", "lang:py"]) == 0
    assert int(capsys.readouterr().out.strip()) == added_py


def test_cli_build_keyword_and_grammar(cli_env, capsys):
    d, corpus = cli_env
    idx = str(d / "idx3")
    assert main(["build", "--source", str(d / "a.parquet"), "--index", idx,
                 "--rows-per-partition", "200",
                 "--keyword-cols", "lang",
                 "--grammar", "pattern:[a-z]+"]) == 0
    capsys.readouterr()
    assert main(["count", "--index", idx, "--query", "lang:py"]) == 0
    n_py = int(capsys.readouterr().out.strip())
    langs = corpus.slice(0, 200).column("lang").to_pylist()
    assert n_py == sum(1 for l in langs if l == "py")


def test_cli_split_and_xml_search(cli_env, capsys):
    d, corpus = cli_env
    idx = str(d / "idx4")
    main(["build", "--source", str(d / "a.parquet"), "--index", idx,
          "--rows-per-partition", "100", "--partitions-per-segment", "2",
          "--id-cols", "repo,path,commit,lang", "--keyword-cols", "lang"])
    capsys.readouterr()
    keep, rest = str(d / "idx4_py"), str(d / "idx4_rest")
    assert main(["split", "--index", idx, "--keep", keep, "--rest", rest,
                 "--col", "lang", "--values", "py"]) == 0
    out = _lines(capsys)[-1]
    langs = corpus.slice(0, 200).column("lang").to_pylist()
    n_py = sum(1 for l in langs if l == "py")
    assert out["keep_docs"] == n_py
    assert out["rest_docs"] == 200 - n_py

    xml = ('<BooleanQuery>'
           '<Clause occurs="must"><TermQuery>import</TermQuery></Clause>'
           '</BooleanQuery>')
    assert main(["search", "--index", keep, "--query", xml, "--xml",
                 "-k", "3"]) == 0
    rows = _lines(capsys)
    assert rows[-1]["total_hits"] > 0


def test_cli_xml_search_custom_content_col(cli_env, capsys, tmp_path):
    """--xml on an index built with --content-col: an XML TermQuery naming
    the actual content field must hit (the default_field comes from the
    manifest, not a hardcoded 'content')."""
    import pyarrow as pa

    d, corpus = cli_env
    renamed = corpus.rename_columns(
        ["body" if c == "content" else c for c in corpus.column_names])
    src = str(tmp_path / "renamed.parquet")
    pq.write_table(renamed.slice(0, 200), src, row_group_size=50)
    idx = str(tmp_path / "idx_body")
    main(["build", "--source", src, "--index", idx,
          "--rows-per-partition", "100", "--partitions-per-segment", "2",
          "--content-col", "body"])
    capsys.readouterr()
    xml = '<TermQuery fieldName="body">import</TermQuery>'
    assert main(["search", "--index", idx, "--query", xml, "--xml",
                 "-k", "3"]) == 0
    rows = _lines(capsys)
    assert rows[-1]["total_hits"] > 0

    # compact with explicit --segments prints the list-of-groups shape
    assert main(["compact", "--index", idx, "--segments", "0,1"]) == 0
    out = _lines(capsys)[-1]
    assert out["merged"] == [[0, 1]]


def test_cli_replicate(cli_env, capsys, tmp_path):
    d, corpus = cli_env
    idx = str(d / "idx_repl")
    assert main(["build", "--source", str(d / "a.parquet"), "--index", idx,
                 "--rows-per-partition", "100",
                 "--partitions-per-segment", "2"]) == 0
    _lines(capsys)
    replica = str(tmp_path / "replica")
    assert main(["replicate", "--index", idx, "--replica", replica,
                 "--concurrency", "4"]) == 0
    st = _lines(capsys)[-1]
    assert st["copied"] > 0 and st["skipped"] == 0
    # replica serves the same count
    assert main(["count", "--index", replica, "--query", "import"]) == 0
    n_rep = int(capsys.readouterr().out.strip())
    assert main(["count", "--index", idx, "--query", "import"]) == 0
    n_pri = int(capsys.readouterr().out.strip())
    assert n_rep == n_pri > 0
    # second sync is a no-op
    assert main(["replicate", "--index", idx, "--replica", replica]) == 0
    st2 = _lines(capsys)[-1]
    assert st2["copied"] == 0 and st2["skipped"] == st["copied"]
