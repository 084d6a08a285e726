"""Benchmark harness — one JSON line per run (driver contract).

Headline: inverted-index build throughput over the deterministic synthetic
source-code corpus (FIXTURES.md F1, 100k docs, cached parquet in /tmp) +
BM25 top-10 query latency p50 over the built index, plus timed runs of the
sf-table pipelines from __ray_entry__.queries().

- plain run:    RAY_GRAFT_CPUS=N GRAFT_SF_DIR=... python bench.py
- scaling mode: python bench.py --scaling
  runs the SAME build job in two fresh processes (num_cpus=8 vs 32 — the
  sandbox substitute for N- vs 4N-node clusters, BASELINE.md protocol),
  reports both throughputs + scaling efficiency, and appends the table to
  BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import subprocess
import sys
import time

BENCH_CORPUS_ROWS = int(os.environ.get("BENCH_CORPUS_ROWS", "100000"))
CORPUS_CACHE = f"/tmp/lucene_ray_bench/corpus_{BENCH_CORPUS_ROWS}.parquet"


def ensure_corpus() -> str:
    if not os.path.exists(CORPUS_CACHE):
        os.makedirs(os.path.dirname(CORPUS_CACHE), exist_ok=True)
        from lucene_ray.fixtures import write_corpus

        # 32 row groups -> >=32 independent partitions for the build
        write_corpus(CORPUS_CACHE + ".tmp", BENCH_CORPUS_ROWS,
                     row_group_size=max(1, BENCH_CORPUS_ROWS // 32))
        os.replace(CORPUS_CACHE + ".tmp", CORPUS_CACHE)
    return CORPUS_CACHE


def run_bench(num_cpus: int, sf_dir: str) -> dict:
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    try:
        import numpy as np

        from lucene_ray.fixtures import query_to_ast, reference_queries
        from lucene_ray.index.build import IndexConfig, build_index
        from lucene_ray.index.reader import IndexReader
        from lucene_ray.search.searcher import Searcher

        corpus = ensure_corpus()
        # warm the page cache so we measure compute+shuffle, not first read
        with open(corpus, "rb") as f:
            while f.read(1 << 24):
                pass

        index_dir = f"/tmp/lucene_ray_bench/idx_{num_cpus}"
        shutil.rmtree(index_dir, ignore_errors=True)
        cfg = IndexConfig(
            target_rows_per_partition=max(1000, BENCH_CORPUS_ROWS // 32),
            partitions_per_segment=8,
            hot_df_threshold=BENCH_CORPUS_ROWS // 4,
        )
        t0 = time.time()
        manifest = build_index(corpus, index_dir, cfg, resume=False)
        build_sec = time.time() - t0
        assert manifest.doc_count == BENCH_CORPUS_ROWS

        # query latency over the built index (serving-path p50)
        searcher = Searcher(IndexReader(index_dir))
        lat: dict[str, list[float]] = {}
        for rep in range(3):
            for spec in reference_queries():
                if spec["type"] in ("phrase", "prefix") and spec["qid"] == 10:
                    pass
                q = query_to_ast(spec)
                t0 = time.time()
                searcher.search(q, 10)
                lat.setdefault(f"q{spec['qid']}_{spec['type']}", []).append(time.time() - t0)
        query_p50 = {k: round(statistics.median(v), 4) for k, v in lat.items()}
        overall_p50 = round(statistics.median([x for v in lat.values() for x in v]), 4)

        # sf-table pipelines (the driver's queries() surface)
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        import __ray_entry__ as entrymod

        qs = entrymod.queries()
        pipeline_secs: dict[str, float] = {}
        for name in ["ft_term_hits_join", "ft_bm25_top10_customer", "dedup_exact",
                     "text_token_stats", "ann_cosine_top10", "agg_lineitem_pricing",
                     "events_tumbling_daily", "join_orders_per_nation"]:
            t0 = time.time()
            qs[name](sf_dir)
            pipeline_secs[name] = round(time.time() - t0, 3)

        return {
            "metric": "index_build_sec",
            "value": round(build_sec, 2),
            "unit": "sec",
            "sf": sf_dir,
            "num_cpus": num_cpus,
            "corpus_rows": BENCH_CORPUS_ROWS,
            "docs_per_sec": round(BENCH_CORPUS_ROWS / build_sec, 1),
            "query_p50_sec": overall_p50,
            "query_p50_detail": query_p50,
            "queries": pipeline_secs,
        }
    finally:
        import ray

        ray.shutdown()


def run_scaling() -> None:
    ensure_corpus()  # generate once, outside the timed runs

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], env=env,
            capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    r_lo, r_hi = run(lo), run(hi)
    speedup = r_hi["docs_per_sec"] / r_lo["docs_per_sec"]
    eff = speedup / (hi / lo)
    result = {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "cpus": [lo, hi],
        "docs_per_sec": {str(lo): r_lo["docs_per_sec"], str(hi): r_hi["docs_per_sec"]},
        "build_sec": {str(lo): r_lo["value"], str(hi): r_hi["value"]},
        "query_p50_sec": {str(lo): r_lo["query_p50_sec"], str(hi): r_hi["query_p50_sec"]},
        "corpus_rows": BENCH_CORPUS_ROWS,
    }
    print(json.dumps(result))
    _write_baseline_md(result, r_lo, r_hi)


def _write_baseline_md(result: dict, r_lo: dict, r_hi: dict) -> None:
    import platform

    import numpy, pyarrow, ray

    os.makedirs("BENCH", exist_ok=True)
    lo, hi = result["cpus"]
    lines = [
        "# BENCH/BASELINE.md — measured numbers (written by bench.py --scaling)",
        "",
        f"- date: {time.strftime('%Y-%m-%d %H:%M:%S')}",
        f"- corpus: deterministic F1 source-code corpus, {result['corpus_rows']} rows "
        f"(seed=42), parquet {CORPUS_CACHE}",
        f"- host: {platform.machine()}, ray {ray.__version__}, pyarrow {pyarrow.__version__}, "
        f"numpy {numpy.__version__}",
        "",
        "| num_cpus | build sec | docs/sec | query p50 sec |",
        "|---|---|---|---|",
        f"| {lo} | {r_lo['value']} | {r_lo['docs_per_sec']} | {r_lo['query_p50_sec']} |",
        f"| {hi} | {r_hi['value']} | {r_hi['docs_per_sec']} | {r_hi['query_p50_sec']} |",
        "",
        f"**scaling efficiency ({lo}->{hi} cpus)** = "
        f"(docs/s@{hi} / docs/s@{lo}) / {hi // lo} = **{result['value']}** (target >= 0.8)",
        "",
    ]
    with open("BENCH/BASELINE.md", "w") as f:
        f.write("\n".join(lines))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
        sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
        print(json.dumps(run_bench(ncpu, sf_dir)))
