"""Query-serving (QPS) scaling proof: the SECOND axis of the north rule.

The build-throughput scaling number on this single-VM sandbox is bounded by
the host's erratic memory/fault path (BENCH/BASELINE.md interpretation).
Query serving is the other half of the rule's workload ("BM25 top-10 query
latency") and lives in the regime a real serving tier occupies: long-lived
actors, warm decoded-postings caches, zero page faults — so it measures the
ENGINE's parallel scaling rather than the host's fault lottery.

Method (single VM standing in for N- vs 4N-node clusters):
- one fixed index (bench corpus, same config as bench.py --build-only),
- per CPU level C, a fresh OS process pinned with ``taskset -c 0..C-1``
  (serving actors are num_cpus=0, so Ray's logical CPU accounting would not
  bound them — CPU affinity does, honestly),
- R = C / n_segments replica pools of QueryShardActor (each actor owns a
  disjoint segment subset, index opened once in __init__ — the exact
  serving topology of pipelines/bulk_search.ShardPool),
- a deterministic 1,024-query workload (term / AND / OR / phrase mixture
  over the corpus vocab) split into per-replica batches; query plans
  (global stats -> Weight) are prepared and ray.put once OUTSIDE the timed
  region (the plan/front-end tier scales independently of the scoring tier
  being measured),
- 2 untimed warm-up passes (readers, decoded caches, JIT'd numpy paths),
  then the median of 3 timed passes.

QPS(32) / QPS(8) / 4 is the reported efficiency. Results append to
BENCH/query_scaling.jsonl; bench.py --render-md folds them into BASELINE.md.

Usage:
  python scripts/query_scaling_proof.py [--rounds 1]        # harness
  python scripts/query_scaling_proof.py --serve --ncpu 8    # one level (internal)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

QPROOF_ROWS = int(os.environ.get("QPROOF_ROWS", "1000000"))
N_QUERIES = int(os.environ.get("QPROOF_QUERIES", "1024"))
BATCH = 32  # queries per actor call (amortizes the per-call actor RPC)


def ensure_index() -> str:
    """Build the proof index once (resume-safe) over the bench corpus."""
    os.environ.setdefault("BENCH_CORPUS_ROWS", str(QPROOF_ROWS))
    import bench

    corpus = bench.ensure_corpus()
    index_dir = f"/tmp/lucene_ray_qproof/idx_{QPROOF_ROWS}"
    if not os.path.exists(os.path.join(index_dir, "MANIFEST.json")):
        import ray

        if not ray.is_initialized():
            ray.init(address="local", include_dashboard=False,
                     logging_level="ERROR")
        from lucene_ray.index.build import IndexConfig, build_index

        cfg = IndexConfig(
            target_rows_per_partition=max(1000, QPROOF_ROWS // 32),
            partitions_per_segment=8,
            hot_df_threshold=QPROOF_ROWS // 4,
        )
        build_index(corpus, index_dir, cfg, resume=True)
        ray.shutdown()
    return index_dir


def make_workload():
    """Deterministic query mixture over the corpus vocab: 40% single term,
    25% AND(2), 25% OR(3), 10% exact phrase of two hot terms."""
    from lucene_ray.fixtures import HOT_TERMS, make_vocab
    from lucene_ray.search.query import BooleanQuery, PhraseQuery, TermQuery

    vocab = make_vocab()
    out = []
    for i in range(N_QUERIES):
        a = vocab[(i * 13) % len(vocab)]
        b = vocab[(i * 29 + 7) % len(vocab)]
        c = vocab[(i * 53 + 3) % len(vocab)]
        m = i % 20
        if m < 8:
            q = TermQuery(a)
        elif m < 13:
            q = BooleanQuery(must=(TermQuery(a), TermQuery(b)))
        elif m < 18:
            q = BooleanQuery(should=(TermQuery(a), TermQuery(b), TermQuery(c)))
        else:
            q = PhraseQuery((HOT_TERMS[i % len(HOT_TERMS)],
                             HOT_TERMS[(i + 1) % len(HOT_TERMS)]))
        out.append((i, q))
    return out


def _twin_worker(index_dir: str, seg: int, my_batches: list, n_passes: int,
                 barrier, out_q):
    """One fixed serving slot — same topology as a QueryShardActor: owns ONE
    segment, serves a FIXED batch subset every pass (hot per-slot caches),
    opened once. Passes are barrier-synchronized so the driver's wall clock
    brackets all slots' work."""
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "2147483647")
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "2147483647")
    from lucene_ray.index.build import _tune_allocators
    from lucene_ray.index.reader import IndexReader
    from lucene_ray.search.query import needs_positions
    from lucene_ray.search.searcher import Searcher

    _tune_allocators()
    searcher = Searcher(IndexReader(index_dir))
    for _ in range(n_passes):
        barrier.wait()
        for plans in my_batches:
            for qid, q, all_terms, scorers, ph, pf, k, thr in plans:
                ss = searcher.segment_scorer(seg, all_terms, scorers, ph, pf,
                                             needs_positions(q))
                ss.top_k(q, k, thr)
        barrier.wait()
    out_q.put(os.getpid())


def twin(ncpu: int) -> dict:
    """No-Ray multiprocessing twin of the serving measurement: identical
    topology (replica pools x one-segment slots, fixed batch routing, state
    opened once per process) with ZERO coordination layer — the host's
    ceiling for this exact work; serve-vs-twin isolates Ray overhead."""
    import multiprocessing as mp

    from lucene_ray.index.reader import IndexReader
    from lucene_ray.search.searcher import Searcher

    index_dir = f"/tmp/lucene_ray_qproof/idx_{QPROOF_ROWS}"
    reader = IndexReader(index_dir)
    searcher = Searcher(reader)
    segs = list(reader.segs)
    n_segs = len(segs)
    replicas = max(1, ncpu // n_segs)
    queries = make_workload()
    k, thr = 10, 1000
    batches = []
    for s in range(0, len(queries), BATCH):
        chunk = queries[s : s + BATCH]
        plans = []
        for qid, q in chunk:
            all_terms, scorers, ph, pf = searcher.plan(q)
            plans.append((qid, q, all_terms, scorers, ph, pf, k, thr))
        batches.append(plans)
    n_warm, n_timed = 2, 3
    n_passes = n_warm + n_timed
    ctx = mp.get_context("spawn")  # the process model Ray workers use
    barrier = ctx.Barrier(replicas * n_segs + 1)
    out_q = ctx.Queue()
    procs = []
    for rep in range(replicas):
        my = [b for i, b in enumerate(batches) if i % replicas == rep]
        for si in range(n_segs):
            p = ctx.Process(target=_twin_worker,
                            args=(index_dir, segs[si], my, n_passes,
                                  barrier, out_q))
            p.start()
            procs.append(p)
    walls = []
    for i in range(n_passes):
        barrier.wait()  # release the pass
        t0 = time.time()
        barrier.wait()  # all slots done
        if i >= n_warm:
            walls.append(time.time() - t0)
    for p in procs:
        out_q.get()
    for p in procs:
        p.join()
    walls.sort()
    wall = walls[len(walls) // 2]
    return {
        "ncpu": ncpu,
        "replicas": replicas,
        "queries": len(queries),
        "wall_sec_median": round(wall, 3),
        "wall_secs": [round(w, 3) for w in walls],
        "qps": round(len(queries) / wall, 1),
    }


def serve(ncpu: int) -> dict:
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "2147483647")
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "2147483647")
    os.environ.setdefault("RAY_worker_niceness", "0")
    import ray

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR",
             object_store_memory=4 << 30)
    import numpy as np

    from lucene_ray.index.reader import IndexReader
    from lucene_ray.pipelines.bulk_search import QueryShardActor
    from lucene_ray.search.searcher import Searcher, merge_topk

    index_dir = f"/tmp/lucene_ray_qproof/idx_{QPROOF_ROWS}"
    reader = IndexReader(index_dir)
    searcher = Searcher(reader)
    segs = list(reader.segs)
    n_segs = len(segs)
    replicas = max(1, ncpu // n_segs)
    pools = [
        [QueryShardActor.remote(index_dir, segs[i::n_segs]) for i in range(n_segs)]
        for _ in range(replicas)
    ]

    queries = make_workload()
    k, thr = 10, 1000
    # plans built + broadcast once, outside the timed region
    batch_refs = []
    for s in range(0, len(queries), BATCH):
        chunk = queries[s : s + BATCH]
        plans = []
        for qid, q in chunk:
            all_terms, scorers, ph, pf = searcher.plan(q)
            plans.append((qid, q, all_terms, scorers, ph, pf, k, thr))
        batch_refs.append((ray.put(plans), chunk))

    def one_pass() -> float:
        t0 = time.time()
        futs = []
        for b, (ref, _chunk) in enumerate(batch_refs):
            pool = pools[b % replicas]
            futs.extend(a.search_batch.remote(ref) for a in pool)
        per_batch = len(pools[0])
        merged = 0
        for b, (ref, chunk) in enumerate(batch_refs):
            parts = ray.get(futs[b * per_batch : (b + 1) * per_batch])
            for qid, _q in chunk:
                dp, sp, total, exact = [], [], 0, True
                for rows in parts:
                    for _seg, rqid, gids, scores, t, ex in rows:
                        if rqid == qid:
                            dp.append(gids)
                            sp.append(scores)
                            total += t
                            exact = exact and ex
                merge_topk(dp, sp, total, k, exact)
                merged += 1
        assert merged == len(queries)
        return time.time() - t0

    # sanity: pool results rank-identical to the driver Searcher for a
    # sample query (the bulk-search parity invariant)
    ref0, chunk0 = batch_refs[0]
    parts0 = ray.get([a.search_batch.remote(ref0) for a in pools[0]])
    qid0, q0 = chunk0[0]
    dp, sp, tt, ex = [], [], 0, True
    for rows in parts0:
        for _seg, rqid, gids, scores, t, e in rows:
            if rqid == qid0:
                dp.append(gids)
                sp.append(scores)
                tt += t
                ex = ex and e
    got = merge_topk(dp, sp, tt, k, ex)
    want = searcher.search(q0, k, total_hits_threshold=thr)
    assert np.array_equal(got.doc_ids, want.doc_ids), "pool/driver rank drift"

    for _ in range(2):  # warm-up: readers, decoded caches, code paths
        one_pass()
    walls = sorted(one_pass() for _ in range(3))
    wall = walls[1]
    return {
        "ncpu": ncpu,
        "replicas": replicas,
        "n_segments": n_segs,
        "queries": len(queries),
        "wall_sec_median": round(wall, 3),
        "wall_secs": [round(w, 3) for w in walls],
        "qps": round(len(queries) / wall, 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--serve", action="store_true")
    ap.add_argument("--twin", action="store_true")
    ap.add_argument("--ncpu", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=1)
    args = ap.parse_args()
    if args.serve:
        print(json.dumps(serve(args.ncpu)))
        return
    if args.twin:
        print(json.dumps(twin(args.ncpu)))
        return
    ensure_index()
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    for rnd in range(args.rounds):
        levels = [8, 32] if rnd % 2 == 0 else [32, 8]
        res = {}
        tw = {}
        for n in levels:
            cmd = ["taskset", "-c", f"0-{n - 1}", sys.executable,
                   os.path.abspath(__file__), "--serve", "--ncpu", str(n)]
            out = subprocess.run(cmd, capture_output=True, text=True,
                                 check=True, cwd=REPO).stdout
            res[str(n)] = json.loads(out.strip().splitlines()[-1])
            cmd = ["taskset", "-c", f"0-{n - 1}", sys.executable,
                   os.path.abspath(__file__), "--twin", "--ncpu", str(n)]
            out = subprocess.run(cmd, capture_output=True, text=True,
                                 check=True, cwd=REPO).stdout
            tw[str(n)] = json.loads(out.strip().splitlines()[-1])
        eff = res["32"]["qps"] / res["8"]["qps"] / 4
        teff = tw["32"]["qps"] / tw["8"]["qps"] / 4
        row = {
            "metric": "query_scaling_proof",
            "corpus_rows": QPROOF_ROWS,
            "qps": {n: r["qps"] for n, r in res.items()},
            "twin_qps": {n: r["qps"] for n, r in tw.items()},
            "wall_sec": {n: r["wall_sec_median"] for n, r in res.items()},
            "replicas": {n: r["replicas"] for n, r in res.items()},
            "queries": N_QUERIES,
            "qps_eff_8_32": round(eff, 3),
            "twin_qps_eff_8_32": round(teff, 3),
            "ratio_serve_over_twin": round(eff / teff, 3) if teff else None,
        }
        print(json.dumps(row))
        with open(os.path.join(REPO, "BENCH", "query_scaling.jsonl"), "a") as f:
            f.write(json.dumps({"ts": time.strftime("%Y-%m-%d %H:%M:%S"), **row}) + "\n")


if __name__ == "__main__":
    main()
