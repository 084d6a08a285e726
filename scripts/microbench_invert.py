"""Multiprocessing microbench of the pure inversion kernel OUTSIDE Ray.

Purpose: make the host-memory-ceiling claim in BENCH/BASELINE.md
independently checkable. Each worker process inverts the SAME deterministic
corpus slice-by-slice (identical work per process, no Ray, no shuffle, no
object store); the aggregate docs/sec at 2 / 8 / 32 processes shows where
the VM's memory subsystem saturates. If the knee is the same as the Ray
pipeline's (flat 8->32), the 8->32 scaling number measures the host, not
the engine.

Usage:  python scripts/microbench_invert.py [--rows 4000] [--reps 3]
Writes one JSON line to stdout and appends it to BENCH/microbench.jsonl.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _worker(rows: int, reps: int, slice_docs: int, barrier, out_q) -> None:
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "2147483647")
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "2147483647")
    import pyarrow as pa

    from lucene_ray.fixtures import make_corpus
    from lucene_ray.index.invert import invert_partition

    try:
        pa.jemalloc_set_decay_ms(-1)
    except Exception:
        pass
    content = make_corpus(rows, seed=42).column("content").combine_chunks()

    def one_pass():
        for s0 in range(0, rows, slice_docs):
            invert_partition(content.slice(s0, min(slice_docs, rows - s0)))

    one_pass()  # untimed warm-up: fault pages, compile numpy paths
    barrier.wait()  # all workers start the timed window together
    t0 = time.time()
    for _ in range(reps):
        one_pass()
    out_q.put(time.time() - t0)


def run_level(n_procs: int, rows: int, reps: int, slice_docs: int) -> float:
    barrier = mp.Barrier(n_procs)
    out_q = mp.Queue()
    procs = [
        mp.Process(target=_worker, args=(rows, reps, slice_docs, barrier, out_q))
        for _ in range(n_procs)
    ]
    for p in procs:
        p.start()
    times = [out_q.get() for _ in procs]
    for p in procs:
        p.join()
    wall = max(times)
    return n_procs * rows * reps / wall  # aggregate docs/sec


def _body_worker(specs, out_root, barrier, outq) -> None:
    """Full Stage-A body (read + invert + sha + bucket + write) on disjoint
    partitions, NO Ray — the exact per-task work of the pipeline's ingest
    stage. If the pipeline's Stage A matches this level-for-level, Ray adds
    zero overhead and any efficiency shortfall is the host's memory path
    on the body's (IO + allocation) profile, which is heavier than the
    cache-friendly pure-invert kernel above."""
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "2147483647")
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "2147483647")
    import pyarrow as pa

    from lucene_ray.index.build import IndexConfig, _StageA

    cfg = IndexConfig(partitions_per_segment=8)
    sa = _StageA(cfg, out_root)
    batch = pa.Table.from_pylist(specs)
    sa(batch)  # untimed warm-up pass (pages, code paths)
    barrier.wait()
    t0 = time.time()
    res = sa(batch)
    ms = res.column("sec").to_pylist() if "sec" in res.column_names else []
    cpu = res.column("cpu").to_pylist() if "cpu" in res.column_names else []
    outq.put((sum(s["num_rows"] for s in specs), time.time() - t0, ms, cpu))


def run_body_level(n_procs: int, corpus: str, spawn: bool = False) -> tuple:
    import shutil

    from lucene_ray.index.build import IndexConfig, plan_partitions

    import pyarrow.parquet as pq

    total_rows = pq.ParquetFile(corpus).metadata.num_rows
    n_parts = int(os.environ.get("BENCH_PARTS", "32"))
    cfg = IndexConfig(
        target_rows_per_partition=max(1000, total_rows // n_parts),
        partitions_per_segment=8,
    )
    specs = plan_partitions([corpus], cfg)
    out_root = f"/tmp/lucene_ray_bench/microbody_{n_procs}"
    shutil.rmtree(out_root, ignore_errors=True)
    chunks = [specs[i::n_procs] for i in range(n_procs)]
    chunks = [c for c in chunks if c]
    # spawn=True: exec fresh interpreters (no fork COW page sharing) — the
    # process model Ray workers actually run under; fork is the default twin
    ctx = mp.get_context("spawn" if spawn else "fork")
    barrier = ctx.Barrier(len(chunks))
    out_q = ctx.Queue()
    procs = [
        ctx.Process(target=_body_worker, args=(c, out_root, barrier, out_q))
        for c in chunks
    ]
    for p in procs:
        p.start()
    res = [out_q.get() for _ in procs]
    for p in procs:
        p.join()
    rows_total = sum(r[0] for r in res)
    wall = max(r[1] for r in res)
    all_ms = sorted(m for r in res for m in r[2])
    all_cpu = sorted(m for r in res for m in r[3])
    dist = {}
    if all_ms:
        dist = {"p50": all_ms[len(all_ms) // 2],
                "p90": all_ms[int(len(all_ms) * 0.9)],
                "max": all_ms[-1], "sum": sum(all_ms), "n": len(all_ms)}
    if all_cpu:
        dist["cpu_p50"] = all_cpu[len(all_cpu) // 2]
        dist["cpu_sum"] = sum(all_cpu)
    return rows_total / wall, dist


def _full_worker_a(specs, out_root, barrier, outq) -> None:
    """Stage-A leg of the full-build twin: same as _body_worker but also
    returns the per-partition metric rows Stage B needs (terms/tokens)."""
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "2147483647")
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "2147483647")
    import pyarrow as pa

    from lucene_ray.index.build import IndexConfig, _StageA

    cfg = IndexConfig(partitions_per_segment=8)
    sa = _StageA(cfg, out_root)
    batch = pa.Table.from_pylist(specs)
    sa(batch)  # untimed warm-up pass (pages, code paths)
    barrier.wait()
    t0 = time.time()
    res = sa(batch)
    outq.put((time.time() - t0, res.to_pylist()))


def _full_worker_c(specs, cfg_kw, out_root, tmp, ctx, barrier, outq) -> None:
    """Stage-C leg: the exact _StageCTask work over this worker's
    cost-balanced (seg, bucket-range) specs, ctx passed as a plain dict
    (the no-Ray path _StageCTask.ctx already supports)."""
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "2147483647")
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "2147483647")
    import shutil

    import pyarrow as pa

    from lucene_ray.index.build import IndexConfig, _StageCTask

    cfg = IndexConfig(**cfg_kw)
    batch = pa.Table.from_pylist(specs)
    warm_tmp = tmp + f".warm{os.getpid()}"
    os.makedirs(warm_tmp, exist_ok=True)
    _StageCTask(cfg, out_root, warm_tmp, dict(ctx))(batch)  # warm-up
    shutil.rmtree(warm_tmp, ignore_errors=True)
    barrier.wait()
    t0 = time.time()
    _StageCTask(cfg, out_root, tmp, dict(ctx))(batch)
    outq.put(time.time() - t0)


def run_full_body_level(n_procs: int, corpus: str, spawn: bool = False) -> tuple:
    """Full-build no-Ray twin: Stage A (invert+flush) + Stage B (driver
    groupby) + Stage C (merge+encode) under plain multiprocessing with the
    SAME partition plan, segment layout, and cost-balanced Stage-C specs as
    the Ray pipeline sized for ``n_procs`` CPUs. The complete identical-work
    baseline for the pipeline-vs-host scaling adjudication (the A-only twin
    leaves Stage C's heavier IO profile out of the comparison)."""
    import shutil

    import pyarrow.parquet as pq

    from lucene_ray.index.build import (
        IndexConfig, Manifest, _plan_stage_c, _run_stage_b, plan_partitions,
        plan_segments,
    )

    total_rows = pq.ParquetFile(corpus).metadata.num_rows
    n_parts = int(os.environ.get("BENCH_PARTS", "32"))
    cfg = IndexConfig(
        target_rows_per_partition=max(1000, total_rows // n_parts),
        partitions_per_segment=8,
        hot_df_threshold=total_rows // 4,
    )
    specs = plan_partitions([corpus], cfg)
    out_root = f"/tmp/lucene_ray_bench/fullbody_{n_procs}"
    shutil.rmtree(out_root, ignore_errors=True)
    os.makedirs(out_root, exist_ok=True)
    manifest = Manifest(index_dir=out_root, config=cfg.to_dict(),
                        partitions=specs, segments=plan_segments(specs, cfg))
    ctx_mp = mp.get_context("spawn" if spawn else "fork")

    # ---- Stage A ----
    chunks = [specs[i::n_procs] for i in range(n_procs)]
    chunks = [c for c in chunks if c]
    barrier = ctx_mp.Barrier(len(chunks))
    out_q = ctx_mp.Queue()
    procs = [ctx_mp.Process(target=_full_worker_a,
                            args=(c, out_root, barrier, out_q))
             for c in chunks]
    for p in procs:
        p.start()
    res = [out_q.get() for _ in procs]
    for p in procs:
        p.join()
    a_wall = max(r[0] for r in res)
    import json as _json
    for r in res:
        for row in r[1]:
            manifest.partials_done[str(row["pid"])] = {
                "rows": row["rows"], "tokens": row["tokens"],
                "terms": row["terms"],
                "ftokens": _json.loads(row.get("ftokens") or "{}"),
            }
    manifest.save()

    # ---- Stage B (driver-side groupby, same as the pipeline's fast path) --
    t0 = time.time()
    _run_stage_b(out_root, manifest)
    b_sec = time.time() - t0

    # ---- Stage C ----
    c_specs, c_ctx = _plan_stage_c(out_root, manifest, cfg, n_cpus=n_procs)
    tmp = os.path.join(out_root, "postings.tmp")
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    c_chunks = [c_specs[i::n_procs] for i in range(n_procs)]
    c_chunks = [c for c in c_chunks if c]
    barrier = ctx_mp.Barrier(len(c_chunks))
    out_q = ctx_mp.Queue()
    cfg_kw = {"target_rows_per_partition": cfg.target_rows_per_partition,
              "partitions_per_segment": cfg.partitions_per_segment,
              "hot_df_threshold": cfg.hot_df_threshold}
    procs = [ctx_mp.Process(target=_full_worker_c,
                            args=(c, cfg_kw, out_root, tmp, c_ctx, barrier,
                                  out_q))
             for c in c_chunks]
    for p in procs:
        p.start()
    c_walls = [out_q.get() for _ in procs]
    for p in procs:
        p.join()
    c_wall = max(c_walls)

    total = a_wall + b_sec + c_wall
    detail = {"A_invert": round(a_wall, 2), "B_term_stats": round(b_sec, 2),
              "C_merge_encode": round(c_wall, 2),
              "n_stage_c_tasks": len(c_specs)}
    shutil.rmtree(out_root, ignore_errors=True)
    return total_rows / total, detail


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=4000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--slice", type=int, default=1024)
    ap.add_argument("--levels", type=str, default="2,8,32")
    ap.add_argument("--body", action="store_true",
                    help="run the full Stage-A body over the bench corpus "
                         "instead of the pure invert kernel")
    ap.add_argument("--body-full", action="store_true",
                    help="run the COMPLETE build (Stage A+B+C) over the "
                         "bench corpus under plain multiprocessing — the "
                         "whole-pipeline no-Ray twin")
    ap.add_argument("--spawn", action="store_true",
                    help="body workers via spawn (exec, no fork COW) — the "
                         "Ray-worker process model")
    ap.add_argument("--corpus", type=str, default="")
    args = ap.parse_args()
    levels = [int(x) for x in args.levels.split(",")]

    if args.body_full:
        corpus = args.corpus
        if not corpus:
            rows = int(os.environ.get("BENCH_CORPUS_ROWS", "300000"))
            corpus = f"/tmp/lucene_ray_bench/corpus_{rows}.parquet"
        pairs = {str(n): run_full_body_level(n, corpus, args.spawn)
                 for n in levels}
        results = {k: round(v[0], 1) for k, v in pairs.items()}
        out = {
            "metric": "full_build_body_docs_per_sec_multiprocessing",
            "note": "complete build (Stage A+B+C), no Ray"
                    + (", spawn (exec) workers" if args.spawn else ""),
            "start_method": "spawn" if args.spawn else "fork",
            "corpus": corpus,
            "docs_per_sec": results,
            "stage_seconds": {k: v[1] for k, v in pairs.items()},
        }
        if "8" in results and "32" in results:
            out["eff_8_32"] = round(results["32"] / results["8"] / 4, 3)
        print(json.dumps(out))
        return

    if args.body:
        corpus = args.corpus
        if not corpus:
            rows = int(os.environ.get("BENCH_CORPUS_ROWS", "300000"))
            corpus = f"/tmp/lucene_ray_bench/corpus_{rows}.parquet"
        pairs = {str(n): run_body_level(n, corpus, args.spawn) for n in levels}
        results = {k: round(v[0], 1) for k, v in pairs.items()}
        out = {
            "metric": "stage_a_body_docs_per_sec_multiprocessing",
            "note": "full Stage-A body (read+invert+sha+bucket+write), no Ray"
                    + (", spawn (exec) workers" if args.spawn else ""),
            "start_method": "spawn" if args.spawn else "fork",
            "corpus": corpus,
            "docs_per_sec": results,
            "task_ms": {k: v[1] for k, v in pairs.items()},
        }
        if "8" in results and "32" in results:
            out["eff_8_32"] = round(results["32"] / results["8"] / 4, 3)
        print(json.dumps(out))
        return

    results: dict[str, float] = {}
    # best-of-2 interleaved, mirroring bench.py --scaling protocol
    for attempt in range(2):
        order = levels if attempt % 2 == 0 else list(reversed(levels))
        for n in order:
            d = run_level(n, args.rows, args.reps, args.slice)
            results[str(n)] = max(results.get(str(n), 0.0), round(d, 1))
    out = {
        "metric": "invert_kernel_docs_per_sec_multiprocessing",
        "note": "pure inversion kernel, no Ray; identical work per process",
        "rows_per_proc": args.rows,
        "reps": args.reps,
        "docs_per_sec": results,
    }
    if "8" in results and "32" in results:
        out["eff_8_32"] = round(results["32"] / results["8"] / 4, 3)
    if "2" in results and "8" in results:
        out["eff_2_8"] = round(results["8"] / results["2"] / 4, 3)
    print(json.dumps(out))
    bench_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH")
    os.makedirs(bench_dir, exist_ok=True)
    with open(os.path.join(bench_dir, "microbench.jsonl"), "a") as f:
        f.write(json.dumps({"ts": time.strftime("%Y-%m-%d %H:%M:%S"), **out}) + "\n")


if __name__ == "__main__":
    main()
