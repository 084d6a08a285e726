"""Diagnose Stage A's 32-way slowdown under Ray vs bare multiprocessing.

Runs ONE build at --cpus N while sampling per-process CPU% (raylet, gcs,
driver, workers) once a second, then prints:
  - stage wall vs per-task ms distribution (from manifest.partials_done)
  - task start/end spread (launch ramp + drain)
  - mean CPU% by process group during Stage A

Usage: python scripts/diag_stage_a.py [--cpus 32] [--rows 1000000]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def sample_cpu(stop, out):
    while not stop.is_set():
        try:
            lines = subprocess.run(
                ["ps", "-eo", "pcpu,comm,args"], capture_output=True, text=True
            ).stdout.splitlines()[1:]
            agg: dict[str, float] = {}
            for ln in lines:
                parts = ln.strip().split(None, 2)
                if len(parts) < 3:
                    continue
                pcpu, comm, args = float(parts[0]), parts[1], parts[2]
                if "raylet" in comm:
                    key = "raylet"
                elif "gcs_server" in comm:
                    key = "gcs"
                elif "ray::" in args:
                    key = "workers"
                elif "diag_stage_a" in args:
                    key = "driver"
                elif comm.startswith("python"):
                    key = "other_py"
                else:
                    continue
                agg[key] = agg.get(key, 0.0) + pcpu
            out.append(agg)
        except Exception:
            pass
        time.sleep(1)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--rows", type=int, default=1000000)
    ap.add_argument("--parts", type=int, default=32)
    args = ap.parse_args()

    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "2147483647")
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "2147483647")
    os.environ["BENCH_CORPUS_ROWS"] = str(args.rows)
    prof_dir = f"/tmp/stagea_prof_{args.cpus}"
    import shutil as _sh

    _sh.rmtree(prof_dir, ignore_errors=True)
    os.makedirs(prof_dir, exist_ok=True)
    os.environ["STAGEA_PROFILE"] = prof_dir

    import ray

    import bench
    from lucene_ray.index.build import IndexConfig, build_index

    corpus = bench.ensure_corpus()
    ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
             logging_level="ERROR", object_store_memory=8 << 30)
    import shutil

    index_dir = f"/tmp/lucene_ray_bench/diag_{args.cpus}"
    cfg = IndexConfig(
        target_rows_per_partition=max(1000, args.rows // args.parts),
        partitions_per_segment=8,
        hot_df_threshold=args.rows // 4,
    )
    shutil.rmtree(index_dir, ignore_errors=True)
    build_index(corpus, index_dir, cfg, resume=False)  # warm-up
    shutil.rmtree(index_dir, ignore_errors=True)
    _sh.rmtree(prof_dir, ignore_errors=True)  # drop warm-up profile rows
    os.makedirs(prof_dir, exist_ok=True)

    samples: list[dict] = []
    stop = threading.Event()
    t = threading.Thread(target=sample_cpu, args=(stop, samples), daemon=True)
    t.start()
    t0 = time.time()
    manifest = build_index(corpus, index_dir, cfg, resume=False)
    wall = time.time() - t0
    stop.set()
    t.join(timeout=2)

    ms = sorted(m.get("ms", 0) for m in manifest.partials_done.values())
    stage = manifest.stats.get("stage_seconds", {})
    mean = {}
    for s in samples:
        for k, v in s.items():
            mean.setdefault(k, []).append(v)
    mean = {k: round(sum(v) / len(v), 1) for k, v in mean.items()}
    phases: dict[str, list[int]] = {}
    for fn in os.listdir(prof_dir):
        with open(os.path.join(prof_dir, fn)) as f:
            for line in f:
                row = json.loads(line)
                for k, v in row.items():
                    if k != "pid":
                        phases.setdefault(k, []).append(v)
    phase_p50 = {k: sorted(v)[len(v) // 2] for k, v in phases.items()}
    print(json.dumps({
        "cpus": args.cpus,
        "build_wall_sec": round(wall, 2),
        "stage_seconds": stage,
        "task_ms": {"p50": ms[len(ms) // 2], "max": ms[-1], "sum": sum(ms),
                    "n": len(ms)},
        "implied_gap_sec": round(stage.get("A_invert", 0) - ms[-1] / 1000, 2),
        "phase_p50_ms": phase_p50,
        "mean_cpu_pct": mean,
        "n_samples": len(samples),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
