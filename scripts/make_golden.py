"""Generate the committed golden conformance set (FIXTURES.md F3): exhaustive
float32-BM25 oracle results for the reference query battery on the seed-42
fixture corpus. Run once; tests/test_golden.py compares the ENGINE against
this file forever after (any rank or float-score drift fails).

Doc ids come from the deterministic partition plan (pinned config matching
tests/conftest.py); the SCORES come only from the independent exhaustive
oracle."""

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from lucene_ray.fixtures import query_to_ast, reference_queries, write_corpus
from lucene_ray.index.build import IndexConfig, plan_partitions
from lucene_ray.search.oracle import ExhaustiveOracle

N_ROWS = 1000
ROW_GROUP_SIZE = 130  # matches tests/conftest.py corpus_file
CFG = IndexConfig(target_rows_per_partition=150)  # matches built_index


def main(out_path: str) -> None:
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "corpus.parquet")
        write_corpus(path, N_ROWS, row_group_size=ROW_GROUP_SIZE)
        import pyarrow.parquet as pq

        texts = pq.read_table(path, columns=["content"]).column("content").to_pylist()
        parts = plan_partitions([path], CFG)
    docs = []
    row = 0
    for p in parts:
        for off in range(p["num_rows"]):
            docs.append(((p["pid"] << 32) | off, texts[row]))
            row += 1
    oracle = ExhaustiveOracle(docs)
    golden = []
    for spec in reference_queries():
        ids, scores, total = oracle.search(query_to_ast(spec), 10)
        golden.append(
            {
                "qid": spec["qid"],
                "hits": [
                    {"doc": int(dd), "score": float(np.float32(s))}
                    for dd, s in zip(ids, scores)
                ],
                "total": int(total),
            }
        )
    with open(out_path, "w") as f:
        json.dump({"n_rows": N_ROWS, "row_group_size": ROW_GROUP_SIZE,
                   "queries": golden}, f, indent=1)
    print(f"wrote {out_path}: {len(golden)} queries")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "tests/golden_f3.json")
