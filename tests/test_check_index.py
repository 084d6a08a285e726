"""CheckIndex analog: the built fixture index must satisfy every invariant,
and corruptions must be detected."""

import numpy as np
import pytest

from lucene_ray.index.check import CheckIndexError, check_index


def test_fixture_index_is_clean(built_index):
    index_dir, manifest, _ = built_index
    summary = check_index(index_dir)
    assert summary["status"] == "OK"
    assert summary["doc_count"] == 1000
    assert summary["segments"] == len(manifest.segments)
    assert summary["terms"] > 1000  # vocab + uniq singletons


def test_detects_corruption(built_index, tmp_path):
    """Flip bytes in one postings file -> the checker must complain."""
    import os
    import shutil

    index_dir, _, _ = built_index
    corrupted = str(tmp_path / "corrupt_idx")
    shutil.copytree(index_dir, corrupted)
    seg0 = os.path.join(corrupted, "postings", "seg=0")
    target = next(
        os.path.join(root, f)
        for root, _, files in sorted(os.walk(seg0))
        for f in sorted(files) if f.endswith(".parquet")
    )
    # rewrite one chunk row with an out-of-order doc list
    import pyarrow.parquet as pq
    import pyarrow as pa

    t = pq.read_table(target)
    cols = t.to_pydict()
    cols["min_doc"][0] = cols["min_doc"][0] + 1  # metadata now disagrees
    pq.write_table(pa.table(cols, schema=t.schema), target)
    with pytest.raises(CheckIndexError):
        check_index(corrupted)
