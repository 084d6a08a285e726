"""Index splitting — the PKIndexSplitter analog
(lucene/misc/src/java/org/apache/lucene/misc/index/PKIndexSplitter.java:37:
"Split an index based on a Query" — docs passing the filter land in one
output index, the rest in the other, both physically rewritten).

Compositional implementation over existing primitives, no re-tokenization:
1. copy the index's durable artifacts to each output (the docmap/partials/
   postings files are immutable per generation, so a file copy IS a valid
   index of the same generation),
2. tombstone the complement in each half (``delete_by_term`` with
   ``invert`` — distributed column-pruned scan),
3. optionally compact each half into one segment with
   ``expunge_deletes=True`` (compact_segments reuses the Stage-C merge
   operator), physically dropping the deleted docs exactly as
   PKIndexSplitter's createIndex does.

With ``expunge=False`` the split is metadata-only (tombstones) — instant,
and each half already serves the correct hit sets; compaction can run
later under the tiered policy.
"""

from __future__ import annotations

import os
import shutil

from lucene_ray.index.build import compact_segments, delete_by_term
from lucene_ray.index.manifest import Manifest


def split_index(index_dir: str, out_keep: str, out_rest: str, col: str,
                values: list, expunge: bool = True) -> tuple[Manifest, Manifest]:
    """Split ``index_dir`` by a stored-column membership predicate:
    ``out_keep`` holds docs with ``col`` in ``values``, ``out_rest`` the
    complement. Returns both manifests."""
    for out in (out_keep, out_rest):
        if os.path.exists(out):
            raise ValueError(f"split target exists: {out}")
        shutil.copytree(index_dir, out)
    delete_by_term(out_keep, col, values, invert=True)
    delete_by_term(out_rest, col, values)
    manifests = []
    for out in (out_keep, out_rest):
        if expunge:
            m = Manifest.load(out)
            segs = [s["seg"] for s in m.segments]
            compact_segments(out, segs, expunge_deletes=True)
        manifests.append(Manifest.load(out))
    return manifests[0], manifests[1]
