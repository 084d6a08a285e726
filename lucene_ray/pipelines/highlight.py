"""Highlighting — fragment extraction around term occurrences, consuming
the offsets postings level (the unified-highlighter shape,
lucene/highlighter/src/java/org/apache/lucene/search/uhighlight/UnifiedHighlighter.java):
offsets come straight from the index (no re-analysis of the text), the
fragment is a character window around the first occurrence.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data


def highlight_first(sf_dir: str, term: str, width: int = 20) -> pa.Table:
    """(doc_id, start_offset, end_offset, fragment) per matching doc:
    fragment = lower(text)[max(0, start-width) : end+width] around the
    FIRST occurrence, offsets read from the off_enc postings stream."""
    from lucene_ray.pipelines.fulltext import snippet_first_occurrence

    snips = snippet_first_occurrence(sf_dir, term)
    if snips.num_rows == 0:
        return snips.append_column("fragment", pa.array([], pa.string()))
    wanted = snips.column("doc_id").to_pylist()
    starts = snips.column("start_offset").to_pylist()
    ends = snips.column("end_offset").to_pylist()
    # point-read ONLY the matched docs' text from the source table
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    src = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    src = src.filter(pc.is_in(src.column("doc_id"), value_set=pa.array(wanted)))
    texts = dict(zip(src.column("doc_id").to_pylist(), src.column("text").to_pylist()))
    frags = []
    for d, s, e in zip(wanted, starts, ends):
        t = texts[d].lower()
        frags.append(t[max(0, s - width): e + width])
    return snips.append_column("fragment", pa.array(frags, pa.string()))
