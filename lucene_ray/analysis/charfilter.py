"""Char filters — the pre-tokenization text-rewrite stage with OFFSET
CORRECTION back to the original text.

Behavioral reference: Lucene's CharFilter chain (analysis/CharFilter.java:
``correctOffset`` maps offsets in the FILTERED stream back to the original
reader) with two concrete filters:

- ``("html_strip",)`` — HTMLStripCharFilter
  (lucene/analysis/common/src/java/org/apache/lucene/analysis/charfilter/
  HTMLStripCharFilter.java, the generated scanner's documented behavior):
  removes ``<...>`` tags and decodes character entities (named subset +
  numeric ``&#NN;`` / ``&#xNN;``), emitting nothing for tags so adjacent
  text joins exactly as Lucene's filter does.
- ``("mapping", ((src, dst), ...))`` — MappingCharFilter
  (charfilter/MappingCharFilter.java): greedy longest-match replacement at
  each position (the NormalizeCharMap FST behavior).

Each filter returns, per document, the filtered text plus a breakpoint map
``(filtered_pos, delta)``: for any filtered offset ``p``, the original
offset is ``p + delta`` of the LAST breakpoint with ``filtered_pos <= p`` —
exactly BaseCharFilter's ``correctOffset`` (charfilter/BaseCharFilter.java:
36-54, cumulative-diff binary search). Filters COMPOSE: a chain's
correction is the function composition of the stages' maps, applied
innermost-last (as chained CharFilter readers do).

The stage is scalar per document (tag scanning is inherently sequential),
so it costs one Python pass per doc in Stage A — only when configured, and
only over docs; the downstream tokenizer/inverter stays vectorized. At
100 TB this parallelizes exactly like the rest of Stage A (per-partition
map_batches tasks).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

# named entities HTMLStripCharFilter decodes that matter for ASCII corpora
# (the full HTML4 table is ~250 entries; extend ENTITIES to widen)
ENTITIES = {
    "amp": "&", "lt": "<", "gt": ">", "quot": '"', "apos": "'",
    "nbsp": " ",
}

_HTML_RE = re.compile(
    r"<[^>]*>|&#x([0-9a-fA-F]+);|&#([0-9]+);|&([a-zA-Z]+);"
)


def _html_strip_one(s: str) -> tuple[str, list[tuple[int, int]]]:
    """One doc -> (filtered, [(filtered_pos, delta)]) breakpoints."""
    out: list[str] = []
    bps: list[tuple[int, int]] = []
    fpos = 0  # length of filtered output so far
    last = 0  # scan position in the original
    for m in _HTML_RE.finditer(s):
        out.append(s[last : m.start()])
        fpos += m.start() - last
        if m.group(1) is not None:
            rep = chr(int(m.group(1), 16))
        elif m.group(2) is not None:
            rep = chr(int(m.group(2)))
        elif m.group(3) is not None:
            ent = ENTITIES.get(m.group(3).lower())
            if ent is None:
                # unknown entity passes through verbatim (scanner behavior)
                last = m.start()
                continue
            rep = ent
        else:
            rep = ""  # tag: emit nothing
        out.append(rep)
        fpos += len(rep)
        last = m.end()
        # after this rewrite, filtered offset fpos corresponds to original
        # offset last: delta = last - fpos
        bps.append((fpos, last - fpos))
    out.append(s[last:])
    return "".join(out), bps


class _MappingMatcher:
    """Greedy longest-match replacer (NormalizeCharMap semantics)."""

    def __init__(self, pairs):
        self.pairs = sorted(((str(a), str(b)) for a, b in pairs),
                            key=lambda p: -len(p[0]))
        if any(not a for a, _ in self.pairs):
            raise ValueError("mapping source must be non-empty")
        # one alternation regex, longest sources first = greedy longest match
        self.rx = re.compile("|".join(re.escape(a) for a, _ in self.pairs))
        self.repl = dict(self.pairs)

    def __call__(self, s: str) -> tuple[str, list[tuple[int, int]]]:
        out: list[str] = []
        bps: list[tuple[int, int]] = []
        fpos = 0
        last = 0
        for m in self.rx.finditer(s):
            out.append(s[last : m.start()])
            fpos += m.start() - last
            rep = self.repl[m.group(0)]
            out.append(rep)
            fpos += len(rep)
            last = m.end()
            if len(rep) != len(m.group(0)):
                bps.append((fpos, last - fpos))
        out.append(s[last:])
        return "".join(out), bps


def _compose(stage, prev_bps: list[tuple[int, int]], s: str):
    """Apply one stage to (s, prev_bps); compose breakpoint maps so the
    result maps the NEW filtered coords straight to ORIGINAL coords.

    Composition: new pos p -> intermediate q = p + delta2(p) -> original
    q + delta1(q). The combined delta is a step function that can only
    change where delta2 changes (p in p2) or where q crosses a prev
    breakpoint (p = q - d for q in p1, d in {0} + d2 values — a complete
    candidate superset; spurious candidates dedupe on the no-change check)."""
    import bisect

    filt, bps = stage(s)
    if not prev_bps:
        return filt, bps
    if not bps:
        return filt, list(prev_bps)
    p2 = [b[0] for b in bps]
    d2 = [b[1] for b in bps]
    p1 = [b[0] for b in prev_bps]
    d1 = [b[1] for b in prev_bps]

    def delta2_at(p):
        i = bisect.bisect_right(p2, p) - 1
        return d2[i] if i >= 0 else 0

    def delta1_at(q):
        i = bisect.bisect_right(p1, q) - 1
        return d1[i] if i >= 0 else 0

    cand = set(p2)
    for q in p1:
        cand.add(q)  # d = 0 case
        for d in d2:
            cand.add(q - d)
    out: list[tuple[int, int]] = []
    prev_total = 0  # delta before the first breakpoint is 0 by definition
    for p in sorted(c for c in cand if c >= 0):
        q = p + delta2_at(p)
        total = (q + delta1_at(q)) - p
        if total != prev_total:
            out.append((p, total))
            prev_total = total
    return filt, out


def build_char_filters(specs: tuple):
    """Compile a char_filters config tuple into stage callables."""
    stages = []
    for spec in specs:
        name = spec[0] if isinstance(spec, (tuple, list)) else spec
        if name == "html_strip":
            stages.append(_html_strip_one)
        elif name == "mapping":
            stages.append(_MappingMatcher(spec[1]))
        else:
            raise ValueError(f"unknown char filter {name!r}")
    return stages


def apply_char_filters(contents: pa.Array, specs: tuple):
    """Filter a string column. Returns ``(filtered_column, corrections)``
    where corrections is ``None`` when no doc needed any rewrite, else a
    triple of flattened per-doc breakpoints
    ``(bp_doc int64[], bp_pos int64[], bp_delta int64[])`` sorted by
    (doc, pos) — the vectorized correctOffset input for
    ``correct_offsets``."""
    stages = build_char_filters(specs)
    if isinstance(contents, pa.ChunkedArray):
        contents = contents.combine_chunks()
    filtered: list[str] = []
    bp_doc: list[int] = []
    bp_pos: list[int] = []
    bp_delta: list[int] = []
    for i, v in enumerate(contents.to_pylist()):
        s = v or ""
        bps: list[tuple[int, int]] = []
        for st in stages:
            s, bps = _compose(st, bps, s)
        filtered.append(s)
        for p, d in bps:
            bp_doc.append(i)
            bp_pos.append(p)
            bp_delta.append(d)
    col = pa.array(filtered, pa.string())
    if not bp_doc:
        return col, None
    return col, (
        np.asarray(bp_doc, dtype=np.int64),
        np.asarray(bp_pos, dtype=np.int64),
        np.asarray(bp_delta, dtype=np.int64),
    )


def correct_offsets(doc_idx: np.ndarray, chars: np.ndarray,
                    corrections) -> np.ndarray:
    """Vectorized correctOffset: map per-token FILTERED char offsets back to
    ORIGINAL text offsets. One searchsorted over (doc, pos)-keyed
    breakpoints for the whole token stream."""
    if corrections is None or len(chars) == 0:
        return chars
    bp_doc, bp_pos, bp_delta = corrections
    big = np.int64(1) << 32
    keys = bp_doc * big + bp_pos
    tok_keys = doc_idx.astype(np.int64) * big + chars.astype(np.int64)
    idx = np.searchsorted(keys, tok_keys, side="right") - 1
    delta = np.where(
        (idx >= 0) & (bp_doc[np.maximum(idx, 0)] == doc_idx),
        bp_delta[np.maximum(idx, 0)],
        0,
    )
    return chars + delta
