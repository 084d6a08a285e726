"""Tiered merge selection — the background-merge policy (SURVEY §3.3).

A faithful port of Lucene's ``TieredMergePolicy.findMerges`` selection core
(lucene/core/src/java/org/apache/lucene/index/TieredMergePolicy.java:317-467
tier budget, :563-606 candidate enumeration, :679-746 scoring):

- segments sorted by size desc; segments larger than ``max_merged_bytes/2``
  are graced out of the budget (the "too large" rule);
- the allowed segment count comes from the tier loop: a tier of
  ``segs_per_tier`` segments at each level, level size multiplying by the
  merge factor until the remaining bytes fit one tier;
- while over budget, candidates are windows over the size-sorted list of up
  to ``merge_factor`` segments (packing smaller ones while under the floor
  or after a too-large skip), scored by
  ``skew * totAfterMergeBytes**0.05 * nonDelRatio**2`` (lower = better) —
  skew = floored biggest / floored total (hitTooLarge pretends perfect
  skew), nonDelRatio reclaims deletes;
- a candidate whose result is not at least 1.5x its biggest input is
  skipped (the O(N^2) re-merge guard), unless it reclaims enough deletes;
- at most one too-large merge per call (haveOneLargeMerge).

Omitted vs Java (documented): ``targetSearchConcurrency`` grace,
``allowedDelCount``/``allowedDocCount`` triggers — this engine's deletes are
global tombstones applied at query time, so delete reclaim only affects
scoring, not triggering. Defaults mirror TieredMergePolicy.java:85-88
(segsPerTier=10 -> Lucene default is 10; SURVEY quotes the historic 8 —
the parameter is explicit either way, floor 16 MB, max 5 GB).
"""

from __future__ import annotations

import os
from dataclasses import dataclass


@dataclass
class TieredPolicy:
    segs_per_tier: float = 10.0
    max_merge_at_once: int = 10  # merge factor (candidate window cap)
    floor_bytes: int = 16 << 20
    max_merged_bytes: int = 5 << 30
    deletes_pct_allowed: float = 20.0

    def floor_size(self, b: int) -> int:
        return max(b, self.floor_bytes)


@dataclass
class SegStat:
    seg: int
    bytes: int
    max_doc: int = 0
    del_count: int = 0


def _allowed_seg_count(eligible: list[SegStat], p: TieredPolicy) -> float:
    if not eligible:
        return p.segs_per_tier
    min_bytes = min(s.bytes for s in eligible)
    tot = sum(s.bytes for s in eligible)
    level = max(min_bytes, p.floor_bytes)
    allowed = 0.0
    merge_factor = int(p.segs_per_tier)
    import math

    while True:
        seg_count_level = tot / level
        if seg_count_level < p.segs_per_tier or level == p.max_merged_bytes:
            allowed += math.ceil(seg_count_level)
            break
        allowed += p.segs_per_tier
        tot -= p.segs_per_tier * level
        level = min(p.max_merged_bytes, level * merge_factor)
    return max(allowed, p.segs_per_tier)


def _score(cand: list[SegStat], hit_too_large: bool, p: TieredPolicy) -> float:
    tot_after = sum(s.bytes for s in cand)
    tot_after_floored = sum(p.floor_size(s.bytes) for s in cand)
    # before-merge bytes include the deleted fraction (sizeInBytes() in
    # Java counts deletes; our proxy scales by live ratio)
    tot_before = 0.0
    for s in cand:
        live = (s.max_doc - s.del_count) / s.max_doc if s.max_doc else 1.0
        tot_before += s.bytes / live if live > 0 else s.bytes * 2.0
    if hit_too_large:
        skew = 1.0 / int(p.segs_per_tier)
    else:
        skew = p.floor_size(cand[0].bytes) / tot_after_floored
    non_del_ratio = tot_after / tot_before if tot_before else 1.0
    return skew * (tot_after ** 0.05) * (non_del_ratio ** 2)


def find_merges(segments: list[SegStat], p: TieredPolicy | None = None
                ) -> list[list[int]]:
    """Merge specification: a list of segment-id groups to merge, computed
    by the tiered budget + skew-scored candidate search described above."""
    p = p or TieredPolicy()
    sorted_eligible = sorted(segments, key=lambda s: (-s.bytes, s.seg))
    # grace out too-large segments (unless they carry enough deletes)
    def too_large(s: SegStat) -> bool:
        seg_del_pct = 100.0 * s.del_count / s.max_doc if s.max_doc else 0.0
        return (s.bytes > p.max_merged_bytes / 2
                and seg_del_pct <= p.deletes_pct_allowed)

    sorted_eligible = [s for s in sorted_eligible if not too_large(s)]
    allowed = _allowed_seg_count(sorted_eligible, p)

    spec: list[list[int]] = []
    to_be_merged: set[int] = set()
    have_one_large_merge = False
    while True:
        eligible = [s for s in sorted_eligible if s.seg not in to_be_merged]
        if not eligible or len(eligible) <= allowed:
            return spec
        best: list[SegStat] | None = None
        best_score = None
        best_too_large = False
        for start in range(len(eligible)):
            cand: list[SegStat] = []
            hit_too_large = False
            bytes_this = 0
            for idx in range(start, len(eligible)):
                if not (len(cand) < p.max_merge_at_once
                        or bytes_this < p.floor_bytes):
                    break
                if bytes_this >= p.max_merged_bytes:
                    break
                s = eligible[idx]
                if bytes_this + s.bytes > p.max_merged_bytes:
                    hit_too_large = True
                    if cand:
                        continue  # keep packing smaller segments
                cand.append(s)
                bytes_this += s.bytes
            if not cand:
                continue
            biggest = cand[0]
            big_del_pct = (100.0 * biggest.del_count / biggest.max_doc
                           if biggest.max_doc else 0.0)
            if (not hit_too_large
                    and bytes_this < biggest.bytes * 1.5
                    and big_del_pct < p.deletes_pct_allowed):
                continue  # O(N^2) re-merge guard (TieredMergePolicy:585-600)
            if len(cand) < 2:
                continue
            if hit_too_large and have_one_large_merge:
                continue
            score = _score(cand, hit_too_large, p)
            if best_score is None or score < best_score:
                best, best_score, best_too_large = cand, score, hit_too_large
        if best is None:
            return spec
        have_one_large_merge |= best_too_large
        to_be_merged.update(s.seg for s in best)
        spec.append([s.seg for s in best])


def segment_stats(index_dir: str, manifest) -> list[SegStat]:
    """On-disk byte size + live/deleted doc counts per segment."""
    import numpy as np

    from lucene_ray.index.build import load_tombstones

    ts = load_tombstones(index_dir, manifest)
    ts_pid = (np.asarray(ts, dtype=np.uint64) >> np.uint64(32)).astype(np.int64)
    out = []
    for s in manifest.segments:
        d = os.path.join(index_dir, "postings", f"seg={s['seg']}")
        nbytes = 0
        for root, _dirs, files in os.walk(d):
            nbytes += sum(os.path.getsize(os.path.join(root, f)) for f in files)
        dels = int(np.isin(ts_pid, np.asarray(s["pids"], dtype=np.int64)).sum())
        out.append(SegStat(seg=int(s["seg"]), bytes=nbytes,
                           max_doc=int(s["num_docs"]), del_count=dels))
    return out


def auto_compact(index_dir: str, policy: TieredPolicy | None = None):
    """Apply the tiered policy to an index: find merges, run each through
    ``compact_segments`` (which reuses Stage C, SURVEY §3.3 — merge reuses
    the flush operator). Returns the list of merge groups executed."""
    from lucene_ray.index.build import Manifest, compact_segments

    manifest = Manifest.load(index_dir)
    merges = find_merges(segment_stats(index_dir, manifest), policy)
    for group in merges:
        compact_segments(index_dir, group)
    return merges
