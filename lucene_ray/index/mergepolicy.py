"""Automatic merge selection — the TieredMergePolicy analog.

Lucene keeps the segment count bounded by a geometric tier budget and picks
the cheapest merge of similarly-sized small segments
(lucene/core/src/java/org/apache/lucene/index/TieredMergePolicy.java:64-90:
"computes a budget of how many segments are allowed … by first dividing the
tiers by mergeFactor; merges below the floor size are selected first").

This engine's segments are doc-count-sized (postings derive from Stage-A
partials, so doc count is the faithful size proxy — there is no per-segment
byte accounting to skew). ``maybe_merge`` is the ``IndexWriter.maybeMerge``
analog: call it after ``add_documents`` batches and it compacts until the
policy is satisfied, reusing :func:`compact_segments` (which is crash-safe:
manifest-before-delete, see build.py).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from lucene_ray.index.build import compact_segments
from lucene_ray.index.manifest import Manifest


@dataclass(frozen=True)
class TieredMergePolicy:
    """Doc-count-tiered policy (TieredMergePolicy.java:64-90 shape).

    - ``floor_segment_docs``: segments below this size all count toward the
      bottom tier (floorSegmentBytes analog), so a trickle of tiny NRT
      segments cannot inflate the budget.
    - ``segments_per_tier``: allowed segments per geometric tier.
    - ``max_merge_at_once``: merge width cap (maxMergeAtOnce).
    """

    segments_per_tier: float = 10.0
    max_merge_at_once: int = 10
    floor_segment_docs: int = 1000

    def allowed_segment_count(self, sizes: list[int]) -> int:
        """Geometric tier budget: level size starts at the floor and grows by
        ``segments_per_tier`` per tier (the mergeFactor in current Lucene,
        where maxMergeAtOnce no longer shapes the budget); each tier admits
        ``segments_per_tier`` segments (TieredMergePolicy.findMerges budget
        loop)."""
        total = sum(max(s, 1) for s in sizes)
        level = float(max(self.floor_segment_docs, 1))
        allowed = 0.0
        remaining = float(total)
        while True:
            seg_count_level = remaining / level
            if seg_count_level < self.segments_per_tier:
                allowed += math.ceil(seg_count_level)
                break
            allowed += self.segments_per_tier
            remaining -= self.segments_per_tier * level
            level *= self.segments_per_tier
        return max(int(allowed), 1)

    def find_merge(self, segments: list[dict]) -> list[int] | None:
        """Return seg ids to merge next, or None if within budget.

        Candidate scoring follows TieredMergePolicy.score:
        ``skew * totalMergedSize**0.05`` — least-skewed window of
        similarly-sized segments wins, with a gentle pull toward smaller
        merges (smaller merges cost less and big segments get their turn
        in later, wider tiers)."""
        if len(segments) < 2:
            return None
        sizes = [max(int(s["num_docs"]), 1) for s in segments]
        if len(segments) <= self.allowed_segment_count(sizes):
            return None
        order = sorted(range(len(segments)), key=lambda i: sizes[i])
        width = max(min(self.max_merge_at_once, len(order)), 2)
        best, best_score = None, None
        for start in range(0, len(order) - width + 1):
            window = order[start : start + width]
            tot = sum(sizes[i] for i in window)
            # floored sizes for skew, as Lucene: tiny segments don't read as
            # "perfectly unskewed" merges below the floor
            floored = [max(sizes[i], self.floor_segment_docs) for i in window]
            skew = max(floored) / sum(floored)
            score = skew * tot**0.05
            if best_score is None or score < best_score:
                best, best_score = window, score
        return sorted(segments[i]["seg"] for i in best)


def maybe_merge(
    index_dir: str,
    policy: TieredMergePolicy | None = None,
    expunge_deletes: bool = True,
) -> Manifest:
    """Compact until the policy budget is met — IndexWriter.maybeMerge
    (lucene/core/src/java/org/apache/lucene/index/IndexWriter.java:2230).
    Each round reuses compact_segments (Stage-C re-run over the chosen
    segments' durable partials; search results are doc-id-stable)."""
    policy = policy or TieredMergePolicy()
    manifest = Manifest.load(index_dir)
    while True:
        chosen = policy.find_merge(manifest.segments)
        if chosen is None:
            return manifest
        manifest = compact_segments(index_dir, chosen,
                                    expunge_deletes=expunge_deletes)
