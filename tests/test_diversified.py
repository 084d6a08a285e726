"""DiversifiedTopDocsCollector parity (misc/search/
DiversifiedTopDocsCollector.java): the closed-form kernel must equal a
faithful simulation of the Java streaming insert(), and per-segment
partials re-merged must equal the kernel applied to the whole set."""

import random

import numpy as np

from lucene_ray.pipelines.bulk_search import diversify_topk


def _java_streaming(docs, k, max_per_key):
    """Faithful port of DiversifiedTopDocsCollector.insert, docs visited in
    doc-id order. Better = (score desc, doc asc); insertWithOverflow
    rejects additions not strictly better than the queue's worst."""
    def key_of(e):
        return (e[1], -e[0])  # worst-first order

    glob, perkey = [], {}
    for doc, score, key in docs:
        add = (doc, score, key)
        if len(glob) >= k and key_of(add) < key_of(min(glob, key=key_of)):
            continue
        q = perkey.setdefault(key, [])
        if len(q) < max_per_key:
            q.append(add)
            overflow = None
        else:
            worst = min(q, key=key_of)
            if key_of(add) <= key_of(worst):
                overflow = add
            else:
                q.remove(worst)
                q.append(add)
                overflow = worst
        if overflow is add:
            continue
        if overflow is None:
            if len(glob) < k:
                glob.append(add)
            else:
                gworst = min(glob, key=key_of)
                if key_of(add) <= key_of(gworst):
                    q.remove(min(q, key=key_of))  # undo the per-key insert
                else:
                    glob.remove(gworst)
                    glob.append(add)
                    perkey[gworst[2]].remove(gworst)
        else:
            glob.remove(overflow)
            glob.append(add)
    return sorted(glob, key=lambda e: (-e[1], e[0]))


def _closed(docs, k, max_per_key):
    gids = np.array([d[0] for d in docs], dtype=np.int64)
    scores = np.array([d[1] for d in docs], dtype=np.float32)
    keys = np.array([d[2] for d in docs])
    g, s, kk = diversify_topk(gids, scores, keys, k, max_per_key)
    return [(int(a), float(b), str(c)) for a, b, c in zip(g, s, kk)]


def test_kernel_equals_java_streaming():
    rng = random.Random(7)
    for _ in range(800):
        n = rng.randint(1, 50)
        k = rng.randint(1, 8)
        mpk = rng.randint(1, 3)
        # small integer scores force heavy score ties
        docs = [(i, float(rng.randint(1, 6)), rng.choice("abcd"))
                for i in range(n)]
        assert _closed(docs, k, mpk) == _java_streaming(docs, k, mpk)


def test_partial_merge_is_exact():
    rng = random.Random(13)
    for _ in range(300):
        n = rng.randint(2, 60)
        k = rng.randint(1, 8)
        mpk = rng.randint(1, 3)
        docs = [(i, float(rng.randint(1, 9)), rng.choice("abc"))
                for i in range(n)]
        whole = _closed(docs, k, mpk)
        # split into 1-4 'segments', take constrained top-k per segment,
        # then re-apply the kernel to the union of the partials
        nseg = rng.randint(1, 4)
        parts = []
        for s in range(nseg):
            seg = docs[s::nseg]
            if seg:
                parts.extend(_closed(seg, k, mpk))
        merged = _closed([(d, sc, ky) for d, sc, ky in parts], k, mpk)
        assert merged == whole


def test_diversified_quota_holds(tmp_path):
    from collections import Counter

    from lucene_ray.pipelines.fulltext import diversified_topk

    t = diversified_topk("/root/testdata/sf0.001", "join", "lang", 10, 2)
    assert t.num_rows <= 10
    counts = Counter(t.column("lang").to_pylist())
    assert counts and max(counts.values()) <= 2
    # scores non-increasing, ranks 1..n
    scores = t.column("score").to_pylist()
    assert scores == sorted(scores, reverse=True)
    assert t.column("rank").to_pylist() == list(range(1, t.num_rows + 1))
