"""Deterministic synthetic source-code corpus + query set (FIXTURES.md F1/F2).

Seed=42, ASCII-only. Zipfian token distribution with a pinned hot head
('import', 'return', ...) so hot-term skew is present by construction; ~1% of
files get a unique ``uniq_{row}`` token (singleton-postings path) and row 0
gets a 300-char token (truncation path). Matches the input_hint schema
``(repo, path, commit, lang, content)``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

HOT_TERMS = ["import", "return", "def", "class", "self",
             "public", "void", "int", "string", "new"]
LANGS = ["py", "java", "js", "go"]
PKGS = ["core", "util", "net", "io", "data", "model", "api", "test"]


def make_vocab(size: int = 2000) -> list[str]:
    rng = np.random.default_rng(1234)
    vocab = list(HOT_TERMS)
    syll = ["get", "set", "run", "node", "item", "buf", "ctx", "len", "map",
            "str", "val", "idx", "ptr", "obj", "fmt", "arg", "tmp", "cfg"]
    while len(vocab) < size:
        n = rng.integers(1, 4)
        w = "_".join(rng.choice(syll) for _ in range(n)) + str(rng.integers(0, 100))
        if w not in vocab:
            vocab.append(w)
    return vocab[:size]


def make_corpus(n_rows: int, seed: int = 42) -> pa.Table:
    """Vectorized deterministic corpus generation (Arrow kernels do the row
    assembly so 200k-row bench corpora build in seconds)."""
    import pyarrow.compute as pc

    rng = np.random.default_rng(seed)
    vocab = np.array(make_vocab(), dtype=object)
    # Zipf-ish weights over the vocab (head pinned to HOT_TERMS by rank order)
    ranks = np.arange(1, len(vocab) + 1, dtype=np.float64)
    weights = 1.0 / ranks**1.1
    weights /= weights.sum()

    rows = np.arange(n_rows)
    repos = [f"org{r % 4}/proj{(r // 4) % 8}" for r in rows]
    langs = [LANGS[r % 4] for r in rows]
    paths = [f"src/{PKGS[r % 8]}/file_{r}.{LANGS[r % 4]}" for r in rows]
    commits = [
        hashlib.sha256(f"{rp}/{p}".encode()).hexdigest()[:12]
        for rp, p in zip(repos, paths)
    ]

    counts = rng.integers(20, 401, size=n_rows).astype(np.int64)
    # singleton + truncation extras appended per affected row
    extra = np.zeros(n_rows, dtype=np.int64)
    extra[1::100] += 1  # uniq_{row} tokens
    if n_rows > 0:
        extra[0] += 1  # 300-char token
    total = int((counts + extra).sum())
    # zipf draws for the base tokens, vectorized inverse-cdf sampling
    cdf = np.cumsum(weights)
    base_total = int(counts.sum())
    draws = np.searchsorted(cdf, rng.random(base_total), side="right")
    base_tokens = vocab[np.minimum(draws, len(vocab) - 1)]
    seps = np.array([" ", "\n", "(", ")", ". ", ", ", "; ", " = "], dtype=object)
    sep_draw = seps[rng.integers(0, len(seps), size=total)]

    # interleave base tokens with per-row extras, preserving row boundaries
    all_tokens = np.empty(total, dtype=object)
    out_pos = 0
    base_pos = 0
    offsets = np.zeros(n_rows + 1, dtype=np.int64)
    for r in range(n_rows):
        c = int(counts[r])
        all_tokens[out_pos : out_pos + c] = base_tokens[base_pos : base_pos + c]
        out_pos += c
        base_pos += c
        if extra[r]:
            extras = []
            if r % 100 == 1:
                extras.append(f"uniq_{r}")
            if r == 0:
                extras.append("z" * 300)
            for e in extras[: int(extra[r])]:
                all_tokens[out_pos] = e
                out_pos += 1
        offsets[r + 1] = out_pos

    frag = pc.binary_join_element_wise(
        pa.array(all_tokens, pa.string()), pa.array(sep_draw, pa.string()), ""
    )
    la = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), frag)
    contents = pc.binary_join(la, "")
    return pa.table(
        {
            "repo": pa.array(repos, pa.string()),
            "path": pa.array(paths, pa.string()),
            "commit": pa.array(commits, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "content": contents,
        }
    )


def write_corpus(path: str, n_rows: int, seed: int = 42,
                 row_group_size: int | None = None) -> str:
    tbl = make_corpus(n_rows, seed)
    pq.write_table(tbl, path, row_group_size=row_group_size or max(1, n_rows // 8))
    return path


def reference_queries() -> list[dict]:
    """The pinned F2 query set (k=10 throughout)."""
    return [
        {"qid": 1, "type": "term", "q": "import"},
        {"qid": 2, "type": "term", "q": "uniq_101"},
        {"qid": 3, "type": "and", "q": ["import", "return"]},
        {"qid": 4, "type": "and", "q": ["public", "void", "string"]},
        {"qid": 5, "type": "or", "q": ["def", "class"]},
        {"qid": 6, "type": "or", "q": ["uniq_201", "uniq_401", "int"]},
        {"qid": 7, "type": "not", "q": {"must": ["return"], "must_not": ["import"]}},
        {"qid": 8, "type": "term", "q": "zzz_absent"},
        {"qid": 9, "type": "phrase", "q": ["new", "string"]},
        {"qid": 10, "type": "prefix", "q": "uniq_1"},
    ]


def query_to_ast(spec: dict):
    from lucene_ray.search.query import (
        BooleanQuery,
        PhraseQuery,
        PrefixQuery,
        TermQuery,
    )

    t = spec["type"]
    q = spec["q"]
    if t == "term":
        return TermQuery(q)
    if t == "and":
        return BooleanQuery(must=[TermQuery(x) for x in q])
    if t == "or":
        return BooleanQuery(should=[TermQuery(x) for x in q])
    if t == "not":
        return BooleanQuery(
            must=[TermQuery(x) for x in q["must"]],
            must_not=[TermQuery(x) for x in q["must_not"]],
        )
    if t == "phrase":
        return PhraseQuery(q)
    if t == "prefix":
        return PrefixQuery(q)
    raise ValueError(t)
