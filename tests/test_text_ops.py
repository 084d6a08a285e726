"""Text-analysis kernels: vectorized paths vs scalar reference on edge cases
(empty docs, unicode, CJK, token-less docs)."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from lucene_ray.ops import text


TEXTS = [
    "Hello World abc123 def_ghi",
    "",                                    # empty
    "!!! ???",                             # no tokens
    "múltiple ünïcode wörds",               # multibyte, tokens split at accents
    "这是一段中文文本 的 测试 内容 非常 好",   # CJK
    "the cat and the dog in the house",     # en markers
    "el perro y la casa de los gatos",      # es markers
    "a" * 300,                              # long token (truncation path)
    "x y z " * 50,
]


def _ds():
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
        "text": pa.array(TEXTS, pa.string()),
    }))


def _tokens(t):
    import re

    return [w for w in re.split(r"[^a-z0-9_]+", t.lower()) if w]


def test_quality_score_matches_scalar_reference(ray_session):
    out = text.quality_score(_ds()).to_pandas().sort_values("doc_id").reset_index(drop=True)
    for i, t in enumerate(TEXTS):
        assert out["n_chars"][i] == len(t)
        assert out["n_alpha_chars"][i] == sum(("a" <= c <= "z") or ("A" <= c <= "Z") for c in t)
        assert out["n_digit_chars"][i] == sum("0" <= c <= "9" for c in t)
        toks = _tokens(t)
        # the engine splits >255-char runs; mirror that for the reference
        split_toks = []
        for w in toks:
            split_toks.extend(w[j:j + 255] for j in range(0, len(w), 255))
        assert out["n_tokens"][i] == len(split_toks), (i, t[:30])
        assert out["max_token_len"][i] == max((len(w) for w in split_toks), default=0)


def test_doc_token_stats_matches_scalar_reference(ray_session):
    out = text.doc_token_stats(_ds()).to_pandas().sort_values("doc_id").reset_index(drop=True)
    for i, t in enumerate(TEXTS):
        toks = []
        for w in _tokens(t):
            toks.extend(w[j:j + 255] for j in range(0, len(w), 255))
        assert out["n_tokens"][i] == len(toks)
        assert out["n_unique_tokens"][i] == len(set(toks))
        assert out["fingerprint"][i] == hashlib.md5(" ".join(toks).encode()).hexdigest()


def test_langid_markers_and_cjk(ray_session):
    out = text.lang_id(_ds()).to_pandas().sort_values("doc_id").reset_index(drop=True)
    preds = list(out["lang_pred"])
    assert preds[4] == "zh"
    assert preds[5] == "en"
    assert preds[6] == "es"
    assert preds[1] == "en"  # empty doc defaults to en


def test_bpe_token_count_runs(ray_session):
    out = text.bpe_token_count(_ds()).to_pandas()
    assert (out["n_bpe_tokens"] >= 0).all()
    assert out["n_bpe_tokens"][1] == 0
