"""Document classification over token statistics — the analog of Lucene's
classification module (lucene/classification/src/java/org/apache/lucene/
classification/SimpleNaiveBayesClassifier.java:48), re-expressed as two Ray
Data stages:

  train:    map_batches partial (class, token) counts  ->  one small
            groupby((class, token)).sum  — the classic pre-aggregated
            wide step; the model (|V| x |C| counts) is the only thing
            shuffled, never the corpus.
  classify: the trained model is broadcast (ray.put once, NOT re-shipped
            per batch) and applied in map_batches with a fully vectorized
            per-batch kernel (token -> vocab row via hash indexer, one
            np.add.at scatter per batch — no Python loop over docs).

Model: multinomial naive Bayes with add-one smoothing (McCallum & Nigam
1998), the same family Lucene's SimpleNaiveBayesClassifier implements:

    score(d, c) = ln(docs_c / N)
                + sum_{t in d} ln(cnt(t, c) + 1)
                - |d| * ln(tokens_c + |V|)

Prediction = argmax_c score, ties broken by class name ascending. The
whole computation is integer-count-based so an exact DuckDB oracle exists
(__ray_entry__.oracle_sql 'classify_nb_lang')."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


def train_naive_bayes(ds: ray.data.Dataset, text_col: str = "text",
                      class_col: str = "lang") -> dict:
    """Train on ``ds``: returns the model dict {vocab: pd.Index,
    classes: list[str], counts: (|V|, |C|) int64, n_docs: (|C|,) int64,
    n_total_docs: int}. Corpus-sized work happens in map_batches; only
    (class, token, cnt) partials are shuffled."""
    from lucene_ray.index.invert import tokenize_column

    def partial_counts(batch: pa.Table) -> pa.Table:
        toks, doc_idx, _pos = tokenize_column(batch.column(text_col))
        cls = batch.column(class_col)
        if isinstance(cls, pa.ChunkedArray):
            cls = cls.combine_chunks()
        cls_d = cls.dictionary_encode()
        if isinstance(cls_d, pa.ChunkedArray):
            cls_d = cls_d.combine_chunks()
        ccodes = np.asarray(cls_d.indices, dtype=np.int64)[doc_idx]
        tok_d = toks.dictionary_encode()
        if isinstance(tok_d, pa.ChunkedArray):
            tok_d = tok_d.combine_chunks()
        tcodes = np.asarray(tok_d.indices, dtype=np.int64)
        nv = len(tok_d.dictionary)
        key = ccodes * nv + tcodes
        uniq, cnt = np.unique(key, return_counts=True)
        return pa.table({
            class_col: cls_d.dictionary.take(pa.array(uniq // nv)),
            "tok": tok_d.dictionary.take(pa.array(uniq % nv)),
            "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    from ray.data.aggregate import Count, Sum

    counts = (
        ds.select_columns([text_col, class_col])
        .map_batches(partial_counts, batch_format="pyarrow")
        .groupby([class_col, "tok"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )
    docs_per_class = (
        ds.select_columns([class_col]).groupby(class_col)
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    classes = sorted(docs_per_class[class_col])
    vocab = pd.Index(sorted(counts["tok"].unique()))
    mat = np.zeros((len(vocab), len(classes)), dtype=np.int64)
    ci = pd.Index(classes).get_indexer(counts[class_col])
    vi = vocab.get_indexer(counts["tok"])
    mat[vi, ci] = counts["cnt"].to_numpy()
    nd = np.zeros(len(classes), dtype=np.int64)
    nd[pd.Index(classes).get_indexer(docs_per_class[class_col])] = (
        docs_per_class["n"].to_numpy()
    )
    return {
        "vocab": vocab,
        "classes": classes,
        "counts": mat,
        "n_docs": nd,
        "n_total_docs": int(nd.sum()),
    }


class _NBScorer:
    """Actor-pool stage: model deserialized ONCE per actor from the
    broadcast ref, per-batch scoring fully vectorized."""

    def __init__(self, model_ref, text_col: str, id_col: str):
        model = ray.get(model_ref) if isinstance(
            model_ref, ray.ObjectRef) else model_ref
        self.vocab: pd.Index = model["vocab"]
        # Arrow copy of the vocab: the per-batch probe is pc.index_in
        # (a C++ hash lookup on the Arrow token array) — the token stream
        # is never boxed to Python strings.
        self.vocab_arr = pa.array(self.vocab, pa.string())
        self.classes = model["classes"]
        self.classes_np = np.asarray(self.classes, dtype=object)
        counts = model["counts"].astype(np.float64)
        V = len(self.vocab)
        self.log_num = np.log1p(counts)                      # ln(cnt+1)
        self.log_denom = np.log(counts.sum(axis=0) + V)      # ln(tokens_c+V)
        self.log_prior = np.log(
            model["n_docs"] / float(model["n_total_docs"]))
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from lucene_ray.index.invert import tokenize_column

        toks, doc_idx, _pos = tokenize_column(batch.column(self.text_col))
        n = len(batch)
        C = len(self.classes)
        scores = np.tile(self.log_prior, (n, 1))
        # token -> vocab row: pc.index_in is an Arrow-native hash probe
        # (null = OOV -> -1); no Python-string boxing of the token stream
        ti = pc.fill_null(pc.index_in(toks, value_set=self.vocab_arr),
                          -1).to_numpy(zero_copy_only=False).astype(np.int64)
        # per-token contribution: ln(cnt+1) for known tokens, ln(0+1)=0 OOV;
        # every token also pays -ln(tokens_c + V) regardless
        known = ti >= 0
        if len(ti):
            contrib = np.zeros((len(ti), C))
            contrib[known] = self.log_num[ti[known]]
            contrib -= self.log_denom
            np.add.at(scores, doc_idx, contrib)
        # argmax with ties -> first (classes sorted asc = smallest name)
        pred = np.argmax(scores, axis=1)
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "pred_lang": pa.array(self.classes_np[pred], pa.string()),
        })


def classify_naive_bayes(ds: ray.data.Dataset, model: dict,
                         text_col: str = "text",
                         id_col: str = "doc_id",
                         concurrency=(1, 4)) -> ray.data.Dataset:
    """Score ``ds`` with a trained model: broadcast once, actor-pool
    map_batches (model load in __init__, per-batch vectorized scoring)."""
    model_ref = ray.put(model)
    return ds.select_columns([id_col, text_col]).map_batches(
        _NBScorer,
        fn_constructor_args=(model_ref, text_col, id_col),
        batch_format="pyarrow",
        concurrency=concurrency,
    )


_nb_models: dict[tuple, dict] = {}


def classify_documents(sf_dir: str, mod: int = 5) -> pa.Table:
    """Pipeline: train on documents with doc_id % mod != 0, predict the
    ``lang`` of the held-out docs (doc_id % mod == 0). The trained model
    is cached per (sf_dir, mod) — the long-lived-model serving shape
    (mirrors the index/pool registries): repeated scoring calls pay only
    the broadcast + actor-pool scan, never a re-train."""
    import pyarrow.compute as pc

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"])

    def split(holdout: bool):
        def f(batch: pa.Table) -> pa.Table:
            ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
            m = pa.array((ids % mod) == 0)
            return batch.filter(m if holdout else pc.invert(m))
        return f

    test = ds.map_batches(split(True), batch_format="pyarrow")
    # mtime in the key so an in-place parquet regeneration invalidates the
    # cached model (consistent with the derived-index caches).
    key = (sf_dir, mod,
           os.path.getmtime(f"{sf_dir}/documents.parquet"))
    if key not in _nb_models:
        train = ds.map_batches(split(False), batch_format="pyarrow")
        _nb_models[key] = train_naive_bayes(train)
    model = _nb_models[key]
    out = classify_naive_bayes(test, model).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def knn_classify(sf_dir: str, doc_id: int, k: int = 10) -> "pa.Table":
    """k-nearest-neighbor document classifier — the classification module's
    KNearestNeighborClassifier (lucene/classification/src/java/org/apache/
    lucene/classification/KNearestNeighborClassifier.java:52,121,190-239):
    MoreLikeThis top-k neighbors of the doc's text (source doc excluded, as
    in the repo's MLT surface), then per class

        boost  = sum over neighbors of (score / maxScore)   [float32 div,
                 double accumulation — Java's exact mix]
        score  = boost / sumdoc

    which equals Java's ``(count * (classBoost/count)) / k`` with its
    ``sumdoc < k`` correction folded in (identical in both branches up to
    ulps; compared at 6 decimals). Ties broken (score desc, class asc) —
    Java iterates a HashMap here, so its tie order is unspecified.
    Returns (class, score_r6, n_neighbors) ranked."""
    import pyarrow.parquet as pq

    from lucene_ray.pipelines.mlt import more_like_this_topk

    t = more_like_this_topk(sf_dir, doc_id, k)
    if len(t) == 0:
        return pa.table({"class": pa.array([], pa.string()),
                         "rank": pa.array([], pa.int64()),
                         "score_r6": pa.array([], pa.float64()),
                         "n_neighbors": pa.array([], pa.int64())})
    ids = np.asarray(t.column("doc_id"), dtype=np.int64)
    scores = np.asarray(t.column("score"), dtype=np.float32)
    lang = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang"])
    lm = dict(zip(lang.column("doc_id").to_pylist(),
                  lang.column("lang").to_pylist()))
    classes = np.array([lm[int(i)] for i in ids])
    # score/maxScore in float32 (Java: float division, then double widen)
    sb = (scores / scores[0]).astype(np.float64)
    uniq, inv = np.unique(classes, return_inverse=True)
    boost = np.bincount(inv, weights=sb)
    cnt = np.bincount(inv).astype(np.int64)
    sumdoc = int(cnt.sum())
    final = boost / sumdoc
    order = np.lexsort((uniq, -final))
    return pa.table(
        {
            "class": pa.array(uniq[order], pa.string()),
            "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
            "score_r6": pa.array(np.round(final[order], 6), pa.float64()),
            "n_neighbors": pa.array(cnt[order], pa.int64()),
        }
    )
