"""Full-text pipelines over the ``documents`` test table.

Builds (once per sf_dir, cached under /tmp/lucene_ray_cache) an inverted
index with the engine's Ray Data pipeline, then serves hit-set / tf / stats /
phrase / prefix / BM25 queries from it. Hit-set-shaped results have exact
DuckDB oracles via the shared tokenizer grammar.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa

from lucene_ray.index.build import IndexConfig, build_index
from lucene_ray.index.reader import IndexReader
from lucene_ray.search.query import Query
from lucene_ray.search.searcher import Searcher

CACHE_ROOT = "/tmp/lucene_ray_cache"

_readers: dict[str, IndexReader] = {}


def documents_index(sf_dir: str) -> IndexReader:
    """Build-or-open the cached documents index for an sf dir."""
    src = os.path.join(sf_dir, "documents.parquet")
    key = hashlib.md5(f"{src}:{os.path.getmtime(src)}:v4".encode()).hexdigest()[:16]
    index_dir = os.path.join(CACHE_ROOT, f"documents-{key}")
    if index_dir not in _readers:
        cfg = IndexConfig(
            content_col="text",
            # n_chars doubles as a numeric doc-values column
            # (NumericRangeQuery / numeric range facets)
            id_cols=("doc_id", "lang", "source", "n_chars"),
            target_rows_per_partition=20_000,
            partitions_per_segment=4,
            hot_df_threshold=500_000,
            with_offsets=True,
            keyword_cols=("lang", "source"),
        )
        manifest = build_index(src, index_dir, cfg, resume=True)
        assert manifest.postings_done
        _readers[index_dir] = IndexReader(index_dir)
    return _readers[index_dir]


def documents_block_index(sf_dir: str) -> IndexReader:
    """Build-or-open a documents index with index-time doc BLOCKS keyed by
    ``source`` (IndexConfig.block_col): each source's docs are contiguous
    and the last one carries the parents-bitset flag — the
    IndexWriter.addDocuments block surface that ToParentBlockJoinQuery
    consumes. Partition size covers every sf's documents table, so each
    source is one block (exact parent aggregation for the oracle)."""
    src = os.path.join(sf_dir, "documents.parquet")
    key = hashlib.md5(f"{src}:{os.path.getmtime(src)}:blk-v1".encode()).hexdigest()[:16]
    index_dir = os.path.join(CACHE_ROOT, f"documents-blk-{key}")
    if index_dir not in _readers:
        cfg = IndexConfig(
            content_col="text",
            id_cols=("doc_id", "lang", "source"),
            target_rows_per_partition=200_000,
            partitions_per_segment=4,
            hot_df_threshold=500_000,
            block_col="source",
        )
        manifest = build_index(src, index_dir, cfg, resume=True)
        assert manifest.postings_done
        _readers[index_dir] = IndexReader(index_dir)
    return _readers[index_dir]


def documents_uax29_index(sf_dir: str) -> IndexReader:
    """Build-or-open a documents index under the uax29 (multilingual
    StandardTokenizer-behavior) grammar. The test tables are pure ASCII, on
    which uax29 is token-for-token identical to the code grammar — so the
    same DuckDB oracle certifies this build path end-to-end (the non-ASCII
    behavior is covered by tests/test_unicode.py's exhaustive oracles)."""
    src = os.path.join(sf_dir, "documents.parquet")
    key = hashlib.md5(f"{src}:{os.path.getmtime(src)}:u29-v1".encode()).hexdigest()[:16]
    index_dir = os.path.join(CACHE_ROOT, f"documents-u29-{key}")
    if index_dir not in _readers:
        cfg = IndexConfig(
            content_col="text",
            id_cols=("doc_id", "lang", "source"),
            target_rows_per_partition=20_000,
            partitions_per_segment=4,
            hot_df_threshold=500_000,
            grammar="uax29",
        )
        manifest = build_index(src, index_dir, cfg, resume=True)
        assert manifest.postings_done
        _readers[index_dir] = IndexReader(index_dir)
    return _readers[index_dir]


def uax29_term_hits(sf_dir: str, term: str) -> pa.Table:
    """Term hit set over the uax29-grammar index."""
    from lucene_ray.search.query import TermQuery

    reader = documents_uax29_index(sf_dir)
    return _orig_ids(sf_dir, _all_matches(sf_dir, TermQuery(term), reader), reader)


HEAD_CHARS = 80  # derived "head" TEXT field = first chars of text


def documents_multifield_index(sf_dir: str) -> IndexReader:
    """Build-or-open a documents index with a SECOND analyzed text field
    (TextField analog — document/TextField.java; ``IndexConfig.text_cols``):
    ``head`` = the first HEAD_CHARS chars of ``text``, derived in a
    column-pruned Ray ``map_batches`` (zero-copy Arrow slice kernel) and
    written beside the source once, then indexed with its own namespaced
    terms, norms and collection stats (per-field avgdl, as
    IndexSearcher.collectionStatistics provides per field)."""
    import pyarrow.compute as pc

    import ray.data

    src = os.path.join(sf_dir, "documents.parquet")
    key = hashlib.md5(f"{src}:{os.path.getmtime(src)}:mf-v1".encode()).hexdigest()[:16]
    index_dir = os.path.join(CACHE_ROOT, f"documents-mf-{key}")
    if index_dir not in _readers:
        derived = index_dir + "-src"
        if not os.path.isdir(derived):
            def _head(b: pa.Table) -> pa.Table:
                h = pc.utf8_slice_codeunits(b.column("text"), 0, HEAD_CHARS)
                return b.append_column("head", h)

            tmp = derived + ".tmp"
            (ray.data.read_parquet(src, columns=["doc_id", "lang", "source", "text"])
             .map_batches(_head, batch_format="pyarrow")
             .write_parquet(tmp))
            os.replace(tmp, derived)  # atomic publish (resume-safe)
        cfg = IndexConfig(
            content_col="text",
            id_cols=("doc_id", "lang", "source"),
            target_rows_per_partition=20_000,
            partitions_per_segment=4,
            hot_df_threshold=500_000,
            text_cols=("head",),
        )
        manifest = build_index(derived, index_dir, cfg, resume=True)
        assert manifest.postings_done
        _readers[index_dir] = IndexReader(index_dir)
    return _readers[index_dir]


def documents_html_index(sf_dir: str) -> IndexReader:
    """Build-or-open a documents index whose content is a derived
    HTML-DECORATED twin of ``text`` (every 'a' wrapped in <b></b>, every
    'e' encoded as &#101;), indexed through the ``html_strip`` char filter
    (HTMLStripCharFilter + correctOffset — charfilter/HTMLStripCharFilter).
    The decoration is exactly invertible by the filter, so the index must
    equal the PLAIN tokenization — any tag/entity leakage (or a missing
    offset-corrected join across stripped tags) breaks the oracle."""
    import pyarrow.compute as pc

    import ray.data

    src = os.path.join(sf_dir, "documents.parquet")
    key = hashlib.md5(f"{src}:{os.path.getmtime(src)}:html-v1".encode()).hexdigest()[:16]
    index_dir = os.path.join(CACHE_ROOT, f"documents-html-{key}")
    if index_dir not in _readers:
        derived = index_dir + "-src"
        if not os.path.isdir(derived):
            def _decorate(b: pa.Table) -> pa.Table:
                h = pc.replace_substring(b.column("text"), "e", "&#101;")
                h = pc.replace_substring(h, "a", "<b>a</b>")
                return b.append_column("html", h)

            tmp = derived + ".tmp"
            (ray.data.read_parquet(src, columns=["doc_id", "lang", "source", "text"])
             .map_batches(_decorate, batch_format="pyarrow")
             .write_parquet(tmp))
            os.replace(tmp, derived)
        cfg = IndexConfig(
            content_col="html",
            id_cols=("doc_id", "lang", "source"),
            target_rows_per_partition=20_000,
            partitions_per_segment=4,
            hot_df_threshold=500_000,
            char_filters=("html_strip",),
        )
        manifest = build_index(derived, index_dir, cfg, resume=True)
        assert manifest.postings_done
        _readers[index_dir] = IndexReader(index_dir)
    return _readers[index_dir]


def html_term_hits(sf_dir: str, term: str) -> pa.Table:
    """Term hit set over the html_strip-filtered decorated index — exact
    SQL oracle: the decoration is filter-invertible, so hits equal the
    PLAIN text tokenization's hits."""
    from lucene_ray.search.query import TermQuery

    reader = documents_html_index(sf_dir)
    return _orig_ids(sf_dir, _all_matches(sf_dir, TermQuery(term), reader), reader)


# deterministic ASCII-token -> han-run substitutions used by the derived
# CJK twin corpus. Substitution sources share no letters, so replacement
# order can't interact, and the injected runs' INTERIOR bigrams can never
# be produced by a seam between adjacent injections (seam bigrams are
# 学日 / 学中 / 人日 / 人中 only) — which is what makes the SQL replay
# below exact: tf(本語) == substring-count('hash'), tf(中国) == count('join').
CJK_SUBS = (("hash", "日本語学"), ("join", "中国人"))


def documents_cjk_index(sf_dir: str) -> IndexReader:
    """Build-or-open a documents index over a derived CJK twin of ``text``
    (deterministic, SQL-replayable replace() substitutions inject han runs
    into the ASCII corpus) under the ``cjk_bigram`` grammar — the
    CJKBigramFilter chain (lucene/analysis/common/src/java/org/apache/
    lucene/analysis/cjk/CJKBigramFilter.java:53, CJKAnalyzer default)."""
    import pyarrow.compute as pc

    import ray.data

    src = os.path.join(sf_dir, "documents.parquet")
    key = hashlib.md5(f"{src}:{os.path.getmtime(src)}:cjk-v1".encode()).hexdigest()[:16]
    index_dir = os.path.join(CACHE_ROOT, f"documents-cjk-{key}")
    if index_dir not in _readers:
        derived = index_dir + "-src"
        if not os.path.isdir(derived):
            def _cjk(b: pa.Table) -> pa.Table:
                t = b.column("text")
                for a, z in CJK_SUBS:
                    t = pc.replace_substring(t, pattern=a, replacement=z)
                return b.set_column(b.schema.get_field_index("text"),
                                    "text", t)

            tmp = derived + ".tmp"
            (ray.data.read_parquet(src, columns=["doc_id", "lang", "source", "text"])
             .map_batches(_cjk, batch_format="pyarrow")
             .write_parquet(tmp))
            os.replace(tmp, derived)  # atomic publish (resume-safe)
        cfg = IndexConfig(
            content_col="text",
            id_cols=("doc_id", "lang", "source"),
            target_rows_per_partition=20_000,
            partitions_per_segment=4,
            hot_df_threshold=500_000,
            grammar="cjk_bigram",
        )
        manifest = build_index(derived, index_dir, cfg, resume=True)
        assert manifest.postings_done
        _readers[index_dir] = IndexReader(index_dir)
    return _readers[index_dir]


# costed lexicon for the Viterbi dict grammar: MaxMatch on 東京都 picks
# 東京|都 (500+800); the lattice picks 東|京都 (800+400) — so a hit on the
# term 京都 proves the VITERBI segmentation ran, and 東京 must hit nothing
VITERBI_SUB = ("merge", " 東京都 ")
VITERBI_LEXICON = (("東京", 500.0), ("京都", 400.0), ("東", 800.0),
                   ("都", 800.0))


def documents_viterbi_index(sf_dir: str) -> IndexReader:
    """Build-or-open a documents index over a derived corpus injecting the
    classic 東京都 ambiguity (every 'merge' substring), analyzed with the
    ``dict`` grammar over a COSTED lexicon — the Viterbi lattice core of
    the reference's morphological tokenizers (kuromoji JapaneseTokenizer's
    dictionary word costs; analysis/tokenizer.viterbi_spans)."""
    import pyarrow.compute as pc

    import ray.data

    src = os.path.join(sf_dir, "documents.parquet")
    key = hashlib.md5(f"{src}:{os.path.getmtime(src)}:vit-v1".encode()).hexdigest()[:16]
    index_dir = os.path.join(CACHE_ROOT, f"documents-vit-{key}")
    if index_dir not in _readers:
        derived = index_dir + "-src"
        if not os.path.isdir(derived):
            def _inj(b: pa.Table) -> pa.Table:
                t = pc.replace_substring(b.column("text"),
                                         pattern=VITERBI_SUB[0],
                                         replacement=VITERBI_SUB[1])
                return b.set_column(b.schema.get_field_index("text"),
                                    "text", t)

            tmp = derived + ".tmp"
            (ray.data.read_parquet(src, columns=["doc_id", "lang", "source", "text"])
             .map_batches(_inj, batch_format="pyarrow")
             .write_parquet(tmp))
            os.replace(tmp, derived)  # atomic publish (resume-safe)
        cfg = IndexConfig(
            content_col="text",
            id_cols=("doc_id", "lang", "source"),
            target_rows_per_partition=20_000,
            partitions_per_segment=4,
            hot_df_threshold=500_000,
            grammar="dict",
            dict_lexicon=VITERBI_LEXICON,
        )
        manifest = build_index(derived, index_dir, cfg, resume=True)
        assert manifest.postings_done
        _readers[index_dir] = IndexReader(index_dir)
    return _readers[index_dir]


# compound injection for the decompounder index: every 'hash' substring
# becomes the standalone compound token below; the dictionary covers its
# three morphemes, so dict_decompound must emit each of them at the
# compound's position (CompoundWordTokenFilterBase posInc-0 contract) and
# every subword term hits exactly the 'hash'-containing docs
COMPOUND_SUB = ("hash", " donaudampfschiff ")
COMPOUND_DICT = ("donau", "dampf", "schiff")


def documents_decompound_index(sf_dir: str) -> IndexReader:
    """Build-or-open a documents index over a derived compound-bearing twin
    of ``text`` analyzed with uax29 + DictionaryCompoundFilter — the
    decompounding chain (lucene/analysis/common/src/java/org/apache/lucene/
    analysis/compound/DictionaryCompoundWordTokenFilter.java)."""
    import pyarrow.compute as pc

    import ray.data

    src = os.path.join(sf_dir, "documents.parquet")
    key = hashlib.md5(
        f"{src}:{os.path.getmtime(src)}:decomp-v1".encode()).hexdigest()[:16]
    index_dir = os.path.join(CACHE_ROOT, f"documents-decomp-{key}")
    if index_dir not in _readers:
        derived = index_dir + "-src"
        if not os.path.isdir(derived):
            def _inj(b: pa.Table) -> pa.Table:
                t = pc.replace_substring(b.column("text"),
                                         pattern=COMPOUND_SUB[0],
                                         replacement=COMPOUND_SUB[1])
                return b.set_column(b.schema.get_field_index("text"),
                                    "text", t)

            tmp = derived + ".tmp"
            (ray.data.read_parquet(src, columns=["doc_id", "lang", "source", "text"])
             .map_batches(_inj, batch_format="pyarrow")
             .write_parquet(tmp))
            os.replace(tmp, derived)  # atomic publish (resume-safe)
        cfg = IndexConfig(
            content_col="text",
            id_cols=("doc_id", "lang", "source"),
            target_rows_per_partition=20_000,
            partitions_per_segment=4,
            hot_df_threshold=500_000,
            grammar="uax29",
            token_filters=(("dict_decompound",
                            {"dict": list(COMPOUND_DICT)}),),
        )
        manifest = build_index(derived, index_dir, cfg, resume=True)
        assert manifest.postings_done
        _readers[index_dir] = IndexReader(index_dir)
    return _readers[index_dir]


def decompound_hits(sf_dir: str) -> pa.Table:
    """(term, doc_id) hit sets over the decompounded derived corpus: each
    dictionary morpheme AND the original compound hit exactly the docs
    whose raw text contains 'hash' — exact substring-containment SQL
    oracle proving subwords are injected and the original is kept."""
    from lucene_ray.search.query import TermQuery

    reader = documents_decompound_index(sf_dir)
    parts = []
    for term in COMPOUND_DICT + (COMPOUND_SUB[1].strip(),):
        t = _orig_ids(sf_dir, _all_matches(sf_dir, TermQuery(term), reader),
                      reader)
        if len(t):
            parts.append(pa.table({
                "term": pa.array([term] * len(t), pa.string()),
                "doc_id": t.column("doc_id"),
            }))
    if not parts:
        return pa.table({"term": pa.array([], pa.string()),
                         "doc_id": pa.array([], pa.int64())})
    out = pa.concat_tables(parts)
    return out.sort_by([("term", "ascending"), ("doc_id", "ascending")])


def documents_common_grams_index(sf_dir: str) -> IndexReader:
    """Build-or-open a documents index with CommonGramsFilter-style
    '_'-joined bigrams beside unigrams for the common word 'the'
    (lucene/analysis/common/src/java/org/apache/lucene/analysis/
    commongrams/CommonGramsFilter.java) over the pinned code grammar."""
    src = os.path.join(sf_dir, "documents.parquet")
    key = hashlib.md5(
        f"{src}:{os.path.getmtime(src)}:cgram-v1".encode()).hexdigest()[:16]
    index_dir = os.path.join(CACHE_ROOT, f"documents-cgram-{key}")
    if index_dir not in _readers:
        cfg = IndexConfig(
            content_col="text",
            id_cols=("doc_id", "lang", "source"),
            target_rows_per_partition=20_000,
            partitions_per_segment=4,
            hot_df_threshold=500_000,
            common_grams=("the",),
        )
        manifest = build_index(src, index_dir, cfg, resume=True)
        assert manifest.postings_done
        _readers[index_dir] = IndexReader(index_dir)
    return _readers[index_dir]


def rewrite_phrase_with_common_grams(terms, common_words):
    """Query-side CommonGramsQueryFilter analog (lucene/analysis/common/
    src/java/org/apache/lucene/analysis/commongrams/
    CommonGramsQueryFilter.java:47): a two-term phrase where either side is
    a common word is exactly one gram-term lookup on a common-grams index.
    Returns the rewritten TermQuery, or None when the phrase is not of
    that exactly-rewritable shape (caller falls back to PhraseQuery)."""
    from lucene_ray.search.query import TermQuery

    terms = list(terms)
    if len(terms) == 2 and (terms[0] in common_words
                            or terms[1] in common_words):
        return TermQuery(f"{terms[0]}_{terms[1]}")
    return None


def common_grams_hits(sf_dir: str, gram: str = "the_fast") -> pa.Table:
    """doc_ids where the common-gram term matches — one term lookup
    replacing a positional phrase over the huge 'the' posting list; exact
    adjacent-token-pair SQL oracle."""
    from lucene_ray.search.query import TermQuery

    reader = documents_common_grams_index(sf_dir)
    t = _orig_ids(sf_dir, _all_matches(sf_dir, TermQuery(gram), reader),
                  reader)
    return t.sort_by("doc_id")


# Arabic pack injection: every 'hash' substring becomes the definite-form
# token below; the ar light10 chain (normalize + strip ال + suffixes) must
# index it under the bare stem, so TermQuery on the stem replays exactly as
# substring containment of 'hash'
ARABIC_SUB = ("hash", " الكتاب ")
ARABIC_STEM_TERM = "كتاب"


def documents_arabic_index(sf_dir: str) -> IndexReader:
    """Build-or-open a documents index over a derived Arabic-bearing twin
    analyzed with uax29 + the ar light10 pack (ArabicNormalizer +
    ArabicStemmer — lucene/analysis/common/src/java/org/apache/lucene/
    analysis/ar/, after Larkey et al. 2002)."""
    import pyarrow.compute as pc

    import ray.data

    src = os.path.join(sf_dir, "documents.parquet")
    key = hashlib.md5(
        f"{src}:{os.path.getmtime(src)}:ar-v1".encode()).hexdigest()[:16]
    index_dir = os.path.join(CACHE_ROOT, f"documents-ar-{key}")
    if index_dir not in _readers:
        derived = index_dir + "-src"
        if not os.path.isdir(derived):
            def _inj(b: pa.Table) -> pa.Table:
                t = pc.replace_substring(b.column("text"),
                                         pattern=ARABIC_SUB[0],
                                         replacement=ARABIC_SUB[1])
                return b.set_column(b.schema.get_field_index("text"),
                                    "text", t)

            tmp = derived + ".tmp"
            (ray.data.read_parquet(src, columns=["doc_id", "lang", "source", "text"])
             .map_batches(_inj, batch_format="pyarrow")
             .write_parquet(tmp))
            os.replace(tmp, derived)  # atomic publish (resume-safe)
        cfg = IndexConfig(
            content_col="text",
            id_cols=("doc_id", "lang", "source"),
            target_rows_per_partition=20_000,
            partitions_per_segment=4,
            hot_df_threshold=500_000,
            grammar="uax29",
            token_filters=(("light_stem", {"lang": "ar"}),),
        )
        manifest = build_index(derived, index_dir, cfg, resume=True)
        assert manifest.postings_done
        _readers[index_dir] = IndexReader(index_dir)
    return _readers[index_dir]


def arabic_stem_hits(sf_dir: str) -> pa.Table:
    """doc_ids where the bare stem كتاب matches — every injected الكتاب
    must have been normalized + article-stripped by the ar pack."""
    from lucene_ray.search.query import TermQuery

    reader = documents_arabic_index(sf_dir)
    t = _orig_ids(sf_dir,
                  _all_matches(sf_dir, TermQuery(ARABIC_STEM_TERM), reader),
                  reader)
    return t.sort_by("doc_id")


# multi-word synonym injection: every 'hash' substring becomes the token
# pair below; the rule maps the ADJACENT pair to 'ny', so tf/hits of 'ny'
# replay exactly as substring counts of 'hash' ('york' never occurs
# naturally in the deterministic code corpus, so the pair can only come
# from an injection)
PHRASE_SYN_SUB = ("hash", " new york ")
PHRASE_SYN_RULES = ((("new", "york"), "ny"),)


def documents_phrase_syn_index(sf_dir: str) -> IndexReader:
    """Build-or-open a documents index with the index-time multi-word
    synonym chain (SynonymGraphFilter + FlattenGraphFilter — lucene/
    analysis/common/src/java/org/apache/lucene/analysis/synonym/
    SynonymGraphFilter.java): 'new york' -> 'ny' injected at the phrase's
    first position."""
    import pyarrow.compute as pc

    import ray.data

    src = os.path.join(sf_dir, "documents.parquet")
    key = hashlib.md5(
        f"{src}:{os.path.getmtime(src)}:psyn-v1".encode()).hexdigest()[:16]
    index_dir = os.path.join(CACHE_ROOT, f"documents-psyn-{key}")
    if index_dir not in _readers:
        derived = index_dir + "-src"
        if not os.path.isdir(derived):
            def _inj(b: pa.Table) -> pa.Table:
                t = pc.replace_substring(b.column("text"),
                                         pattern=PHRASE_SYN_SUB[0],
                                         replacement=PHRASE_SYN_SUB[1])
                return b.set_column(b.schema.get_field_index("text"),
                                    "text", t)

            tmp = derived + ".tmp"
            (ray.data.read_parquet(src, columns=["doc_id", "lang", "source", "text"])
             .map_batches(_inj, batch_format="pyarrow")
             .write_parquet(tmp))
            os.replace(tmp, derived)  # atomic publish (resume-safe)
        cfg = IndexConfig(
            content_col="text",
            id_cols=("doc_id", "lang", "source"),
            target_rows_per_partition=20_000,
            partitions_per_segment=4,
            hot_df_threshold=500_000,
            grammar="uax29",
            phrase_synonyms=PHRASE_SYN_RULES,
        )
        manifest = build_index(derived, index_dir, cfg, resume=True)
        assert manifest.postings_done
        _readers[index_dir] = IndexReader(index_dir)
    return _readers[index_dir]


def phrase_synonym_hits(sf_dir: str) -> pa.Table:
    """(term, doc_id) over the multi-word-synonym index: the contraction
    'ny' AND the phrase tokens 'new'/'york' (kept beside the synonym) all
    hit the 'hash'-bearing docs ('new' additionally hits its natural
    occurrences — replayed in SQL via token containment)."""
    from lucene_ray.search.query import PhraseQuery, TermQuery

    reader = documents_phrase_syn_index(sf_dir)
    parts = []
    t = _orig_ids(sf_dir, _all_matches(sf_dir, TermQuery("ny"), reader),
                  reader)
    if len(t):
        parts.append(pa.table({
            "term": pa.array(["ny"] * len(t), pa.string()),
            "doc_id": t.column("doc_id"),
        }))
    # the original phrase still matches beside the flattened synonym
    p = _orig_ids(sf_dir,
                  _all_matches(sf_dir, PhraseQuery(("new", "york")), reader),
                  reader)
    if len(p):
        parts.append(pa.table({
            "term": pa.array(["new york"] * len(p), pa.string()),
            "doc_id": p.column("doc_id"),
        }))
    if not parts:
        return pa.table({"term": pa.array([], pa.string()),
                         "doc_id": pa.array([], pa.int64())})
    out = pa.concat_tables(parts)
    return out.sort_by([("term", "ascending"), ("doc_id", "ascending")])


# reversed-field injection: every 'scan' substring becomes the standalone
# token below; its suffix 'qzx' occurs nowhere else in the deterministic
# corpus, so PrefixQuery('xzq…') over the REVERSED index == leading
# wildcard *qzx == exactly the 'scan'-bearing docs
REVERSE_SUB = ("scan", " wunderqzx ")


def documents_reversed_index(sf_dir: str) -> IndexReader:
    """Build-or-open a documents index whose tokens pass through
    ReverseStringFilter (lucene/analysis/common/src/java/org/apache/lucene/
    analysis/reverse/ReverseStringFilter.java) — the mirror field that
    makes leading wildcards cheap (Solr ReversedWildcardFilterFactory
    pattern: ``*suffix`` becomes a prefix scan on the reversed field)."""
    import pyarrow.compute as pc

    import ray.data

    src = os.path.join(sf_dir, "documents.parquet")
    key = hashlib.md5(
        f"{src}:{os.path.getmtime(src)}:rev-v1".encode()).hexdigest()[:16]
    index_dir = os.path.join(CACHE_ROOT, f"documents-rev-{key}")
    if index_dir not in _readers:
        derived = index_dir + "-src"
        if not os.path.isdir(derived):
            def _inj(b: pa.Table) -> pa.Table:
                t = pc.replace_substring(b.column("text"),
                                         pattern=REVERSE_SUB[0],
                                         replacement=REVERSE_SUB[1])
                return b.set_column(b.schema.get_field_index("text"),
                                    "text", t)

            tmp = derived + ".tmp"
            (ray.data.read_parquet(src, columns=["doc_id", "lang", "source", "text"])
             .map_batches(_inj, batch_format="pyarrow")
             .write_parquet(tmp))
            os.replace(tmp, derived)  # atomic publish (resume-safe)
        cfg = IndexConfig(
            content_col="text",
            id_cols=("doc_id", "lang", "source"),
            target_rows_per_partition=20_000,
            partitions_per_segment=4,
            hot_df_threshold=500_000,
            grammar="uax29",
            token_filters=(("reverse",),),
        )
        manifest = build_index(derived, index_dir, cfg, resume=True)
        assert manifest.postings_done
        _readers[index_dir] = IndexReader(index_dir)
    return _readers[index_dir]


def suffix_wildcard_hits(sf_dir: str, suffix: str = "qzx") -> pa.Table:
    """doc_ids matching the leading wildcard ``*suffix`` executed as a
    PrefixQuery(reversed(suffix)) over the reversed-token index — no term
    enumeration over the whole dictionary, the point of the mirror field."""
    from lucene_ray.search.query import PrefixQuery

    reader = documents_reversed_index(sf_dir)
    t = _orig_ids(sf_dir,
                  _all_matches(sf_dir, PrefixQuery(suffix[::-1]), reader),
                  reader)
    return t.sort_by("doc_id")


def dict_viterbi_hits(sf_dir: str) -> pa.Table:
    """(term, doc_id) hit sets over the Viterbi-segmented derived corpus:
    京都 and 東 hit exactly the docs whose raw text contains 'merge'
    (the lattice's min-cost path), while MaxMatch's segmentation 東京 / 都
    must hit NOTHING. Exact substring-containment SQL oracle."""
    from lucene_ray.search.query import TermQuery

    reader = documents_viterbi_index(sf_dir)
    parts = []
    for term in ("京都", "東", "東京", "都"):
        t = _orig_ids(sf_dir, _all_matches(sf_dir, TermQuery(term), reader),
                      reader)
        if len(t):
            parts.append(pa.table({
                "term": pa.array([term] * len(t), pa.string()),
                "doc_id": t.column("doc_id"),
            }))
    if not parts:
        return pa.table({"term": pa.array([], pa.string()),
                         "doc_id": pa.array([], pa.int64())})
    out = pa.concat_tables(parts)
    return out.sort_by([("term", "ascending"), ("doc_id", "ascending")])


def cjk_bigram_tf(sf_dir: str, bigram: str = "本語") -> pa.Table:
    """(doc_id, tf) of one CJK bigram term over the derived-CJK index —
    exercises the whole CJKBigramFilter path (region detection, overlap,
    positions) with an exact substring-count SQL oracle."""
    reader = documents_cjk_index(sf_dir)
    return _term_freqs_on(reader, bigram)


# ASCII token -> accented/space-padded twin for the ICU-folding index: the
# padding guarantees each injected occurrence is its own uax29 token, so
# ICUFoldingFilter must map it back to exactly the ASCII source ('Jöín' ->
# 'join') and tf('join') == substring-count('join') in the raw text.
FOLD_SUB = ("join", " Jöín ")


def documents_folded_index(sf_dir: str) -> IndexReader:
    """Build-or-open a documents index over a derived accented twin of
    ``text`` (every 'join' substring becomes the standalone accented token
    'Jöín'), analyzed with uax29 + the ICUFoldingFilter chain
    (lucene/analysis/icu/src/java/org/apache/lucene/analysis/icu/
    ICUFoldingFilter.java:57) — Unicode case/diacritic folding must map
    the injected tokens back to their ASCII sources or the oracle breaks."""
    import pyarrow.compute as pc

    import ray.data

    src = os.path.join(sf_dir, "documents.parquet")
    key = hashlib.md5(f"{src}:{os.path.getmtime(src)}:fold-v1".encode()).hexdigest()[:16]
    index_dir = os.path.join(CACHE_ROOT, f"documents-fold-{key}")
    if index_dir not in _readers:
        derived = index_dir + "-src"
        if not os.path.isdir(derived):
            def _acc(b: pa.Table) -> pa.Table:
                t = pc.replace_substring(b.column("text"),
                                         pattern=FOLD_SUB[0],
                                         replacement=FOLD_SUB[1])
                return b.set_column(b.schema.get_field_index("text"),
                                    "text", t)

            tmp = derived + ".tmp"
            (ray.data.read_parquet(src, columns=["doc_id", "lang", "source", "text"])
             .map_batches(_acc, batch_format="pyarrow")
             .write_parquet(tmp))
            os.replace(tmp, derived)  # atomic publish (resume-safe)
        cfg = IndexConfig(
            content_col="text",
            id_cols=("doc_id", "lang", "source"),
            target_rows_per_partition=20_000,
            partitions_per_segment=4,
            hot_df_threshold=500_000,
            grammar="uax29",
            token_filters=(("icu_fold",),),
        )
        manifest = build_index(derived, index_dir, cfg, resume=True)
        assert manifest.postings_done
        _readers[index_dir] = IndexReader(index_dir)
    return _readers[index_dir]


def folded_tf(sf_dir: str, term: str = "join") -> pa.Table:
    """(doc_id, tf) of an ASCII term over the folded index — every hit is
    an accented token the ICUFoldingFilter folded back; exact
    substring-count SQL oracle."""
    reader = documents_folded_index(sf_dir)
    return _term_freqs_on(reader, term)


# joiner-bearing derived corpus: each substitution injects a standalone
# uax29 token that only survives as ONE token because the WB6/7 / WB11/12
# joiner rules hold (apostrophe between letters, dot between digits)
JOINER_SUBS = (("join", " o'join "), ("scan", " 3.14 "))


def documents_joiner_index(sf_dir: str) -> IndexReader:
    """Build-or-open a documents index over a derived JOINER-BEARING twin
    of ``text`` (every 'join' substring becomes the standalone token
    "o'join", every 'scan' becomes "3.14"), analyzed with the uax29
    grammar. The WB6/7 + WB11/12 joiner rules
    (StandardTokenizerImpl.jflex:91-92,216,238-247) must keep each injected
    occurrence ONE token — with the pre-round-5 split behavior the probe
    terms would not exist in the term dictionary and the oracle breaks."""
    import pyarrow.compute as pc

    import ray.data

    src = os.path.join(sf_dir, "documents.parquet")
    key = hashlib.md5(f"{src}:{os.path.getmtime(src)}:joiner-v1".encode()).hexdigest()[:16]
    index_dir = os.path.join(CACHE_ROOT, f"documents-joiner-{key}")
    if index_dir not in _readers:
        derived = index_dir + "-src"
        if not os.path.isdir(derived):
            def _inj(b: pa.Table) -> pa.Table:
                t = b.column("text")
                for pat, rep in JOINER_SUBS:
                    t = pc.replace_substring(t, pattern=pat, replacement=rep)
                return b.set_column(b.schema.get_field_index("text"),
                                    "text", t)

            tmp = derived + ".tmp"
            (ray.data.read_parquet(src, columns=["doc_id", "lang", "source", "text"])
             .map_batches(_inj, batch_format="pyarrow")
             .write_parquet(tmp))
            os.replace(tmp, derived)  # atomic publish (resume-safe)
        cfg = IndexConfig(
            content_col="text",
            id_cols=("doc_id", "lang", "source"),
            target_rows_per_partition=20_000,
            partitions_per_segment=4,
            hot_df_threshold=500_000,
            grammar="uax29",
        )
        manifest = build_index(derived, index_dir, cfg, resume=True)
        assert manifest.postings_done
        _readers[index_dir] = IndexReader(index_dir)
    return _readers[index_dir]


def uax29_joiner_hits(sf_dir: str) -> pa.Table:
    """(term, doc_id) hit sets of the joiner-bearing probe terms over the
    derived corpus, plus NEGATIVE probes ('join', 'scan', '14' — the
    fragments a joiner-less tokenizer would have emitted) which must hit
    nothing. Exact SQL oracle: substring containment on the raw text."""
    from lucene_ray.search.query import TermQuery

    reader = documents_joiner_index(sf_dir)
    parts = []
    for term in ("3.14", "o'join", "join", "scan", "14"):
        t = _orig_ids(sf_dir, _all_matches(sf_dir, TermQuery(term), reader),
                      reader)
        if len(t):
            parts.append(pa.table({
                "term": pa.array([term] * len(t), pa.string()),
                "doc_id": t.column("doc_id"),
            }))
    if not parts:
        return pa.table({"term": pa.array([], pa.string()),
                         "doc_id": pa.array([], pa.int64())})
    out = pa.concat_tables(parts)
    return out.sort_by([("term", "ascending"), ("doc_id", "ascending")])


def documents_pattern_index(sf_dir: str) -> IndexReader:
    """Build-or-open a documents index under a ``pattern:`` grammar
    (PatternTokenizer, analysis/pattern/PatternTokenizer.java:40-56):
    tokens are regex matches of ``[a-z]+`` over the lowercased text."""
    src = os.path.join(sf_dir, "documents.parquet")
    key = hashlib.md5(f"{src}:{os.path.getmtime(src)}:pat-v1".encode()).hexdigest()[:16]
    index_dir = os.path.join(CACHE_ROOT, f"documents-pat-{key}")
    if index_dir not in _readers:
        cfg = IndexConfig(
            content_col="text",
            id_cols=("doc_id", "lang", "source"),
            target_rows_per_partition=20_000,
            partitions_per_segment=4,
            hot_df_threshold=500_000,
            grammar="pattern:[a-z]+",
        )
        manifest = build_index(src, index_dir, cfg, resume=True)
        assert manifest.postings_done
        _readers[index_dir] = IndexReader(index_dir)
    return _readers[index_dir]


def pattern_term_hits(sf_dir: str, term: str) -> pa.Table:
    """Term hit set under the pattern grammar — SQL oracle replays the
    same regex tokenization (split on '[^a-z]+')."""
    from lucene_ray.search.query import TermQuery

    reader = documents_pattern_index(sf_dir)
    return _orig_ids(sf_dir, _all_matches(sf_dir, TermQuery(term), reader), reader)


def documents_shingle_index(sf_dir: str) -> IndexReader:
    """Build-or-open a documents index with bigram shingles injected
    beside the unigrams (ShingleFilter analog, IndexConfig.shingles)."""
    src = os.path.join(sf_dir, "documents.parquet")
    key = hashlib.md5(f"{src}:{os.path.getmtime(src)}:sh-v1".encode()).hexdigest()[:16]
    index_dir = os.path.join(CACHE_ROOT, f"documents-sh-{key}")
    if index_dir not in _readers:
        cfg = IndexConfig(
            content_col="text",
            id_cols=("doc_id", "lang", "source"),
            target_rows_per_partition=20_000,
            partitions_per_segment=4,
            hot_df_threshold=500_000,
            shingles=(2,),
        )
        manifest = build_index(src, index_dir, cfg, resume=True)
        assert manifest.postings_done
        _readers[index_dir] = IndexReader(index_dir)
    return _readers[index_dir]


def shingle_term_hits(sf_dir: str, bigram: str) -> pa.Table:
    """Hit set of ONE bigram shingle term ("a b") — the CommonGrams-style
    exact-phrase-as-single-term lookup. SQL oracle: token adjacency via the
    positional CTE."""
    from lucene_ray.search.query import TermQuery

    reader = documents_shingle_index(sf_dir)
    return _orig_ids(sf_dir, _all_matches(sf_dir, TermQuery(bigram), reader), reader)


def xml_query_hits(sf_dir: str, xml: str) -> pa.Table:
    """Hit set of an XML-syntax query (queryparser/xml/CoreParser.java
    element set — search/xml_parser.py) over the documents index."""
    from lucene_ray.search.xml_parser import parse_xml_query

    reader = documents_index(sf_dir)
    cfg = reader.manifest.config
    q = parse_xml_query(
        xml,
        default_field=cfg.get("content_col") or "content",
        text_fields=tuple(cfg.get("text_cols") or ()),
    )
    return _orig_ids(sf_dir, _all_matches(sf_dir, q, reader), reader)


def multifield_hits(sf_dir: str, terms: list[str]) -> pa.Table:
    """Hit set of a MultiFieldQueryParser-shaped query over (text, head)
    (queryparser/classic/MultiFieldQueryParser.java:58-66): each term is a
    SHOULD across both fields, terms OR together — so a doc matches iff any
    term appears in either field."""
    from lucene_ray.search.query import multi_field_query

    reader = documents_multifield_index(sf_dir)
    q = multi_field_query(" ".join(terms), fields=("text", "head"),
                          content_field="text")
    return _orig_ids(sf_dir, _all_matches(sf_dir, q, reader), reader)


def textfield_topk(sf_dir: str, term: str, k: int = 10) -> pa.Table:
    """BM25 top-k of a term in the HEAD text field, scored against the
    field's OWN norms and avgdl (per-field NumericDocValues norms +
    CollectionStatistics — LeafReader.getNormValues(field)). Float32-exact
    SQL oracle: the head column derives deterministically from text, so
    DuckDB replays tokenize(substr(text)) + byte4 length quantization +
    BM25 with the head field's collection stats."""
    from lucene_ray.search.query import TermQuery

    reader = documents_multifield_index(sf_dir)
    td = _pool(reader).search([(0, TermQuery(f"head:{term}"))], k)[0]
    if len(td.doc_ids) == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int64()),
                         "score": pa.array([], pa.float32())})
    t = reader.lookup_docs(td.doc_ids, columns=["doc_id", "doc_id_orig"])
    m = dict(zip(t.column("doc_id").to_pylist(),
                 t.column("doc_id_orig").to_pylist()))
    return pa.table(
        {
            "doc_id": pa.array([int(m[int(g)]) for g in td.doc_ids], pa.int64()),
            "rank": pa.array(np.arange(1, len(td.doc_ids) + 1), pa.int64()),
            "score": pa.array(td.scores, pa.float32()),
        }
    )


ANALYSIS_FILTERS = (("porter_stem",), ("synonyms", {"slow": ["fast"]}))


def documents_analysis_index(sf_dir: str) -> IndexReader:
    """Build-or-open a documents index with an analysis CHAIN
    (IndexConfig.token_filters): Porter stemming then index-time synonym
    injection (occurrences of 'slow' also indexed as 'fast' at the same
    position) — the analysis-common zoo seam exercised end-to-end
    (PorterStemFilter.java, SynonymGraphFilter.java)."""
    src = os.path.join(sf_dir, "documents.parquet")
    key = hashlib.md5(f"{src}:{os.path.getmtime(src)}:ana-v1".encode()).hexdigest()[:16]
    index_dir = os.path.join(CACHE_ROOT, f"documents-ana-{key}")
    if index_dir not in _readers:
        cfg = IndexConfig(
            content_col="text",
            id_cols=("doc_id", "lang", "source"),
            target_rows_per_partition=20_000,
            partitions_per_segment=4,
            hot_df_threshold=500_000,
            token_filters=ANALYSIS_FILTERS,
        )
        manifest = build_index(src, index_dir, cfg, resume=True)
        assert manifest.postings_done
        _readers[index_dir] = IndexReader(index_dir)
    return _readers[index_dir]


def analyzed_hits(sf_dir: str, query_text: str) -> pa.Table:
    """Hit set over the analysis-chain index, with the QUERY analyzed by the
    SAME chain (QueryBuilder semantics: one analyzer both sides)."""
    from lucene_ray.analysis.filters import AnalyzerChain
    from lucene_ray.search.query import parse_query

    reader = documents_analysis_index(sf_dir)
    q = parse_query(query_text, analyzer=AnalyzerChain(ANALYSIS_FILTERS))
    return _orig_ids(sf_dir, _all_matches(sf_dir, q, reader), reader)


def documents_lang_index(sf_dir: str, lang: str = "en") -> IndexReader:
    """Build-or-open a documents index analyzed with a LANGUAGE PACK
    (analysis/lang.py): stopword removal + the pack's light stemmer — the
    per-language *Analyzer shape from Lucene's analysis-common zoo
    (e.g. EnglishAnalyzer/FrenchLightStemFilter chains)."""
    from lucene_ray.analysis.lang import language_pack

    pack = language_pack(lang)
    src = os.path.join(sf_dir, "documents.parquet")
    key = hashlib.md5(
        f"{src}:{os.path.getmtime(src)}:lang-{lang}-v1".encode()
    ).hexdigest()[:16]
    index_dir = os.path.join(CACHE_ROOT, f"documents-lang-{lang}-{key}")
    if index_dir not in _readers:
        cfg = IndexConfig(
            content_col="text",
            id_cols=("doc_id", "lang", "source"),
            target_rows_per_partition=20_000,
            partitions_per_segment=4,
            hot_df_threshold=500_000,
            stopwords=tuple(sorted(pack["stopwords"])),
            token_filters=pack["filter_specs"],
        )
        manifest = build_index(src, index_dir, cfg, resume=True)
        assert manifest.postings_done
        _readers[index_dir] = IndexReader(index_dir)
    return _readers[index_dir]


def lang_pack_hits(sf_dir: str, query_text: str, lang: str = "en") -> pa.Table:
    """Hit set over a language-pack index with the query analyzed by the
    SAME pack (stop + stem both sides): 'customers' and 'customer' conflate
    to one postings list."""
    from lucene_ray.analysis.lang import analyzer_for
    from lucene_ray.search.query import parse_query

    reader = documents_lang_index(sf_dir, lang)
    q = parse_query(query_text, analyzer=analyzer_for(lang))
    return _orig_ids(sf_dir, _all_matches(sf_dir, q, reader), reader)


AUTOCOMPLETE_FILTERS = (("edge_ngram", {"min": 2, "max": 6}),)


def documents_autocomplete_index(sf_dir: str) -> IndexReader:
    """Build-or-open a documents index with index-time edge n-grams
    (EdgeNGramTokenFilter.java): every token also indexed under its 2..6-char
    prefixes at the same position, so a typed prefix is a plain TermQuery —
    the search-as-you-type trade (bigger index, O(1) prefix lookup, no
    dictionary expansion per keystroke)."""
    src = os.path.join(sf_dir, "documents.parquet")
    key = hashlib.md5(f"{src}:{os.path.getmtime(src)}:ac-v1".encode()).hexdigest()[:16]
    index_dir = os.path.join(CACHE_ROOT, f"documents-ac-{key}")
    if index_dir not in _readers:
        cfg = IndexConfig(
            content_col="text",
            id_cols=("doc_id", "lang", "source"),
            target_rows_per_partition=20_000,
            partitions_per_segment=4,
            hot_df_threshold=500_000,
            token_filters=AUTOCOMPLETE_FILTERS,
        )
        manifest = build_index(src, index_dir, cfg, resume=True)
        assert manifest.postings_done
        _readers[index_dir] = IndexReader(index_dir)
    return _readers[index_dir]


def autocomplete_hits(sf_dir: str, prefix: str) -> pa.Table:
    """Docs matching a typed prefix via the edge-ngram index: one TermQuery,
    no multi-term expansion. Equivalent to a PrefixQuery hit set whenever
    min_gram <= len(prefix) <= max_gram."""
    from lucene_ray.search.query import TermQuery

    reader = documents_autocomplete_index(sf_dir)
    q = TermQuery(prefix)
    return _orig_ids(sf_dir, _all_matches(sf_dir, q, reader), reader)


def documents_index_deleted(sf_dir: str) -> IndexReader:
    """Build-or-open a copy of the documents index with every doc whose
    doc_id is divisible by 7 tombstoned (delete_by_term) — the live-docs
    test surface for the driver contract."""
    import pyarrow.parquet as pq

    from lucene_ray.index.build import delete_by_term

    src = os.path.join(sf_dir, "documents.parquet")
    key = hashlib.md5(f"{src}:{os.path.getmtime(src)}:del-v1".encode()).hexdigest()[:16]
    index_dir = os.path.join(CACHE_ROOT, f"documents-del-{key}")
    if index_dir not in _readers:
        cfg = IndexConfig(
            content_col="text",
            id_cols=("doc_id", "lang", "source"),
            target_rows_per_partition=20_000,
            partitions_per_segment=4,
            hot_df_threshold=500_000,
        )
        manifest = build_index(src, index_dir, cfg, resume=True)
        if not manifest.tombstones:
            ids = pq.read_table(src, columns=["doc_id"]).column("doc_id").to_pylist()
            delete_by_term(index_dir, "doc_id", [i for i in ids if i % 7 == 0])
        _readers[index_dir] = IndexReader(index_dir)
    return _readers[index_dir]


def documents_index_dv_updated(sf_dir: str) -> IndexReader:
    """Build-or-open a copy of the documents index where every doc with
    lang='fr' has had its n_chars doc-value set to 0 via
    update_numeric_docvalue — the updateNumericDocValue test surface."""
    import pyarrow.parquet as pq

    from lucene_ray.index.build import update_numeric_docvalue

    src = os.path.join(sf_dir, "documents.parquet")
    key = hashlib.md5(f"{src}:{os.path.getmtime(src)}:dvu-v1".encode()).hexdigest()[:16]
    index_dir = os.path.join(CACHE_ROOT, f"documents-dvu-{key}")
    if index_dir not in _readers:
        cfg = IndexConfig(
            content_col="text",
            id_cols=("doc_id", "lang", "source", "n_chars"),
            target_rows_per_partition=20_000,
            partitions_per_segment=4,
            hot_df_threshold=500_000,
        )
        manifest = build_index(src, index_dir, cfg, resume=True)
        if not manifest.dv_updates:
            update_numeric_docvalue(index_dir, "lang", ["fr"], "n_chars", 0)
        _readers[index_dir] = IndexReader(index_dir)
    return _readers[index_dir]


def numeric_range_after_dv_update(sf_dir: str, lower: int, upper: int) -> pa.Table:
    """NumericRangeQuery over n_chars AFTER a doc-values update zeroed it
    for lang='fr' docs — exercises the update overlay and the zone-map
    bypass (stale row-group stats must not prune updated rows)."""
    from lucene_ray.search.query import NumericRangeQuery

    reader = documents_index_dv_updated(sf_dir)
    q = NumericRangeQuery("n_chars", lower, upper)
    gids = _all_matches(sf_dir, q, reader)
    return _orig_ids(sf_dir, gids, reader)


def _searcher(sf_dir: str) -> Searcher:
    return Searcher(documents_index(sf_dir))


_pools: dict[str, "object"] = {}


def _pool(reader: IndexReader):
    """One long-lived QueryShardActor pool per index dir — the distributed
    serving path every contract query runs through."""
    from lucene_ray.pipelines.bulk_search import ShardPool

    if reader.index_dir not in _pools:
        _pools[reader.index_dir] = ShardPool(reader.index_dir, concurrency=4)
    return _pools[reader.index_dir]


def _all_matches(sf_dir: str, q: Query, reader: IndexReader | None = None) -> np.ndarray:
    """Global doc ids of ALL matching docs (exhaustive evaluation), computed
    on the actor-pool serving path (not the driver)."""
    reader = reader if reader is not None else documents_index(sf_dir)
    return _pool(reader).match([(0, q)])[0]


def _orig_ids(sf_dir: str, gids: np.ndarray, reader: IndexReader | None = None) -> pa.Table:
    """Map engine doc ids back to the table's own doc_id column, sorted."""
    reader = reader if reader is not None else documents_index(sf_dir)
    if len(gids) == 0:
        return pa.table({"doc_id": pa.array([], pa.int64())})
    t = reader.lookup_docs(gids, columns=["doc_id", "doc_id_orig"])
    ids = sorted(t.column("doc_id_orig").to_pylist())
    return pa.table({"doc_id": pa.array(ids, pa.int64())})


def term_hits(sf_dir: str, term: str) -> pa.Table:
    from lucene_ray.search.query import TermQuery

    return _orig_ids(sf_dir, _all_matches(sf_dir, TermQuery(term)))


def function_score_topk(sf_dir: str, term: str, source: str,
                        k: int = 10) -> pa.Table:
    """Top-k under a FunctionScoreQuery (queries/function/
    FunctionScoreQuery.java:47): hit set of ``term``, scores REPLACED by the
    expression (``_score`` binds the term's BM25 score). Single-phase —
    unlike the two-pass ``expression_rescore`` window, every hit is scored
    by the formula. Returns (doc_id, rank, score)."""
    from lucene_ray.search.query import FunctionScoreQuery, TermQuery

    return _scored_topk(sf_dir, FunctionScoreQuery(TermQuery(term), source), k)


def covering_hits(sf_dir: str, terms: list[str], min_match: str) -> pa.Table:
    """Hit set of a CoveringQuery (sandbox/search/CoveringQuery.java): docs
    matching at least ``min_match(doc)`` of the term clauses, where
    ``min_match`` is a formula over numeric doc-values columns."""
    from lucene_ray.search.query import CoveringQuery, TermQuery

    q = CoveringQuery(tuple(TermQuery(t) for t in terms), min_match)
    return _orig_ids(sf_dir, _all_matches(sf_dir, q))


def term_hits_after_delete(sf_dir: str, term: str) -> pa.Table:
    """Term hit set over the tombstoned index: deleted docs (doc_id % 7 == 0)
    must be excluded by the live-docs mask."""
    from lucene_ray.search.query import TermQuery

    reader = documents_index_deleted(sf_dir)
    return _orig_ids(sf_dir, _all_matches(sf_dir, TermQuery(term), reader), reader)


def bool_hits(sf_dir: str, must=(), should=(), must_not=(),
              minimum_should_match: int = 0) -> pa.Table:
    from lucene_ray.search.query import BooleanQuery, TermQuery

    q = BooleanQuery(
        must=[TermQuery(t) for t in must],
        should=[TermQuery(t) for t in should],
        must_not=[TermQuery(t) for t in must_not],
        minimum_should_match=minimum_should_match,
    )
    return _orig_ids(sf_dir, _all_matches(sf_dir, q))


def regexp_hits(sf_dir: str, pattern: str) -> pa.Table:
    from lucene_ray.search.query import RegexpQuery

    return _orig_ids(sf_dir, _all_matches(sf_dir, RegexpQuery(pattern)))


def suggest_terms(sf_dir: str, prefix: str, k: int = 10) -> pa.Table:
    """Top-k completion suggestions for a prefix, ranked by doc_freq desc
    then term asc — the suggest-module shape (a weighted prefix lookup over
    the term dictionary, lucene/suggest/.../analyzing/AnalyzingSuggester.java)
    served from the sorted term_stats table with range pruning."""
    import pyarrow.dataset as pads

    reader = documents_index(sf_dir)
    tbl = reader._term_stats_ds.to_table(
        columns=["term", "doc_freq"],
        filter=(pads.field("term") >= prefix) & (pads.field("term") < prefix + "￿"),
    )
    df = tbl.to_pandas()
    df = df[df["term"].str.startswith(prefix) & ~df["term"].str.contains(":")]
    df["doc_freq"] = df["doc_freq"].astype("int64")
    df = df.sort_values(["doc_freq", "term"], ascending=[False, True]).head(k)
    return pa.Table.from_pandas(df.reset_index(drop=True), preserve_index=False)


def mlt_hits(sf_dir: str, doc_id: int = 7, max_terms: int = 5,
             min_tf: int = 2, min_df: int = 5) -> pa.Table:
    """MoreLikeThis standalone query (lucene/queries/src/java/org/apache/
    lucene/queries/mlt/MoreLikeThis.java:70: "Generate a more-like-this
    query"): analyze the source doc, keep terms with tf >= minTermFreq and
    df >= minDocFreq, rank by tf * idf with TFIDFSimilarity's idf
    (log(numDocs / (df + 1)) + 1, MoreLikeThis.createQueue), take
    maxQueryTerms, OR them, return the hit set. Term selection reads ONE
    bucket-pruned term_stats lookup; float64 idf replayed exactly in SQL."""
    import math

    import pyarrow.compute as pc_
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq_

    from lucene_ray.analysis.tokenizer import CodeTokenizer
    from lucene_ray.search.query import BooleanQuery, TermQuery

    reader = documents_index(sf_dir)
    src = pads.dataset(os.path.join(sf_dir, "documents.parquet")).to_table(
        columns=["doc_id", "text"], filter=pads.field("doc_id") == doc_id)
    text = src.column("text")[0].as_py()
    toks = CodeTokenizer()(text)
    tf: dict[str, int] = {}
    for t in toks:
        tf[t] = tf.get(t, 0) + 1
    cand = sorted(t for t, c in tf.items() if c >= min_tf)
    stats = reader.term_stats(cand)
    n_docs = reader.manifest.stats["doc_count"]
    scored = []
    for t in cand:
        ts = stats.get(t)
        if ts is None or ts.doc_freq < min_df:
            continue
        idf = math.log(n_docs / (ts.doc_freq + 1.0)) + 1.0
        scored.append((-(tf[t] * idf), t))
    scored.sort()
    sel = [t for _, t in scored[:max_terms]]
    if not sel:
        return pa.table({"doc_id": pa.array([], pa.int64())})
    q = BooleanQuery(should=tuple(TermQuery(t) for t in sel))
    t = _orig_ids(sf_dir, _all_matches(sf_dir, q, reader), reader)
    return t.sort_by("doc_id")


def suggest_infix(sf_dir: str, needle: str, k: int = 10) -> pa.Table:
    """AnalyzingInfixSuggester analog (lucene/suggest/src/java/org/apache/
    lucene/search/suggest/analyzing/AnalyzingInfixSuggester.java:72: match
    anywhere inside the suggestion, not just at its start): terms whose
    text CONTAINS the needle, ranked weight (doc_freq) desc then term asc.
    One Arrow match_substring over the term dictionary — no range pruning
    possible for infix (the Java pays the same price via n-grams)."""
    import pyarrow.compute as pc

    reader = documents_index(sf_dir)
    tbl = reader._term_stats_ds.to_table(columns=["term", "doc_freq"])
    terms = tbl.column("term")
    mask = pc.and_(pc.match_substring(terms, pattern=needle),
                   pc.invert(pc.match_substring(terms, pattern=":")))
    hits = tbl.filter(mask)
    df = hits.to_pandas()
    df["doc_freq"] = df["doc_freq"].astype("int64")
    df = df.sort_values(["doc_freq", "term"], ascending=[False, True]).head(k)
    return pa.Table.from_pandas(df.reset_index(drop=True),
                                preserve_index=False)


_freetext_lms: dict[tuple, tuple] = {}


def _freetext_lm(sf_dir: str):
    """Token n-gram language model over ``documents.text`` — the model
    FreeTextSuggester builds (lucene/suggest/src/java/org/apache/lucene/
    search/suggest/analyzing/FreeTextSuggester.java:92: analyzed token
    shingles -> weighted FST). Ray shape: one map_batches pass emits
    per-batch partial (gram, order, cnt) counts — bigrams formed by a
    vectorized adjacency zip on (doc_idx, position) — then ONE small
    groupby-sum shuffle over the vocab-sized gram table (the corpus is
    never re-shuffled). The aggregated model is the FST analog and is
    cached per (sf_dir, source mtime) so an in-place parquet regeneration
    invalidates the model."""
    key = (sf_dir,
           os.path.getmtime(os.path.join(sf_dir, "documents.parquet")))
    if key in _freetext_lms:
        return _freetext_lms[key]
    import pyarrow.compute as pc

    import ray.data

    from lucene_ray.index.invert import tokenize_column

    def partial(batch: pa.Table) -> pa.Table:
        toks, doc_idx, pos = tokenize_column(batch.column("text"))
        if len(toks) == 0:
            return pa.table({"gram": pa.array([], pa.string()),
                             "order_n": pa.array([], pa.int8()),
                             "cnt": pa.array([], pa.int64())})
        uni = pa.table({"gram": toks}).group_by("gram").aggregate(
            [("gram", "count")])
        di = np.asarray(doc_idx)
        ps = np.asarray(pos)
        adj = (di[1:] == di[:-1]) & (ps[1:] == ps[:-1] + 1)
        left = toks.slice(0, len(toks) - 1)
        right = toks.slice(1)
        grams = pc.binary_join_element_wise(left, right, " ")
        bi_tbl = pa.table({"gram": grams.filter(pa.array(adj))})
        bi = bi_tbl.group_by("gram").aggregate([("gram", "count")])
        return pa.table({
            "gram": pa.concat_arrays(
                [uni.column("gram").combine_chunks(),
                 bi.column("gram").combine_chunks()]),
            "order_n": pa.array(np.r_[np.ones(len(uni), np.int8),
                                      np.full(len(bi), 2, np.int8)]),
            "cnt": pa.concat_arrays(
                [pc.cast(uni.column("gram_count"), pa.int64()).combine_chunks(),
                 pc.cast(bi.column("gram_count"), pa.int64()).combine_chunks()]),
        })

    from ray.data.aggregate import Sum

    agg = (ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                                 columns=["text"])
           .map_batches(partial, batch_format="pyarrow")
           .groupby(["gram", "order_n"])
           .aggregate(Sum("cnt", alias_name="cnt"))
           .to_pandas())
    uni_df = agg[agg["order_n"] == 1]
    bi_df = agg[agg["order_n"] == 2]
    uni = dict(zip(uni_df["gram"], uni_df["cnt"].astype(np.int64)))
    bi = dict(zip(bi_df["gram"], bi_df["cnt"].astype(np.int64)))
    total = int(uni_df["cnt"].sum())
    _freetext_lms[key] = (uni, bi, total)
    return _freetext_lms[key]


FREETEXT_ALPHA = 0.4  # stupid-backoff discount (Brants et al. 2007), the
# same constant FreeTextSuggester.ALPHA ships


def freetext_suggest(sf_dir: str, context: str = "hash",
                     prefix: str = "s", k: int = 10) -> pa.Table:
    """Search-as-you-type continuation after any prefix — the
    FreeTextSuggester lookup: candidates are dictionary terms starting
    with ``prefix``; each scores count(context cand)/count(context) from
    the bigram model when the context bigram exists, else backs off to
    ALPHA * (count(cand)/total_tokens) (stupid backoff). Returns
    (term, score_r9) ranked score desc, term asc."""
    uni, bi, total = _freetext_lm(sf_dir)
    ctx_cnt = uni.get(context, 0)
    rows = []
    for w, cw in uni.items():
        if not w.startswith(prefix):
            continue
        cb = bi.get(f"{context} {w}", 0)
        if cb > 0 and ctx_cnt > 0:
            s = np.float64(cb) / np.float64(ctx_cnt)
        else:
            s = FREETEXT_ALPHA * (np.float64(cw) / np.float64(total))
        rows.append((w, float(s)))
    import pyarrow.compute as pc

    rows.sort(key=lambda r: (-r[1], r[0]))
    rows = rows[:k]
    score = pc.round(pa.array([r[1] for r in rows], pa.float64()),
                     ndigits=9, round_mode="half_towards_infinity")
    return pa.table({
        "term": pa.array([r[0] for r in rows], pa.string()),
        "score_r9": score,
    })


def suggest_terms_in_context(sf_dir: str, prefix: str,
                             context_col: str = "lang",
                             context_val: str = "fr", k: int = 10,
                             max_candidates: int = 50) -> pa.Table:
    """Context-filtered completions — the ContextSuggestField surface
    (lucene/suggest/src/java/org/apache/lucene/search/suggest/document/
    ContextSuggestField.java): suggestions ranked by how often the term
    occurs in docs MATCHING the context (a keyword field), not globally.
    Candidates come from the range-pruned dictionary scan; their in-context
    doc counts are exact hit totals computed per segment in the shard
    actors (one count row per (segment, candidate) — never a hit set)."""
    from lucene_ray.search.query import BooleanQuery, TermQuery

    reader = documents_index(sf_dir)
    cands = suggest_terms(sf_dir, prefix, max_candidates).column("term").to_pylist()
    if not cands:
        return pa.table({"term": pa.array([], pa.string()),
                         "doc_freq": pa.array([], pa.int64())})
    ctx = TermQuery(f"{context_col}:{context_val}")
    queries = [
        (i, BooleanQuery(must=(TermQuery(t),), filter=(ctx,)))
        for i, t in enumerate(cands)
    ]
    tds = _pool(reader).search(queries, k=1, total_hits_threshold=None)
    rows = [(cands[i], tds[i].total_hits) for i, _ in enumerate(cands)
            if tds[i].total_hits > 0]
    rows.sort(key=lambda r: (-r[1], r[0]))
    rows = rows[:k]
    return pa.table({"term": pa.array([r[0] for r in rows], pa.string()),
                     "doc_freq": pa.array([r[1] for r in rows], pa.int64())})


def suggest_fuzzy(sf_dir: str, typed: str, k: int = 10,
                  max_edits: int = 1) -> pa.Table:
    """Fuzzy completion — the AnalyzingSuggester/FuzzySuggester shape
    (lucene/suggest/src/java/org/apache/lucene/search/suggest/analyzing/
    AnalyzingSuggester.java:100, FuzzySuggester.java): the typed text is
    ANALYZED first (code grammar, lowercase), candidates are dictionary
    terms whose first-|typed|-chars prefix is within ``max_edits`` edits of
    it, ranked by doc_freq desc then term asc. Lucene intersects a
    Levenshtein automaton with the suggest FST; here the banded
    edit-distance check scans the sorted term dictionary (documented
    divergence — same candidate set)."""
    from lucene_ray.analysis.tokenizer import CodeTokenizer
    from lucene_ray.index.reader import _levenshtein_within

    reader = documents_index(sf_dir)
    toks = CodeTokenizer()(typed)
    typed_t = toks[0] if toks else typed.lower()
    tbl = reader._term_stats_ds.to_table(columns=["term", "doc_freq"])
    df = tbl.to_pandas()
    df = df[~df["term"].str.contains(":")]
    L = len(typed_t)
    keep = np.fromiter(
        (_levenshtein_within(typed_t, t[:L], max_edits) for t in df["term"]),
        dtype=bool, count=len(df),
    )
    df = df[keep]
    df["doc_freq"] = df["doc_freq"].astype("int64")
    df = df.sort_values(["doc_freq", "term"], ascending=[False, True]).head(k)
    return pa.Table.from_pandas(df.reset_index(drop=True), preserve_index=False)




def phrase_hits(sf_dir: str, terms: list[str], slop: int = 0) -> pa.Table:
    from lucene_ray.search.query import PhraseQuery

    return _orig_ids(sf_dir, _all_matches(sf_dir, PhraseQuery(terms, slop=slop)))


def prefix_hits(sf_dir: str, prefix: str) -> pa.Table:
    from lucene_ray.search.query import PrefixQuery

    return _orig_ids(sf_dir, _all_matches(sf_dir, PrefixQuery(prefix)))


def wildcard_hits(sf_dir: str, pattern: str) -> pa.Table:
    from lucene_ray.search.query import WildcardQuery

    return _orig_ids(sf_dir, _all_matches(sf_dir, WildcardQuery(pattern)))


def fuzzy_hits(sf_dir: str, term: str, max_edits: int = 1) -> pa.Table:
    from lucene_ray.search.query import FuzzyQuery

    return _orig_ids(sf_dir, _all_matches(sf_dir, FuzzyQuery(term, max_edits)))


def range_hits(sf_dir: str, lower: str, upper: str) -> pa.Table:
    from lucene_ray.search.query import TermRangeQuery

    return _orig_ids(sf_dir, _all_matches(sf_dir, TermRangeQuery(lower, upper)))


def term_freqs(sf_dir: str, term: str) -> pa.Table:
    """(doc_id, tf) for every doc containing the term."""
    return _term_freqs_on(documents_index(sf_dir), term)


def _term_freqs_on(reader: IndexReader, term: str) -> pa.Table:
    rows_doc, rows_tf = [], []
    from lucene_ray.search.executor import SegmentContext

    for seg in reader.segs:
        tbl = reader.postings(seg, [term])
        ctx = SegmentContext.from_chunk_table(
            tbl, reader.num_docs(seg), reader.norms(seg), reader.global_doc_ids(seg)
        )
        tp = ctx.postings(term)
        if tp is None:
            continue
        gids = ctx.global_ids[tp.docs]
        orig = reader.lookup_docs(gids, columns=["doc_id", "doc_id_orig"])
        m = dict(zip(orig.column("doc_id").to_pylist(), orig.column("doc_id_orig").to_pylist()))
        rows_doc.extend(int(m[int(g)]) for g in gids)
        rows_tf.extend(int(f) for f in tp.freqs)
    order = np.argsort(np.asarray(rows_doc, dtype=np.int64), kind="stable")
    return pa.table(
        {
            "doc_id": pa.array(np.asarray(rows_doc, dtype=np.int64)[order], pa.int64()),
            "tf": pa.array(np.asarray(rows_tf, dtype=np.int64)[order], pa.int64()),
        }
    )


def spell_correct(sf_dir: str, term: str, max_edits: int = 2,
                  k: int = 5) -> pa.Table:
    """Did-you-mean corrections — the DirectSpellChecker analog
    (lucene/suggest/src/java/org/apache/lucene/search/spell/
    DirectSpellChecker.java:53): dictionary terms within ``max_edits``
    full-term Levenshtein edits of the ANALYZED input (the input term
    itself excluded, as the checker never suggests the query), ranked by
    edit distance asc, then doc_freq desc, then term asc — the checker's
    similarity-then-popularity comparator at unit edit costs. Exactly
    SQL-checkable via DuckDB's levenshtein(). Scans the (small,
    pre-aggregated) term dictionary like every other dictionary op — the
    postings themselves are never touched; candidates are length-
    prefiltered (|len(t)-len(q)| <= max_edits) before the banded
    early-exit distance check."""
    from lucene_ray.analysis.tokenizer import CodeTokenizer
    from lucene_ray.index.reader import _levenshtein_within

    reader = documents_index(sf_dir)
    toks = CodeTokenizer()(term)
    typed = toks[0] if toks else term.lower()
    tbl = reader._term_stats_ds.to_table(columns=["term", "doc_freq"])
    df = tbl.to_pandas()
    df = df[~df["term"].str.contains(":") & (df["term"] != typed)]
    lens = df["term"].str.len().to_numpy()
    df = df[abs(lens - len(typed)) <= max_edits]
    dists, keep = [], []
    for t in df["term"]:
        for d in range(1, max_edits + 1):
            if _levenshtein_within(typed, t, d):
                keep.append(True)
                dists.append(d)
                break
        else:
            keep.append(False)
    df = df[np.asarray(keep, dtype=bool)]
    df["dist"] = np.asarray(dists, dtype=np.int64)
    df["doc_freq"] = df["doc_freq"].astype("int64")
    df = df.sort_values(["dist", "doc_freq", "term"],
                        ascending=[True, False, True]).head(k)
    return pa.Table.from_pandas(
        df[["term", "dist", "doc_freq"]].reset_index(drop=True),
        preserve_index=False,
    )


_SIMS = {
    "dfr_inb2": lambda: __import__(
        "lucene_ray.search.similarity", fromlist=["DFRSimilarity"]
    ).DFRSimilarity(),
    "axiomatic_f2exp": lambda: __import__(
        "lucene_ray.search.similarity", fromlist=["AxiomaticF2EXPSimilarity"]
    ).AxiomaticF2EXPSimilarity(),
    "dfi_chi2": lambda: __import__(
        "lucene_ray.search.similarity", fromlist=["DFISimilarity"]
    ).DFISimilarity(),
    "ib_ll_df_h1": lambda: __import__(
        "lucene_ray.search.similarity", fromlist=["IBSimilarity"]
    ).IBSimilarity(),
    "raw_tf": lambda: __import__(
        "lucene_ray.search.similarity", fromlist=["RawTFSimilarity"]
    ).RawTFSimilarity(),
}


def _sim_mod():
    import lucene_ray.search.similarity as m
    return m


# round-5 grid: DFR basic-model x after-effect x normalization, IB
# SPL/TTF, the remaining Axiomatic variants, IndriDirichlet (see
# similarity.py for the reference file:line cites)
_SIMS.update({
    "dfr_g_l_h1": lambda: _sim_mod().DFRGridSimilarity("g", "l", "h1"),
    "dfr_ine_b_h2": lambda: _sim_mod().DFRGridSimilarity("ine", "b", "h2"),
    "dfr_if_b_z": lambda: _sim_mod().DFRGridSimilarity("if", "b", "z",
                                                       c=0.3),
    "dfr_in_l_h3": lambda: _sim_mod().DFRGridSimilarity("in", "l", "h3",
                                                        c=800.0),
    "ib_spl_ttf_h2": lambda: _sim_mod().IBGridSimilarity("spl", "ttf", "h2"),
    "axiomatic_f1exp": lambda: _sim_mod().AxiomaticSimilarity("f1exp"),
    "axiomatic_f1log": lambda: _sim_mod().AxiomaticSimilarity("f1log"),
    "axiomatic_f2log": lambda: _sim_mod().AxiomaticSimilarity("f2log"),
    "axiomatic_f3exp": lambda: _sim_mod().AxiomaticSimilarity("f3exp"),
    "axiomatic_f3log": lambda: _sim_mod().AxiomaticSimilarity("f3log"),
    "indri_dirichlet": lambda: _sim_mod().IndriDirichletSimilarity(),
    # MultiSimilarity.java: a term's score is the SUM of the subs' scores
    # (float32 accumulation in sub order, oracle-replayable)
    "multi_rawtf_ib": lambda: _sim_mod().MultiSimilarity(
        [_sim_mod().RawTFSimilarity(), _sim_mod().IBSimilarity()]),
})


def similarity_topk(sf_dir: str, term: str, sim: str, k: int = 10) -> pa.Table:
    """Scored top-k under a non-default Similarity (DFR InB2 or Axiomatic
    F2EXP) served by the SAME actor pool: scorers are built driver-side
    (the Weight) and ship inside the plan, so per-segment scoring code is
    untouched — the Similarity seam end-to-end. Float32-exact SQL oracle
    (double math, byte4-lossy dl, final float cast)."""
    from lucene_ray.search.query import TermQuery
    from lucene_ray.search.searcher import Searcher

    reader = documents_index(sf_dir)
    planner = Searcher(reader, similarity=_SIMS[sim]())
    td = _pool(reader).search([(0, TermQuery(term))], k,
                              planner=planner)[0]
    if len(td.doc_ids) == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int64()),
                         "score": pa.array([], pa.float32())})
    t = reader.lookup_docs(td.doc_ids, columns=["doc_id", "doc_id_orig"])
    m = dict(zip(t.column("doc_id").to_pylist(),
                 t.column("doc_id_orig").to_pylist()))
    return pa.table({
        "doc_id": pa.array([int(m[int(g)]) for g in td.doc_ids], pa.int64()),
        "rank": pa.array(np.arange(1, len(td.doc_ids) + 1), pa.int64()),
        "score": pa.array(td.scores, pa.float32()),
    })


def perfield_sim_topk(sf_dir: str, term: str, k: int = 10) -> pa.Table:
    """Scored top-k of a SHOULD pair (content term, head-field term) under
    a PerFieldSimilarityWrapper: content scored BM25 against its own
    norms/avgdl, the head field scored RawTF — one query, two similarities
    (similarities/PerFieldSimilarityWrapper.java). Float32-exact SQL oracle
    (content BM25 CTE + head tf, per-doc sum)."""
    from lucene_ray.search.query import BooleanQuery, TermQuery
    from lucene_ray.search.searcher import Searcher
    from lucene_ray.search.similarity import (BM25Similarity,
                                              PerFieldSimilarity,
                                              RawTFSimilarity)

    reader = documents_multifield_index(sf_dir)
    sim = PerFieldSimilarity(BM25Similarity(),
                             {"head": RawTFSimilarity()})
    planner = Searcher(reader, similarity=sim)
    q = BooleanQuery(should=(TermQuery(term), TermQuery(f"head:{term}")))
    td = _pool(reader).search([(0, q)], k, planner=planner)[0]
    if len(td.doc_ids) == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int64()),
                         "score": pa.array([], pa.float32())})
    t = reader.lookup_docs(td.doc_ids, columns=["doc_id", "doc_id_orig"])
    m = dict(zip(t.column("doc_id").to_pylist(),
                 t.column("doc_id_orig").to_pylist()))
    return pa.table({
        "doc_id": pa.array([int(m[int(g)]) for g in td.doc_ids], pa.int64()),
        "rank": pa.array(np.arange(1, len(td.doc_ids) + 1), pa.int64()),
        "score": pa.array(td.scores, pa.float32()),
    })


def word_break_suggest(sf_dir: str, term: str, k: int = 5,
                       min_break_length: int = 2,
                       min_freq: int = 1) -> pa.Table:
    """WordBreakSpellChecker.suggestWordBreaks analog (lucene/suggest/src/
    java/org/apache/lucene/search/spell/WordBreakSpellChecker.java:92-139
    at maxChanges=1): split the analyzed term at every point where BOTH
    parts are dictionary words of >= ``min_break_length`` chars with
    doc_freq >= ``min_freq``; ranked by summed doc_freq desc then left part
    asc (the NUM_CHANGES_THEN_SUMMED_FREQUENCY comparator at one change).
    One bucket-pruned term_stats lookup for ALL candidate parts — postings
    never touched. Exactly SQL-checkable (substr enumeration + df table)."""
    from lucene_ray.analysis.tokenizer import CodeTokenizer

    reader = documents_index(sf_dir)
    toks = CodeTokenizer()(term)
    typed = toks[0] if toks else term.lower()
    cands = [
        (typed[:i], typed[i:])
        for i in range(min_break_length, len(typed) - min_break_length + 1)
    ]
    stats = reader.term_stats(sorted({w for p in cands for w in p}))
    rows = []
    for a, b in cands:
        da = stats.get(a)
        db = stats.get(b)
        if da and db and da.doc_freq >= min_freq and db.doc_freq >= min_freq:
            rows.append((a, b, int(da.doc_freq + db.doc_freq)))
    rows.sort(key=lambda r: (-r[2], r[0]))
    rows = rows[:k]
    return pa.table({
        "left_part": pa.array([r[0] for r in rows], pa.string()),
        "right_part": pa.array([r[1] for r in rows], pa.string()),
        "freq_sum": pa.array([r[2] for r in rows], pa.int64()),
    })


def word_combine_suggest(sf_dir: str, terms: list[str], k: int = 5,
                         min_freq: int = 1,
                         max_combine_length: int = 20) -> pa.Table:
    """WordBreakSpellChecker.suggestWordCombinations analog
    (WordBreakSpellChecker.java:141-189): join every run of 2+ ADJACENT
    input terms; a combination suggests when the joined word is in the
    dictionary with doc_freq >= ``min_freq`` and within
    ``max_combine_length`` chars. Ranked by doc_freq desc then start asc.
    Returns (start, length, combined, doc_freq)."""
    from lucene_ray.analysis.tokenizer import CodeTokenizer

    tk = CodeTokenizer()
    norm = [t for w in terms for t in tk(w)]
    cands = {}
    for i in range(len(norm)):
        for j in range(i + 2, len(norm) + 1):
            joined = "".join(norm[i:j])
            if len(joined) <= max_combine_length:
                cands[(i, j - i)] = joined
    stats = documents_index(sf_dir).term_stats(sorted(set(cands.values())))
    rows = []
    for (i, ln), joined in cands.items():
        st = stats.get(joined)
        if st and st.doc_freq >= min_freq:
            rows.append((i, ln, joined, int(st.doc_freq)))
    rows.sort(key=lambda r: (-r[3], r[0]))
    rows = rows[:k]
    return pa.table({
        "start": pa.array([r[0] for r in rows], pa.int64()),
        "length": pa.array([r[1] for r in rows], pa.int64()),
        "combined": pa.array([r[2] for r in rows], pa.string()),
        "doc_freq": pa.array([r[3] for r in rows], pa.int64()),
    })


def _map_orig_ids(reader: IndexReader, gids: np.ndarray) -> np.ndarray:
    """Vectorized gid -> source doc_id mapping (sorted searchsorted join,
    no per-hit Python dict)."""
    t = reader.lookup_docs(gids, columns=["doc_id", "doc_id_orig"])
    ids = np.asarray(t.column("doc_id"), dtype=np.uint64)
    orig = np.asarray(t.column("doc_id_orig"), dtype=np.int64)
    o = np.argsort(ids)
    return orig[o][np.searchsorted(ids[o], gids)]


def _snippet_segment(term: str):
    """Per-segment first-occurrence offset kernel for ShardPool.map_segments
    — decode AND gid->source-id mapping run inside the warm serving actor,
    so the driver only gathers the final rows (no per-call actor pool;
    round-3 cold-start fix)."""

    def kernel(reader, seg):
        from lucene_ray.codec.postings import (decode_docs, decode_freqs,
                                               decode_offsets)

        doc_parts, s_parts, e_parts = [], [], []
        tbl = reader.postings(seg, [term])
        if tbl is not None and len(tbl):
            gids = reader.global_doc_ids(seg)
            live = reader.live_mask(seg)
            for row in tbl.to_pylist():
                d = decode_docs(row["docs_enc"], row["count"]).astype(np.int64)
                f = decode_freqs(row["freqs_enc"], row["count"]).astype(np.int64)
                s, e = decode_offsets(row["off_enc"], f)
                first = np.cumsum(f) - f  # first-occurrence index per doc
                if live is not None:
                    keep = live[d]
                    d, first = d[keep], first[keep]
                if len(d) == 0:
                    continue
                doc_parts.append(_map_orig_ids(reader, gids[d]))
                s_parts.append(s[first].astype(np.int64))
                e_parts.append(e[first].astype(np.int64))
        if not doc_parts:
            return (np.zeros(0, np.int64),) * 3
        return (np.concatenate(doc_parts), np.concatenate(s_parts),
                np.concatenate(e_parts))

    return kernel


def snippet_first_occurrence(sf_dir: str, term: str) -> pa.Table:
    """(doc_id, start_offset, end_offset) of the FIRST occurrence of a term
    per matching doc — the offsets-consuming highlight primitive (offsets
    read straight from the off_enc postings stream; char offsets into the
    lowercased text). Distributed: runs on the SHARED warm QueryShardActor
    pool (`_pool`) via map_segments — no per-call actor pool, no cold
    start; the driver only sorts the gathered rows."""
    reader = documents_index(sf_dir)
    parts = _pool(reader).map_segments(_snippet_segment(term))
    docs = np.concatenate([p[0] for p in parts]) if parts else \
        np.zeros(0, np.int64)
    starts = np.concatenate([p[1] for p in parts]) if parts else \
        np.zeros(0, np.int64)
    ends = np.concatenate([p[2] for p in parts]) if parts else \
        np.zeros(0, np.int64)
    order = np.argsort(docs, kind="stable")
    return pa.table(
        {
            "doc_id": pa.array(docs[order], pa.int64()),
            "start_offset": pa.array(starts[order], pa.int64()),
            "end_offset": pa.array(ends[order], pa.int64()),
        }
    )


def span_first_hits(sf_dir: str, term: str, end: int) -> pa.Table:
    """Docs where ``term`` occurs within the first ``end`` positions —
    SpanFirstQuery over a SpanTermQuery (SpanFirstQuery.java)."""
    from lucene_ray.search.query import SpanFirstQuery, SpanTermQuery

    q = SpanFirstQuery(SpanTermQuery(term), end)
    return _orig_ids(sf_dir, _all_matches(sf_dir, q))


def span_near_hits(sf_dir: str, terms: list[str], slop: int = 0,
                   in_order: bool = True) -> pa.Table:
    """Docs where the terms occur within slop — SpanNearQuery over
    SpanTermQuerys (NearSpansOrdered.java / NearSpansUnordered.java)."""
    from lucene_ray.search.query import SpanNearQuery, SpanTermQuery

    q = SpanNearQuery([SpanTermQuery(t) for t in terms], slop=slop,
                      in_order=in_order)
    return _orig_ids(sf_dir, _all_matches(sf_dir, q))


def span_not_hits(sf_dir: str, include: str, follow: str) -> pa.Table:
    """Docs with an occurrence of ``include`` that is NOT part of the
    ordered bigram ``include follow`` — SpanNotQuery(include,
    SpanNear([include, follow], 0)) (SpanNotQuery.java)."""
    from lucene_ray.search.query import SpanNearQuery, SpanNotQuery, SpanTermQuery

    near = SpanNearQuery([SpanTermQuery(include), SpanTermQuery(follow)], slop=0)
    q = SpanNotQuery(SpanTermQuery(include), near)
    return _orig_ids(sf_dir, _all_matches(sf_dir, q))


def documents_taxonomy_index(sf_dir: str) -> IndexReader:
    """Build-or-open a documents index with a HIERARCHICAL taxonomy
    dimension (facet/taxonomy/TaxonomyReader.java:59 / FacetField):
    a deterministic, SQL-derivable path column
    ``cat = source/lang/(long|short by n_chars >= 300)`` is added in a
    map_batches stage, and ``IndexConfig.path_cols`` indexes every ancestor
    prefix as a keyword term — drill-down at any depth is one TermQuery."""
    import shutil

    import pyarrow.compute as pc
    import ray.data

    src = os.path.join(sf_dir, "documents.parquet")
    key = hashlib.md5(f"{src}:{os.path.getmtime(src)}:tax-v2".encode()).hexdigest()[:16]
    index_dir = os.path.join(CACHE_ROOT, f"documents-tax-{key}")
    if index_dir not in _readers:
        derived_dir = index_dir + "-src"
        if not os.path.isdir(derived_dir):
            def add_cat(batch: pa.Table) -> pa.Table:
                size = pc.if_else(
                    pc.greater_equal(batch.column("n_chars"), 300),
                    pa.scalar("long"), pa.scalar("short"),
                )
                cat = pc.binary_join_element_wise(
                    batch.column("source").cast(pa.string()),
                    batch.column("lang").cast(pa.string()),
                    size, "/",
                )
                return batch.append_column("cat", cat)

            tmp = derived_dir + ".tmp"
            shutil.rmtree(tmp, ignore_errors=True)
            ray.data.read_parquet(
                src, columns=["doc_id", "lang", "source", "n_chars", "text"]
            ).map_batches(
                add_cat, batch_format="pyarrow"
            ).write_parquet(tmp)
            os.replace(tmp, derived_dir)
        cfg = IndexConfig(
            content_col="text",
            id_cols=("doc_id", "cat"),
            target_rows_per_partition=20_000,
            partitions_per_segment=4,
            hot_df_threshold=500_000,
            path_cols=("cat",),
        )
        manifest = build_index(derived_dir, index_dir, cfg, resume=True)
        assert manifest.postings_done
        _readers[index_dir] = IndexReader(index_dir)
    return _readers[index_dir]


def facet_path_counts(sf_dir: str, term: str) -> pa.Table:
    """Taxonomy facet counts over a term's hit set at EVERY path level —
    the getTopChildren-at-each-ancestor shape (TaxonomyFacetCounts):
    (path, n_docs) rows for every ancestor prefix, sorted by path."""
    from collections import Counter

    from lucene_ray.search.query import TermQuery

    reader = documents_taxonomy_index(sf_dir)
    # leaf-label counts aggregate inside the actors; the driver only rolls
    # DISTINCT taxonomy labels up to their ancestors (taxonomy size, never
    # hit count — the TaxonomyFacetCounts rollup shape)
    agg = _pool(reader).facets([(0, TermQuery(term))], "cat")[0]
    counts: Counter = Counter()
    for label, (n, _s, _m) in agg.items():
        segs = label.split("/")
        for L in range(1, len(segs) + 1):
            counts["/".join(segs[:L])] += n
    paths = sorted(counts)
    return pa.table(
        {
            "path": pa.array(paths, pa.string()),
            "n_docs": pa.array([counts[p] for p in paths], pa.int64()),
        }
    )


def drilldown_path_hits(sf_dir: str, term: str, path: str) -> pa.Table:
    """Drill-down to a taxonomy subtree at ANY depth: the base TermQuery
    plus one scoreless keyword FILTER on the path prefix (DrillDownQuery
    with a hierarchical dim) — matches every doc whose path starts with
    ``path`` because ancestors are indexed as their own terms."""
    from lucene_ray.search.query import BooleanQuery, TermQuery

    reader = documents_taxonomy_index(sf_dir)
    q = BooleanQuery(must=[TermQuery(term)],
                     filter=[TermQuery(f"cat:{path}")])
    return _orig_ids(sf_dir, _all_matches(sf_dir, q, reader), reader)


def interval_ordered_hits(sf_dir: str, terms: list[str],
                          max_gaps: int = -1) -> pa.Table:
    """Docs with a minimal ordered interval over ``terms`` (total
    inter-term gap <= max_gaps when >= 0) — IntervalQuery over
    Intervals.ordered/maxgaps (intervals/IntervalQuery.java:59)."""
    from lucene_ray.search.query import IntervalQuery, IOrdered, ITerm

    q = IntervalQuery(IOrdered([ITerm(t) for t in terms], max_gaps=max_gaps))
    return _orig_ids(sf_dir, _all_matches(sf_dir, q))


def interval_unordered_hits(sf_dir: str, terms: list[str],
                            max_gaps: int = -1) -> pa.Table:
    """Docs with a minimal unordered window over ``terms`` whose gap count
    is <= max_gaps (Intervals.unordered + maxgaps)."""
    from lucene_ray.search.query import IntervalQuery, ITerm, IUnordered

    q = IntervalQuery(IUnordered([ITerm(t) for t in terms], max_gaps=max_gaps))
    return _orig_ids(sf_dir, _all_matches(sf_dir, q))


def interval_containing_hits(sf_dir: str, big: list[str], small: str,
                             max_gaps: int = -1) -> pa.Table:
    """Docs where some minimal ordered interval over ``big`` CONTAINS an
    occurrence of ``small`` (Intervals.containing)."""
    from lucene_ray.search.query import (
        IContaining,
        IntervalQuery,
        IOrdered,
        ITerm,
    )

    src = IContaining(IOrdered([ITerm(t) for t in big], max_gaps=max_gaps),
                      ITerm(small))
    return _orig_ids(sf_dir, _all_matches(sf_dir, IntervalQuery(src)))


def dismax_hits(sf_dir: str, terms: list[str], tie_breaker: float = 0.0) -> pa.Table:
    """Hit set of a DisjunctionMaxQuery over TermQuerys (= the union; the
    tie_breaker only affects scores)."""
    from lucene_ray.search.query import DisMaxQuery, TermQuery

    q = DisMaxQuery([TermQuery(t) for t in terms], tie_breaker)
    return _orig_ids(sf_dir, _all_matches(sf_dir, q))


def dismax_topk(sf_dir: str, terms: list[str], tie_breaker: float = 0.1,
                k: int = 10) -> pa.Table:
    """Scored DisMax top-k (rows-only contract surface: float32 max +
    tie_breaker arithmetic)."""
    from lucene_ray.search.query import DisMaxQuery, TermQuery

    reader = documents_index(sf_dir)
    q = DisMaxQuery([TermQuery(t) for t in terms], tie_breaker)
    td = _pool(reader).search([(0, q)], k)[0]
    if len(td.doc_ids) == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int64()),
                         "score": pa.array([], pa.float32())})
    t = reader.lookup_docs(td.doc_ids, columns=["doc_id", "doc_id_orig"])
    m = dict(zip(t.column("doc_id").to_pylist(), t.column("doc_id_orig").to_pylist()))
    return pa.table(
        {
            "doc_id": pa.array([int(m[int(g)]) for g in td.doc_ids], pa.int64()),
            "rank": pa.array(np.arange(1, len(td.doc_ids) + 1), pa.int64()),
            "score": pa.array(td.scores, pa.float32()),
        }
    )


def _topk_table(reader: IndexReader, td) -> pa.Table:
    """(doc_id_orig, rank, score) table from a TopDocs — shared result shape
    of the scored contract surfaces."""
    if len(td.doc_ids) == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int64()),
                         "score": pa.array([], pa.float32())})
    t = reader.lookup_docs(td.doc_ids, columns=["doc_id", "doc_id_orig"])
    m = dict(zip(t.column("doc_id").to_pylist(), t.column("doc_id_orig").to_pylist()))
    return pa.table(
        {
            "doc_id": pa.array([int(m[int(g)]) for g in td.doc_ids], pa.int64()),
            "rank": pa.array(np.arange(1, len(td.doc_ids) + 1), pa.int64()),
            "score": pa.array(td.scores, pa.float32()),
        }
    )


def synonym_hits(sf_dir: str, terms: list[str]) -> pa.Table:
    """SynonymQuery hit set (= union of the terms' doc sets)."""
    from lucene_ray.search.query import SynonymQuery

    return _orig_ids(sf_dir, _all_matches(sf_dir, SynonymQuery(terms)))


def synonym_topk(sf_dir: str, terms: list[str], k: int = 10) -> pa.Table:
    """Scored SynonymQuery top-k: similarity fires ONCE per doc with
    freq = sum of the per-term freqs, idf from max df / summed ttf
    (SynonymQuery.java:47-52, SynonymWeight :213-231). With unit boosts the
    freq sum is integral, so float32 scores are order-independent exact —
    fully SQL-checkable."""
    from lucene_ray.search.query import SynonymQuery

    reader = documents_index(sf_dir)
    td = _pool(reader).search([(0, SynonymQuery(terms))], k)[0]
    return _topk_table(reader, td)


def feature_bool_topk(sf_dir: str, term: str, col: str = "n_chars",
                      function: str = "log", weight: float = 0.5,
                      scaling: float = 1.0, k: int = 10) -> pa.Table:
    """BM25 term relevance + static-feature boost — the canonical
    FeatureField composition (FeatureField.java:66-100 'how it is typically
    used': a SHOULD clause adding w*ln(scaling + S) over a quality/length
    feature column to the text score)."""
    from lucene_ray.search.query import BooleanQuery, FeatureQuery, TermQuery

    q = BooleanQuery(should=(
        TermQuery(term),
        FeatureQuery(col, function=function, weight=weight, scaling=scaling),
    ))
    reader = documents_index(sf_dir)
    td = _pool(reader).search([(0, q)], k)[0]
    return _topk_table(reader, td)


def term_in_set_hits(sf_dir: str, terms: list[str]) -> pa.Table:
    """TermInSetQuery hit set — constant-score terms-dictionary set filter."""
    from lucene_ray.search.query import TermInSetQuery

    return _orig_ids(sf_dir, _all_matches(sf_dir, TermInSetQuery(terms)))


def complex_phrase_hits(sf_dir: str, content: str, slop: int = 0,
                        in_order: bool = True) -> pa.Table:
    """Hit set of a complex phrase — quoted phrase whose elements may be
    wildcards, fuzzy terms or (a b) alternative groups
    (ComplexPhraseQueryParser.java:61); rewritten to SpanNear over per-
    position span clauses with the dictionary expansions resolved live."""
    from lucene_ray.search.complex_phrase import complex_phrase_query

    reader = documents_index(sf_dir)
    q = complex_phrase_query(content, slop, in_order,
                             expand=reader.expand_multi_term)
    return _orig_ids(sf_dir, _all_matches(sf_dir, q, reader), reader)


def surround_hits(sf_dir: str, s: str) -> pa.Table:
    """Hit set of a surround-syntax query (queryparser/surround dialect:
    W/N distance operators, infix + prefix forms, truncation, booleans).
    Truncations expand against the live term dictionary."""
    from lucene_ray.search.surround_parser import parse_surround

    reader = documents_index(sf_dir)
    q = parse_surround(s, expand=reader.expand_multi_term)
    return _orig_ids(sf_dir, _all_matches(sf_dir, q, reader), reader)


def _common_terms_q(sf_dir: str, terms: list[str], max_term_frequency: float,
                    low_freq_occur: str, high_freq_occur: str):
    """Resolve df stats from the index and build the CommonTermsQuery
    rewrite (term classification happens against the LIVE collection stats,
    the point of the query vs static stopword lists)."""
    from lucene_ray.search.query import common_terms_query

    reader = documents_index(sf_dir)
    stats = reader.term_stats(sorted(set(terms)))
    dfs = {t: st.doc_freq for t, st in stats.items()}
    max_doc = reader.collection_stats().doc_count
    return common_terms_query(
        terms, dfs, max_doc, max_term_frequency,
        low_freq_occur=low_freq_occur, high_freq_occur=high_freq_occur,
    ), reader


def common_terms_hits(sf_dir: str, terms: list[str],
                      max_term_frequency: float = 0.5,
                      low_freq_occur: str = "SHOULD",
                      high_freq_occur: str = "SHOULD") -> pa.Table:
    """Exact hit set of a CommonTermsQuery: docs matched by the required
    low-frequency sub-clause (or by ALL terms when every term is common and
    the query degenerates to a conjunction)."""
    q, reader = _common_terms_q(sf_dir, terms, max_term_frequency,
                                low_freq_occur, high_freq_occur)
    return _orig_ids(sf_dir, _all_matches(sf_dir, q, reader), reader)


def common_terms_topk(sf_dir: str, terms: list[str],
                      max_term_frequency: float = 0.5, k: int = 10,
                      low_freq_occur: str = "SHOULD",
                      high_freq_occur: str = "SHOULD") -> pa.Table:
    """Scored CommonTermsQuery top-k: rare terms gate the hit set, common
    terms only add score. Float32-exact in SQL — the executor folds the
    low sub-clause then the high sub-clause onto the accumulator
    (executor._eval_bool clause order), each sub-clause itself a float32
    fold of its term scores."""
    q, reader = _common_terms_q(sf_dir, terms, max_term_frequency,
                                low_freq_occur, high_freq_occur)
    return _scored_topk(sf_dir, q, k)


def diversified_topk(sf_dir: str, query: str, key_col: str, k: int = 10,
                     max_per_key: int = 2) -> pa.Table:
    """Diversified BM25 top-k: no more than ``max_per_key`` results per
    ``key_col`` value (misc/search/DiversifiedTopDocsCollector.java — the
    'max 3 Beatles hits on the 1967 compilation' collector). Distributed as
    per-segment constrained top-k partials re-merged with the same kernel;
    float32-exact in SQL (per-key row_number + global row_number over the
    per-doc BM25 scores)."""
    from lucene_ray.search.query import parse_query

    reader = documents_index(sf_dir)
    q = parse_query(query)
    gids, scores, keys = _pool(reader).diversified(
        [(0, q)], key_col, k, max_per_key)[0]
    if len(gids) == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         key_col: pa.array([], pa.string()),
                         "rank": pa.array([], pa.int64()),
                         "score": pa.array([], pa.float32())})
    t = reader.lookup_docs(np.asarray(gids), columns=["doc_id", "doc_id_orig"])
    m = dict(zip(t.column("doc_id").to_pylist(), t.column("doc_id_orig").to_pylist()))
    return pa.table(
        {
            "doc_id": pa.array([int(m[int(g)]) for g in gids], pa.int64()),
            key_col: pa.array([str(x) for x in keys], pa.string()),
            "rank": pa.array(np.arange(1, len(gids) + 1), pa.int64()),
            "score": pa.array(scores, pa.float32()),
        }
    )


def simple_query_hits(sf_dir: str, s: str,
                      default_operator: str = "SHOULD") -> pa.Table:
    """Exact hit set of a SimpleQueryParser query (queryparser/simple/
    SimpleQueryParser.java) — the error-tolerant human syntax: + | -
    "phrase"~N prefix* term~N (...), unparseable input degrading, never
    raising."""
    from lucene_ray.search.simple_parser import simple_parse

    q = simple_parse(s, default_operator=default_operator)
    return _orig_ids(sf_dir, _all_matches(sf_dir, q))


def numeric_range_hits(sf_dir: str, col: str, lower, upper,
                       term: str | None = None) -> pa.Table:
    """Docs with ``lower <= col <= upper`` (NumericRangeQuery over the
    doc-values column), optionally intersected with a TermQuery as a
    BooleanQuery filter clause — the IntPoint.newRangeQuery + filter shape."""
    from lucene_ray.search.query import BooleanQuery, NumericRangeQuery, TermQuery

    nq = NumericRangeQuery(col, lower, upper)
    q = BooleanQuery(must=[TermQuery(term), nq]) if term else nq
    return _orig_ids(sf_dir, _all_matches(sf_dir, q))


def facet_numeric_ranges(sf_dir: str, term: str, col: str,
                         edges: list[int]) -> pa.Table:
    """Range facet counts over a query's hit set (LongRangeFacetCounts
    analog, facet/range/LongRangeFacetCounts.java): buckets are
    [edges[i], edges[i+1]) plus a final [edges[-1], inf) bucket; counts from
    the doc-values column of the matching docs."""
    from lucene_ray.search.query import TermQuery

    reader = documents_index(sf_dir)
    labels = [f"[{edges[i]},{edges[i + 1]})" for i in range(len(edges) - 1)]
    labels.append(f"[{edges[-1]},inf)")
    # binned per segment inside the actors (values below edges[0] uncounted,
    # as in Lucene); only (bin, count) partials reach the driver
    agg = _pool(reader).facets([(0, TermQuery(term))], col, edges=edges)[0]
    counts = np.zeros(len(labels), dtype=np.int64)
    for b, (n, _s, _m) in agg.items():
        counts[int(b)] += n
    return pa.table(
        {
            "range": pa.array(labels, pa.string()),
            "n_docs": pa.array(counts, pa.int64()),
        }
    )


def compute_dynamic_numeric_ranges(values, weights, top_n: int) -> list[dict]:
    """Exact port of DynamicRangeUtil.computeDynamicNumericRanges
    (lucene/facet/src/java/org/apache/lucene/facet/range/
    DynamicRangeUtil.java:204-266): sort items by (value, weight), then
    greedily emit a range whenever the accumulated weight reaches
    totalWeight / min(topN, len); the remainder becomes a final range.
    Returns [{count, weight, min, max, centroid}, ...]."""
    values = np.asarray(values, dtype=np.int64)
    weights = np.asarray(weights, dtype=np.int64)
    n = len(values)
    out: list[dict] = []
    if n == 0 or top_n == 0:
        return out
    order = np.lexsort((weights, values))
    v, w = values[order], weights[order]
    cw = np.cumsum(w)
    cv = np.cumsum(v)
    target = float(cw[-1]) / min(top_n, n)
    start = 0
    base_w = base_v = 0
    while start < n:
        i = int(np.searchsorted(cw, base_w + target, side="left"))
        i = min(max(i, start), n - 1)  # remainder range / zero-weight runs
        count = i - start + 1
        vsum = int(cv[i]) - base_v
        out.append({
            "count": count,
            "weight": int(cw[i]) - base_w,
            "min": int(v[start]),
            "max": int(v[i]),
            "centroid": vsum / count,
        })
        base_w, base_v = int(cw[i]), int(cv[i])
        start = i + 1
    return out


def facet_dynamic_ranges(sf_dir: str, term: str, col: str,
                         top_n: int) -> pa.Table:
    """Equi-weight dynamic range facets over a query's hit set with UNIT
    weights (DynamicRangeUtil.computeDynamicRanges, facet/range/
    DynamicRangeUtil.java:55-122, with weightValueSource == constant 1).

    Scale shape: per-value histogram partials aggregate per segment inside
    the shard actors (only distinct-value rows reach the driver); with unit
    weights the greedy split reduces to fixed chunks of
    ``ceil(n / min(topN, n))`` items over the value-sorted stream, so range
    bounds and centroids come from prefix sums over the HISTOGRAM — no
    per-doc expansion anywhere."""
    from lucene_ray.search.query import TermQuery

    reader = documents_index(sf_dir)
    agg = _pool(reader).facets([(0, TermQuery(term))], col)[0]
    empty = pa.table({
        "range_idx": pa.array([], pa.int64()),
        "n_docs": pa.array([], pa.int64()),
        "weight": pa.array([], pa.int64()),
        "min_value": pa.array([], pa.int64()),
        "max_value": pa.array([], pa.int64()),
        "centroid": pa.array([], pa.float64()),
    })
    if not agg or top_n == 0:
        return empty
    items = sorted((int(k), int(vv[0])) for k, vv in agg.items())
    vals = np.array([it[0] for it in items], dtype=np.int64)
    cnts = np.array([it[1] for it in items], dtype=np.int64)
    n = int(cnts.sum())
    k = int(np.ceil(float(n) / min(top_n, n)))  # accu >= target first at ceil
    starts = np.arange(0, n, k, dtype=np.int64)  # 0-based item index
    ends = np.minimum(starts + k, n) - 1  # inclusive
    ccount = np.cumsum(cnts)
    cvsum = np.cumsum(vals * cnts)

    def vsum_upto(j):  # sum of item values over items [0, j] (j inclusive)
        g = np.searchsorted(ccount, j, side="right")
        before = np.where(g > 0, ccount[np.maximum(g - 1, 0)], 0)
        base = np.where(g > 0, cvsum[np.maximum(g - 1, 0)], 0)
        return base + (j + 1 - before) * vals[g]

    ge = np.searchsorted(ccount, ends, side="right")
    gs = np.searchsorted(ccount, starts, side="right")
    vs = vsum_upto(ends) - np.where(starts > 0, vsum_upto(starts - 1), 0)
    counts = ends - starts + 1
    return pa.table({
        "range_idx": pa.array(np.arange(len(starts)), pa.int64()),
        "n_docs": pa.array(counts, pa.int64()),
        "weight": pa.array(counts, pa.int64()),  # unit weights
        "min_value": pa.array(vals[gs], pa.int64()),
        "max_value": pa.array(vals[ge], pa.int64()),
        "centroid": pa.array(vs / counts, pa.float64()),
    })


def facet_associations(sf_dir: str, term: str, facet_col: str = "lang",
                       value_col: str = "n_chars") -> pa.Table:
    """Association facets (facet/taxonomy/TaxonomyFacetIntAssociations.java,
    AssociationAggregationFunction.java:40-66): per facet label, aggregate a
    per-doc association value over the matching docs — SUM and MAX columns
    plus the doc count, ordered by summed value desc then label asc
    (Lucene's getTopChildren value ordering with a deterministic tie-break)."""
    from lucene_ray.search.query import TermQuery

    reader = documents_index(sf_dir)
    agg = _pool(reader).facets([(0, TermQuery(term))], facet_col,
                               value_col=value_col)[0]
    if not agg:
        return pa.table({facet_col: pa.array([], pa.string()),
                         "sum_value": pa.array([], pa.int64()),
                         "max_value": pa.array([], pa.int64()),
                         "n_docs": pa.array([], pa.int64())})
    keys = sorted(agg, key=lambda k: (-agg[k][1], k))
    return pa.table(
        {
            facet_col: pa.array(keys, pa.string()),
            "sum_value": pa.array([agg[k][1] for k in keys], pa.int64()),
            "max_value": pa.array([agg[k][2] for k in keys], pa.int64()),
            "n_docs": pa.array([agg[k][0] for k in keys], pa.int64()),
        }
    )


def term_vector(sf_dir: str, doc_id: int) -> pa.Table:
    """(term, tf) of one document — the IndexReader.getTermVector surface
    (index/TermVectors.java). Served by re-analyzing the stored text with
    the index's analyzer (equivalent to a stored vector under a
    deterministic analyzer); sorted by term like Lucene's TermsEnum."""
    from collections import Counter

    import pyarrow.dataset as pads

    from lucene_ray.analysis.tokenizer import CodeTokenizer

    ds = pads.dataset(os.path.join(sf_dir, "documents.parquet"))
    t = ds.to_table(columns=["text"], filter=pads.field("doc_id") == doc_id)
    if t.num_rows != 1:
        raise KeyError(f"doc_id {doc_id}: {t.num_rows} rows")
    tf = Counter(CodeTokenizer()(t.column("text")[0].as_py()))
    terms = sorted(tf)
    return pa.table(
        {
            "term": pa.array(terms, pa.string()),
            "tf": pa.array([tf[t] for t in terms], pa.int64()),
        }
    )


def doc_freq_topk(sf_dir: str, k: int = 20) -> pa.Table:
    """Top-k CONTENT-field terms by doc_freq (df desc, term asc) from the
    term stats table (keyword-field terms live in their own namespace)."""
    reader = documents_index(sf_dir)
    import pyarrow.dataset as pads

    tbl = pads.dataset(os.path.join(reader.index_dir, "term_stats"), format="parquet").to_table()
    df = tbl.to_pandas()
    df = df[~df["term"].str.contains(":")]
    df = df.sort_values(["doc_freq", "term"], ascending=[False, True]).head(k)
    df["doc_freq"] = df["doc_freq"].astype("int64")
    return pa.Table.from_pandas(
        df[["term", "doc_freq"]].reset_index(drop=True), preserve_index=False
    )


def collection_stats(sf_dir: str) -> pa.Table:
    reader = documents_index(sf_dir)
    cs = reader.collection_stats()
    return pa.table(
        {
            "doc_count": pa.array([cs.doc_count], pa.int64()),
            "sum_total_term_freq": pa.array([cs.sum_total_term_freq], pa.int64()),
        }
    )


def facet_counts(sf_dir: str, term: str, facet_col: str = "lang") -> pa.Table:
    """Facet counts over a query's hit set (FacetsCollector analog,
    SURVEY §2.5): counted per segment INSIDE the shard actors (the hit set
    never ships to the driver — only label partials merge), exactly the
    collected-during-match shape of facet/FacetsCollector.java:36."""
    from lucene_ray.search.query import TermQuery

    reader = documents_index(sf_dir)
    agg = _pool(reader).facets([(0, TermQuery(term))], facet_col)[0]
    keys = sorted(agg)
    return pa.table(
        {
            facet_col: pa.array(keys, pa.string()),
            "n_docs": pa.array([agg[k][0] for k in keys], pa.int64()),
        }
    )


def phrase_prefix_hits(sf_dir: str, terms: list[str], prefix: str) -> pa.Table:
    """Match-phrase-prefix: exact phrase whose LAST position matches any
    dictionary term with ``prefix`` — MultiPhraseQuery over the prefix
    expansion (MultiPhraseQuery.java:46, the PhraseQuery.Builder +
    TermsEnum pattern; the search-as-you-type query shape)."""
    from lucene_ray.search.query import MultiPhraseQuery

    reader = documents_index(sf_dir)
    expansion = reader.expand_prefix(prefix)
    if not expansion:
        return pa.table({"doc_id": pa.array([], pa.int64())})
    q = MultiPhraseQuery([(t,) for t in terms] + [tuple(expansion)])
    return _orig_ids(sf_dir, _all_matches(sf_dir, q, reader), reader)


def multi_phrase_hits(sf_dir: str, positions: list) -> pa.Table:
    """Exact phrase with alternatives per position (synonym-phrase shape)."""
    from lucene_ray.search.query import MultiPhraseQuery

    q = MultiPhraseQuery(positions)
    return _orig_ids(sf_dir, _all_matches(sf_dir, q))


def sort_by_field_topk(sf_dir: str, term: str, col: str, k: int = 10,
                       reverse: bool = True) -> pa.Table:
    """Query-time sort by a doc-values column — the
    Sort(SortField(col, LONG, reverse)) search surface
    (search/SortField.java): top-k of the term's hit set ordered by the
    column, ties broken by doc id ascending (Lucene's index-order
    tie-break). Like Lucene without an index sort, every hit's comparator
    value is visited — but per SEGMENT inside the shard actors, each of
    which returns at most k rows for the driver's tiny merge (the
    TopFieldCollector per-leaf + reduce shape); no full hit set crosses
    the wire."""
    from lucene_ray.search.query import TermQuery

    reader = documents_index(sf_dir)
    orig, vals = _pool(reader).sort_field_topk(
        [(0, TermQuery(term))], col, k, reverse)[0]
    return pa.table(
        {
            "doc_id": pa.array(orig, pa.int64()),
            col: pa.array(vals, pa.int64()),
        }
    )


def hit_count(sf_dir: str, query_text: str) -> pa.Table:
    """Exact hit count of a parsed query — the TotalHitCountCollector
    surface (search/TotalHitCountCollector.java), computed on the
    distributed match path."""
    from lucene_ray.search.query import parse_query

    n = len(_all_matches(sf_dir, parse_query(query_text)))
    return pa.table({"n_hits": pa.array([n], pa.int64())})


def grouped_bm25_topk(sf_dir: str, term: str, group_col: str = "lang",
                      per_group: int = 2) -> pa.Table:
    """Top-N docs per group value by BM25 score — the grouping module's
    two-pass GroupingSearch shape (lucene/grouping/.../GroupingSearch.java)
    flattened to one scored pass + per-group partial top-k. Rows-only
    contract surface (float32 scores)."""
    from lucene_ray.search.query import TermQuery

    reader = documents_index(sf_dir)
    # per-segment per-group partial top-N inside the shard actors; the
    # driver merges <= segments x groups x N rows (never the hit set)
    rows = _pool(reader).grouped_topk([(0, TermQuery(term))], group_col,
                                      per_group)[0]
    if not rows:
        return pa.table({group_col: pa.array([], pa.string()),
                         "doc_id": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int64()),
                         "score": pa.array([], pa.float32())})
    groups = sorted(rows)
    return pa.table(
        {
            group_col: pa.array([g for g in groups for _ in rows[g]], pa.string()),
            "doc_id": pa.array([o for g in groups for o, _ in rows[g]], pa.int64()),
            "rank": pa.array([r + 1 for g in groups for r in range(len(rows[g]))],
                             pa.int64()),
            "score": pa.array([sc for g in groups for _, sc in rows[g]], pa.float32()),
        }
    )


def numeric_set_hits(sf_dir: str, col: str, values: list) -> pa.Table:
    """Docs whose doc-values column is in ``values`` (IntPoint.newSetQuery
    analog)."""
    from lucene_ray.search.query import NumericSetQuery

    return _orig_ids(sf_dir, _all_matches(sf_dir, NumericSetQuery(col, values)))


def parsed_hits(sf_dir: str, query_text: str) -> pa.Table:
    """Hit set of a classic-parser query string (exercises the parser's
    extended syntax — ^boost, ~fuzzy, field:[a TO b] ranges — end-to-end)."""
    from lucene_ray.search.query import parse_query

    return _orig_ids(sf_dir, _all_matches(sf_dir, parse_query(query_text)))


def filtered_bm25_topk(sf_dir: str, query: str, col: str, lower, upper,
                       k: int = 10) -> pa.Table:
    """BM25 top-k restricted by a scoreless numeric FILTER clause
    (BooleanClause.Occur.FILTER + IntPoint range): ranking comes from the
    scoring clause alone — rows-only contract surface."""
    from lucene_ray.search.query import BooleanQuery, NumericRangeQuery, parse_query

    q = BooleanQuery(must=[parse_query(query)],
                     filter=[NumericRangeQuery(col, lower, upper)])
    return _scored_topk(sf_dir, q, k)


def bm25_topk(sf_dir: str, query: str, k: int = 10) -> pa.Table:
    """BM25 top-k (doc_id, rank, score float32) — scored path, no SQL oracle
    (float32 Lucene-order arithmetic is not expressible in DuckDB; validated
    instead by the exhaustive-oracle pytest suite). Served by the
    distributed actor pool (rank-identical to the driver Searcher by the
    bulk-search parity tests)."""
    from lucene_ray.search.query import parse_query

    return _scored_topk(sf_dir, parse_query(query), k)


def _scored_topk(sf_dir: str, q: Query, k: int) -> pa.Table:
    reader = documents_index(sf_dir)
    td = _pool(reader).search([(0, q)], k)[0]
    if len(td.doc_ids) == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int64()),
                         "score": pa.array([], pa.float32())})
    t = reader.lookup_docs(td.doc_ids, columns=["doc_id", "doc_id_orig"])
    m = dict(zip(t.column("doc_id").to_pylist(), t.column("doc_id_orig").to_pylist()))
    return pa.table(
        {
            "doc_id": pa.array([int(m[int(g)]) for g in td.doc_ids], pa.int64()),
            "rank": pa.array(np.arange(1, len(td.doc_ids) + 1), pa.int64()),
            "score": pa.array(td.scores, pa.float32()),
        }
    )


# ---------------------------------------------------------------------------
# Per-position payloads: DelimitedPayloadTokenFilter + PayloadScoreQuery
# ---------------------------------------------------------------------------

PAYLOAD_DELIM = "|"


def _payload_value(pos: int, tok_len: int) -> int:
    """Deterministic per-occurrence payload for the derived corpus —
    varies with both position and token, SQL-replayable as arithmetic."""
    return (pos * 31 + tok_len) % 101


def documents_payload_index(sf_dir: str) -> IndexReader:
    """Build-or-open a documents index over a derived payload-annotated twin
    of ``text``: token at position p becomes ``tok|((p*31+len(tok))%101)``,
    tokenized by the ``pattern`` grammar on space runs (PatternTokenizer —
    the WhitespaceTokenizer+DelimitedPayloadTokenFilter pairing of Lucene's
    payload tests, analysis/payloads/DelimitedPayloadTokenFilterTest.java)
    with ``payload_delimiter`` so each posting position carries its integer
    payload (IndexOptions payload level, PostingsEnum.getPayload)."""
    import re as _re

    import ray.data

    src = os.path.join(sf_dir, "documents.parquet")
    key = hashlib.md5(f"{src}:{os.path.getmtime(src)}:pay-v1".encode()).hexdigest()[:16]
    index_dir = os.path.join(CACHE_ROOT, f"documents-pay-{key}")
    if index_dir not in _readers:
        derived = index_dir + "-src"
        if not os.path.isdir(derived):
            split = _re.compile(r"[^a-z0-9_]+")

            def _annot(b: pa.Table) -> pa.Table:
                # same token list as the oracle's _TOKLIST split, annotated
                # and re-joined with single spaces so the pattern grammar
                # re-finds exactly these tokens at these positions
                texts = b.column("text").to_pylist()
                out = [
                    " ".join(
                        f"{t}{PAYLOAD_DELIM}{_payload_value(p, len(t))}"
                        for p, t in enumerate(
                            x for x in split.split(s.lower()) if x)
                    )
                    for s in texts
                ]
                return b.set_column(b.schema.get_field_index("text"),
                                    "text", pa.array(out, pa.string()))

            tmp = derived + ".tmp"
            (ray.data.read_parquet(src, columns=["doc_id", "lang", "source", "text"])
             .map_batches(_annot, batch_format="pyarrow")
             .write_parquet(tmp))
            os.replace(tmp, derived)  # atomic publish (resume-safe)
        cfg = IndexConfig(
            content_col="text",
            id_cols=("doc_id", "lang", "source"),
            target_rows_per_partition=20_000,
            partitions_per_segment=4,
            hot_df_threshold=500_000,
            grammar="pattern:[^ ]+",
            payload_delimiter=PAYLOAD_DELIM,
        )
        manifest = build_index(derived, index_dir, cfg, resume=True)
        assert manifest.postings_done
        _readers[index_dir] = IndexReader(index_dir)
    return _readers[index_dir]


def payload_term_scores(sf_dir: str, term: str, fn: str = "sum") -> pa.Table:
    """Per-doc aggregate of the integer payloads at ``term``'s occurrences —
    the PayloadScoreQuery surface (queries/src/java/org/apache/lucene/
    queries/payloads/PayloadScoreQuery.java with SumPayloadFunction /
    MaxPayloadFunction / MinPayloadFunction). Decodes the pay_enc stream of
    every posting chunk and reduces per doc fully vectorized
    (np.{add,maximum,minimum}.reduceat over the flat payload stream).
    Returns (doc_id, pay) sorted by doc_id."""
    from lucene_ray.codec.postings import (
        decode_docs,
        decode_freqs,
        decode_payloads,
    )

    red = {"sum": np.add, "max": np.maximum, "min": np.minimum}[fn]
    reader = documents_payload_index(sf_dir)
    ids: list[np.ndarray] = []
    vals: list[np.ndarray] = []
    for s in reader.manifest.segments:
        seg = s["seg"]
        tbl = reader.postings(seg, [term])
        if tbl is None or len(tbl) == 0:
            continue
        gids = reader.global_doc_ids(seg)
        for i in range(len(tbl)):
            cnt = tbl.column("count")[i].as_py()
            docs = decode_docs(tbl.column("docs_enc")[i].as_py(), cnt)
            freqs = decode_freqs(tbl.column("freqs_enc")[i].as_py(), cnt)
            pays = decode_payloads(tbl.column("pay_enc")[i].as_py(), freqs)
            starts = np.concatenate([[0], np.cumsum(freqs)[:-1]]).astype(np.int64)
            ids.append(gids[docs.astype(np.int64)])
            vals.append(red.reduceat(pays.astype(np.int64), starts))
    if not ids:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "pay": pa.array([], pa.int64())})
    gid_all = np.concatenate(ids)
    val_all = np.concatenate(vals)
    t = reader.lookup_docs(gid_all, columns=["doc_id", "doc_id_orig"])
    m = dict(zip(t.column("doc_id").to_pylist(),
                 t.column("doc_id_orig").to_pylist()))
    orig = np.array([m[int(g)] for g in gid_all], dtype=np.int64)
    order = np.argsort(orig, kind="stable")
    return pa.table({"doc_id": pa.array(orig[order], pa.int64()),
                     "pay": pa.array(val_all[order], pa.int64())})


def replica_term_hits(sf_dir: str, term: str) -> pa.Table:
    """Term hit set served from a SYNCED REPLICA of the documents index —
    the NRT replication surface end-to-end (lucene/replicator/nrt/
    ReplicaNode.java): the primary's commit point is shipped to a separate
    directory (incremental, checksum-verified, Ray-task file fan-out) and
    the query runs against the replica's own reader. Exact same oracle as
    ft_term_hits — a replica MUST serve identically."""
    from lucene_ray.index.replicate import sync_replica
    from lucene_ray.search.query import TermQuery

    primary = documents_index(sf_dir)
    replica_dir = primary.index_dir + "-replica"
    sync_replica(primary.index_dir, replica_dir, concurrency=4)
    if replica_dir not in _readers:
        _readers[replica_dir] = IndexReader(replica_dir)
    reader = _readers[replica_dir]
    return _orig_ids(sf_dir, _all_matches(sf_dir, TermQuery(term), reader),
                     reader)


# German light-pack injection: every 'sort' substring becomes the inflected
# noun below; GermanLightStemmer folds ä->a and strips 'ern' then 'e'/'er'
# ('häusern' -> 'haus'), so hits of the bare stem replay as substring
# containment of the trigger ('haus' never occurs naturally in the corpus)
GERMAN_SUB = ("sort", " häusern ")
GERMAN_STEM_TERM = "haus"


def documents_german_light_index(sf_dir: str) -> IndexReader:
    """Build-or-open a documents index over a derived German-bearing twin
    analyzed with uax29 + the de light pack (GermanLightStemmer — lucene/
    analysis/common/src/java/org/apache/lucene/analysis/de/
    GermanLightStemmer.java, golden-verified on delighttestdata)."""
    import pyarrow.compute as pc

    import ray.data

    src = os.path.join(sf_dir, "documents.parquet")
    key = hashlib.md5(
        f"{src}:{os.path.getmtime(src)}:delight-v1".encode()).hexdigest()[:16]
    index_dir = os.path.join(CACHE_ROOT, f"documents-delight-{key}")
    if index_dir not in _readers:
        derived = index_dir + "-src"
        if not os.path.isdir(derived):
            def _inj(b: pa.Table) -> pa.Table:
                t = pc.replace_substring(b.column("text"),
                                         pattern=GERMAN_SUB[0],
                                         replacement=GERMAN_SUB[1])
                return b.set_column(b.schema.get_field_index("text"),
                                    "text", t)

            tmp = derived + ".tmp"
            (ray.data.read_parquet(src, columns=["doc_id", "lang", "source", "text"])
             .map_batches(_inj, batch_format="pyarrow")
             .write_parquet(tmp))
            os.replace(tmp, derived)  # atomic publish (resume-safe)
        cfg = IndexConfig(
            content_col="text",
            id_cols=("doc_id", "lang", "source"),
            target_rows_per_partition=20_000,
            partitions_per_segment=4,
            hot_df_threshold=500_000,
            grammar="uax29",
            token_filters=(("light_stem", {"lang": "de_light"}),),
        )
        manifest = build_index(derived, index_dir, cfg, resume=True)
        assert manifest.postings_done
        _readers[index_dir] = IndexReader(index_dir)
    return _readers[index_dir]


def german_light_stem_hits(sf_dir: str) -> pa.Table:
    """doc_ids where the bare stem 'haus' matches — every injected
    'häusern' must have been folded + suffix-stripped by the de_light
    pack (GermanLightStemmer behavior)."""
    from lucene_ray.search.query import TermQuery

    reader = documents_german_light_index(sf_dir)
    t = _orig_ids(sf_dir,
                  _all_matches(sf_dir, TermQuery(GERMAN_STEM_TERM), reader),
                  reader)
    return t.sort_by("doc_id")


# Full-RSLP Portuguese injection: every 'scan' substring becomes the
# inflected plural below; the 7-step RSLP flow takes 'balões' -> plural
# 'balão' -> noun 'ão' removal -> 'bal' ('bal' never occurs naturally)
RSLP_SUB = ("scan", " balões ")
RSLP_STEM_TERM = "bal"


def documents_rslp_index(sf_dir: str) -> IndexReader:
    """Build-or-open a documents index over a derived Portuguese-bearing
    twin analyzed with uax29 + the full-RSLP pt pack (PortugueseStemmer —
    analysis/rslp_pt.py, golden-verified on ptrslptestdata)."""
    import pyarrow.compute as pc

    import ray.data

    src = os.path.join(sf_dir, "documents.parquet")
    key = hashlib.md5(
        f"{src}:{os.path.getmtime(src)}:rslp-v1".encode()).hexdigest()[:16]
    index_dir = os.path.join(CACHE_ROOT, f"documents-rslp-{key}")
    if index_dir not in _readers:
        derived = index_dir + "-src"
        if not os.path.isdir(derived):
            def _inj(b: pa.Table) -> pa.Table:
                t = pc.replace_substring(b.column("text"),
                                         pattern=RSLP_SUB[0],
                                         replacement=RSLP_SUB[1])
                return b.set_column(b.schema.get_field_index("text"),
                                    "text", t)

            tmp = derived + ".tmp"
            (ray.data.read_parquet(src, columns=["doc_id", "lang", "source", "text"])
             .map_batches(_inj, batch_format="pyarrow")
             .write_parquet(tmp))
            os.replace(tmp, derived)  # atomic publish (resume-safe)
        cfg = IndexConfig(
            content_col="text",
            id_cols=("doc_id", "lang", "source"),
            target_rows_per_partition=20_000,
            partitions_per_segment=4,
            hot_df_threshold=500_000,
            grammar="uax29",
            token_filters=(("light_stem", {"lang": "pt_rslp"}),),
        )
        manifest = build_index(derived, index_dir, cfg, resume=True)
        assert manifest.postings_done
        _readers[index_dir] = IndexReader(index_dir)
    return _readers[index_dir]


def rslp_stem_hits(sf_dir: str) -> pa.Table:
    """doc_ids where the bare RSLP stem 'bal' matches — every injected
    'balões' must have run the full plural+noun RSLP flow."""
    from lucene_ray.search.query import TermQuery

    reader = documents_rslp_index(sf_dir)
    t = _orig_ids(sf_dir,
                  _all_matches(sf_dir, TermQuery(RSLP_STEM_TERM), reader),
                  reader)
    return t.sort_by("doc_id")
