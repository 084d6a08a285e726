"""Tokenizer behavior tests (StandardAnalyzer-constrained grammar, SURVEY §2.2)."""

from lucene_ray.analysis import CodeTokenizer, StandardLikeAnalyzer


def test_basic_split_and_lowercase():
    t = CodeTokenizer()
    assert t("Foo bar-Baz_qux 123") == ["foo", "bar", "baz_qux", "123"]


def test_punct_only():
    assert CodeTokenizer()("!!! ... ---") == []


def test_max_token_split():
    t = CodeTokenizer(max_token_length=255)
    tok = "a" * 300
    out = t(tok)
    assert out == ["a" * 255, "a" * 45]


def test_underscore_joins():
    # UAX#29 ExtendNumLet behavior: '_' joins tokens
    assert CodeTokenizer()("uniq_137 foo_bar_1") == ["uniq_137", "foo_bar_1"]


def test_invert_positions_and_length():
    a = StandardLikeAnalyzer()
    postings, n = a.invert("def foo(): return foo")
    assert n == 4
    assert postings == {"def": [0], "foo": [1, 3], "return": [2]}


def test_stopwords_keep_position_holes():
    a = StandardLikeAnalyzer(stopwords=frozenset({"the"}))
    pairs = a.tokens_with_positions("the quick the fox")
    assert pairs == [("quick", 1), ("fox", 3)]
    postings, n = a.invert("the quick the fox")
    assert n == 2  # stop-removed tokens don't count toward field length
    assert postings == {"quick": [1], "fox": [3]}
