"""SimpleQueryParser parity tests (queryparser/simple/SimpleQueryParser.java
+ the behaviors asserted by TestSimpleQueryParser.java): operators, grouping,
right-to-left precedence, escaping, and — the module's defining contract —
graceful degradation on malformed input (never raises)."""

from lucene_ray.search.query import (
    BooleanQuery,
    FuzzyQuery,
    MatchAllQuery,
    PhraseQuery,
    PrefixQuery,
    TermQuery,
)
from lucene_ray.search.simple_parser import (
    AND_OPERATOR,
    NOT_OPERATOR,
    PHRASE_OPERATOR,
    WHITESPACE_OPERATOR,
    simple_parse,
)


def t(s):
    return TermQuery(s)


def test_single_term():
    assert simple_parse("join") == t("join")


def test_default_or():
    q = simple_parse("join batch")
    assert q == BooleanQuery(should=(t("join"), t("batch")))


def test_default_and_operator():
    q = simple_parse("join batch", default_operator="MUST")
    assert q == BooleanQuery(must=(t("join"), t("batch")))


def test_explicit_and_or_not():
    q = simple_parse("join + batch")
    assert q == BooleanQuery(must=(t("join"), t("batch")))
    q = simple_parse("join | batch")
    assert q == BooleanQuery(should=(t("join"), t("batch")))
    q = simple_parse("-join")
    assert q == BooleanQuery(should=(MatchAllQuery(),), must_not=(t("join"),))


def test_double_negation_cancels():
    assert simple_parse("--join") == t("join")


def test_right_to_left_precedence():
    # token1 | token2 + token3 == (token1 | token2) + token3
    q = simple_parse("a | b + c")
    inner = BooleanQuery(should=(t("a"), t("b")))
    assert q == BooleanQuery(must=(inner, t("c")))


def test_parens_precedence():
    q = simple_parse("a + (b | c)")
    assert q == BooleanQuery(
        must=(t("a"), BooleanQuery(should=(t("b"), t("c")))))


def test_phrase_and_slop():
    assert simple_parse('"batch window"') == PhraseQuery(["batch", "window"])
    assert simple_parse('"batch window"~3') == PhraseQuery(
        ["batch", "window"], slop=3)
    # single-token phrase degrades to a term query
    assert simple_parse('"batch"') == t("batch")


def test_prefix_and_fuzzy():
    assert simple_parse("cust*") == PrefixQuery("cust")
    assert simple_parse("joib~1") == FuzzyQuery("joib", 1)
    # bare ~ means automatic fuzziness 2; values cap at 2; ~0 -> plain term
    assert simple_parse("joib~") == FuzzyQuery("joib", 2)
    assert simple_parse("joib~9") == FuzzyQuery("joib", 2)
    assert simple_parse("joib~0") == t("joib")
    # malformed fuzziness swallows to 0 (never raises)
    assert simple_parse("joib~x") == t("joib")


def test_star_alone_is_match_all():
    assert simple_parse(" * ") == MatchAllQuery()
    assert simple_parse("") == BooleanQuery()  # matches nothing


def test_malformed_never_raises():
    # unbalanced parens: '(' extraneous
    assert simple_parse("((join") == t("join")
    # unclosed quote: '"' extraneous, contents parsed as terms
    assert simple_parse('"unclosed join') == BooleanQuery(
        should=(t("unclosed"), t("join")))
    # dangling operators ignored
    assert simple_parse("+ | join") == t("join")
    # '+' after an operator is ignored (op already set)
    assert simple_parse("a+|b") == BooleanQuery(must=(t("a"), t("b")))
    # empty group resets the pending operation
    assert simple_parse("a + () b") == BooleanQuery(should=(t("a"), t("b")))


def test_escaping():
    # escaped operators become literal chars, then analysis splits them
    assert simple_parse(r"a\+b") == BooleanQuery(should=(t("a"), t("b")))
    # escaped '*' is not a prefix operator (and analysis drops it)
    assert simple_parse(r"cust\*") == t("cust")


def test_flags_disable_features():
    flags = AND_OPERATOR | NOT_OPERATOR | WHITESPACE_OPERATOR | PHRASE_OPERATOR
    # '|' disabled: treated as a token char, analysis splits around it
    q = simple_parse("a|b", flags=flags)
    assert q == BooleanQuery(should=(t("a"), t("b")))
    # fuzzy disabled: '~1' folds into the token, analysis strips '~'
    q = simple_parse("joib~1", flags=flags)
    assert q == BooleanQuery(should=(t("joib"), t("1")))


def test_not_requires_adjacency():
    # '- join' negates join: Java resets not only after a non-'-' branch,
    # whitespace between '-' and the term is consumed by the main loop
    # AFTER the not was counted, which clears it
    assert simple_parse("- join") == t("join")
    assert simple_parse("-join") == BooleanQuery(
        should=(MatchAllQuery(),), must_not=(t("join"),))
