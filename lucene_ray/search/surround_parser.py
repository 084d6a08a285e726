"""Surround query parser — the span-query (proximity) syntax.

Behavioral reference: Lucene's surround dialect
(lucene/queryparser/src/java/org/apache/lucene/queryparser/surround/
parser/QueryParser.jj and query/DistanceQuery.java):

- ``W`` (ordered) and ``N`` (unordered) positional operators with an
  optional numeric distance prefix 2-99; distance 1 = adjacent. The
  distance maps to span slop = distance - 1 (DistanceQuery.java:96
  ``new SpanNearQuery(spanClauses, getOpDistance() - 1, ordered)``).
- boolean ``AND`` / ``OR`` / ``NOT`` (NOT is binary: a NOT b).
- every non-unary operator works BOTH infix (``a AND b AND c``) and
  prefix (``AND(a, b, c)``, ``3W(a, b)``) — QueryParser.jj:66-75.
- truncation ``pre*`` (SrndPrefixQuery; inside a distance op it expands
  against the term dictionary into a span-OR, via the ``expand``
  callable; MINIMUM_PREFIX_LENGTH = 3 enforced as in QueryParser.jj:78).
- ``(...)`` grouping, ``^boost`` on any clause, operators case-insensitive.

Scope notes (documented divergences): the single-content-field engine has
no ``field:`` prefix inside surround (use the classic parser for keyword
fields); ``?`` single-char truncation maps to the wildcard expansion.

Top-level booleans produce BooleanQuery over constant-score span hit sets;
W/N produce SpanNearQuery; OR inside a distance op produces SpanOrQuery,
matching SpanNearClauseFactory's rewrite.
"""

from __future__ import annotations

import re

from lucene_ray.search.query import (
    BooleanQuery,
    ConstantScoreQuery,
    Query,
    SpanNearQuery,
    SpanOrQuery,
    SpanTermQuery,
    WildcardQuery,
)

MINIMUM_PREFIX_LENGTH = 3  # QueryParser.jj:78

_TOKEN_RE = re.compile(
    r"\s*(?:(?P<lparen>\()|(?P<rparen>\))|(?P<comma>,)"
    r"|(?P<boost>\^\d+(?:\.\d+)?)"
    r"|(?P<dist>\d{1,2}[WwNn])(?=[\s(])"
    r"|(?P<word>[^\s(),^]+))"
)


class SurroundParseError(ValueError):
    pass


def _tokenize(s: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if m is None or m.end() == pos:
            if s[pos:].strip() == "":
                break
            raise SurroundParseError(f"bad input at {pos}: {s[pos:pos+10]!r}")
        pos = m.end()
        for kind in ("lparen", "rparen", "comma", "boost", "dist", "word"):
            v = m.group(kind)
            if v is not None:
                out.append((kind, v))
                break
    return out


_BOOL_OPS = {"and": "and", "or": "or", "not": "not"}


def _op_of(tok: tuple[str, str]) -> tuple[str, int, bool] | None:
    """(kind, distance, ordered) for an operator word, else None."""
    kind, v = tok
    if kind == "dist":
        d = int(v[:-1])
        if not (2 <= d <= 99):
            raise SurroundParseError(f"distance out of range: {v}")
        return ("near", d, v[-1] in "Ww")
    if kind != "word":
        return None
    lw = v.lower()
    if lw in _BOOL_OPS:
        return (lw, 0, False)
    if lw == "w":
        return ("near", 1, True)
    if lw == "n":
        return ("near", 1, False)
    return None


class _Parser:
    def __init__(self, toks: list[tuple[str, str]], expand):
        self.toks = toks
        self.i = 0
        self.expand = expand

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self):
        t = self.peek()
        if t is None:
            raise SurroundParseError("unexpected end of query")
        self.i += 1
        return t

    # expr := atom ((AND|OR|NOT|W|N) atom)*  — one operator kind per chain,
    # as in the surround grammar (mixing requires parentheses)
    def expr(self):
        left = self.atom()
        chain_op = None
        items = [left]
        while True:
            t = self.peek()
            if t is None or t[0] in ("rparen", "comma"):
                break
            op = _op_of(t)
            if op is None:
                raise SurroundParseError(f"expected operator, got {t[1]!r}")
            if chain_op is None:
                chain_op = op
            elif op != chain_op:
                raise SurroundParseError(
                    f"mixed operators need parentheses: {t[1]!r}")
            self.next()
            items.append(self.atom())
        if chain_op is None:
            return left
        return _combine(chain_op, items)

    def atom(self):
        t = self.next()
        kind, v = t
        # prefix operator form: OP ( args , ... )
        op = _op_of(t)
        if op is not None and self.peek() is not None and self.peek()[0] == "lparen":
            self.next()
            args = [self.expr()]
            while self.peek() is not None and self.peek()[0] == "comma":
                self.next()
                args.append(self.expr())
            if self.next()[0] != "rparen":
                raise SurroundParseError("expected ')'")
            node = _combine(op, args)
        elif kind == "lparen":
            node = self.expr()
            if self.next()[0] != "rparen":
                raise SurroundParseError("expected ')'")
        elif kind == "word":
            node = self.leaf(v)
        else:
            raise SurroundParseError(f"unexpected {v!r}")
        nxt = self.peek()
        if nxt is not None and nxt[0] == "boost":
            self.next()
            node = ("boost", float(nxt[1][1:]), node)
        return node

    def leaf(self, v: str):
        if v.endswith("*") or "?" in v:
            stem = v.rstrip("*").replace("?", "")
            if len(stem) < MINIMUM_PREFIX_LENGTH:
                raise SurroundParseError(
                    f"Too unrestrictive truncation: {v}")
            return ("trunc", v.lower())
        return ("term", v.lower())


def _combine(op, items):
    kind = op[0]
    if kind == "near":
        return ("near", op[1], op[2], items)
    if kind == "not":
        if len(items) != 2:
            raise SurroundParseError("NOT takes exactly two operands")
        return ("not", items)
    return (kind, items)


def _to_spans(node, expand) -> Query:
    """Lower a node appearing INSIDE a distance op to a span query
    (SpanNearClauseFactory semantics: term -> SpanTerm, truncation ->
    span-OR over the dictionary expansion, OR -> SpanOr)."""
    tag = node[0]
    if tag == "term":
        return SpanTermQuery(node[1])
    if tag == "trunc":
        terms = expand(WildcardQuery(node[1]))
        return SpanOrQuery([SpanTermQuery(t) for t in terms] or
                           [SpanTermQuery("\0_no_match_\0")])
    if tag == "or":
        return SpanOrQuery([_to_spans(c, expand) for c in node[1]])
    if tag == "near":
        _, dist, ordered, items = node
        return SpanNearQuery([_to_spans(c, expand) for c in items],
                             slop=dist - 1, in_order=ordered)
    if tag == "boost":
        return _to_spans(node[2], expand)  # boost folded at the top level
    raise SurroundParseError(
        f"operator {tag!r} is not allowed inside a distance operator")


def _lower(node, expand) -> Query:
    """Top-level lowering. BasicQueryFactory semantics: bare terms become
    scored TermQuerys, truncations become multi-term queries (expanded by
    the plan), booleans stay boolean; only distance operators force the
    span domain (constant-score hit sets in this engine)."""
    tag = node[0]
    if tag == "term":
        from lucene_ray.search.query import TermQuery

        return TermQuery(node[1])
    if tag == "trunc":
        return WildcardQuery(node[1])
    if tag == "near":
        return _to_spans(node, expand)
    if tag == "or":
        return BooleanQuery(should=[_lower(c, expand) for c in node[1]])
    if tag == "and":
        return BooleanQuery(must=[_lower(c, expand) for c in node[1]])
    if tag == "not":
        inc, exc = node[1]
        return BooleanQuery(must=[_lower(inc, expand)],
                            must_not=[_lower(exc, expand)])
    if tag == "boost":
        inner = _lower(node[2], expand)
        return ConstantScoreQuery(inner, boost=node[1])
    raise SurroundParseError(f"cannot lower {tag!r}")


def parse_surround(s: str, expand=None) -> Query:
    """Parse a surround query string into the engine's query AST.
    ``expand(WildcardQuery) -> list[str]`` resolves truncations against the
    term dictionary (pass reader.expand_multi_term); parsing itself never
    touches the index, and queries without truncation need no expander."""
    toks = _tokenize(s)
    if not toks:
        raise SurroundParseError("empty query")
    p = _Parser(toks, expand)
    node = p.expr()
    if p.peek() is not None:
        raise SurroundParseError(f"trailing input: {p.peek()[1]!r}")
    if expand is None:
        expand = lambda q: []
    return _lower(node, expand)
