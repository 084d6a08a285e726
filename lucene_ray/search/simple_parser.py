"""SimpleQueryParser — error-tolerant human query syntax.

Behavioral reference: Lucene's queryparser module
(lucene/queryparser/src/java/org/apache/lucene/queryparser/simple/
SimpleQueryParser.java): `+` AND, `|` OR, `-` NOT, `"..."` phrase
(`~N` near/slop), trailing `*` prefix, `~N` fuzzy on terms, `(...)`
precedence, `\\` escaping — and NO syntax errors, ever: unbalanced
parentheses/quotes, dangling operators and malformed fuzziness all
degrade gracefully exactly as the Java parser does (extraneous chars
ignored, unclosed delimiters treated as literals).

The single-field analog of the multi-field/weights surface: one
analyzed text field, so newDefaultQuery analyzes the raw token and
joins multi-token analyses with the default operator
(QueryBuilder.createBooleanQuery), without the per-field boost loop.
"""

from __future__ import annotations

from lucene_ray.search.query import (
    BooleanQuery,
    FuzzyQuery,
    MatchAllQuery,
    PhraseQuery,
    PrefixQuery,
    Query,
    TermQuery,
)

# feature flags (SimpleQueryParser.java:111-138)
AND_OPERATOR = 1 << 0
NOT_OPERATOR = 1 << 1
OR_OPERATOR = 1 << 2
PREFIX_OPERATOR = 1 << 3
PHRASE_OPERATOR = 1 << 4
PRECEDENCE_OPERATORS = 1 << 5
ESCAPE_OPERATOR = 1 << 6
WHITESPACE_OPERATOR = 1 << 7
FUZZY_OPERATOR = 1 << 8
NEAR_OPERATOR = 1 << 9
ALL_FLAGS = -1

_MAX_FUZZINESS = 2  # LevenshteinAutomata.MAXIMUM_SUPPORTED_DISTANCE
_WS = (" ", "\t", "\n", "\r")


class _State:
    """Parse cursor + the in-progress query tree (State in the Java
    parser, plus the clause list the BooleanQuery.Builder would hold)."""

    __slots__ = ("data", "index", "length", "top", "current_op",
                 "previous_op", "not_count")

    def __init__(self, data: str, start: int, length: int):
        self.data = data
        self.index = start
        self.length = length
        self.top: list[tuple[str, Query]] | Query | None = None
        self.current_op: str | None = None
        self.previous_op: str | None = None
        self.not_count = 0


class SimpleParser:
    def __init__(self, flags: int = ALL_FLAGS,
                 default_operator: str = "SHOULD", analyzer=None):
        if default_operator not in ("MUST", "SHOULD"):
            raise ValueError("default operator must be MUST or SHOULD")
        from lucene_ray.analysis.tokenizer import CodeTokenizer

        self.flags = flags
        self.default_operator = default_operator
        self.analyzer = analyzer or CodeTokenizer()

    # ---- public entry (SimpleQueryParser.java:160) ----

    def parse(self, query_text: str) -> Query:
        if query_text.strip() == "*":
            return MatchAllQuery()
        state = _State(query_text, 0, len(query_text))
        self._parse_sub_query(state)
        if state.top is None:
            return BooleanQuery()  # MatchNoDocsQuery analog
        return self._finish(state.top)

    # ---- tree building ----
    # state.top is either a leaf Query or a list of (occur, query) clauses
    # standing in for the Java BooleanQuery.Builder (clause order kept).

    @staticmethod
    def _finish(top) -> Query:
        if not isinstance(top, list):
            return top
        must = tuple(q for occ, q in top if occ == "MUST")
        should = tuple(q for occ, q in top if occ == "SHOULD")
        must_not = tuple(q for occ, q in top if occ == "MUST_NOT")
        return BooleanQuery(must=must, should=should, must_not=must_not)

    def _build_query_tree(self, state: _State, branch: Query | None) -> None:
        """buildQueryTree (SimpleQueryParser.java:449): negation wrapper,
        operation-change re-rooting, clause append."""
        if branch is None:
            return
        if state.not_count % 2 == 1:
            branch = BooleanQuery(must_not=(branch,),
                                  should=(MatchAllQuery(),))
        if state.top is None:
            state.top = branch
        else:
            if state.current_op is None:
                state.current_op = self.default_operator
            if state.previous_op != state.current_op:
                # operational change: current top becomes one clause of a
                # new parent — right-to-left precedence
                state.top = [(state.current_op, self._finish(state.top))]
            state.top.append((state.current_op, branch))
            state.previous_op = state.current_op
        state.current_op = None

    # ---- recursive descent (parseSubQuery, SimpleQueryParser.java:177) ----

    def _parse_sub_query(self, state: _State) -> None:
        f = self.flags
        while state.index < state.length:
            c = state.data[state.index]
            if c == "(" and f & PRECEDENCE_OPERATORS:
                self._consume_sub_query(state)
            elif c == ")" and f & PRECEDENCE_OPERATORS:
                state.index += 1  # extraneous — ignored
            elif c == '"' and f & PHRASE_OPERATOR:
                self._consume_phrase(state)
            elif c == "+" and f & AND_OPERATOR:
                if state.current_op is None and state.top is not None:
                    state.current_op = "MUST"
                state.index += 1
            elif c == "|" and f & OR_OPERATOR:
                if state.current_op is None and state.top is not None:
                    state.current_op = "SHOULD"
                state.index += 1
            elif c == "-" and f & NOT_OPERATOR:
                state.not_count += 1
                state.index += 1
                continue  # keep the pending nots across the next char
            elif c in _WS and f & WHITESPACE_OPERATOR:
                state.index += 1
            else:
                self._consume_token(state)
            state.not_count = 0

    def _consume_sub_query(self, state: _State) -> None:
        start = state.index + 1
        state.index = start
        precedence = 1
        escaped = False
        while state.index < state.length:
            c = state.data[state.index]
            if not escaped:
                if c == "\\" and self.flags & ESCAPE_OPERATOR:
                    escaped = True
                    state.index += 1
                    continue
                if c == "(":
                    precedence += 1
                elif c == ")":
                    precedence -= 1
                    if precedence == 0:
                        break
            escaped = False
            state.index += 1
        if state.index == state.length:
            # unbalanced: the '(' is extraneous — rewind and ignore it
            state.index = start
        elif state.index == start:
            state.current_op = None  # '()' — op was meant for this subquery
            state.index += 1
        else:
            sub = _State(state.data, start, state.index)
            self._parse_sub_query(sub)
            self._build_query_tree(
                state, None if sub.top is None else self._finish(sub.top))
            state.index += 1

    def _consume_phrase(self, state: _State) -> None:
        start = state.index + 1
        state.index = start
        buf: list[str] = []
        escaped = False
        has_slop = False
        while state.index < state.length:
            c = state.data[state.index]
            if not escaped:
                if c == "\\" and self.flags & ESCAPE_OPERATOR:
                    escaped = True
                    state.index += 1
                    continue
                if c == '"':
                    if (state.length > state.index + 1
                            and state.data[state.index + 1] == "~"
                            and self.flags & NEAR_OPERATOR):
                        state.index += 1
                        if state.length > state.index + 1:
                            has_slop = True
                        break
                    break
            escaped = False
            buf.append(c)
            state.index += 1
        if state.index == state.length:
            state.index = start  # unclosed quote — extraneous
        elif state.index == start:
            state.current_op = None  # empty phrase
            state.index += 1
        else:
            slop = self._parse_fuzziness(state) if has_slop else 0
            self._build_query_tree(
                state, self._new_phrase_query("".join(buf), slop))
            state.index += 1

    def _consume_token(self, state: _State) -> None:
        buf: list[str] = []
        escaped = False
        prefix = False
        fuzzy = False
        while state.index < state.length:
            c = state.data[state.index]
            if not escaped:
                if c == "\\" and self.flags & ESCAPE_OPERATOR:
                    escaped = True
                    prefix = False
                    state.index += 1
                    continue
                if self._token_finished(c):
                    break
                if buf and c == "~" and self.flags & FUZZY_OPERATOR:
                    fuzzy = True
                    break
                prefix = bool(buf) and c == "*" \
                    and bool(self.flags & PREFIX_OPERATOR)
            escaped = False
            buf.append(c)
            state.index += 1
        if not buf:
            return
        if fuzzy:
            token = "".join(buf)
            fuzziness = min(self._parse_fuzziness(state), _MAX_FUZZINESS)
            branch = (self._new_default_query(token) if fuzziness == 0
                      else self._new_fuzzy_query(token, fuzziness))
        elif prefix:
            branch = self._new_prefix_query("".join(buf[:-1]))
        else:
            branch = self._new_default_query("".join(buf))
        self._build_query_tree(state, branch)

    def _token_finished(self, c: str) -> bool:
        f = self.flags
        return ((c == '"' and bool(f & PHRASE_OPERATOR))
                or (c == "|" and bool(f & OR_OPERATOR))
                or (c == "+" and bool(f & AND_OPERATOR))
                or (c in "()" and bool(f & PRECEDENCE_OPERATORS))
                or (c in _WS and bool(f & WHITESPACE_OPERATOR)))

    def _parse_fuzziness(self, state: _State) -> int:
        """parseFuzziness (SimpleQueryParser.java:497): digits after '~';
        empty -> automatic 2; malformed or negative -> 0."""
        if state.index >= state.length or state.data[state.index] != "~":
            return 0
        chars: list[str] = []
        while state.index < state.length:
            state.index += 1
            if state.index < state.length:
                if self._token_finished(state.data[state.index]):
                    break
                chars.append(state.data[state.index])
        text = "".join(chars)
        if not text:
            return 2
        try:
            return max(int(text), 0)
        except ValueError:
            return 0

    # ---- leaf factories (newDefaultQuery etc., single-field analogs) ----

    def _new_default_query(self, text: str) -> Query | None:
        toks = self.analyzer(text)
        if not toks:
            return None
        if len(toks) == 1:
            return TermQuery(toks[0])
        clauses = tuple(TermQuery(t) for t in toks)
        if self.default_operator == "MUST":
            return BooleanQuery(must=clauses)
        return BooleanQuery(should=clauses)

    def _new_fuzzy_query(self, text: str, fuzziness: int) -> Query | None:
        toks = self.analyzer(text)
        if not toks:
            return None
        return FuzzyQuery(toks[0], fuzziness)

    def _new_prefix_query(self, text: str) -> Query | None:
        toks = self.analyzer(text)
        if not toks:
            return None
        return PrefixQuery(toks[0])

    def _new_phrase_query(self, text: str, slop: int) -> Query | None:
        toks = self.analyzer(text)
        if not toks:
            return None
        if len(toks) == 1:
            return TermQuery(toks[0])
        return PhraseQuery(toks, slop=slop)


def simple_parse(s: str, flags: int = ALL_FLAGS,
                 default_operator: str = "SHOULD", analyzer=None) -> Query:
    """Parse ``s`` with SimpleQueryParser semantics — never raises on
    malformed input."""
    return SimpleParser(flags, default_operator, analyzer).parse(s)
