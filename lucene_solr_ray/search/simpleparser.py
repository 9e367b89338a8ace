"""SimpleQueryParser: never-throws human query syntax.

Re-expression of ``lucene/queryparser/src/java/org/apache/lucene/
queryparser/simple/SimpleQueryParser.java`` (parse loop :158,
consumeSubQuery :222, consumePhrase :280, consumeToken :348,
buildQueryTree :429, parseFuzziness :478, tokenFinished :511): whatever
the user types parses to SOME query — syntax errors are never raised,
unmatched ``(`` / ``"`` are treated as literal/extraneous characters.

Operators (each gated by a flag bit, default all on):

- ``+`` AND, ``|`` OR (applied right-to-left: ``a | b + c`` =
  ``(a OR b) AND c``), ``-`` NOT (double negation cancels),
- ``"..."`` phrase, ``"..."~N`` sloppy phrase,
- trailing ``*`` prefix, ``term~N`` fuzzy (edit distance capped at 2,
  ~0 = plain term),
- ``( )`` precedence, ``\\`` escape, whitespace delimits.

The default operator is OR (``defaultOperator = Occur.SHOULD``,
SimpleQueryParser.java:126). Analysis runs through the engine analyzer
(newDefaultQuery/newPhraseQuery -> the shared ``_analyze_chunk``);
prefix terms are lowercased but not tokenized, matching the classic
parser's expanded-term handling.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

from .query import (
    BooleanQuery,
    FuzzyQuery,
    MatchAllDocsQuery,
    MatchNoDocs,
    PhraseQuery,
    PrefixQuery,
    Query,
    _analyze_chunk,
)

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

_WS = " \t\n\r"
_MAX_EDITS = 2  # LevenshteinAutomata.MAXIMUM_SUPPORTED_DISTANCE


@dataclass
class _State:
    data: str
    index: int
    length: int
    top: Query | None = None
    current_op: str | None = None   # "must" | "should"
    previous_op: str | None = None
    neg: int = 0


class SimpleQueryParser:
    def __init__(self, analyzer=None, flags: int = -1,
                 default_operator: str = "should"):
        if analyzer is None:
            from ..analysis import StandardAnalyzer

            analyzer = StandardAnalyzer()
        self.analyzer = analyzer
        self.flags = flags
        self.default_operator = default_operator

    def _on(self, flag: int) -> bool:
        return (self.flags & flag) != 0

    def parse(self, text: str) -> Query:
        state = _State(text, 0, len(text))
        self._parse_sub(state)
        return state.top if state.top is not None else MatchNoDocs()

    # -- parse loop (SimpleQueryParser.java:158) --

    def _parse_sub(self, state: _State) -> None:
        while state.index < state.length:
            c = state.data[state.index]
            if c == "(" and self._on(PRECEDENCE_OPERATORS):
                self._consume_subquery(state)
            elif c == ")" and self._on(PRECEDENCE_OPERATORS):
                state.index += 1  # extraneous, ignored
            elif c == '"' and self._on(PHRASE_OPERATOR):
                self._consume_phrase(state)
            elif c == "+" and self._on(AND_OPERATOR):
                if state.current_op is None and state.top is not None:
                    state.current_op = "must"
                state.index += 1
            elif c == "|" and self._on(OR_OPERATOR):
                if state.current_op is None and state.top is not None:
                    state.current_op = "should"
                state.index += 1
            elif c == "-" and self._on(NOT_OPERATOR):
                state.neg += 1
                state.index += 1
                continue  # keep neg across consecutive '-'
            elif c in _WS and self._on(WHITESPACE_OPERATOR):
                state.index += 1
            else:
                self._consume_token(state)
            state.neg = 0

    # -- ( ... ) (:222) --

    def _consume_subquery(self, state: _State) -> None:
        start = state.index = state.index + 1
        depth, escaped = 1, False
        while state.index < state.length:
            c = state.data[state.index]
            if not escaped:
                if c == "\\" and self._on(ESCAPE_OPERATOR):
                    escaped = True
                    state.index += 1
                    continue
                if c == "(":
                    depth += 1
                elif c == ")":
                    depth -= 1
                    if depth == 0:
                        break
            escaped = False
            state.index += 1
        if state.index == state.length:
            # no closing paren: the '(' is extraneous
            state.index = start
        elif state.index == start:
            # '()': the pending operation would have applied to it
            state.current_op = None
            state.index += 1
        else:
            sub = _State(state.data, start, state.index)
            self._parse_sub(sub)
            self._build(state, sub.top)
            state.index += 1

    # -- "..."[~N] (:280) --

    def _consume_phrase(self, state: _State) -> None:
        start = state.index = state.index + 1
        buf, escaped, has_slop = [], False, False
        while state.index < state.length:
            c = state.data[state.index]
            if not escaped:
                if c == "\\" and self._on(ESCAPE_OPERATOR):
                    escaped = True
                    state.index += 1
                    continue
                if c == '"':
                    if (state.index + 1 < state.length
                            and state.data[state.index + 1] == "~"
                            and self._on(NEAR_OPERATOR)):
                        state.index += 1
                        has_slop = state.index + 1 < state.length
                    break
            escaped = False
            buf.append(c)
            state.index += 1
        if state.index == state.length:
            state.index = start  # no closing quote: extraneous
        elif state.index == start:
            state.current_op = None  # empty phrase
            state.index += 1
        else:
            slop = self._parse_fuzziness(state) if has_slop else 0
            self._build(state, self._new_phrase("".join(buf), slop))
            state.index += 1

    # -- term[*|~N] (:348) --

    def _consume_token(self, state: _State) -> None:
        buf, escaped, prefix, fuzzy = [], False, False, False
        while state.index < state.length:
            c = state.data[state.index]
            if not escaped:
                if c == "\\" and self._on(ESCAPE_OPERATOR):
                    escaped = True
                    prefix = False
                    state.index += 1
                    continue
                if self._token_finished(state):
                    break
                if buf and c == "~" and self._on(FUZZY_OPERATOR):
                    fuzzy = True
                    break
                prefix = bool(buf) and c == "*" and self._on(
                    PREFIX_OPERATOR)
            escaped = False
            buf.append(c)
            state.index += 1
        if not buf:
            return
        token = "".join(buf)
        if fuzzy:
            edits = min(self._parse_fuzziness(state), _MAX_EDITS)
            branch = (self._new_default(token) if edits == 0
                      else self._new_fuzzy(token, edits))
        elif prefix:
            branch = self._new_prefix(token[:-1])
        else:
            branch = self._new_default(token)
        self._build(state, branch)

    # -- query-tree assembly (:429) --

    def _build(self, state: _State, branch: Query | None) -> None:
        if branch is None or isinstance(branch, MatchNoDocs):
            return
        if state.neg % 2 == 1:
            branch = BooleanQuery(should=[MatchAllDocsQuery()],
                                  must_not=[branch])
        if state.top is None:
            state.top = branch
            state.current_op = None
            return
        if state.current_op is None:
            state.current_op = self.default_operator
        if state.previous_op != state.current_op:
            # operational change: current top becomes one clause of a
            # fresh parent (right-to-left precedence)
            state.top = self._with_clause(BooleanQuery(), state.top,
                                          state.current_op)
        state.top = self._with_clause(state.top, branch, state.current_op)
        state.previous_op = state.current_op
        state.current_op = None

    @staticmethod
    def _with_clause(bq: BooleanQuery, q: Query, occur: str) -> BooleanQuery:
        return BooleanQuery(
            must=bq.must + ([q] if occur == "must" else []),
            should=bq.should + ([q] if occur == "should" else []),
            must_not=list(bq.must_not),
            min_should_match=bq.min_should_match)

    # -- helpers (:478, :511) --

    def _parse_fuzziness(self, state: _State) -> int:
        if (state.index >= state.length
                or state.data[state.index] != "~"):
            return 0
        digits = []
        while state.index < state.length:
            state.index += 1
            if state.index < state.length:
                if self._token_finished(state):
                    break
                digits.append(state.data[state.index])
        try:
            n = int("".join(digits))
        except ValueError:
            return 0
        return max(n, 0)

    def _token_finished(self, state: _State) -> bool:
        c = state.data[state.index]
        return ((c == '"' and self._on(PHRASE_OPERATOR))
                or (c == "|" and self._on(OR_OPERATOR))
                or (c == "+" and self._on(AND_OPERATOR))
                or (c in "()" and self._on(PRECEDENCE_OPERATORS))
                or (c in _WS and self._on(WHITESPACE_OPERATOR)))

    # -- query factories (newDefaultQuery/newPhraseQuery/... :529+) --

    def _new_default(self, token: str) -> Query:
        return _analyze_chunk(token, self.analyzer)

    def _new_phrase(self, phrase: str, slop: int) -> Query:
        q = _analyze_chunk(phrase, self.analyzer)
        if isinstance(q, PhraseQuery) and slop:
            q = replace(q, slop=slop)
        return q

    def _new_prefix(self, token: str) -> Query:
        from ..analysis.analyzer import java_lowercase

        return PrefixQuery(prefix=java_lowercase(token))

    def _new_fuzzy(self, token: str, edits: int) -> Query:
        from ..analysis.analyzer import java_lowercase

        return FuzzyQuery(term=java_lowercase(token), max_edits=edits)


def parse_simple(text: str, analyzer=None, flags: int = -1,
                 default_operator: str = "should") -> Query:
    """Parse with SimpleQueryParser semantics; NEVER raises."""
    return SimpleQueryParser(analyzer, flags, default_operator).parse(text)
