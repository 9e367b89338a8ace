"""ExtendedDisMax (edismax) query parser analog.

Re-expression of the reference surface:

- ``solr/core/src/java/org/apache/solr/search/ExtendedDismaxQParser.java``
  — the lenient user-query parser with mm / pf / pf2 / pf3 / ps / qs /
  bq / tie / lowercaseOperators parameters. This engine indexes one
  analyzed text field, so the qf field list degenerates to that field
  and ``tie`` only matters for the synonym/dismax structures the classic
  parser already emits.
- ``solr/core/src/java/org/apache/solr/util/SolrPluginUtils.java``
  ``calculateMinShouldMatch`` / ``setMinShouldMatch`` — the mm spec
  grammar (integer, negative integer, percentage, negative percentage,
  and ``N<spec`` conditional chains) reimplemented with the reference's
  exact truncation/clamping arithmetic.

The output is an AST of existing node types (BooleanQuery with
min_should_match, PhraseQuery, TermQuery, ...) so every scorer — the
in-process shards, the distributed actors and the pure-Python oracle —
runs edismax queries unchanged.
"""

from __future__ import annotations

import re

from .query import (BooleanQuery, MatchNoDocs, PhraseQuery, Query,
                    parse_query)

__all__ = ["calculate_min_should_match", "parse_edismax"]


def calculate_min_should_match(optional_count: int, spec: str) -> int:
    """SolrPluginUtils.calculateMinShouldMatch: resolve an mm spec
    against the number of optional (SHOULD) clauses.

    - ``"3"``   -> 3 required
    - ``"-2"``  -> optional_count - 2 required
    - ``"75%"`` -> int(optional_count * 0.75) required (truncates)
    - ``"-25%"``-> optional_count + int(optional_count * -0.25)
    - ``"2<-25% 9<-3"`` -> conditional chain: each ``n<spec`` applies
      only when optional_count > n; the LAST applicable wins; counts
      <= the smallest n require everything.

    Result clamps to [0, optional_count] exactly like the reference.
    """
    result = optional_count
    spec = spec.strip()
    if "<" in spec:
        for part in re.split(r"\s+", spec):
            head, _, tail = part.partition("<")
            if not tail:
                raise ValueError(
                    f"invalid mm conditional (expected n<spec): {part!r}")
            upper = int(head)
            if optional_count <= upper:
                return result
            result = calculate_min_should_match(optional_count, tail)
        return result
    if spec.endswith("%"):
        percent = int(spec[:-1])
        calc = result * percent / 100.0
        result = result + int(calc) if calc < 0 else int(calc)
    else:
        calc = int(spec)
        result = result + calc if calc < 0 else calc
    if optional_count < result:
        return optional_count
    return 0 if result < 0 else result


_LOWER_OPS = re.compile(r'(?<![\w"])(?:and|or|not)(?![\w"])')


def _transform_lower_ops(text: str, to_upper: bool) -> str:
    """Standalone lowercase and/or/not OUTSIDE quotes: with
    lowercaseOperators=true they act as operators (uppercase them for
    the classic parser); with false they are ordinary words — drop them
    up front, which is exactly what analysis would do (all three are in
    the 33-stopword list), so the classic parser's case-insensitive
    operator matching never sees them
    (ExtendedDismaxQParser.splitIntoClauses)."""
    def fix(chunk: str) -> str:
        return _LOWER_OPS.sub(
            (lambda m: m.group(0).upper()) if to_upper else " ", chunk)

    out: list[str] = []
    in_quote = False
    last = 0
    for i, c in enumerate(text):
        if c == '"':
            chunk = text[last:i]
            out.append(chunk if in_quote else fix(chunk))
            out.append('"')
            in_quote = not in_quote
            last = i + 1
    chunk = text[last:]
    out.append(chunk if in_quote else fix(chunk))
    return "".join(out)


_ESCAPE_RE = re.compile(r'[+\-!(){}\[\]^"~*?:\\/<>]')
_OPERATOR_WORD = re.compile(r"^(?:AND|OR|NOT)$")


def _escaped_terms_query(text: str, analyzer) -> Query:
    """The lenient fallback: strip query syntax and treat the input as
    plain analyzed text, every chunk optional (the reference escapes the
    whole string and reparses)."""
    cleaned = _ESCAPE_RE.sub(" ", text)
    words = [w for w in cleaned.split()
             if not _OPERATOR_WORD.match(w.upper())]
    return parse_query(" ".join(words), analyzer)


def _apply_phrase_slop(q: Query, qs: int) -> Query:
    """qs (query phrase slop) applies to phrases the USER typed without
    an explicit ~N (ExtendedDismaxQParser 'qs' param)."""
    if isinstance(q, PhraseQuery) and q.slop == 0:
        return PhraseQuery(q.terms, q.positions, boost=q.boost, slop=qs)
    if isinstance(q, BooleanQuery):
        return BooleanQuery(
            must=[_apply_phrase_slop(c, qs) for c in q.must],
            should=[_apply_phrase_slop(c, qs) for c in q.should],
            must_not=[_apply_phrase_slop(c, qs) for c in q.must_not],
            min_should_match=q.min_should_match)
    return q


def _phrase_of(terms: list[str], positions: list[int], slop: int,
               boost: float) -> Query:
    base = positions[0]
    return PhraseQuery(tuple(terms),
                       tuple(p - base for p in positions),
                       boost=boost, slop=slop)


def parse_edismax(text: str, analyzer=None, *, mm: str | None = None,
                  pf: float = 0.0, ps: int = 0,
                  pf2: float = 0.0, ps2: int | None = None,
                  pf3: float = 0.0, ps3: int | None = None,
                  qs: int = 0, bq: str | None = None,
                  lowercase_operators: bool = False) -> Query:
    """Parse a user query with edismax semantics into the engine AST.

    ``pf``/``pf2``/``pf3`` are phrase-boost weights (0 = off): the
    analyzed query terms as one whole phrase / word bigrams / word
    trigrams, added as SHOULD clauses so they boost but never restrict
    (ExtendedDismaxQParser.addShingledPhraseQueries). ``ps``/``ps2``/
    ``ps3`` are their slops (ps2/ps3 default to ps like the reference).
    ``bq`` is an additive boost query. ``mm`` is applied to the main
    query's top-level optional clauses per SolrPluginUtils.
    """
    if analyzer is None:
        from ..analysis import get_analyzer

        analyzer = get_analyzer("standard")
    text = _transform_lower_ops(text, to_upper=lowercase_operators)

    try:
        main = parse_query(text, analyzer)
    except Exception:
        main = _escaped_terms_query(text, analyzer)
    if qs:
        main = _apply_phrase_slop(main, qs)

    if mm is not None and isinstance(main, BooleanQuery) and main.should:
        main.min_should_match = calculate_min_should_match(
            len(main.should), mm)

    # phrase boosts run over the analyzed terms of the whole user text
    # with operators and quotes stripped (the reference rebuilds the
    # phrase from the parsed clauses' raw text)
    boosts: list[Query] = []
    if pf or pf2 or pf3:
        cleaned = _ESCAPE_RE.sub(" ", text)
        words = [w for w in cleaned.split()
                 if not _OPERATOR_WORD.match(w.upper())]
        terms, positions = analyzer.analyze(" ".join(words))
        if pf and len(terms) > 1:
            boosts.append(_phrase_of(terms, positions, ps, pf))
        if pf2 and len(terms) > 1:
            s2 = ps if ps2 is None else ps2
            for i in range(len(terms) - 1):
                boosts.append(_phrase_of(terms[i:i + 2],
                                         positions[i:i + 2], s2, pf2))
        if pf3 and len(terms) > 2:
            s3 = ps if ps3 is None else ps3
            for i in range(len(terms) - 2):
                boosts.append(_phrase_of(terms[i:i + 3],
                                         positions[i:i + 3], s3, pf3))
    if bq:
        bq_q = parse_query(bq, analyzer)
        if not isinstance(bq_q, MatchNoDocs):
            boosts.append(bq_q)

    if not boosts:
        return main
    # main query is REQUIRED, boosts are optional adders — exactly the
    # reference's outer BooleanQuery composition
    return BooleanQuery(must=[main], should=boosts)
