"""SimpleQueryParser: structural expectations transcribed from the
reference's TestSimpleQueryParser.java (default operator MUST, like its
parse() helper), plus a never-throws fuzz."""

import pytest

from lucene_solr_ray.analysis import StandardAnalyzer
from lucene_solr_ray.search.query import (
    BooleanQuery,
    FuzzyQuery,
    MatchAllDocsQuery,
    MatchNoDocs,
    PhraseQuery,
    PrefixQuery,
    TermQuery,
)
from lucene_solr_ray.search.simpleparser import (
    PREFIX_OPERATOR,
    parse_simple,
)

AN = StandardAnalyzer()


def parse(text, **kw):
    return parse_simple(text, AN, default_operator="must", **kw)


def T(t):
    return TermQuery(t, 1.0)


def test_term():
    assert parse("foobar") == T("foobar")


def test_fuzzy():
    assert parse("foobar~2") == FuzzyQuery(term="foobar", max_edits=2)
    assert parse("foobar~") == T("foobar")
    assert parse("foobar~a") == T("foobar")
    assert parse("foobar~1a") == T("foobar")
    # over-max fuzziness clamps to 2 (TestSimpleQueryParser testFuzzy)
    assert parse("foo~3 bar") == BooleanQuery(
        must=[FuzzyQuery(term="foo", max_edits=2), T("bar")])


def test_phrase_and_slop():
    foo_bar = PhraseQuery(("foo", "bar"), (0, 1))
    assert parse('"foo bar"') == foo_bar
    assert parse('"foo bar"~2') == PhraseQuery(("foo", "bar"), (0, 1),
                                               slop=2)
    assert parse('"foo bar"~10') == PhraseQuery(("foo", "bar"), (0, 1),
                                                slop=10)
    assert parse('"foo bar"~') == foo_bar
    assert parse('"foo bar"~a') == foo_bar
    assert parse('"foo bar"~1a') == foo_bar
    assert parse('"foo bar"~-1') == foo_bar
    assert parse('"foo bar"~12 baz') == BooleanQuery(
        must=[PhraseQuery(("foo", "bar"), (0, 1), slop=12), T("baz")])


def test_prefix():
    assert parse("foobar*") == PrefixQuery(prefix="foobar")
    # inner '*' is part of the prefix (testCrazyPrefixes1)
    assert parse("st*ar*") == PrefixQuery(prefix="st*ar")
    # escaped trailing '*' is NOT a prefix operator
    assert not isinstance(parse("star\\*"), PrefixQuery)


def test_and_or_not():
    assert parse("foo+bar") == BooleanQuery(must=[T("foo"), T("bar")])
    assert parse("foo bar") == BooleanQuery(must=[T("foo"), T("bar")])
    assert parse("foo|bar") == BooleanQuery(should=[T("foo"), T("bar")])
    assert parse("foo||bar") == BooleanQuery(should=[T("foo"), T("bar")])
    negated = BooleanQuery(should=[MatchAllDocsQuery()],
                           must_not=[T("foo")])
    assert parse("-foo") == negated
    assert parse("-(foo)") == negated
    assert parse("---foo") == negated      # odd count stays negated
    assert parse("----foo") == T("foo")    # double negation cancels


def test_right_to_left_precedence():
    # testComplex00: star|wars empire == (star OR wars) AND empire
    inner = BooleanQuery(should=[T("star"), T("wars")])
    expected = BooleanQuery(must=[inner, T("empire")])
    assert parse("star|wars empire") == expected
    assert parse("star|wars + empire") == expected
    assert parse("star| + wars + ----empire |") == expected
    # testComplex01: star wars | empire == (star AND wars) OR empire
    inner = BooleanQuery(must=[T("star"), T("wars")])
    expected = BooleanQuery(should=[inner, T("empire")])
    assert parse("star wars | empire") == expected
    assert parse("star + wars|empire") == expected


def test_parens():
    # testComplex04: (star wars) | empire | (strikes back)
    inner = BooleanQuery(must=[T("star"), T("wars")])
    inner2 = BooleanQuery(must=[T("strikes"), T("back")])
    expected = BooleanQuery(should=[inner, T("empire"), inner2])
    assert parse("(star wars) | empire | (strikes back)") == expected
    assert parse("(star + wars) |empire | (strikes + back)") == expected


def test_garbage_never_throws():
    star = T("star")
    for s in ("star", "star\n", "star\r", "star\t", "star(", "star)",
              'star"', "\t \r\n\nstar   \n \r \t ", '- + "" - star \\'):
        assert parse(s) == star, repr(s)
    for s in ("", "  ", "+", "-", "|", "(", ")", '"', "\\", "+-|()\""):
        assert isinstance(parse(s), MatchNoDocs), repr(s)


def test_flags_disable_operators():
    # with PREFIX disabled, a trailing '*' is literal (analysis strips it)
    q = parse("foobar*", flags=-1 & ~PREFIX_OPERATOR)
    assert not isinstance(q, PrefixQuery)


def test_fuzz_never_raises():
    import random

    rng = random.Random(7)
    alphabet = 'ab +|-"()\\~*c3'
    for _ in range(500):
        s = "".join(rng.choice(alphabet)
                    for _ in range(rng.randrange(0, 24)))
        parse(s)  # must not raise
