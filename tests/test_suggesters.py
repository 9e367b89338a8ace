"""Analyzing / Fuzzy / Infix suggesters (lucene/suggest analog).

Semantics pinned against the reference javadocs/defaults:
AnalyzingSuggester.java:69-117 (analyzed-form keys, surface results,
exactFirst, weight-desc rank), FuzzySuggester.java:44-109 (maxEdits=1,
transpositions, nonFuzzyPrefix=1, minFuzzyLength=3),
AnalyzingInfixSuggester (inner tokens exact + last-token prefix,
<b> highlighting).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from lucene_solr_ray.search.suggest import (
    SEP_LABEL,
    AnalyzingInfixSuggester,
    AnalyzingSuggester,
    FreeTextSuggester,
    FuzzySuggester,
    _min_prefix_edit_distance,
    build_entries,
)


def _ds(rows):
    return rd.from_arrow(pa.table({
        "text": pa.array([r[0] for r in rows], type=pa.string()),
        "weight": pa.array([r[1] for r in rows], type=pa.int64()),
    }))


CORPUS = [
    ("The Ghost of Christmas Past", 50),
    ("ghost busters", 10),
    ("ghoul stories", 7),
    ("christmas carol", 30),
    ("submarine sandwich", 20),
    ("suburban trains", 15),
]


@pytest.fixture(scope="module")
def analyzing(ray_session):
    return AnalyzingSuggester.build(_ds(CORPUS), "text", "weight")


def test_analyzed_keys_join_with_sep(ray_session):
    entries = build_entries(_ds([("Ghost Busters", 3)]), "text", "weight")
    assert entries.column("key").to_pylist() == [f"ghost{SEP_LABEL}busters"]
    assert entries.column("surface").to_pylist() == ["Ghost Busters"]


def test_prefix_lookup_returns_surfaces_by_weight(analyzing):
    got = analyzing.lookup("gho", num=5)
    # ghost busters(10) and ghoul stories(7) both start with "gho";
    # "The Ghost..." keys as "the<SEP>ghost..." (stopwords keep positions
    # in the standard chain but "the" is a stopword => dropped token, key
    # starts at "ghost") — verify against the actual analyzed key
    surfaces = [s for s, _ in got]
    assert surfaces[0] in ("The Ghost of Christmas Past", "ghost busters")
    weights = [w for _, w in got]
    assert weights == sorted(weights, reverse=True)


def test_stopword_removal_matches_reference_example(ray_session):
    # class javadoc: with a stop filter, "ghost chr..." finds
    # "The Ghost of Christmas Past" when separators are not preserved
    sugg = AnalyzingSuggester.build(
        _ds(CORPUS), "text", "weight", preserve_sep=False)
    got = sugg.lookup("ghost chr", num=3)
    assert got and got[0][0] == "The Ghost of Christmas Past"


def test_empty_lookup_returns_nothing(analyzing):
    assert analyzing.lookup("", num=5) == []
    assert analyzing.lookup("the", num=5) == []  # analyzes to no tokens


def test_exact_first(ray_session):
    sugg = AnalyzingSuggester.build(
        _ds([("nine", 1), ("nine inch nails", 99)]), "text", "weight")
    # prefix "nine" matches both; higher-weight entry would win on
    # weight, but exactFirst pulls the exact analyzed form ahead
    assert sugg.lookup("nine", num=2)[0] == ("nine", 1)
    off = AnalyzingSuggester.build(
        _ds([("nine", 1), ("nine inch nails", 99)]), "text", "weight",
        exact_first=False)
    assert off.lookup("nine", num=2)[0] == ("nine inch nails", 99)


def test_max_surface_forms_cap(ray_session):
    rows = [(f"Cap {i}", i) for i in range(10)]
    # all analyze to distinct keys; force same key via same text casing
    rows = [("CAP", i) for i in range(10)]
    entries = build_entries(_ds(rows), "text", "weight",
                            max_surface_forms=3)
    assert entries.num_rows == 1  # identical (key,surface) dedup to max
    rows = [(f"cAp{'!' * 0}", i) for i in range(3)]
    # distinct surfaces, same analyzed key
    rows = [("cap", 5), ("Cap", 7), ("CAP", 9), ("cAp", 1)]
    entries = build_entries(_ds(rows), "text", "weight",
                            max_surface_forms=2)
    assert entries.num_rows == 2
    assert sorted(entries.column("weight").to_pylist()) == [7, 9]


def test_dedup_keeps_max_weight(ray_session):
    entries = build_entries(
        _ds([("same text", 3), ("same text", 11), ("same text", 5)]),
        "text", "weight")
    assert entries.num_rows == 1
    assert entries.column("weight").to_pylist() == [11]


def _reference_min_prefix_dl(query: str, key: str,
                             transpositions: bool) -> int:
    """Independent textbook restricted-Damerau DP (no early cuts, no
    vectorization): min over ALL prefixes of key of DL(query, prefix)."""
    n, m = len(query), len(key)
    dp = [[0] * (n + 1) for _ in range(m + 1)]
    for j in range(n + 1):
        dp[0][j] = j
    for i in range(1, m + 1):
        dp[i][0] = i
        for j in range(1, n + 1):
            cost = 0 if query[j - 1] == key[i - 1] else 1
            v = min(dp[i - 1][j] + 1, dp[i][j - 1] + 1,
                    dp[i - 1][j - 1] + cost)
            if (transpositions and i > 1 and j > 1
                    and query[j - 1] == key[i - 2]
                    and query[j - 2] == key[i - 1]):
                v = min(v, dp[i - 2][j - 2] + 1)
            dp[i][j] = v
    return min(dp[i][n] for i in range(m + 1))


def test_vectorized_dp_matches_textbook_dp():
    rng = np.random.default_rng(31)
    alphabet = list("abc")
    for _ in range(300):
        q = "".join(rng.choice(alphabet, size=rng.integers(0, 6)))
        k = "".join(rng.choice(alphabet, size=rng.integers(0, 9)))
        for tr in (True, False):
            ref = _reference_min_prefix_dl(q, k, tr)
            for cap in (1, 2, 3):
                got = _min_prefix_edit_distance(q, k, cap, tr)
                # early cuts may overshoot ONLY above the cap
                assert (got == ref) or (got > cap and ref > cap), \
                    (q, k, tr, cap, got, ref)


def test_min_prefix_edit_distance_kernel():
    # exact prefix -> 0
    assert _min_prefix_edit_distance("sub", "submarine", 2, True) == 0
    # one substitution against a prefix
    assert _min_prefix_edit_distance("sob", "submarine", 2, True) == 1
    # transposition = 1 edit when enabled, 2 otherwise
    assert _min_prefix_edit_distance("usb", "submarine", 2, True) == 1
    assert _min_prefix_edit_distance("usb", "submarine", 2, False) == 2
    # far off
    assert _min_prefix_edit_distance("zzz", "submarine", 1, True) > 1


@pytest.fixture(scope="module")
def fuzzy(ray_session):
    return FuzzySuggester.build(_ds(CORPUS), "text", "weight")


def test_fuzzy_matches_with_one_edit(fuzzy):
    # "sumbarine" = transposition of "submarine" -> matches (default
    # transpositions=true)
    got = fuzzy.lookup("sumbarine", num=5)
    assert ("submarine sandwich", 20) in got


def test_fuzzy_non_fuzzy_prefix_is_exact(fuzzy):
    # first char must match exactly (nonFuzzyPrefix=1): edit at char 0
    # never matches
    got = fuzzy.lookup("wubmarine", num=5)
    assert all(s != "submarine sandwich" for s, _ in got)


def test_fuzzy_short_queries_get_no_edits(fuzzy):
    # len(analyzed) < minFuzzyLength=3 -> pure prefix semantics
    assert fuzzy.lookup("sx", num=5) == []
    assert {s for s, _ in fuzzy.lookup("su", num=5)} == {
        "submarine sandwich", "suburban trains"}


def test_fuzzy_brute_force_oracle(ray_session):
    """Every reported match obeys the automaton definition: some prefix of
    the analyzed key (first nonFuzzyPrefix chars exact) within maxEdits of
    the analyzed query — and no qualifying entry is missed."""
    rng = np.random.default_rng(7)
    alphabet = list("abcd")
    rows = ["".join(rng.choice(alphabet, size=rng.integers(3, 8)))
            for _ in range(80)]
    ds = rd.from_arrow(pa.table({"text": pa.array(rows)}))
    sugg = FuzzySuggester.build(ds, "text")
    for q in ["abca", "bcda", "aab", "dcb", "abcd"]:
        got = {s for s, _ in sugg.lookup(q, num=1000)}
        expect = set()
        for surf in rows:
            key = surf  # single lowercase token: analyzed == surface
            if not key.startswith(q[:1]):
                continue
            if _min_prefix_edit_distance(q[1:], key[1:], 1, True) <= 1:
                expect.add(surf)
        assert got == expect, q


@pytest.fixture(scope="module")
def infix(ray_session):
    return AnalyzingInfixSuggester.build(_ds(CORPUS), "text", "weight")


def test_infix_matches_inner_tokens(infix):
    got = infix.lookup("christmas", num=5)
    assert [s for s, _ in got] == [
        "The Ghost of Christmas Past", "christmas carol"]


def test_infix_last_token_is_prefix_others_exact(infix):
    got = infix.lookup("christmas ca", num=5)
    assert [s for s, _ in got] == ["christmas carol"]
    # "chr" alone is a prefix everywhere it appears
    got = infix.lookup("chr", num=5)
    assert {s for s, _ in got} == {
        "The Ghost of Christmas Past", "christmas carol"}


def test_infix_all_terms_required_toggle(ray_session):
    sugg = AnalyzingInfixSuggester.build(
        _ds(CORPUS), "text", "weight", all_terms_required=False)
    got = sugg.lookup("ghost carol", num=10)
    surfaces = {s for s, _ in got}
    assert "ghost busters" in surfaces and "christmas carol" in surfaces


def test_infix_highlight(infix):
    got = infix.lookup("christmas ca", num=1, highlight=True)
    (surface, weight, marked) = got[0]
    assert marked == "<b>christmas</b> <b>ca</b>rol"


def test_infix_rank_by_weight(infix):
    got = infix.lookup("gho", num=5)
    weights = [w for _, w in got]
    assert weights == sorted(weights, reverse=True)


# ---- FreeTextSuggester (stupid-backoff n-gram LM) ----

FREETEXT_CORPUS = [
    ("foo bar", 1),
    ("foo bar", 1),
    ("foo baz", 1),
    ("bar qux", 1),
]
# tokens: foo x3, bar x3, baz x1, qux x1 -> totTokens = 8
# bigrams: foo|bar x2, foo|baz x1, bar|qux x1


@pytest.fixture(scope="module")
def freetext(ray_session):
    ds = rd.from_arrow(pa.table({
        "text": pa.array([t for t, _ in FREETEXT_CORPUS])}))
    return FreeTextSuggester.build(ds, "text", grams=2)


def test_freetext_counts_and_totals(freetext):
    S = FreeTextSuggester.NGRAM_SEP
    assert freetext.tot_tokens == 8
    assert freetext._counts[f"foo{S}bar"] == 2
    assert freetext._counts["foo"] == 3


def test_freetext_bigram_scores_exact(freetext):
    S = FreeTextSuggester.NGRAM_SEP
    got = freetext.lookup("foo b", num=5)
    # bigram model, context "foo" (count 3): bar 2/3, baz 1/3;
    # unigram fallback for prefix "b": "bar" already seen, "baz" seen
    assert got[0] == (f"foo{S}bar", pytest.approx(2 / 3))
    assert got[1] == (f"foo{S}baz", pytest.approx(1 / 3))
    assert len(got) == 2


def test_freetext_trailing_space_upgrades_context(freetext):
    S = FreeTextSuggester.NGRAM_SEP
    got = freetext.lookup("foo ", num=5)
    # predicts words AFTER foo, not words starting with foo
    assert [g for g, _ in got] == [f"foo{S}bar", f"foo{S}baz"]
    # without the space: completions of the partial token "foo"
    got2 = freetext.lookup("fo", num=5)
    assert [g for g, _ in got2] == ["foo"]
    assert got2[0][1] == pytest.approx(3 / 8)


def test_freetext_backoff_to_unigram(freetext):
    # context "qux" was never followed by anything: bigram model has no
    # qux|b* -> backoff 0.4; unigram model completes "b*"
    got = freetext.lookup("qux b", num=5)
    scores = dict(got)
    assert scores["bar"] == pytest.approx(0.4 * 3 / 8)
    assert scores["baz"] == pytest.approx(0.4 * 1 / 8)


def test_freetext_dedup_prefers_higher_order_model(freetext):
    S = FreeTextSuggester.NGRAM_SEP
    # "foo ba" -> bigram gives foo|bar, foo|baz; unigram would offer
    # bar, baz again but they are seen -> only bigram entries remain
    got = freetext.lookup("foo ba", num=10)
    assert {g for g, _ in got} == {f"foo{S}bar", f"foo{S}baz"}


def test_freetext_empty_and_unknown(freetext):
    assert freetext.lookup("", num=5) == []
    assert freetext.lookup("zzz", num=5) == []


# ---- BlendedInfixSuggester (position-blended scores) ----

BLEND_CORPUS = [
    ("wars alone", 10),        # starts with the query -> coeff 1
    ("galaxy far wars", 12),   # "wars" at position 2 -> linear 0.8
    ("star wars saga", 11),    # "wars" at position 1 -> linear 0.9
]


@pytest.fixture(scope="module")
def blended(ray_session):
    from lucene_solr_ray.search.suggest import BlendedInfixSuggester

    return BlendedInfixSuggester.build(_ds(BLEND_CORPUS), "text", "weight")


def test_blended_position_linear_reranks(blended):
    got = blended.lookup("wars", num=3)
    # raw weights would rank galaxy(12) first; blending flips it:
    # wars alone 10*1=10, star wars 11*0.9=9.9, galaxy 12*0.8=9.6
    assert [s for s, *_ in got] == [
        "wars alone", "star wars saga", "galaxy far wars"]
    assert [round(r[-1], 4) for r in got] == [10.0, 9.9, 9.6]


def test_blended_reciprocal(ray_session):
    from lucene_solr_ray.search.suggest import BlendedInfixSuggester

    sugg = BlendedInfixSuggester.build(
        _ds(BLEND_CORPUS), "text", "weight",
        blender_type="position_reciprocal")
    got = sugg.lookup("wars", num=3)
    scores = {s: round(r, 4) for s, _, r in got}
    # 1/(pos+1): galaxy 12/3=4, star wars 11/2=5.5, wars alone 10*1=10
    assert scores == {"wars alone": 10.0, "star wars saga": 5.5,
                      "galaxy far wars": 4.0}


def test_blended_prefix_of_query_keeps_weight(blended):
    # "wars al" -> "wars alone" starts with the raw query: coefficient 1
    got = blended.lookup("wars al", num=2)
    assert got[0][0] == "wars alone" and got[0][-1] == 10.0


# ---- store()/load() persistence ----

def test_save_load_roundtrip_analyzing_fuzzy(ray_session, tmp_path,
                                             analyzing):
    from lucene_solr_ray.search.suggest import (
        AnalyzingSuggester as A, FuzzySuggester as F,
        load_suggester, save_suggester)

    save_suggester(analyzing, str(tmp_path / "an"))
    loaded = load_suggester(str(tmp_path / "an"))
    assert isinstance(loaded, A)
    for q in ("gho", "chr", "sub", "nine"):
        assert loaded.lookup(q, num=5) == analyzing.lookup(q, num=5)

    fz = F(  # rebuild a fuzzy view over the same persisted dictionary
        __import__("pyarrow").parquet.read_table(
            tmp_path / "an" / "entries.parquet"))
    save_suggester(fz, str(tmp_path / "fz"))
    fz2 = load_suggester(str(tmp_path / "fz"))
    assert isinstance(fz2, F)
    assert fz2.lookup("sumbarine", num=5) == fz.lookup("sumbarine", num=5)


def test_save_load_roundtrip_freetext(ray_session, tmp_path, freetext):
    from lucene_solr_ray.search.suggest import (
        FreeTextSuggester as FT, load_suggester, save_suggester)

    save_suggester(freetext, str(tmp_path / "ft"))
    loaded = load_suggester(str(tmp_path / "ft"))
    assert isinstance(loaded, FT)
    assert loaded.tot_tokens == freetext.tot_tokens
    for q in ("foo b", "foo ", "qux b"):
        assert loaded.lookup(q, num=5) == freetext.lookup(q, num=5)


def test_save_load_roundtrip_blended(ray_session, tmp_path, blended):
    from lucene_solr_ray.search.suggest import (
        BlendedInfixSuggester as B, load_suggester, save_suggester)

    save_suggester(blended, str(tmp_path / "bl"))
    loaded = load_suggester(str(tmp_path / "bl"))
    assert isinstance(loaded, B)
    assert loaded.lookup("wars", num=3) == blended.lookup("wars", num=3)
