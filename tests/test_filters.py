"""Token-filter chain tests: Porter vectors, folding, grams, shingles,
synonyms, custom-chain round trip through the index."""

import pytest

from lucene_solr_ray.analysis import get_analyzer
from lucene_solr_ray.analysis.filters import (
    CustomAnalyzer,
    ascii_folding_filter,
    lowercase_filter,
    make_edge_ngram_filter,
    make_ngram_filter,
    make_shingle_filter,
    make_stop_filter,
    make_synonym_filter,
    porter_stem,
    porter_stem_filter,
)

# Porter's published vocabulary examples (Porter 1980, public description)
PORTER_VECTORS = [
    ("caresses", "caress"), ("ponies", "poni"), ("ties", "ti"),
    ("caress", "caress"), ("cats", "cat"), ("feed", "feed"),
    ("agreed", "agre"), ("plastered", "plaster"), ("bled", "bled"),
    ("motoring", "motor"), ("sing", "sing"), ("conflated", "conflat"),
    ("troubled", "troubl"), ("sized", "size"), ("hopping", "hop"),
    ("tanned", "tan"), ("falling", "fall"), ("hissing", "hiss"),
    ("fizzed", "fizz"), ("failing", "fail"), ("filing", "file"),
    ("happy", "happi"), ("sky", "sky"), ("relational", "relat"),
    ("conditional", "condit"), ("rational", "ration"),
    ("digitizer", "digit"), ("operator", "oper"),
    ("feudalism", "feudal"), ("decisiveness", "decis"),
    ("hopefulness", "hope"), ("callousness", "callous"),
    ("formaliti", "formal"), ("triplicate", "triplic"),
    ("formative", "form"), ("formalize", "formal"),
    ("electriciti", "electr"), ("electrical", "electr"),
    ("hopeful", "hope"), ("goodness", "good"), ("revival", "reviv"),
    ("allowance", "allow"), ("inference", "infer"),
    ("airliner", "airlin"), ("adjustable", "adjust"),
    ("defensible", "defens"), ("replacement", "replac"),
    ("adjustment", "adjust"), ("dependent", "depend"),
    ("adoption", "adopt"), ("communism", "commun"),
    ("activate", "activ"), ("effective", "effect"),
    ("probate", "probat"), ("rate", "rate"), ("cease", "ceas"),
    ("controll", "control"), ("roll", "roll"),
]


@pytest.mark.parametrize("word,expected", PORTER_VECTORS)
def test_porter_vectors(word, expected):
    assert porter_stem(word) == expected


def test_ascii_folding():
    toks = [("café", 0), ("Łódź", 1), ("straße", 2), ("plain", 3)]
    out = ascii_folding_filter(toks)
    assert out == [("cafe", 0), ("Lodz", 1), ("strasse", 2), ("plain", 3)]


def test_ngram_filter():
    out = make_ngram_filter(2, 3)([("abcd", 5)])
    assert out == [("ab", 5), ("bc", 5), ("cd", 5),
                   ("abc", 5), ("bcd", 5)]


def test_edge_ngram_filter():
    out = make_edge_ngram_filter(1, 3)([("abcd", 2)])
    assert out == [("a", 2), ("ab", 2), ("abc", 2)]


def test_shingle_filter():
    toks = [("a", 0), ("b", 1), ("c", 2)]
    out = make_shingle_filter(2)(toks)
    assert ("a b", 0) in out and ("b c", 1) in out
    assert ("a", 0) in out  # unigrams kept
    out2 = make_shingle_filter(2, output_unigrams=False)(toks)
    assert out2 == [("a b", 0), ("b c", 1)]


def test_synonym_filter():
    f = make_synonym_filter({"fast": ["quick", "rapid"]})
    out = f([("fast", 0), ("car", 1)])
    assert out == [("fast", 0), ("quick", 0), ("rapid", 0), ("car", 1)]


def test_custom_chain_analyze():
    a = CustomAnalyzer([lowercase_filter, make_stop_filter(),
                        porter_stem_filter])
    terms, positions = a.analyze("The Engines are Running quickly")
    assert terms == ["engin", "run", "quickli"]
    assert positions == [1, 3, 4]  # holes where stopwords were


def test_registry_resolves_custom_chains():
    a = get_analyzer("english_stemmed")
    assert a.analyze_terms("the indexes merging") == ["index", "merg"]


def test_stemmed_index_round_trip(ray_session, tmp_path):
    """A custom chain flows through build_index + search unchanged."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_solr_ray.index.build import build_index
    from lucene_solr_ray.search.searcher import IndexSearcher

    rows = [("c-0", 0, "the engines are running"),
            ("c-1", 0, "an engine runs fast"),
            ("c-2", 0, "nothing relevant here")]
    t = pa.table({
        "conv_id": pa.array([r[0] for r in rows]),
        "turn_idx": pa.array([r[1] for r in rows], type=pa.int32()),
        "text": pa.array([r[2] for r in rows]),
    })
    src = tmp_path / "docs.parquet"
    pq.write_table(t, src)
    out = tmp_path / "idx"
    build_index(str(src), str(out), num_shards=1,
                analyzer="english_stemmed")
    s = IndexSearcher(str(out))
    # "engine" and "engines" both stem to "engin": query-side chain matches
    hits = s.search("engines", k=10)
    assert {d for d, _ in hits} == {0, 1}


# --- round-2 filter additions ---

def test_trim_filter():
    from lucene_solr_ray.analysis.filters import trim_filter

    assert trim_filter([(" ab ", 0), ("  ", 1), ("c", 2)]) == \
        [("ab", 0), ("c", 2)]


def test_reverse_string_filter():
    from lucene_solr_ray.analysis.filters import reverse_string_filter

    assert reverse_string_filter([("abc", 0), ("x", 1)]) == \
        [("cba", 0), ("x", 1)]


def test_truncate_filter():
    from lucene_solr_ray.analysis.filters import make_truncate_filter

    f = make_truncate_filter(3)
    assert f([("abcdef", 0), ("ab", 1)]) == [("abc", 0), ("ab", 1)]


def test_limit_token_count_filter():
    from lucene_solr_ray.analysis.filters import make_limit_token_count_filter

    f = make_limit_token_count_filter(2)
    assert f([("a", 0), ("b", 1), ("c", 2)]) == [("a", 0), ("b", 1)]


def test_pattern_replace_filter():
    from lucene_solr_ray.analysis.filters import make_pattern_replace_filter

    f = make_pattern_replace_filter(r"[0-9]+", "#")
    assert f([("ab12cd", 0), ("345", 1)]) == [("ab#cd", 0), ("#", 1)]
    g = make_pattern_replace_filter(r".*", "")
    assert g([("gone", 0)]) == []  # emptied tokens drop


def test_keyword_marker_stem_filter():
    from lucene_solr_ray.analysis.filters import (
        make_keyword_marker_stem_filter,
        porter_stem,
    )

    f = make_keyword_marker_stem_filter({"running"})
    assert f([("running", 0), ("jumping", 1)]) == \
        [("running", 0), (porter_stem("jumping"), 1)]


def test_new_filters_compose_in_chain():
    from lucene_solr_ray.analysis.filters import (
        CustomAnalyzer,
        lowercase_filter,
        make_pattern_replace_filter,
        make_truncate_filter,
    )

    an = CustomAnalyzer([lowercase_filter,
                         make_pattern_replace_filter(r"[0-9]", ""),
                         make_truncate_filter(4)])
    terms, positions = an.analyze("Hello99 WORLDWIDE x1")
    assert terms == ["hell", "worl", "x"]
    assert positions == [0, 1, 2]


def test_decimal_digit_filter():
    from lucene_solr_ray.analysis.filters import decimal_digit_filter

    # Arabic-Indic and Devanagari digits fold to ASCII
    out = decimal_digit_filter([("١٢٣", 0), ("abc42", 1),
                                ("१22", 2)])
    assert out == [("123", 0), ("abc42", 1), ("122", 2)]


def test_apostrophe_filter():
    from lucene_solr_ray.analysis.filters import apostrophe_filter

    out = apostrophe_filter([("turkiye'nin", 0), ("plain", 1),
                             ("rock’n", 2), ("'lead", 3)])
    assert out == [("turkiye", 0), ("plain", 1), ("rock", 2)]


def test_keep_word_filter():
    from lucene_solr_ray.analysis.filters import make_keep_word_filter

    f = make_keep_word_filter({"ray", "data"})
    assert f([("ray", 0), ("big", 1), ("data", 2)]) == \
        [("ray", 0), ("data", 2)]


def test_stemmer_override_filter():
    from lucene_solr_ray.analysis.filters import (
        make_stemmer_override_filter,
        porter_stem,
    )

    f = make_stemmer_override_filter({"running": "sprint"})
    out = f([("running", 0), ("jumping", 1)])
    assert out[0] == ("sprint", 0)
    assert out[1] == (porter_stem("jumping"), 1)


def test_icu_normalize_filter():
    """NFKC + casefold (ICUNormalizer2Filter's nfkc_cf default):
    compatibility forms fold, case folds beyond simple lowercase."""
    from lucene_solr_ray.analysis.filters import icu_normalize_filter

    toks = [("ＦＵＬＬＷＩＤＴＨ", 0), ("ﬁle", 1), ("STRASSE", 2),
            ("Straße", 3), ("½", 4)]
    out = icu_normalize_filter(toks)
    assert out == [("fullwidth", 0), ("file", 1), ("strasse", 2),
                   ("strasse", 3), ("1⁄2", 4)]


def test_common_grams_filter():
    """CommonGramsFilter: bigram emitted at the first word's position
    when either member is common; no gram across a position hole."""
    from lucene_solr_ray.analysis.filters import make_common_grams_filter

    f = make_common_grams_filter(common={"the", "of"})
    out = f([("the", 0), ("who", 1), ("sound", 2), ("of", 3), ("music", 4)])
    assert out == [("the", 0), ("the_who", 0), ("who", 1), ("sound", 2),
                   ("sound_of", 2), ("of", 3), ("of_music", 3),
                   ("music", 4)]
    # hole (stopword removed earlier): positions 0,2 adjacent-in-list but
    # not adjacent-in-position -> no bigram
    assert f([("the", 0), ("music", 2)]) == [("the", 0), ("music", 2)]


def test_new_chains_registered():
    from lucene_solr_ray.analysis.filters import CUSTOM_CHAINS

    terms, _ = CUSTOM_CHAINS["icu_folded"].analyze("Ｔｈｅ ﬁle")
    assert terms == ["the", "file"]
    terms, pos = CUSTOM_CHAINS["common_grams"].analyze("The Who rocks")
    assert "the_who" in terms
