"""IndexBased/FileBased spelling index (classic SpellChecker n-gram
index + LevensteinDistance ranking)."""

import pytest

from lucene_solr_ray.search.spellindex import (
    SpellingIndex,
    levenshtein,
    string_distance,
)


def test_levenshtein_and_distance():
    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein("", "abc") == 3
    assert string_distance("abcd", "abcd") == 1.0
    assert string_distance("abcd", "abcx") == 0.75


@pytest.fixture()
def idx():
    words = ["search", "searching", "searcher", "sears", "sharp",
             "share", "charge", "merge", "emerge", "surge"]
    import numpy as np

    # descending freqs: 'search' is the most popular dictionary word
    return SpellingIndex(words, np.arange(10 + len(words), 10, -1))


def test_suggest_basic(idx):
    # substitution typo sharing grams ("serach"-style transpositions
    # share no trigram with the target — the reference's known
    # candidate-retrieval blind spot, same here by construction)
    got = idx.suggest("searsh", k=3)
    assert got and got[0][0] == "search"
    # accuracy filter: all results at >= 0.5 similarity
    assert all(d >= 0.5 for _, d, _ in got)


def test_input_word_excluded_and_popularity_gate(idx):
    got = idx.suggest("search", k=5)
    assert all(w != "search" for w, _, _ in got)
    # more_popular_than: only words strictly more frequent qualify
    got2 = idx.suggest("searsh", k=5, more_popular_than=19)
    assert got2 and all(f > 19 for _, _, f in got2)


def test_accuracy_threshold(idx):
    loose = idx.suggest("searsh", k=10, accuracy=0.3)
    tight = idx.suggest("searsh", k=10, accuracy=0.8)
    assert len(tight) <= len(loose)
    assert {w for w, _, _ in tight} <= {w for w, _, _ in loose}


def test_file_based(tmp_path):
    p = tmp_path / "dict.txt"
    p.write_text("# comment\nalpha\nalphabet\t7\nalpine\n\nbeta\n")
    idx = SpellingIndex.from_file(str(p))
    assert "alphabet" in idx.words
    assert idx.freqs[idx.words.index("alphabet")] == 7
    got = idx.suggest("alpah", k=2)
    assert got and got[0][0] == "alpha"


def test_save_load_roundtrip(tmp_path, idx):
    p = tmp_path / "spell.parquet"
    idx.save(str(p))
    re = SpellingIndex.load(str(p))
    assert re.suggest("searsh", k=3) == idx.suggest("searsh", k=3)


def test_index_based_from_searcher(ray_session, tmp_path):
    """Dictionary from the real index term dictionary with a relative-df
    threshold (HighFrequencyDictionary): low-frequency typo-like terms
    never become suggestions at a positive threshold."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_solr_ray.data.transcripts import generate_transcripts
    from lucene_solr_ray.index.build import build_index
    from lucene_solr_ray.search.searcher import IndexSearcher
    from lucene_solr_ray.search.spellindex import index_based_spellchecker

    t = generate_transcripts(200, seed=4)
    texts = t.column("text").to_pylist()
    texts[0] += " zzuniquetypo"          # df == 1
    t = t.set_column(t.column_names.index("text"), "text", pa.array(texts))
    src = tmp_path / "s.parquet"
    pq.write_table(t, src)
    build_index(str(src), str(tmp_path / "idx"), num_shards=2)
    s = IndexSearcher(str(tmp_path / "idx"))

    all_terms = index_based_spellchecker(s, 0.0)
    assert "zzuniquetypo" in all_terms.words
    thresh = index_based_spellchecker(s, 0.01)
    assert "zzuniquetypo" not in thresh.words
    assert len(thresh.words) > 10
    # a real suggestion round trip against a common index term
    common = max(zip(all_terms.freqs, all_terms.words))[1]
    typo = common[:-1] + ("x" if common[-1] != "x" else "y")
    got = thresh.suggest(typo, k=3)
    assert any(w == common for w, _, _ in got), (common, typo, got)
    # cache round trip
    c1 = index_based_spellchecker(s, 0.01, cache_dir=str(tmp_path / "c"))
    c2 = index_based_spellchecker(s, 0.01, cache_dir=str(tmp_path / "c"))
    assert c1.words == c2.words
