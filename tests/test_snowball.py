"""Snowball stemmers vs the reference's full TestSnowballVocab goldens
(lucene/analysis/common/src/test/.../snowball/TestSnowballVocabData.zip):
every vocabulary word must stem to exactly the reference output."""

import io
import zipfile

import pytest

from lucene_solr_ray.analysis.snowball import SNOWBALL_STEMS

ZIP = ("/root/reference/lucene/analysis/common/src/test/org/apache/"
       "lucene/analysis/snowball/TestSnowballVocabData.zip")


def _vocab(lang: str):
    with zipfile.ZipFile(ZIP) as z:
        # splitlines, not split: the porter golden stems 's' to the
        # EMPTY string, which split() would silently drop
        voc = io.TextIOWrapper(z.open(f"{lang}/voc.txt"),
                               encoding="utf-8").read().splitlines()
        out = io.TextIOWrapper(z.open(f"{lang}/output.txt"),
                               encoding="utf-8").read().splitlines()
        while voc and voc[-1] == "":     # trailing blank lines only
            voc.pop()
        while out and len(out) > len(voc):
            out.pop()
    assert len(voc) == len(out) and len(voc) > 10000
    return voc, out


@pytest.mark.parametrize("lang", sorted(SNOWBALL_STEMS))
def test_full_vocab_golden(lang):
    stem = SNOWBALL_STEMS[lang]
    voc, out = _vocab(lang)
    bad = [(v, o, stem(v)) for v, o in zip(voc, out) if stem(v) != o]
    assert not bad, (len(bad), bad[:10])


def test_registered_chains():
    from lucene_solr_ray.analysis import get_analyzer

    a = get_analyzer("german_stemmed")
    assert a.analyze_terms("Die Bäuerinnen arbeiten") == \
        ["die", "bauerinn", "arbeit"]
    f = get_analyzer("french_stemmed")
    assert f.analyze_terms("les bibliothèques nationales") == \
        ["le", "bibliothequ", "national"]
    s = get_analyzer("spanish_stemmed")
    # 'rap' is the reference golden for rápidas (TestSnowballVocabData)
    assert s.analyze_terms("las comunicaciones rápidas") == \
        ["las", "comun", "rap"]
