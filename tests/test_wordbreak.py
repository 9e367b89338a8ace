"""WordBreakSpellChecker: break run-on words / combine adjacent words
(WordBreakSpellChecker.java:92-306)."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.index.build import build_index
from lucene_solr_ray.search.searcher import IndexSearcher
from lucene_solr_ray.search.wordbreak import (
    suggest_word_breaks,
    suggest_word_combinations,
)


@pytest.fixture(scope="module")
def wb(ray_session, tmp_path_factory):
    docs = (["data base systems run", "the data layer holds state",
             "base rates move", "helloworld demo app",
             "hello there world", "ray data engine"] * 20)
    root = tmp_path_factory.mktemp("wb")
    src = root / "src.parquet"
    n = len(docs)
    pq.write_table(pa.table({
        "conv_id": [f"c{i:05d}" for i in range(n)],
        "turn_idx": pa.array([0] * n, type=pa.int32()),
        "role": ["user"] * n,
        "text": docs,
        "tool": [""] * n,
        "ts": pa.array([0] * n, type=pa.timestamp("us")),
    }), src)
    out = root / "idx"
    build_index(str(src), str(out), num_shards=3)
    return IndexSearcher(str(out))


def test_word_breaks_basic(wb):
    got = suggest_word_breaks(wb, "database")
    assert got and got[0]["words"] == ["data", "base"]
    assert got[0]["changes"] == 1
    assert all(f > 0 for f in got[0]["freqs"])
    # no valid split -> empty
    assert suggest_word_breaks(wb, "zzqqxxyy") == []


def test_word_breaks_multi_change(wb):
    # 'databaserates' needs two breaks: data | base | rates
    assert suggest_word_breaks(wb, "databaserates", max_changes=1) == []
    got = suggest_word_breaks(wb, "databaserates", max_changes=2)
    assert any(s["words"] == ["data", "base", "rates"] for s in got)


def test_word_breaks_min_freq(wb):
    # raising the frequency floor above 'base' df kills the split
    df_base = wb.global_df(__import__(
        "lucene_solr_ray.search.query",
        fromlist=["TermQuery"]).TermQuery("base"))["base"]
    got = suggest_word_breaks(wb, "database", min_freq=df_base + 1)
    assert got == []


def test_word_combinations(wb):
    got = suggest_word_combinations(wb, ["hello", "world", "demo"])
    assert got and got[0]["word"] == "helloworld"
    assert got[0]["indexes"] == [0, 1]
    assert got[0]["freq"] == 20
    # window cap: non-adjacent words never combine
    assert all(s["word"] != "hellodemo" for s in got)
    # nothing to combine
    assert suggest_word_combinations(wb, ["ray", "base"]) == []


def test_evaluation_budget(wb):
    # a tiny budget stops the scan without error
    got = suggest_word_breaks(wb, "database", max_evaluations=1)
    assert isinstance(got, list)
