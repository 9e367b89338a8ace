"""CLI round trip: build -> check -> search -> update via module entry."""

import json

from lucene_solr_ray.cli import main
from lucene_solr_ray.data.transcripts import transcripts_path


def test_cli_build_check_search(ray_session, tmp_path, capsys):
    src = transcripts_path("tiny")
    idx = str(tmp_path / "idx")
    assert main(["build", src, idx, "--num-shards", "2"]) == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["shards"] == 2 and out["stats"]["num_docs"] > 0

    assert main(["check", idx]) == 0
    assert json.loads(capsys.readouterr().out.strip())["status"] == "ok"

    assert main(["search", idx, "ray AND data", "-k", "5"]) == 0
    hits = json.loads(capsys.readouterr().out.strip())
    assert hits and {"doc_id", "score", "conv_id", "turn_idx"} <= set(hits[0])
