"""Deterministic synthetic conversation-transcript generator (FIXTURES.md §1).

Schema is exactly the BASELINE.json input_hint shape:
``conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp[us]``. Generation is seeded and vectorized; text draws from a
Zipf-distributed vocabulary (creating heavy, stopword-adjacent terms) with
edge-case strings injected at fixed intervals. Rows are written sorted by
``(conv_id, turn_idx)`` — the stable ordering whose rank defines ``doc_id``.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
ROLES = ("user", "assistant", "tool")
TOOLS = ("", "search", "bash", "browser")

# edge-case strings exercising analyzer corner cases (FIXTURES.md §2)
EDGE_STRINGS = (
    "ray-data map_batches v2.5, e.g. foo.bar",
    "mail a@b.co on 2026-08-17 at 12:30",
    "the and of to is",
    "日本語 text ひらがな カタカナ 한국어",
    "İstanbul STRASSE Σ O'Neill's",
    "x" * 300,
    "1,000 items cost $5.99 (50% off!)",
    "",
)


def _build_vocab() -> list[str]:
    """~2200-word vocabulary: stopwords (heavy), domain words (mid), rare tail."""
    stop = ["the", "and", "of", "to", "is", "a", "in", "that", "it", "for"]
    domain = [
        "ray", "data", "index", "query", "search", "engine", "batch", "actor",
        "shard", "merge", "segment", "term", "posting", "score", "rank",
        "token", "parse", "filter", "sort", "group", "join", "stream",
        "write", "read", "build", "run", "test", "error", "retry", "cache",
        "model", "train", "agent", "tool", "code", "file", "line", "text",
        "user", "turn", "answer", "question", "result", "table", "row",
        "column", "block", "node", "cluster", "task", "scale", "fast",
        "slow", "big", "small", "new", "old", "first", "last", "next",
    ]
    rare = [f"t{i:05d}" for i in range(2000)]
    return stop + domain + rare


VOCAB = _build_vocab()


def generate_transcripts(n_convs: int, seed: int = SEED) -> pa.Table:
    """Generate a transcripts table for ``n_convs`` conversations."""
    rng = np.random.default_rng(seed)
    conv_lens = 1 + (rng.integers(0, 12, size=n_convs)).astype(np.int64)
    n_turns = int(conv_lens.sum())

    conv_idx = np.repeat(np.arange(n_convs), conv_lens)
    turn_idx = (np.arange(n_turns) -
                np.repeat(np.concatenate(([0], np.cumsum(conv_lens)[:-1])), conv_lens))

    # words per turn: 3..30
    words_per_turn = rng.integers(3, 31, size=n_turns)
    total_words = int(words_per_turn.sum())
    # Zipf-ish sampling over the vocab: rank r with prob ~ 1/(r+10)
    ranks = np.arange(len(VOCAB))
    probs = 1.0 / (ranks + 10.0)
    probs /= probs.sum()
    word_ids = rng.choice(len(VOCAB), size=total_words, p=probs)
    vocab_arr = np.array(VOCAB, dtype=object)
    words = vocab_arr[word_ids]
    bounds = np.concatenate(([0], np.cumsum(words_per_turn)))
    texts = [" ".join(words[bounds[i]:bounds[i + 1]]) for i in range(n_turns)]
    # inject edge strings deterministically
    for k in range(0, n_turns, 53):
        texts[k] = texts[k] + " " + EDGE_STRINGS[(k // 53) % len(EDGE_STRINGS)]
    for k in range(17, n_turns, 101):  # a few pure edge-string turns
        texts[k] = EDGE_STRINGS[(k // 101) % len(EDGE_STRINGS)]

    roles = np.array(ROLES, dtype=object)[turn_idx % 3]
    tool_pick = rng.integers(0, 4, size=n_turns)
    tools = np.where(roles == "tool", np.array(TOOLS, dtype=object)[tool_pick], "")

    base = np.datetime64("2026-01-01T00:00:00", "us")
    ts = base + (np.arange(n_turns) * 17_000_000).astype("timedelta64[us]")

    return pa.table({
        "conv_id": pa.array([f"conv-{i:08d}" for i in conv_idx], type=pa.string()),
        "turn_idx": pa.array(turn_idx, type=pa.int32()),
        "role": pa.array(roles, type=pa.string()),
        "text": pa.array(texts, type=pa.string()),
        "tool": pa.array(tools, type=pa.string()),
        "ts": pa.array(ts, type=pa.timestamp("us")),
    })


SIZES = {"tiny": 50, "small": 2_000, "bench": 200_000, "large": 2_000_000}


def transcripts_path(size: str = "small", root: str | None = None,
                     seed: int = SEED) -> str:
    """Write (once, cached) and return the parquet path for a standard size."""
    n_convs = SIZES[size]
    root = root or os.environ.get("LSR_DATA_DIR", "/tmp/lsr_data")
    out = Path(root) / f"transcripts_{size}_seed{seed}"
    marker = out / "_SUCCESS"
    if not marker.exists():
        out.mkdir(parents=True, exist_ok=True)
        table = generate_transcripts(n_convs, seed)
        # fine-grained row groups: the fused build plans one task per
        # row-group span, so granularity here bounds load-balance quality
        pq.write_table(table, out / "part-0.parquet",
                       row_group_size=max(2048, len(table) // 128))
        marker.touch()
    return str(out / "part-0.parquet")
