"""Incremental index updates: the TopicStream / NRT-reopen analog.

Reference semantics re-expressed (SURVEY.md §2.10, §1.5): new documents
arrive append-only past a checkpoint (TopicStream's ``_version_``
watermark, ``solr/solrj/.../io/stream/TopicStream.java``); they are
tokenized into new runs, and the term shuffle touches ONLY the shards the
new doc_id range lands in. A partially-filled tail shard is merged with
its existing segment — the log-structured merge (TieredMergePolicy /
mtree-merge analog, MapReduceIndexerTool.java:330-338) — and the manifest
generation is bumped (SegmentInfos.java:55-140 two-phase publish). Global
statistics are recomputed exactly, so post-update scores equal a
from-scratch build's (asserted in tests).
"""

from __future__ import annotations

import functools
import json
import os
import shutil
import time
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data as rd

from ..search import bm25
from . import segment
from .build import (
    MANIFEST_NAME,
    SegmentWriter,
    TokenizeStage,
    _explode_runs,
    _manifest_row_table,
    compute_stats,
    read_manifest,
)


@ray.remote
def _add_doc_ids_from(block: pa.Table, offset: int, docs_per_shard: int) -> pa.Table:
    doc_id = np.arange(offset, offset + block.num_rows, dtype=np.int64)
    block = block.append_column("doc_id", pa.array(doc_id, type=pa.int64()))
    return block.append_column(
        "doc_shard", pa.array(doc_id // docs_per_shard, type=pa.int32()))


def _decode_segment_to_postings(terms_file: Path, base: int) -> pa.Table:
    """Existing segment -> posting rows (term, doc_id, freq, positions)."""
    t = pq.read_table(terms_file)
    terms_out, docs_out, freqs_out, pos_lists = [], [], [], []
    for i in range(t.num_rows):
        docs = segment.decode_doc_ids(t.column("doc_ids_enc")[i].as_py(), base)
        freqs = segment.decode_freqs(t.column("freqs_enc")[i].as_py())
        flat, offs = segment.decode_positions(
            t.column("positions_enc")[i].as_py(), freqs)
        term = t.column("term")[i].as_py()
        terms_out.extend([term] * len(docs))
        docs_out.append(docs)
        freqs_out.append(freqs)
        pos_lists.append((flat, offs))
    if not terms_out:
        return None
    docs_np = np.concatenate(docs_out)
    freqs_np = np.concatenate(freqs_out)
    flat_all = np.concatenate([f for f, _ in pos_lists]) if pos_lists else np.empty(0)
    pos_offsets = np.concatenate(([0], np.cumsum(freqs_np)))
    return pa.table({
        "term": pa.array(terms_out, type=pa.string()).dictionary_encode(),
        "doc_id": pa.array(docs_np, type=pa.int64()),
        "freq": pa.array(freqs_np, type=pa.int64()),
        "positions": pa.LargeListArray.from_arrays(
            pos_offsets.astype(np.int64),
            pa.array(flat_all.astype(np.int32), type=pa.int32())),
    })


class MergingSegmentWriter(SegmentWriter):
    """SegmentWriter that first folds in an existing shard segment."""

    def __call__(self, group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return _manifest_row_table([])
        shard_id = int(group.column("doc_shard")[0].as_py())
        shard_dir = Path(self.index_dir) / "shards" / f"shard={shard_id:05d}"
        terms_file = shard_dir / "terms.parquet"
        if terms_file.exists():
            base = shard_id * self.docs_per_shard
            old = _decode_segment_to_postings(terms_file, base)
            if old is not None:
                # old postings need norm_byte for block-max: look them up
                # from the new group's shard norms at encode time; reuse 0
                # (impact bound stays positive; block_max is advisory)
                norms_part = (Path(self.index_dir) / "norms" /
                              f"doc_shard={shard_id}")
                norm_arr = np.zeros(self.docs_per_shard, dtype=np.uint8)
                if norms_part.exists():
                    nt = pq.read_table(norms_part, columns=["doc_id", "norm_byte"])
                    ids = nt.column("doc_id").to_numpy(zero_copy_only=False)
                    norm_arr[ids - base] = nt.column("norm_byte").to_numpy(
                        zero_copy_only=False)
                old_docs = old.column("doc_id").to_numpy(zero_copy_only=False)
                old = old.append_column(
                    "doc_shard",
                    pa.array(np.full(old.num_rows, shard_id, dtype=np.int32),
                             type=pa.int32()))
                old = old.append_column(
                    "norm_byte",
                    pa.array(norm_arr[old_docs - base], type=pa.uint8()))
                group = pa.concat_tables(
                    [old.select(group.column_names), group])
            # remove the old segment so the parent write path can replace it
            shutil.rmtree(shard_dir)
        return super().__call__(group)


def update_index(index_dir: str, source: str | rd.Dataset, *,
                 batch_size: int = 4096, concurrency: int | None = None) -> dict:
    """Append new (later-keyed) documents to an existing index."""
    index_path = Path(index_dir)
    manifest = read_manifest(index_dir)
    params = manifest["params"]
    docs_per_shard = params["docs_per_shard"]
    base_doc = manifest["stats"]["num_docs"]

    from .build import ds_select

    if isinstance(source, str):
        import pyarrow.dataset as _pads

        from .build import DOCVALUE_FIELDS

        src_fields = {f.name for f in _pads.dataset(source).schema}
        extra = [c for c in DOCVALUE_FIELDS if c in src_fields]
        ds = rd.read_parquet(source,
                             columns=["conv_id", "turn_idx", "text"] + extra)
    else:
        ds = ds_select(source)

    # append-only checkpoint check (TopicStream watermark semantics)
    checkpoint = manifest.get("checkpoint")
    if checkpoint is not None:
        first = ds.take(1)[0]
        if (first["conv_id"], int(first["turn_idx"])) <= tuple(checkpoint):
            raise ValueError(
                f"update must be past checkpoint {checkpoint}, got "
                f"({first['conv_id']}, {first['turn_idx']})")

    mat = ds.materialize()
    refs = mat.to_arrow_refs()
    counts = ray.get([_count_rows.remote(r) for r in refs])
    offsets = np.concatenate(([0], np.cumsum(counts))) + base_doc
    new_refs = [
        _add_doc_ids_from.remote(r, int(offsets[i]), docs_per_shard)
        for i, r in enumerate(refs)
    ]
    ds = rd.from_arrow_refs(new_refs)

    if concurrency is None:
        concurrency = max(2, int(ray.cluster_resources().get("CPU", 4)) - 1)

    runs_dir = index_path / f"runs_update_{manifest['version'] + 1}"
    tokenized = ds.map_batches(
        TokenizeStage,
        fn_constructor_kwargs={"analyzer_name": params["analyzer"]},
        batch_format="pyarrow", batch_size=batch_size,
        zero_copy_batch=True, concurrency=concurrency)
    tokenized.write_parquet(str(runs_dir))

    # exact updated global stats
    delta = compute_stats(rd.read_parquet(str(runs_dir), columns=["doc_len"]))
    stats = manifest["stats"]
    new_stats = {
        "num_docs": stats["num_docs"] + delta["num_docs"],
        "doc_count": stats["doc_count"] + delta["doc_count"],
        "sum_total_term_freq":
            stats["sum_total_term_freq"] + delta["sum_total_term_freq"],
    }
    new_stats["avgdl"] = float(bm25.avg_field_length(
        new_stats["sum_total_term_freq"], max(new_stats["doc_count"], 1)))

    # append norms for the new docs
    import pyarrow.dataset as _pads

    from .build import DOCVALUE_FIELDS

    runs_fields = {f.name for f in _pads.dataset(str(runs_dir)).schema}
    ncols = (["doc_id", "doc_shard", "conv_id", "turn_idx"]
             + [c for c in DOCVALUE_FIELDS if c in runs_fields]
             + ["doc_len", "norm_byte"])
    rd.read_parquet(str(runs_dir), columns=ncols).write_parquet(
        str(index_path / "norms"), partition_cols=["doc_shard"])

    # term shuffle over the NEW postings only; tail shard merges its old data
    runs = rd.read_parquet(
        str(runs_dir),
        columns=["doc_id", "doc_shard", "norm_byte", "terms", "freqs", "pos_flat"])
    postings = runs.map_batches(_explode_runs, batch_format="pyarrow",
                                zero_copy_batch=True)
    writer = functools.partial(
        _merge_segment_group, index_dir=str(index_path),
        docs_per_shard=int(docs_per_shard))
    new_rows = (postings.groupby("doc_shard")
                .map_groups(writer, batch_format="pyarrow").take_all())

    shards = {s["shard_id"]: s for s in manifest["shards"]}
    for r in new_rows:
        shards[r["shard_id"]] = {k: int(v) for k, v in r.items()}

    # checkpoint = last key of the updated input (from the final block)
    last_block = ray.get(refs[-1])
    checkpoint = [last_block.column("conv_id")[-1].as_py(),
                  int(last_block.column("turn_idx")[-1].as_py())]

    new_manifest = {
        **manifest,
        "version": manifest["version"] + 1,
        "created_unix": time.time(),
        "stats": new_stats,
        "checkpoint": checkpoint,
        "shards": [shards[k] for k in sorted(shards)],
    }
    tmp = index_path / (MANIFEST_NAME + ".tmp")
    tmp.write_text(json.dumps(new_manifest, indent=1))
    os.replace(tmp, index_path / MANIFEST_NAME)
    shutil.rmtree(runs_dir, ignore_errors=True)
    return new_manifest


@ray.remote
def _count_rows(block: pa.Table) -> int:
    return block.num_rows


def _merge_segment_group(group: pa.Table, index_dir: str,
                         docs_per_shard: int) -> pa.Table:
    return MergingSegmentWriter(index_dir, docs_per_shard)(group)
