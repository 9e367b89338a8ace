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
        aside = shard_dir.parent / f".merging-shard={shard_id:05d}"
        if aside.exists() and not shard_dir.exists():
            # a previous merge crashed between set-aside and replacement:
            # restore the old segment before redoing the merge
            os.rename(aside, shard_dir)
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
            # set the old segment ASIDE (atomic rename, recoverable above)
            # rather than deleting it before the replacement is written —
            # a crash in that window would otherwise lose the shard while
            # the manifest still references it
            shutil.rmtree(aside, ignore_errors=True)
            os.rename(shard_dir, aside)
        try:
            out = super().__call__(group)
        except BaseException:
            if aside.exists() and not shard_dir.exists():
                os.rename(aside, shard_dir)  # roll back
            raise
        shutil.rmtree(aside, ignore_errors=True)
        return out


def update_index(index_dir: str, source: str | rd.Dataset, *,
                 batch_size: int = 4096, concurrency: int | None = None,
                 overwrite: bool = False) -> dict:
    """Append new documents to an existing index.

    ``overwrite=False`` (default): strictly append-only past the
    checkpoint (TopicStream watermark). ``overwrite=True``: updateDocument
    semantics (IndexWriter.java:1503) — incoming (conv_id, turn_idx) keys
    that already exist have their old doc_ids tombstoned and the new
    versions are appended with fresh doc_ids; the old versions become
    unreachable. With overwrite the doc_id order no longer mirrors global
    key order, so tie-breaks may differ from a from-scratch rebuild
    (same as the reference, where updated docs get new docIDs)."""
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
    if checkpoint is not None and not overwrite:
        first = ds.take(1)[0]
        if (first["conv_id"], int(first["turn_idx"])) <= tuple(checkpoint):
            raise ValueError(
                f"update must be past checkpoint {checkpoint}, got "
                f"({first['conv_id']}, {first['turn_idx']})")

    mat = ds.materialize()
    refs = mat.to_arrow_refs()
    metas = ray.get([_block_meta_update.remote(r) for r in refs])
    counts = [m["rows"] for m in metas]
    # the doc_id == rank invariant requires the update batch itself to be
    # (conv_id, turn_idx)-sorted, same as the build's per-block check —
    # unsorted input would silently diverge from a from-scratch rebuild
    prev_last = None
    for m in metas:
        if m["rows"] == 0:
            continue
        if not m["sorted_within"]:
            raise ValueError("update rows not sorted by (conv_id, turn_idx)")
        if prev_last is not None and tuple(m["first"]) < tuple(prev_last):
            raise ValueError(
                "update blocks out of (conv_id, turn_idx) order")
        prev_last = m["last"]
    if overwrite:
        # updateDocument: tombstone the existing versions of incoming keys
        incoming = [k for ks in ray.get([_block_keys.remote(r)
                                         for r in refs]) for k in ks]
        if incoming:
            delete_documents(index_dir, keys=incoming)
            manifest = read_manifest(index_dir)  # version bumped
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

    # checkpoint = last key of the updated input (last non-empty block's
    # order metadata); never moves backward (overwrite batches may carry
    # old keys)
    checkpoint = list(prev_last) if prev_last is not None else None
    old_cp = manifest.get("checkpoint")
    if old_cp is not None and (checkpoint is None
                               or tuple(old_cp) > tuple(checkpoint)):
        checkpoint = list(old_cp)

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


@ray.remote
def _block_meta_update(block: pa.Table) -> dict:
    """Row count + (conv_id, turn_idx) order metadata for one block."""
    n = block.num_rows
    if n == 0:
        return {"rows": 0, "first": None, "last": None,
                "sorted_within": True}
    cids = np.asarray(block.column("conv_id").to_pylist(), dtype=object)
    turns = block.column("turn_idx").to_numpy(zero_copy_only=False)
    if n > 1:
        a, b = cids[:-1], cids[1:]
        ok = bool(np.all((a < b) | ((a == b) & (turns[:-1] <= turns[1:]))))
    else:
        ok = True
    return {
        "rows": n,
        "first": (str(cids[0]), int(turns[0])),
        "last": (str(cids[-1]), int(turns[-1])),
        "sorted_within": ok,
    }


def _merge_segment_group(group: pa.Table, index_dir: str,
                         docs_per_shard: int) -> pa.Table:
    return MergingSegmentWriter(index_dir, docs_per_shard)(group)


# --------------------------------------------------------------------------
# deletes / overwrite (IndexWriter.deleteDocuments / updateDocument,
# IndexWriter.java:1503; SignatureUpdateProcessor overwrite-on-signature)
# --------------------------------------------------------------------------

DELETES_NAME = "_DELETES.json"


def read_deletes(index_dir: str) -> set[int]:
    """Tombstoned doc_ids (live-docs complement). Empty set if none."""
    f = Path(index_dir) / DELETES_NAME
    if not f.exists():
        return set()
    return set(json.loads(f.read_text())["doc_ids"])


def delete_documents(index_dir: str, doc_ids=None, keys=None) -> dict:
    """Tombstone documents by doc_id or by (conv_id, turn_idx) key.

    Lucene semantics: deleted docs become unreachable from every query
    (liveDocs mask in the searchers) immediately, while index-level
    statistics (docFreq, docCount, sumTotalTermFreq) keep counting them
    until a merge rewrites the segments — exactly the reference's
    maxDoc/numDocs distinction (IndexWriter.deleteDocuments; stats decay
    at merge, not at delete). The manifest version is bumped (NRT reopen
    picks the tombstones up).
    """
    index_path = Path(index_dir)
    manifest = read_manifest(index_dir)
    dels = read_deletes(index_dir)
    resolved = {int(d) for d in (doc_ids or [])}
    if keys:
        import pyarrow.dataset as pads

        want = {(str(c), int(t)) for c, t in keys}
        t = pads.dataset(str(index_path / "norms"), format="parquet",
                         partitioning="hive").to_table(
            columns=["doc_id", "conv_id", "turn_idx"],
            filter=pads.field("conv_id").isin([c for c, _ in want]))
        for r in t.to_pylist():
            if (str(r["conv_id"]), int(r["turn_idx"])) in want:
                resolved.add(int(r["doc_id"]))
    newly = resolved - dels
    all_dels = sorted(dels | resolved)
    tmp = index_path / (DELETES_NAME + ".tmp")
    tmp.write_text(json.dumps({"doc_ids": all_dels}))
    os.replace(tmp, index_path / DELETES_NAME)

    new_manifest = {**manifest,
                    "version": manifest["version"] + 1,
                    "created_unix": time.time(),
                    "deleted_count": len(all_dels)}
    mtmp = index_path / (MANIFEST_NAME + ".tmp")
    mtmp.write_text(json.dumps(new_manifest, indent=1))
    os.replace(mtmp, index_path / MANIFEST_NAME)
    return {"deleted_now": sorted(newly), "total_deleted": len(all_dels)}


@ray.remote
def _block_keys(block: pa.Table) -> list:
    return list(zip(block.column("conv_id").to_pylist(),
                    (int(x) for x in block.column("turn_idx").to_pylist())))
