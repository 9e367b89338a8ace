"""Ingest update-processor chain: per-batch field mutators.

Re-expressions of the Solr update-request processor zoo
(``solr/core/src/java/org/apache/solr/update/processor/`` —
CloneFieldUpdateProcessorFactory, RegexReplaceProcessorFactory,
DefaultValueUpdateProcessorFactory, TimestampUpdateProcessorFactory,
TrimFieldUpdateProcessorFactory, RemoveBlankFieldUpdateProcessorFactory,
FieldLengthUpdateProcessorFactory): each processor is a vectorized
``pa.Table -> pa.Table`` transform, and a chain composes them into ONE
``map_batches`` stage (``apply_chain``) — the idiomatic Ray Data shape
for per-record ingest mutation.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

Processor = Callable[[pa.Table], pa.Table]


def clone_field(src: str, dst: str) -> Processor:
    """CloneFieldUpdateProcessor: copy a column under a new name."""

    def fn(t: pa.Table) -> pa.Table:
        if dst in t.column_names:
            t = t.drop_columns([dst])
        return t.append_column(dst, t.column(src))

    return fn


def regex_replace(field: str, pattern: str, replacement: str) -> Processor:
    """RegexReplaceProcessor: vectorized regex substitution on a string
    column."""

    def fn(t: pa.Table) -> pa.Table:
        out = pc.replace_substring_regex(t.column(field), pattern,
                                         replacement)
        return t.set_column(t.column_names.index(field), field, out)

    return fn


def default_value(field: str, value) -> Processor:
    """DefaultValueUpdateProcessor: fill nulls (or create the column)."""

    def fn(t: pa.Table) -> pa.Table:
        if field not in t.column_names:
            return t.append_column(
                field, pa.array([value] * len(t)))
        col = t.column(field)
        out = pc.fill_null(col, value)
        return t.set_column(t.column_names.index(field), field, out)

    return fn


def timestamp_field(field: str = "timestamp",
                    fixed: np.datetime64 | None = None) -> Processor:
    """TimestampUpdateProcessor: stamp an ingest-time column. Pass
    ``fixed`` for deterministic pipelines (tests, reproducible runs)."""

    def fn(t: pa.Table) -> pa.Table:
        ts = fixed if fixed is not None else np.datetime64("now", "us")
        col = pa.array(np.full(len(t), ts, dtype="datetime64[us]"))
        if field in t.column_names:
            t = t.drop_columns([field])
        return t.append_column(field, col)

    return fn


def trim_field(field: str) -> Processor:
    """TrimFieldUpdateProcessor: strip surrounding whitespace."""

    def fn(t: pa.Table) -> pa.Table:
        out = pc.utf8_trim_whitespace(t.column(field))
        return t.set_column(t.column_names.index(field), field, out)

    return fn


def remove_blank(field: str) -> Processor:
    """RemoveBlankFieldUpdateProcessor: empty strings become null."""

    def fn(t: pa.Table) -> pa.Table:
        col = t.column(field)
        out = pc.if_else(pc.equal(col, ""), pa.scalar(None, type=col.type),
                         col)
        return t.set_column(t.column_names.index(field), field, out)

    return fn


def field_length(src: str, dst: str) -> Processor:
    """FieldLengthUpdateProcessor: character length of a string column."""

    def fn(t: pa.Table) -> pa.Table:
        if dst in t.column_names:
            t = t.drop_columns([dst])
        return t.append_column(
            dst, pc.utf8_length(t.column(src)).cast(pa.int64()))

    return fn


def apply_chain(ds: rd.Dataset, processors: list[Processor]) -> rd.Dataset:
    """Compose the chain into ONE map_batches stage (one pass per batch,
    zero-copy Arrow in/out)."""

    def run(t: pa.Table) -> pa.Table:
        for p in processors:
            t = p(t)
        return t

    return ds.map_batches(run, batch_format="pyarrow", zero_copy_batch=True)
