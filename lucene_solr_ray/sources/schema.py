"""Declared-schema system: fields, dynamic fields, copyField, per-field
analyzers.

Re-expression of Solr's IndexSchema
(``solr/core/src/java/org/apache/solr/schema/IndexSchema.java:95-163``:
the fields / dynamicFields / copyFields registries and
``getFieldType(name)`` resolution; ``ManagedIndexSchema`` mutation is out
of scope). Field types bind a coercion (the FieldType.toNativeType
analog) and, for text types, an analyzer name from the analysis
registry; per-field query/index analysis goes through
``schema.analyze(field, text)``.

Resolution precedence mirrors the reference: an explicit field always
wins; otherwise the LONGEST matching dynamicField pattern
(IndexSchema.dynamicFieldListWithDuplicates ordering), ``*`` last.
copyField sources may be dynamic patterns; a copy directive with
maxChars truncates like CopyField.getLimitedValue.

Schema application is one vectorized ``pa.Table -> pa.Table`` transform
(``prepare_batch``) that slots into the update-processor chain
(``sources.processors.apply_chain``) — coercion + copyFields run inside
the same single map_batches ingest stage.
"""

from __future__ import annotations

import fnmatch
from dataclasses import dataclass, field as dc_field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_TYPE_COERCE = {
    "string": pa.string(),     # StrField: keyword, no analysis
    "text": pa.string(),       # TextField: analyzed
    "pint": pa.int64(),        # IntPointField
    "plong": pa.int64(),
    "pfloat": pa.float64(),    # FloatPointField
    "pdouble": pa.float64(),
    "pdate": pa.timestamp("us"),  # DatePointField
    "boolean": pa.bool_(),
}


@dataclass(frozen=True)
class FieldType:
    """FieldType analog: storage type + analyzer binding for text."""

    name: str
    base: str = "string"          # key into _TYPE_COERCE
    analyzer: str | None = None   # analysis-registry name for text types

    @property
    def arrow_type(self) -> pa.DataType:
        return _TYPE_COERCE[self.base]


@dataclass(frozen=True)
class SchemaField:
    name: str                      # exact name or dynamic glob (*_s)
    type: str                      # FieldType name
    required: bool = False
    docvalues: bool = False


@dataclass(frozen=True)
class CopyField:
    source: str                    # exact or glob
    dest: str
    max_chars: int | None = None


DEFAULT_TYPES = (
    FieldType("string", "string"),
    FieldType("text_general", "text", analyzer="standard"),
    FieldType("text_url_email", "text", analyzer="uax29_url_email"),
    FieldType("pint", "pint"),
    FieldType("plong", "plong"),
    FieldType("pfloat", "pfloat"),
    FieldType("pdouble", "pdouble"),
    FieldType("pdate", "pdate"),
    FieldType("boolean", "boolean"),
)


class IndexSchema:
    """fields + dynamicFields + copyFields + type registry."""

    def __init__(self, fields: list[SchemaField],
                 copy_fields: list[CopyField] = (),
                 types: list[FieldType] = DEFAULT_TYPES):
        self.types = {t.name: t for t in types}
        self.fields: dict[str, SchemaField] = {}
        self.dynamic: list[SchemaField] = []
        for f in fields:
            if f.type not in self.types:
                raise ValueError(f"field {f.name!r}: unknown type {f.type!r}")
            if "*" in f.name:
                self.dynamic.append(f)
            else:
                self.fields[f.name] = f
        # longest pattern wins; '*' (if declared) falls to the end
        self.dynamic.sort(key=lambda f: len(f.name), reverse=True)
        self.copy_fields = list(copy_fields)
        for cf in self.copy_fields:
            if self.resolve(cf.dest) is None:
                raise ValueError(f"copyField dest {cf.dest!r} undeclared")

    # --- resolution (IndexSchema.getFieldOrNull / getDynamicPattern) ---

    def resolve(self, name: str) -> SchemaField | None:
        """Explicit field, else longest matching dynamic pattern."""
        f = self.fields.get(name)
        if f is not None:
            return f
        for d in self.dynamic:
            if fnmatch.fnmatchcase(name, d.name):
                return d
        return None

    def field_type(self, name: str) -> FieldType:
        f = self.resolve(name)
        if f is None:
            raise KeyError(f"undefined field {name!r} "
                           "(no explicit field or dynamicField matches)")
        return self.types[f.type]

    # --- per-field analysis (getIndexAnalyzer per field) ---

    def analyze(self, name: str, text: str):
        ft = self.field_type(name)
        if ft.base != "text":
            raise TypeError(f"field {name!r} ({ft.name}) is not analyzed")
        from ..analysis import get_analyzer

        return get_analyzer(ft.analyzer).analyze(text)

    # --- batch application (ingest-side; one vectorized transform) ---

    def prepare_batch(self, t: pa.Table) -> pa.Table:
        """Validate + coerce every column to its declared type, then run
        copyField directives. Unknown columns raise (schema-on-write,
        like the reference without schemaless mode); missing required
        fields raise."""
        for name in t.column_names:
            ft = self.field_type(name)  # raises on undefined
            col = t.column(name)
            if not col.type.equals(ft.arrow_type):
                col = col.cast(ft.arrow_type)
                t = t.set_column(t.column_names.index(name), name, col)
        for cf in self.copy_fields:
            srcs = ([cf.source] if "*" not in cf.source else
                    [c for c in t.column_names
                     if fnmatch.fnmatchcase(c, cf.source)])
            for src in srcs:
                if src not in t.column_names:
                    continue
                vals = t.column(src)
                dest_ft = self.field_type(cf.dest)
                if not vals.type.equals(dest_ft.arrow_type):
                    vals = vals.cast(dest_ft.arrow_type)
                if cf.max_chars is not None:
                    vals = pc.utf8_slice_codeunits(vals, 0, cf.max_chars)
                if cf.dest in t.column_names:
                    # multiple sources into one dest concatenate with a
                    # space (multivalued-dest flattening for the
                    # single-valued engine)
                    joined = pc.binary_join_element_wise(
                        t.column(cf.dest).cast(pa.string()),
                        vals.cast(pa.string()), " ")
                    t = t.set_column(t.column_names.index(cf.dest),
                                     cf.dest, joined)
                else:
                    t = t.append_column(cf.dest, vals)
        # required check AFTER copyFields: a required field may be
        # produced only by a copy directive (the reference applies
        # copyFields first, then validates)
        for f in self.fields.values():
            if f.required and f.name not in t.column_names:
                raise ValueError(f"required field {f.name!r} missing")
        return t

    def processor(self):
        """The schema as an update-chain processor
        (``sources.processors.Processor``)."""
        return self.prepare_batch


def transcripts_schema() -> IndexSchema:
    """The engine's default transcript schema: explicit core fields,
    dynamic suffix patterns, and a catch-all copy into the indexed text
    (the reference's ``_text_`` catch-all copyField)."""
    return IndexSchema(
        fields=[
            SchemaField("conv_id", "string", required=True),
            SchemaField("turn_idx", "pint", required=True),
            SchemaField("text", "text_general", required=True),
            SchemaField("role", "string", docvalues=True),
            SchemaField("tool", "string", docvalues=True),
            SchemaField("score", "plong", docvalues=True),
            SchemaField("ts", "pdate"),
            SchemaField("*_s", "string"),
            SchemaField("*_t", "text_general"),
            SchemaField("*_i", "pint"),
            SchemaField("*_f", "pdouble"),
            SchemaField("*_dt", "pdate"),
        ],
        copy_fields=[CopyField("*_t", "text")],
    )


# ----------------------------------------------------------------- schemaless

#: type-guess escalation chain (AddSchemaFieldsUpdateProcessorFactory's
#: typeMapping cascade Boolean -> Long -> Double -> Date -> fallback
#: string/text, AddSchemaFieldsUpdateProcessorFactory.java:76-116). The
#: JOIN of two guesses is the least common escalation: numeric widens
#: (plong ∨ pdouble = pdouble); anything incompatible (boolean vs
#: number, date vs number) falls to analyzed text, the reference's
#: catch-all mapping.
_GUESS_RANK = {"boolean": 0, "plong": 1, "pdouble": 2, "pdate": 3,
               "text_general": 4}


def _join_guess(a: str, b: str) -> str:
    """Commutative/associative join on the escalation lattice — partial
    guesses merge to the same result in any order, which is what makes
    distributed inference deterministic regardless of partition order."""
    if a == b:
        return a
    pair = {a, b}
    if pair == {"plong", "pdouble"}:
        return "pdouble"
    return "text_general"


def guess_field_type(col: pa.ChunkedArray | pa.Array) -> str:
    """One partition's guess for an undeclared column. Arrow-typed
    columns map directly; string columns try the reference's parse
    cascade (long -> double -> date) on the non-null values and fall
    back to analyzed text."""
    t = col.type
    if pa.types.is_boolean(t):
        return "boolean"
    if pa.types.is_integer(t):
        return "plong"
    if pa.types.is_floating(t):
        return "pdouble"
    if pa.types.is_timestamp(t) or pa.types.is_date(t):
        return "pdate"
    vals = col.drop_null()
    if len(vals) == 0:
        return "text_general"
    for target, tname in ((pa.int64(), "plong"),
                          (pa.float64(), "pdouble"),
                          (pa.timestamp("us"), "pdate")):
        try:
            vals.cast(target)
            return tname
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
            continue
    return "text_general"


def infer_schemaless(source, base: IndexSchema) -> IndexSchema:
    """Phase-1 of schemaless ingest: scan the dataset once, guess a type
    for every column the base schema does not resolve, and return a new
    IndexSchema with those fields added explicitly.

    Where the reference mutates a shared managed schema as documents
    stream in (first-writer-wins through ZooKeeper optimistic
    concurrency), a distributed Ray ingest infers per-partition guesses
    in parallel (``map_batches`` partials) and merges them with the
    commutative lattice join — the converged schema is a pure function
    of the data, independent of partition count or arrival order.
    ``source`` is a ``ray.data.Dataset`` or a ``pa.Table``.
    """
    import ray.data as rd

    def batch_guesses(t: pa.Table) -> pa.Table:
        names, guesses = [], []
        for name in t.column_names:
            if base.resolve(name) is None:
                names.append(name)
                guesses.append(guess_field_type(t.column(name)))
        return pa.table({"field": pa.array(names, type=pa.string()),
                         "guess": pa.array(guesses, type=pa.string())})

    merged: dict[str, str] = {}
    if isinstance(source, pa.Table):
        partial = batch_guesses(source)
        pairs = zip(partial.column("field").to_pylist(),
                    partial.column("guess").to_pylist())
        for f, g in pairs:
            merged[f] = _join_guess(merged[f], g) if f in merged else g
    else:
        ds = source.map_batches(batch_guesses, batch_format="pyarrow")
        for b in ds.iter_batches(batch_format="pyarrow", batch_size=None):
            for f, g in zip(b.column("field").to_pylist(),
                            b.column("guess").to_pylist()):
                merged[f] = _join_guess(merged[f], g) if f in merged else g
    if not merged:
        return base
    new_fields = list(base.fields.values()) + list(base.dynamic) + [
        SchemaField(f, merged[f]) for f in sorted(merged)
    ]
    return IndexSchema(new_fields, base.copy_fields,
                       list(base.types.values()))


def schemaless_ingest(source, base: IndexSchema):
    """Two-phase schemaless ingest (the ``update.autoCreateFields``
    flag): infer the converged schema, then apply it. Returns
    ``(schema, prepared)`` where prepared is the coerced dataset/table
    ready for the update-processor chain."""
    import ray.data as rd

    schema = infer_schemaless(source, base)
    if isinstance(source, pa.Table):
        return schema, schema.prepare_batch(source)
    return schema, source.map_batches(schema.prepare_batch,
                                      batch_format="pyarrow")
