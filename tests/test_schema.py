"""Declared-schema system: resolution precedence, copyField, coercion,
per-field analyzers (IndexSchema.java:95-163 semantics)."""

import numpy as np
import pyarrow as pa
import pytest

from lucene_solr_ray.sources.schema import (
    CopyField,
    FieldType,
    IndexSchema,
    SchemaField,
    transcripts_schema,
)


def _schema(copy=()):
    return IndexSchema(
        fields=[
            SchemaField("id", "string", required=True),
            SchemaField("title", "text_general"),
            SchemaField("title_s", "string"),   # explicit beats *_s
            SchemaField("*_s", "string"),
            SchemaField("*_txt_en", "text_general"),
            SchemaField("*_txt", "text_general"),
            SchemaField("*_i", "pint"),
            SchemaField("*", "string"),
        ],
        copy_fields=list(copy),
    )


def test_resolution_precedence():
    s = _schema()
    assert s.resolve("title").name == "title"          # explicit
    assert s.resolve("title_s").name == "title_s"      # explicit over *_s
    assert s.resolve("name_s").name == "*_s"
    # longest dynamic pattern wins: *_txt_en over *_txt over *
    assert s.resolve("body_txt_en").name == "*_txt_en"
    assert s.resolve("body_txt").name == "*_txt"
    assert s.resolve("anything").name == "*"
    assert s.field_type("count_i").base == "pint"


def test_undefined_field_raises():
    s = IndexSchema(fields=[SchemaField("id", "string")])
    with pytest.raises(KeyError):
        s.field_type("nope")
    with pytest.raises(ValueError):
        IndexSchema(fields=[SchemaField("id", "string")],
                    copy_fields=[CopyField("id", "missing_dest")])
    with pytest.raises(ValueError):
        IndexSchema(fields=[SchemaField("id", "nosuchtype")])


def test_prepare_batch_coerces_and_validates():
    s = _schema()
    t = pa.table({"id": pa.array(["a", "b"]),
                  "count_i": pa.array([1, 2], type=pa.int32())})
    out = s.prepare_batch(t)
    assert out.column("count_i").type == pa.int64()
    with pytest.raises(KeyError):
        strict = IndexSchema(fields=[SchemaField("id", "string")])
        strict.prepare_batch(pa.table({"id": ["x"], "rogue": [1]}))


def test_copy_field_glob_concat_and_maxchars():
    s = _schema(copy=[CopyField("*_txt", "title"),
                      CopyField("id", "id_s", max_chars=2)])
    t = pa.table({"id": pa.array(["abcdef"]),
                  "title": pa.array(["head"]),
                  "a_txt": pa.array(["one"]),
                  "b_txt": pa.array(["two"])})
    out = s.prepare_batch(t)
    # glob copy concatenates into the existing dest
    assert out.column("title")[0].as_py() == "head one two"
    # maxChars truncation (CopyField.getLimitedValue)
    assert out.column("id_s")[0].as_py() == "ab"


def test_per_field_analyzer():
    s = _schema()
    terms, positions = s.analyze("body_txt", "The Quick e-mail@foo.com")
    assert "quick" in terms
    with pytest.raises(TypeError):
        s.analyze("count_i", "123")
    # a url_email-typed dynamic field keeps the address as one token
    s2 = IndexSchema(fields=[SchemaField("*_url", "text_url_email"),
                             SchemaField("id", "string")])
    t2, _ = s2.analyze("from_url", "mail e-mail@foo.com")
    assert any("@" in t for t in t2)


def test_transcripts_schema_end_to_end(ray_session):
    s = transcripts_schema()
    t = pa.table({
        "conv_id": pa.array(["c1"]),
        "turn_idx": pa.array([0], type=pa.int32()),
        "text": pa.array(["hello world"]),
        "note_t": pa.array(["extra searchable note"]),
    })
    out = s.prepare_batch(t)
    assert out.column("turn_idx").type == pa.int64()
    # catch-all copyField folded the dynamic text field into `text`
    assert out.column("text")[0].as_py() == "hello world extra searchable note"
    # the schema slots into the update-processor chain
    import ray.data as rd

    from lucene_solr_ray.sources.processors import apply_chain, trim_field

    ds = rd.from_arrow(pa.table({
        "conv_id": pa.array(["  c2  "]),
        "turn_idx": pa.array([1], type=pa.int64()),
        "text": pa.array(["body"]),
    }))
    got = apply_chain(ds, [trim_field("conv_id"), s.processor()]).to_pandas()
    assert got["conv_id"][0] == "c2"


def test_required_satisfied_by_copy_field():
    """copyFields run BEFORE the required check (reference order): a
    required dest produced only by a copy directive is accepted."""
    s = IndexSchema(
        fields=[SchemaField("id", "string"),
                SchemaField("text", "text_general", required=True),
                SchemaField("*_t", "text_general")],
        copy_fields=[CopyField("*_t", "text")])
    out = s.prepare_batch(pa.table({"id": ["a"], "note_t": ["from copy"]}))
    assert out.column("text")[0].as_py() == "from copy"
    with pytest.raises(ValueError, match="required"):
        s.prepare_batch(pa.table({"id": ["a"]}))


# ----------------------------------------------------------- schemaless mode

def _base():
    from lucene_solr_ray.sources.schema import (IndexSchema, SchemaField)

    return IndexSchema([SchemaField("id", "string", required=True)])


def test_schemaless_guesses_and_prepares(ray_session):
    import pyarrow as pa

    from lucene_solr_ray.sources.schema import schemaless_ingest

    t = pa.table({
        "id": pa.array(["a", "b"]),
        "views": pa.array([1, 2], type=pa.int32()),
        "ratio": pa.array(["1.5", "2"]),           # string -> pdouble
        "when": pa.array(["2024-01-01T00:00:00", "2024-02-01T00:00:00"]),
        "blurb": pa.array(["hello world", "42 not only digits here"]),
        "flag": pa.array([True, False]),
    })
    schema, out = schemaless_ingest(t, _base())
    assert schema.field_type("views").name == "plong"
    assert schema.field_type("ratio").name == "pdouble"
    assert schema.field_type("when").name == "pdate"
    assert schema.field_type("blurb").name == "text_general"
    assert schema.field_type("flag").name == "boolean"
    assert out.column("views").type == pa.int64()
    assert out.column("ratio").to_pylist() == [1.5, 2.0]
    assert str(out.column("when").type).startswith("timestamp")
    # base schema still enforced: undeclared stays undeclared without flag
    import pytest as _pt
    with _pt.raises(KeyError):
        _base().field_type("views")


def test_schemaless_converges_independent_of_partition_order(ray_session):
    """The lattice join makes inference a pure function of the data:
    any partitioning / ordering yields the same converged schema."""
    import itertools

    import pyarrow as pa

    import ray.data as rd

    from lucene_solr_ray.sources.schema import infer_schemaless

    parts = [
        pa.table({"id": pa.array(["a"]), "x": pa.array([1]),
                  "y": pa.array(["10"])}),
        pa.table({"id": pa.array(["b"]), "x": pa.array([2.5]),
                  "y": pa.array(["3.5"])}),
        pa.table({"id": pa.array(["c"]), "x": pa.array([3]),
                  "y": pa.array(["not a number"])}),
    ]
    want = None
    for perm in itertools.permutations(range(3)):
        ds = rd.from_arrow([parts[i] for i in perm])
        schema = infer_schemaless(ds, _base())
        got = (schema.field_type("x").name, schema.field_type("y").name)
        if want is None:
            want = got
        assert got == want, perm
    # mixed int+float escalates numeric; string col with a non-numeric
    # value anywhere falls to analyzed text
    assert want == ("pdouble", "text_general")


def test_schemaless_escalation_join_table():
    from lucene_solr_ray.sources.schema import _join_guess

    assert _join_guess("plong", "pdouble") == "pdouble"
    assert _join_guess("pdouble", "plong") == "pdouble"
    assert _join_guess("plong", "plong") == "plong"
    assert _join_guess("boolean", "plong") == "text_general"
    assert _join_guess("pdate", "pdouble") == "text_general"
    assert _join_guess("pdate", "pdate") == "pdate"
    # associativity spot check on a triple
    a = _join_guess(_join_guess("plong", "pdouble"), "pdate")
    b = _join_guess("plong", _join_guess("pdouble", "pdate"))
    assert a == b == "text_general"
