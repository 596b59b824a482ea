"""N-Quads text sink test (StreamingWriter analog)."""

import os
import shutil

from conftest import DATA_DIR
from jsonld_spark.operators.nquads import write_nquads
from jsonld_spark.rdf_model import parse_nquads


def test_write_nquads_sink(spark):
    triples = spark.createDataFrame(
        [
            ("http://e/a", "http://p/x", "v\nw", True, None, None, None),
            ("http://e/a", "http://p/y", "http://e/b", False, None, None, None),
            ("_:h1", "http://p/x", "5", True, "http://www.w3.org/2001/XMLSchema#integer", None, "http://g/1"),
            ("http://e/c", "http://p/l", "bonjour", True, "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString", "fr", None),
        ],
        "subj string, pred string, obj string, obj_is_literal boolean, obj_datatype string, obj_lang string, graph string",
    )
    out = os.path.join(DATA_DIR, "nq_out")
    shutil.rmtree(out, ignore_errors=True)
    write_nquads(triples, out, partitions=2)
    text = "\n".join(
        open(os.path.join(out, f)).read()
        for f in sorted(os.listdir(out))
        if f.startswith("part-")
    )
    quads = parse_nquads(text)
    assert len(quads) == 4
    lines = [ln for ln in text.splitlines() if ln.strip()]
    assert any('"v\\nw"' in ln for ln in lines)  # escaped newline
    assert any("@fr" in ln for ln in lines)
    assert any('"5"^^<http://www.w3.org/2001/XMLSchema#integer> <http://g/1>' in ln for ln in lines)


def test_nquad_col_accepts_column_args(spark):
    """Signature says Column | str — Column inputs must not crash."""
    from pyspark.sql import functions as F

    from jsonld_spark.operators.nquads import nquad_col

    df = spark.createDataFrame(
        [("http://s", "http://p", "http://o", False, None, None, None)],
        "subj string, pred string, obj string, obj_is_literal boolean,"
        " obj_datatype string, obj_lang string, graph string",
    )
    out = df.select(
        nquad_col(subj=F.col("subj"), pred="pred").alias("line")
    ).collect()
    assert out[0].line == "<http://s> <http://p> <http://o> .\n" or "<http://s>" in out[0].line

def test_nquad_col_matches_python_serializer_byte_for_byte(spark):
    """Differential parity: the JVM expression and rdf_model.quad_to_nquads
    (the writer byte-parity-tested against the reference) must serialize
    IDENTICAL lines over nasty crawl literals — control chars, named
    ECHARs, backslash/quote runs, lang with a nulled datatype column."""
    from pyspark.sql import functions as F

    from jsonld_spark.operators.nquads import nquad_col
    from jsonld_spark.rdf_model import (
        RDF_LANGSTRING, XSD_STRING, Quad, quad_to_nquads,
    )

    XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"
    quads = [
        Quad("http://e/s", "http://p/x", "plain", True, XSD_STRING, None, None),
        Quad("http://e/s", "http://p/x", 'q"uo\\te', True, XSD_STRING, None, None),
        Quad("http://e/s", "http://p/x", "nl\ncr\rtab\t", True, XSD_STRING, None, None),
        Quad("http://e/s", "http://p/x", "bs\bff\f", True, XSD_STRING, None, None),
        Quad("http://e/s", "http://p/x", "nul\x00esc\x1bdel\x7fvt\x0b", True,
             XSD_STRING, None, None),
        Quad("http://e/s", "http://p/x", "\x01\x02\x03\\\x04\"\x05", True,
             XSD_STRING, None, None),
        Quad("http://e/s", "http://p/l", "bonjour\x07", True, RDF_LANGSTRING,
             "fr", None),
        Quad("_:b0", "http://p/x", "5", True, XSD_INT, None, "http://g/1"),
        Quad("http://e/s", "http://p/y", "http://e/o", False, None, None, "_:g"),
        Quad("_:b0", "_:p", "_:o", False, None, None, None),  # generalized
    ]
    # the pipeline's storage convention: xsd:string stored as NULL datatype;
    # plus one EXTERNAL-producer row — lang set but datatype column NULL —
    # whose tag must not be dropped
    rows = [
        (q.subj, q.pred, q.obj, q.obj_is_literal,
         None if q.obj_datatype == XSD_STRING else q.obj_datatype,
         q.obj_lang, q.graph)
        for q in quads
    ] + [("http://e/s", "http://p/l", "hola", True, None, "es", None)]
    expected = [quad_to_nquads(q).rstrip("\n").rstrip() for q in quads] + [
        quad_to_nquads(
            Quad("http://e/s", "http://p/l", "hola", True, None, "es", None)
        ).rstrip("\n").rstrip()
    ]
    df = spark.createDataFrame(
        rows,
        "subj string, pred string, obj string, obj_is_literal boolean,"
        " obj_datatype string, obj_lang string, graph string",
    )
    got = [r.line for r in df.select(nquad_col().alias("line")).collect()]
    assert got == expected

def test_read_nquads_distributed_roundtrip(spark):
    """write_nquads → read_nquads recovers the triples (including star
    and generalized lines), distributed via the text source."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from jsonld_spark.operators.nquads import read_nquads, write_nquads

    rows = [
        ("http://e/a", "http://p/x", "v\nw\x07", True, None, None, None),
        ("http://e/a", "http://p/y", "http://e/b", False, None, None, None),
        ("_:h1", "http://p/x", "5",
         True, "http://www.w3.org/2001/XMLSchema#integer", None, "http://g/1"),
        ("http://e/c", "http://p/l", "bonjour", True,
         "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString", "fr", None),
        ("<< <http://e/a> <http://p/x> <http://e/b> >>",
         "http://p/conf", "0.9", True,
         "http://www.w3.org/2001/XMLSchema#decimal", None, None),
        ("_:s", "_:p", "_:o", False, None, None, "_:g"),  # generalized
    ]
    schema = (
        "subj string, pred string, obj string, obj_is_literal boolean,"
        " obj_datatype string, obj_lang string, graph string"
    )
    df = spark.createDataFrame(rows, schema)
    out = os.path.join(DATA_DIR, "nq_rt")
    shutil.rmtree(out, ignore_errors=True)
    write_nquads(df, out, partitions=2)
    back = read_nquads(spark, out)
    assert sorted(map(tuple, back.collect())) == sorted(rows)
    # no shuffle in the parse plan: text scan feeds mapInPandas directly
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_parse_nquads_lines_drop_mode(spark):
    from jsonld_spark.operators.nquads import parse_nquads_lines

    lines = spark.createDataFrame(
        [("<http://e/a> <http://p/x> \"ok\" .",),
         ("this is not nquads",),
         ("# comment",),
         ("",)],
        "value string",
    )
    got = parse_nquads_lines(lines, mode="drop").collect()
    assert len(got) == 1 and got[0].obj == "ok"
    import pytest
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Exception):
        parse_nquads_lines(lines, mode="strict").collect()


def test_parse_nquads_uchar_iri_unescape():
    from jsonld_spark.rdf_model import parse_nquads

    [q] = parse_nquads(
        '<http://e/\\u00E9> <http://p/\\U0001F600x> "v"^^<http://t/\\u00FC> .'
    )
    assert q.subj == "http://e/é"
    assert q.pred == "http://p/\U0001F600x"
    assert q.obj_datatype == "http://t/ü"
