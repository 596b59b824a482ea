"""fromRdf tests: literal conversion, list folding, graph nesting,
roundtrip with toRdf."""

from jsonld_spark import doc_to_quads
from jsonld_spark.from_rdf import from_quads
from jsonld_spark.rdf_model import (
    RDF_LANGSTRING,
    XSD_INTEGER,
    XSD_STRING,
    Quad,
)


def test_simple_grouping():
    quads = [
        Quad("http://e/a", "http://p/name", "Alice", True, XSD_STRING, None, None),
        Quad(
            "http://e/a",
            "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
            "http://t/Person",
            False,
            None,
            None,
            None,
        ),
        Quad("http://e/a", "http://p/knows", "http://e/b", False, None, None, None),
        Quad("http://e/b", "http://p/name", "Bob", True, XSD_STRING, None, None),
    ]
    out = from_quads(quads, ordered=True)
    assert [n["@id"] for n in out] == ["http://e/a", "http://e/b"]
    a = out[0]
    assert a["@type"] == ["http://t/Person"]
    assert a["http://p/name"] == [{"@value": "Alice"}]
    assert a["http://p/knows"] == [{"@id": "http://e/b"}]


def test_typed_and_lang_literals():
    quads = [
        Quad("http://e/a", "http://p/age", "33", True, XSD_INTEGER, None, None),
        Quad("http://e/a", "http://p/label", "hi", True, RDF_LANGSTRING, "en", None),
    ]
    out = from_quads(quads)
    a = out[0]
    assert a["http://p/age"] == [{"@value": "33", "@type": XSD_INTEGER}]
    assert a["http://p/label"] == [{"@value": "hi", "@language": "en"}]
    native = from_quads(quads, use_native_types=True)[0]
    assert native["http://p/age"] == [{"@value": 33}]


def test_list_roundtrip():
    doc = {
        "@context": {"p": {"@id": "http://s.org/p", "@container": "@list"}},
        "@id": "http://e.com/a",
        "p": ["x", "y", "z"],
    }
    quads = doc_to_quads(doc)
    out = from_quads(quads, ordered=True)
    assert out == [
        {
            "@id": "http://e.com/a",
            "http://s.org/p": [
                {"@list": [{"@value": "x"}, {"@value": "y"}, {"@value": "z"}]}
            ],
        }
    ]


def test_empty_list_roundtrip():
    doc = {
        "@context": {"p": {"@id": "http://s.org/p", "@container": "@list"}},
        "@id": "http://e.com/a",
        "p": [],
    }
    out = from_quads(doc_to_quads(doc))
    assert out[0]["http://s.org/p"] == [{"@list": []}]


def test_shared_list_node_not_folded():
    # a list node referenced twice must stay reified
    quads = doc_to_quads(
        {
            "@context": {"p": {"@id": "http://s.org/p", "@container": "@list"}},
            "@id": "http://e.com/a",
            "p": ["x"],
        }
    )
    head = next(q.obj for q in quads if q.pred == "http://s.org/p")
    quads.append(
        Quad("http://e.com/b", "http://s.org/also", head, False, None, None, None)
    )
    out = from_quads(quads, ordered=True)
    ids = {n["@id"] for n in out}
    assert head in ids  # bnode survives — not folded


def test_named_graph_nesting():
    quads = [
        Quad("http://e/a", "http://p/x", "v", True, XSD_STRING, None, "http://g/1"),
    ]
    out = from_quads(quads, ordered=True)
    assert out == [
        {
            "@id": "http://g/1",
            "@graph": [
                {"@id": "http://e/a", "http://p/x": [{"@value": "v"}]}
            ],
        }
    ]


def test_full_roundtrip_doc():
    doc = {
        "@context": {
            "@vocab": "http://v/",
            "knows": {"@id": "http://v/knows", "@type": "@id"},
        },
        "@id": "http://e/a",
        "@type": "Person",
        "name": "Alice",
        "age": 33,
        "knows": "http://e/b",
    }
    quads = doc_to_quads(doc)
    out = from_quads(quads, ordered=True)
    a = next(n for n in out if n["@id"] == "http://e/a")
    assert a["@type"] == ["http://v/Person"]
    assert a["http://v/name"] == [{"@value": "Alice"}]
    assert a["http://v/age"] == [
        {"@value": "33", "@type": XSD_INTEGER}
    ]
    # and quads regenerate identically from the materialized doc
    re_quads = set()
    from jsonld_spark.to_rdf import expanded_to_quads

    re_quads = set(expanded_to_quads(out))
    assert re_quads == set(quads)


def test_materialize_graphs_spark(spark):
    from jsonld_spark.operators.materialize import materialize_graphs, node_stats

    triples = spark.createDataFrame(
        [
            ("http://e/a", "http://p/x", "v", True, XSD_STRING, None, None),
            ("http://e/a", "http://p/y", "http://e/b", False, None, None, None),
            ("http://e/c", "http://p/x", "w", True, XSD_STRING, None, "http://g/1"),
        ],
        "subj string, pred string, obj string, obj_is_literal boolean, obj_datatype string, obj_lang string, graph string",
    )
    out = {r.graph: r for r in materialize_graphs(triples).collect()}
    assert out[None].n_nodes == 1
    assert out["http://g/1"].n_nodes == 1
    stats = node_stats(triples).collect()
    assert len(stats) == 2


def test_materialize_compacted_roundtrip(spark):
    """Writer parity: triples → compacted JSON-LD docs per graph."""
    import json as _json

    from jsonld_spark.operators.materialize import materialize_compacted

    rows = [
        ("http://e/a", "http://v/name", "Alice", True, None, None, None),
        ("http://e/a", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
         "http://v/Person", False, None, None, None),
        ("http://e/a", "http://v/knows", "http://e/b", False, None, None, None),
    ]
    t = spark.createDataFrame(
        rows,
        "subj string, pred string, obj string, obj_is_literal boolean, "
        "obj_datatype string, obj_lang string, graph string",
    )
    ctx = {"@vocab": "http://v/", "knows": {"@type": "@id"}}
    (row,) = materialize_compacted(t, ctx).collect()
    doc = _json.loads(row.jsonld)
    node = doc[0] if isinstance(doc, list) else doc
    assert node["@id"] == "http://e/a"
    assert node["name"] == "Alice"
    assert node["@type"] == "Person"
    assert node["knows"] == "http://e/b"


RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"


def test_list_with_cycle_not_folded():
    """An rdf:rest cycle is not a well-formed list — nodes stay explicit."""
    quads = [
        Quad("http://e/a", "http://p/l", "_:l1", False, None, None, None),
        Quad("_:l1", RDF_NS + "first", "x", True, XSD_STRING, None, None),
        Quad("_:l1", RDF_NS + "rest", "_:l2", False, None, None, None),
        Quad("_:l2", RDF_NS + "first", "y", True, XSD_STRING, None, None),
        Quad("_:l2", RDF_NS + "rest", "_:l1", False, None, None, None),
    ]
    out = from_quads(quads, ordered=True)
    top = next(n for n in out if n["@id"] == "http://e/a")
    assert "@list" not in str(top.get("http://p/l"))


def test_list_node_with_extra_property_not_folded():
    """A cons cell with extra properties is not well-formed (spec 5.3)."""
    quads = [
        Quad("http://e/a", "http://p/l", "_:l1", False, None, None, None),
        Quad("_:l1", RDF_NS + "first", "x", True, XSD_STRING, None, None),
        Quad("_:l1", RDF_NS + "rest", RDF_NS + "nil", False, None, None, None),
        Quad("_:l1", "http://p/extra", "e", True, XSD_STRING, None, None),
    ]
    out = from_quads(quads, ordered=True)
    top = next(n for n in out if n["@id"] == "http://e/a")
    (ref,) = top["http://p/l"]
    assert ref == {"@id": "_:l1"}  # stays a node reference, list kept explicit


def test_native_types_converts_numbers_and_booleans():
    quads = [
        Quad("http://e/a", "http://p/i", "42", True, XSD_INTEGER, None, None),
        Quad(
            "http://e/a",
            "http://p/b",
            "true",
            True,
            "http://www.w3.org/2001/XMLSchema#boolean",
            None,
            None,
        ),
        Quad(
            "http://e/a",
            "http://p/d",
            "2.5E0",
            True,
            "http://www.w3.org/2001/XMLSchema#double",
            None,
            None,
        ),
    ]
    (node,) = from_quads(quads, use_native_types=True)
    assert node["http://p/i"] == [{"@value": 42}]
    assert node["http://p/b"] == [{"@value": True}]
    assert node["http://p/d"] == [{"@value": 2.5}]


def test_without_native_types_keeps_lexical_forms():
    quads = [
        Quad("http://e/a", "http://p/i", "042", True, XSD_INTEGER, None, None),
    ]
    (node,) = from_quads(quads, use_native_types=False)
    assert node["http://p/i"] == [
        {"@value": "042", "@type": XSD_INTEGER}
    ]


def test_langstring_recovers_language():
    quads = [
        Quad("http://e/a", "http://p/t", "bonjour", True, RDF_LANGSTRING, "fr", None),
    ]
    (node,) = from_quads(quads)
    assert node["http://p/t"] == [{"@value": "bonjour", "@language": "fr"}]


def test_nil_object_becomes_empty_list():
    quads = [
        Quad("http://e/a", "http://p/l", RDF_NS + "nil", False, None, None, None),
    ]
    (node,) = from_quads(quads)
    assert node["http://p/l"] == [{"@list": []}]


def test_materialize_framed(spark):
    """Writer frame parity: triples → framed JSON-LD per graph."""
    import json as _json

    from jsonld_spark.operators.materialize import materialize_framed

    rows = [
        ("http://e/lib", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
         "http://v/Library", False, None, None, None),
        ("http://e/lib", "http://v/contains", "http://e/book", False, None, None, None),
        ("http://e/book", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
         "http://v/Book", False, None, None, None),
        ("http://e/book", "http://v/title", "T", True, None, None, None),
    ]
    t = spark.createDataFrame(
        rows,
        "subj string, pred string, obj string, obj_is_literal boolean, "
        "obj_datatype string, obj_lang string, graph string",
    )
    frame = {"@context": {"@vocab": "http://v/"}, "@type": "Library"}
    (row,) = materialize_framed(t, frame).collect()
    doc = _json.loads(row.jsonld)
    assert doc["@type"] == "Library"
    assert doc["contains"]["title"] == "T"  # book embedded under the library


def test_native_types_nonfinite_double_stays_typed_string():
    """NaN/INF are valid xsd:double lexicals but have no JSON
    representation — native conversion must skip them so downstream
    json.dumps stays valid JSON."""
    import json as _json

    from jsonld_spark.from_rdf import from_quads
    from jsonld_spark.rdf_model import Quad

    XSD_D = "http://www.w3.org/2001/XMLSchema#double"
    docs = from_quads(
        [
            Quad("http://s", "http://p", "NaN", True, XSD_D, None, None),
            Quad("http://s", "http://p", "INF", True, XSD_D, None, None),
            Quad("http://s", "http://p", "4.2E0", True, XSD_D, None, None),
        ],
        use_native_types=True,
    )
    vals = docs[0]["http://p"]
    by_val = {_json.dumps(v.get("@value")): v for v in vals}
    assert '"NaN"' in by_val and by_val['"NaN"']["@type"] == XSD_D
    assert '"INF"' in by_val and by_val['"INF"']["@type"] == XSD_D
    assert 4.2 in [v.get("@value") for v in vals]
    _json.loads(_json.dumps(docs))  # round-trips as STRICT JSON
