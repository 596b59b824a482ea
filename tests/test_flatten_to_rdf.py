"""Flatten + toRdf unit tests (W3C-suite-style cases, written from spec)."""

from jsonld_spark import (
    doc_to_quads,
    flatten_expanded,
    expand_document,
    quads_to_nquads,
)
from jsonld_spark.rdf_model import (
    RDF_FIRST,
    RDF_JSON,
    RDF_LANGSTRING,
    RDF_NIL,
    RDF_REST,
    RDF_TYPE,
    XSD_BOOLEAN,
    XSD_DOUBLE,
    XSD_INTEGER,
    XSD_STRING,
    Quad,
    canonical_double,
    jcs_canonicalize,
    parse_nquads,
)


def quads(doc, **kw):
    return set(doc_to_quads(doc, **kw))


def test_simple_triples():
    doc = {
        "@context": {"@vocab": "http://s.org/"},
        "@id": "http://e.com/a",
        "@type": "Person",
        "name": "Alice",
        "age": 33,
        "score": 1.5,
        "alive": True,
    }
    q = quads(doc)
    assert Quad("http://e.com/a", RDF_TYPE, "http://s.org/Person", False, None, None, None) in q
    assert Quad("http://e.com/a", "http://s.org/name", "Alice", True, XSD_STRING, None, None) in q
    assert Quad("http://e.com/a", "http://s.org/age", "33", True, XSD_INTEGER, None, None) in q
    assert Quad("http://e.com/a", "http://s.org/score", "1.5E0", True, XSD_DOUBLE, None, None) in q
    assert Quad("http://e.com/a", "http://s.org/alive", "true", True, XSD_BOOLEAN, None, None) in q


def test_integral_float_is_integer():
    doc = {
        "@context": {"@vocab": "http://s.org/"},
        "@id": "http://e.com/a",
        "n": 10.0,
    }
    q = quads(doc)
    assert Quad("http://e.com/a", "http://s.org/n", "10", True, XSD_INTEGER, None, None) in q


def test_huge_number_is_double():
    doc = {
        "@context": {"@vocab": "http://s.org/"},
        "@id": "http://e.com/a",
        "n": 10_000_000_000_000_000_000_000,
    }
    q = quads(doc)
    assert Quad("http://e.com/a", "http://s.org/n", "1.0E22", True, XSD_DOUBLE, None, None) in q


def test_forced_double_datatype():
    doc = {
        "@context": {
            "n": {
                "@id": "http://s.org/n",
                "@type": "http://www.w3.org/2001/XMLSchema#double",
            }
        },
        "@id": "http://e.com/a",
        "n": 10,
    }
    q = quads(doc)
    assert Quad("http://e.com/a", "http://s.org/n", "1.0E1", True, XSD_DOUBLE, None, None) in q


def test_language_literal():
    doc = {
        "@context": {"@vocab": "http://s.org/", "@language": "en"},
        "@id": "http://e.com/a",
        "label": "color",
    }
    q = quads(doc)
    assert Quad("http://e.com/a", "http://s.org/label", "color", True, RDF_LANGSTRING, "en", None) in q


def test_bnode_minting_deterministic():
    doc = {
        "@context": {"@vocab": "http://s.org/"},
        "@id": "http://e.com/a",
        "knows": {"name": "Anon"},
    }
    q = quads(doc)
    assert Quad("http://e.com/a", "http://s.org/knows", "_:b0", False, None, None, None) in q
    assert Quad("_:b0", "http://s.org/name", "Anon", True, XSD_STRING, None, None) in q


def test_list_cons_chain():
    doc = {
        "@context": {"p": {"@id": "http://s.org/p", "@container": "@list"}},
        "@id": "http://e.com/a",
        "p": ["x", "y"],
    }
    q = quads(doc)
    # head bnode linked from subject
    heads = [t for t in q if t.pred == "http://s.org/p"]
    assert len(heads) == 1
    head = heads[0].obj
    assert head.startswith("_:")
    firsts = {t.subj: t.obj for t in q if t.pred == RDF_FIRST}
    rests = {t.subj: t.obj for t in q if t.pred == RDF_REST}
    assert firsts[head] == "x"
    nxt = rests[head]
    assert firsts[nxt] == "y"
    assert rests[nxt] == RDF_NIL


def test_empty_list_is_nil():
    doc = {
        "@context": {"p": {"@id": "http://s.org/p", "@container": "@list"}},
        "@id": "http://e.com/a",
        "p": [],
    }
    q = quads(doc)
    assert Quad("http://e.com/a", "http://s.org/p", RDF_NIL, False, None, None, None) in q


def test_named_graph():
    doc = {
        "@context": {"@vocab": "http://s.org/"},
        "@id": "http://e.com/g",
        "@graph": [{"@id": "http://e.com/a", "p": "v"}],
    }
    q = quads(doc)
    assert Quad("http://e.com/a", "http://s.org/p", "v", True, XSD_STRING, None, "http://e.com/g") in q


def test_reverse_swaps():
    doc = {
        "@context": {"children": {"@reverse": "http://s.org/parent"}},
        "@id": "http://e.com/a",
        "children": [{"@id": "http://e.com/b"}],
    }
    q = quads(doc)
    assert Quad("http://e.com/b", "http://s.org/parent", "http://e.com/a", False, None, None, None) in q


def test_json_literal_jcs():
    doc = {
        "@context": {"p": {"@id": "http://s.org/p", "@type": "@json"}},
        "@id": "http://e.com/a",
        "p": {"b": 1, "a": [True, None, 1.5]},
    }
    q = quads(doc)
    assert Quad(
        "http://e.com/a",
        "http://s.org/p",
        '{"a":[true,null,1.5],"b":1}',
        True,
        RDF_JSON,
        None,
        None,
    ) in q


def test_bnode_predicate_dropped():
    doc = {
        "@context": {"p": "_:bprop"},
        "@id": "http://e.com/a",
        "p": "v",
    }
    assert quads(doc) == set()
    q = doc_to_quads(doc, produce_generalized_rdf=True)
    assert len(q) == 1 and q[0].pred.startswith("_:")


def test_relative_subject_dropped():
    doc = {"@context": {"@vocab": "http://s.org/"}, "@id": "rel", "p": "v"}
    assert quads(doc) == set()  # no base → relative @id → invalid statement


def test_i18n_datatype_mode():
    doc = {
        "@context": {"@vocab": "http://s.org/", "@language": "ar", "@direction": "rtl"},
        "@id": "http://e.com/a",
        "label": "x",
    }
    q = doc_to_quads(doc, rdf_direction="i18n-datatype")
    assert q[0].obj_datatype == "https://www.w3.org/ns/i18n#ar_rtl"
    # default: direction dropped, language kept
    q2 = quads(doc)
    assert Quad("http://e.com/a", "http://s.org/label", "x", True, RDF_LANGSTRING, "ar", None) in q2


def test_compound_literal_mode():
    doc = {
        "@context": {"@vocab": "http://s.org/", "@language": "ar", "@direction": "rtl"},
        "@id": "http://e.com/a",
        "label": "x",
    }
    q = doc_to_quads(doc, rdf_direction="compound-literal")
    preds = {t.pred for t in q}
    assert "http://www.w3.org/1999/02/22-rdf-syntax-ns#value" in preds
    assert "http://www.w3.org/1999/02/22-rdf-syntax-ns#direction" in preds


def test_flatten_shapes():
    doc = {
        "@context": {"@vocab": "http://s.org/"},
        "@id": "http://e.com/a",
        "knows": {"name": "Anon", "knows": {"@id": "http://e.com/a"}},
    }
    expanded = expand_document(doc)
    flat = flatten_expanded(expanded)
    ids = {n["@id"] for n in flat}
    assert ids == {"_:b0", "http://e.com/a"}
    bn = next(n for n in flat if n["@id"] == "_:b0")
    assert bn["http://s.org/knows"] == [{"@id": "http://e.com/a"}]


def test_flatten_dedups_values():
    doc = {
        "@context": {"@vocab": "http://s.org/"},
        "@id": "http://e.com/a",
        "p": ["v", "v"],
    }
    flat = flatten_expanded(expand_document(doc))
    assert flat[0]["http://s.org/p"] == [{"@value": "v"}]


def test_nquads_roundtrip():
    doc = {
        "@context": {"@vocab": "http://s.org/", "@language": "en"},
        "@id": "http://e.com/a",
        "label": 'say "hi"\n',
        "n": 3,
    }
    q = doc_to_quads(doc)
    text = quads_to_nquads(q)
    assert set(parse_nquads(text)) == set(q)


def test_canonical_double_forms():
    assert canonical_double(1.5) == "1.5E0"
    assert canonical_double(10.1) == "1.01E1"
    assert canonical_double(-2.0) == "-2.0E0"
    assert canonical_double(1e21) == "1.0E21"
    assert canonical_double(0.000001) == "1.0E-6"
    assert canonical_double(5.0) == "5.0E0"


def test_jcs_numbers():
    assert jcs_canonicalize(1.0) == "1"
    assert jcs_canonicalize(1e21) == "1e+21"
    assert jcs_canonicalize(0.00001) == "0.00001"
    assert jcs_canonicalize(1e-7) == "1e-7"
    assert jcs_canonicalize([1.5, 2, "x"]) == '[1.5,2,"x"]'
    assert jcs_canonicalize({"b": 1, "a": 2}) == '{"a":2,"b":1}'


def test_shared_bnode_across_graphs():
    doc = {
        "@context": {"@vocab": "http://s.org/"},
        "@graph": [
            {
                "@id": "http://e.com/g1",
                "@graph": [{"@id": "_:shared", "p": "v1"}],
            },
            {"@id": "_:shared", "p": "v0"},
        ],
    }
    q = quads(doc)
    subj = {t.subj for t in q}
    # same relabeled bnode in both default and named graph
    assert len(subj) == 1
    graphs = {t.graph for t in q}
    assert graphs == {None, "http://e.com/g1"}


def test_jcs_non_bmp_keys_sort_by_utf16_units_at_every_depth():
    """RFC 8785 sorts keys by UTF-16 code units: a non-BMP key (surrogate
    pair starting 0xD800) sorts BEFORE U+FF61 (0xFF61) — including inside
    nested objects, which previously sorted by code points."""
    doc = {"｡": 1, "\U00010000": 2}
    top = jcs_canonicalize(doc)
    nested = jcs_canonicalize({"outer": doc})
    assert top.index('"\U00010000"') < top.index('"｡"')
    assert nested.index('"\U00010000"') < nested.index('"｡"')


def test_executor_context_cache_keyed_by_identity():
    """The per-worker cache must verify dict identity, not just id():
    a different entries dict (even at a recycled address) rebuilds."""
    from jsonld_spark import udfs

    e1 = {"http://ctx.example/a": {"@context": {"@vocab": "http://v1/"}}}
    e2 = {"http://ctx.example/a": {"@context": {"@vocab": "http://v2/"}}}
    c1 = udfs._get_cache(e1, "v1")
    assert udfs._get_cache(e1, "v1") is c1  # memoized per worker
    c2 = udfs._get_cache(e2, "v1")
    assert c2 is not c1
    # stale-address simulation: poison the map with a wrong dict under
    # e1's key — the identity check must reject it and rebuild
    udfs._CACHE_BY_KEY.clear()
    udfs._CACHE_BY_KEY[("v1", id(e1))] = (e2, c2)
    assert udfs._get_cache(e1, "v1") is not c2
