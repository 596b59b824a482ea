"""JSON-LD-star (RDF-star) behind ``rdfstar=True``.

Cases mirror the reference's rdfstar suites:
spec/expand_spec.rb:3419-4007 ('JSON-LD-star'), flatten_spec.rb:704-1211,
lib/json/ld/expand.rb:293-342 & 617-621, flatten.rb:60-150 & 216-246,
to_rdf.rb:86-91 (quoted statements).
"""

import json

import pytest

from jsonld_spark import errors as err
from jsonld_spark.expand import expand_document
from jsonld_spark.flatten import flatten_expanded
from jsonld_spark.to_rdf import doc_to_quads


def exp(d, **kw):
    return expand_document(json.loads(d), rdfstar=True, **kw)


# -- expansion: embedded subjects/objects (expand_spec.rb:3455-3700) --------


@pytest.mark.parametrize(
    "doc,expected",
    [
        (
            '{"@id": {"ex:prop": "value"}, "ex:prop": "value2"}',
            [{"@id": {"ex:prop": [{"@value": "value"}]},
              "ex:prop": [{"@value": "value2"}]}],
        ),
        (
            '{"@id": {"@id": "ex:rei", "ex:prop": "value"}, "ex:prop": "value2"}',
            [{"@id": {"@id": "ex:rei", "ex:prop": [{"@value": "value"}]},
              "ex:prop": [{"@value": "value2"}]}],
        ),
        (
            '{"@id": {"@id": "_:rei", "ex:prop": "value"}, "ex:prop": "value2"}',
            [{"@id": {"@id": "_:rei", "ex:prop": [{"@value": "value"}]},
              "ex:prop": [{"@value": "value2"}]}],
        ),
        (
            '{"@id": {"@id": "ex:rei", "@type": "ex:Type"}, "ex:prop": "value2"}',
            [{"@id": {"@id": "ex:rei", "@type": ["ex:Type"]},
              "ex:prop": [{"@value": "value2"}]}],
        ),
        (
            '{"@id": {"@id": "ex:rei", "ex:prop": {"@id": "ex:value"}}, "ex:prop": "value2"}',
            [{"@id": {"@id": "ex:rei", "ex:prop": [{"@id": "ex:value"}]},
              "ex:prop": [{"@value": "value2"}]}],
        ),
        (
            '{"@id": "ex:subj", "ex:value": {"@id": {"@id": "ex:rei", "ex:prop": "value"}}}',
            [{"@id": "ex:subj",
              "ex:value": [{"@id": {"@id": "ex:rei",
                                    "ex:prop": [{"@value": "value"}]}}]}],
        ),
        (
            """{"@id": {"@id": {"@id": "ex:rei", "ex:prop": "value3"},
                "ex:prop": "value"}, "ex:prop": "value2"}""",
            [{"@id": {"@id": {"@id": "ex:rei", "ex:prop": [{"@value": "value3"}]},
                      "ex:prop": [{"@value": "value"}]},
              "ex:prop": [{"@value": "value2"}]}],
        ),
    ],
    ids=[
        "embedded-subject-no-id",
        "embedded-subject-iri-id",
        "embedded-subject-bnode-id",
        "embedded-subject-type",
        "embedded-subject-iri-value",
        "embedded-object",
        "recursive-embedded-subject",
    ],
)
def test_expand_embedded_nodes(doc, expected):
    assert exp(doc) == expected


@pytest.mark.parametrize(
    "doc,exc",
    [
        ('{"@id": {"@id": "ex:rei"}, "ex:prop": "v"}', err.InvalidEmbeddedNode),
        ('{"@id": {"@id": "ex:rei", "ex:prop": ["v1", "v2"]}, "ex:prop": "v3"}',
         err.InvalidEmbeddedNode),
        ('{"@id": {"@id": "ex:rei", "@type": ["ex:T1", "ex:T2"]}, "ex:prop": "v"}',
         err.InvalidEmbeddedNode),
        ('{"@id": {"@id": "ex:rei", "@type": "ex:T", "ex:prop": "v"}, "ex:prop": "v2"}',
         err.InvalidEmbeddedNode),
        ('{"@id": {"@id": "ex:rei", "@reverse": {"ex:prop": {"@id": "ex:v"}}}, "ex:prop": "v2"}',
         err.InvalidEmbeddedNode),
        ('{"@id": "ex:bob", "ex:name": "Bob", "@annotation": {"ex:prop": "v"}}',
         err.InvalidAnnotation),
        ('{"@id": "ex:bob", "@graph": {"@id": "ex:fred", "ex:name": "Fred", "@annotation": {"ex:prop": "v"}}}',
         err.InvalidAnnotation),
        ('{"@id": "ex:bob", "ex:knows": {"@id": "ex:fred", "@annotation": {"@id": "ex:x", "ex:prop": "v"}}}',
         err.InvalidAnnotation),
        ('{"@id": "ex:bob", "ex:knows": {"@id": "fred", "@annotation": "value2"}}',
         err.InvalidAnnotation),
        ('{"@id": "ex:bob", "ex:knows": {"@list": [{"@id": "ex:fred"}], "@annotation": {"ex:prop": "v"}}}',
         err.InvalidSetOrListObject),
        ('{"@id": "ex:bob", "ex:knows": {"@list": [{"@id": "ex:fred", "@annotation": {"ex:prop": "v"}}]}}',
         err.InvalidAnnotation),
        ('{"@id": "ex:bob", "ex:name": "Bob", "@included": [{"@id": "ex:fred", "ex:name": "F", "@annotation": {"ex:prop": "v"}}]}',
         err.InvalidAnnotation),
    ],
    ids=[
        "no-property", "multiple-properties", "multiple-types",
        "type-and-property", "embedded-reverse",
        "annotation-top-level", "annotation-top-level-graph",
        "annotation-with-id", "annotation-value-object",
        "annotation-on-list", "annotation-on-list-value",
        "annotation-top-level-included",
    ],
)
def test_expand_star_errors(doc, exc):
    with pytest.raises(exc):
        exp(doc)


def test_expand_annotation_on_value_and_node():
    out = exp('{"@id": "ex:bob", "ex:age": {"@value": 23, "@annotation": {"ex:certainty": 0.8}}}')
    assert out == [{"@id": "ex:bob",
                    "ex:age": [{"@value": 23,
                                "@annotation": [{"ex:certainty": [{"@value": 0.8}]}]}]}]
    out = exp('{"@id": "ex:bob", "ex:knows": {"@id": "ex:fred", "@annotation": {"ex:certainty": 0.8}}}')
    assert out == [{"@id": "ex:bob",
                    "ex:knows": [{"@id": "ex:fred",
                                  "@annotation": [{"ex:certainty": [{"@value": 0.8}]}]}]}]


def test_annotation_ignored_without_rdfstar_with_warning():
    """The rdfstar=False path keeps round-2 behavior: drop + warning row."""
    w = []
    out = expand_document(
        json.loads('{"@id": "ex:bob", "ex:age": {"@value": 23, "@annotation": {"ex:certainty": 0.8}}}'),
        warnings_out=w,
    )
    assert out == [{"@id": "ex:bob", "ex:age": [{"@value": 23}]}]
    assert any("@annotation" in x for x in w)
    # embedded @id without rdfstar stays an error (expand_spec.rb:3419)
    with pytest.raises(err.InvalidIdValue):
        expand_document(json.loads('{"@id": {"ex:prop": "v"}, "ex:prop": "v2"}'))


# -- toRdf: quoted-triple emission ------------------------------------------


def test_tordf_value_annotation_quoted_subject():
    doc = {"@id": "http://e/bob",
           "http://e/age": {"@value": 23, "@annotation": {"http://e/c": "high"}}}
    quads = doc_to_quads(json.loads(json.dumps(doc)), rdfstar=True)
    asserted = [(q.subj, q.pred, q.obj) for q in quads]
    assert ("http://e/bob", "http://e/age", "23") in asserted
    quoted = [q for q in quads if q.subj.startswith("<<")]
    assert len(quoted) == 1
    assert quoted[0].subj == (
        '<< <http://e/bob> <http://e/age> "23"^^<http://www.w3.org/2001/XMLSchema#integer> >>'
    )
    assert quoted[0].pred == "http://e/c" and quoted[0].obj == "high"


def test_tordf_node_annotation_quoted_subject():
    doc = {"@id": "http://e/bob",
           "http://e/knows": {"@id": "http://e/fred",
                              "@annotation": {"http://e/c": {"@value": 0.8}}}}
    quads = doc_to_quads(json.loads(json.dumps(doc)), rdfstar=True)
    subs = {q.subj for q in quads}
    assert "<< <http://e/bob> <http://e/knows> <http://e/fred> >>" in subs
    # the base triple is asserted too
    assert ("http://e/bob", "http://e/knows", "http://e/fred") in {
        (q.subj, q.pred, q.obj) for q in quads
    }


def test_tordf_embedded_subject_not_asserted():
    """A quoted statement is referenced, not asserted (to_rdf.rb quoted:)."""
    doc = {"@id": {"@id": "http://e/rei", "http://e/p": "value"},
           "http://e/p": "value2"}
    quads = doc_to_quads(json.loads(json.dumps(doc)), rdfstar=True)
    assert len(quads) == 1
    q = quads[0]
    assert q.subj == '<< <http://e/rei> <http://e/p> "value" >>'
    assert q.pred == "http://e/p" and q.obj == "value2"
    # the inner statement itself is NOT in the asserted set
    assert not any(qq.subj == "http://e/rei" for qq in quads)


def test_tordf_recursive_quoted():
    doc = {"@id": {"@id": {"@id": "http://e/rei", "http://e/p": "v3"},
                   "http://e/p": "v"},
           "http://e/p": "v2"}
    quads = doc_to_quads(json.loads(json.dumps(doc)), rdfstar=True)
    assert len(quads) == 1
    assert quads[0].subj == (
        '<< << <http://e/rei> <http://e/p> "v3" >> <http://e/p> "v" >>'
    )


# -- flatten: reification + create_annotations inverse -----------------------


def test_flatten_reifies_annotation_and_inverse_refolds():
    doc = {"@id": "ex:bob", "ex:name": [{"@value": "Bob"}],
           "ex:knows": {"@id": "ex:fred", "@annotation": {"ex:certainty": 0.8}}}
    expanded = exp(json.dumps(doc))
    flat = flatten_expanded(json.loads(json.dumps(expanded)))
    star_nodes = [n for n in flat if isinstance(n.get("@id"), dict)]
    assert len(star_nodes) == 1
    assert star_nodes[0]["@id"] == {"@id": "ex:bob", "ex:knows": [{"@id": "ex:fred"}]}
    assert star_nodes[0]["ex:certainty"] == [{"@value": 0.8}]

    refolded = flatten_expanded(
        json.loads(json.dumps(expanded)), create_annotations_=True
    )
    assert refolded == [{
        "@id": "ex:bob",
        "ex:knows": [{"@id": "ex:fred",
                      "@annotation": [{"ex:certainty": [{"@value": 0.8}]}]}],
        "ex:name": [{"@value": "Bob"}],
    }]


def test_flatten_value_annotation_roundtrip():
    doc = {"@id": "ex:bob",
           "ex:age": {"@value": 23, "@annotation": {"ex:c": "high"}}}
    expanded = exp(json.dumps(doc))
    refolded = flatten_expanded(
        json.loads(json.dumps(expanded)), create_annotations_=True
    )
    assert refolded == [{
        "@id": "ex:bob",
        "ex:age": [{"@value": 23,
                    "@annotation": [{"ex:c": [{"@value": "high"}]}]}],
    }]


def test_flatten_annotation_ignored_without_rdfstar():
    """flatten_spec.rb:704-733: annotations vanish without rdfstar."""
    doc = {"@id": "ex:bob",
           "ex:knows": {"@id": "ex:fred", "@annotation": {"ex:c": 0.8}}}
    expanded = expand_document(json.loads(json.dumps(doc)))
    flat = flatten_expanded(expanded)
    assert flat == [
        {"@id": "ex:bob", "ex:knows": [{"@id": "ex:fred"}]},
        {"@id": "ex:fred"},
    ] or flat == [{"@id": "ex:bob", "ex:knows": [{"@id": "ex:fred"}]}]


def test_pipeline_rdfstar_quoted_terms_salted(spark):
    """KGPipeline(rdfstar=True): annotation triples reach the triples
    table with quoted-term subjects whose inner bnode labels carry the
    same salted global ids as the asserted triples."""
    from jsonld_spark.pipeline import KGPipeline

    doc = {
        "@id": "http://e/bob",
        # bnode object with an annotation → quoted term contains a bnode
        "http://e/knows": {"http://e/name": "anon",
                           "@annotation": {"http://e/c": "high"}},
    }
    html = (
        '<script type="application/ld+json">' + json.dumps(doc) + "</script>"
    ).encode()
    pages = spark.createDataFrame([("http://p.e/", html)], "url string, html binary")
    pipe = KGPipeline(spark, rdfstar=True)
    rows = pipe.triples(pages).collect()
    asserted_bnodes = {
        r.subj for r in rows if r.subj.startswith("_:")
    } | {r.obj for r in rows if not r.obj_is_literal and r.obj.startswith("_:")}
    quoted = [r for r in rows if r.subj.startswith("<<")]
    assert quoted, rows
    inner_bnodes = {
        tok for r in quoted for tok in r.subj.split() if tok.startswith("_:")
    }
    assert inner_bnodes and inner_bnodes <= asserted_bnodes, (
        inner_bnodes,
        asserted_bnodes,
    )
    # rdfstar off: same page yields no quoted terms, plus a warning row
    pipe_off = KGPipeline(spark)
    off = pipe_off.extract(pages).collect()
    assert not any((r.subj or "").startswith("<<") for r in off)
    assert any((r.error or "").startswith("warning:") for r in off)


# -- compaction of embedded nodes / annotations (compact_spec.rb:3222-3392) --


def test_compact_embedded_object_cases():
    from jsonld_spark.compact import compact_document

    ctx = {"ex": "http://example/"}
    # object-iii
    inp = [{"@id": "http://example/s",
            "http://example/p": [{"@id": {"@id": "http://example/s1",
                                          "http://example/p1": [{"@id": "http://example/o1"}]}}]}]
    out = compact_document(inp, ctx)
    assert out == {"@context": ctx, "@id": "ex:s",
                   "ex:p": {"@id": {"@id": "ex:s1", "ex:p1": {"@id": "ex:o1"}}}}
    # object-iil (literal value inside embedded node)
    inp = [{"@id": "http://example/s",
            "http://example/p": [{"@id": {"@id": "http://example/s1",
                                          "http://example/p1": [{"@value": "o1"}]}}]}]
    out = compact_document(inp, ctx)
    assert out == {"@context": ctx, "@id": "ex:s",
                   "ex:p": {"@id": {"@id": "ex:s1", "ex:p1": "o1"}}}
    # recursive-subject
    inp = [{"@id": {"@id": {"@id": "http://example/s2",
                            "http://example/p2": [{"@id": "http://example/o2"}]},
                    "http://example/p1": [{"@id": "http://example/o1"}]},
            "http://example/p": [{"@id": "http://example/o"}]}]
    out = compact_document(inp, ctx)
    assert out == {"@context": ctx,
                   "@id": {"@id": {"@id": "ex:s2", "ex:p2": {"@id": "ex:o2"}},
                           "ex:p1": {"@id": "ex:o1"}},
                   "ex:p": {"@id": "ex:o"}}


def test_compact_annotation_roundtrips():
    from jsonld_spark.compact import compact_document

    ctx = {"ex": "http://e/"}
    for doc in [
        {"@id": "http://e/bob",
         "http://e/knows": {"@id": "http://e/fred",
                            "@annotation": {"http://e/certainty": 0.8}}},
        {"@id": "http://e/bob",
         "http://e/age": {"@value": 23, "@annotation": {"http://e/c": "hi"}}},
        {"@id": {"@id": "http://e/rei", "http://e/prop": "value"},
         "http://e/prop": "value2"},
    ]:
        expanded = expand_document(json.loads(json.dumps(doc)), rdfstar=True)
        compacted = compact_document(json.loads(json.dumps(expanded)), ctx)
        re_expanded = expand_document(json.loads(json.dumps(compacted)), rdfstar=True)
        assert re_expanded == expanded, (doc, compacted)


def test_nquads_star_roundtrip():
    """N-Quads-star interop: quoted terms (nested, with '>>' inside
    literals, in subject and object position) survive serialize → parse."""
    from jsonld_spark.rdf_model import Quad, parse_nquads, quads_to_nquads

    XS = "http://www.w3.org/2001/XMLSchema#string"
    qs = [
        Quad("<< <http://e/b> <http://e/k> <http://e/f> >>", "http://e/c",
             "hi", True, XS, None, None),
        Quad('<< << <http://e/r> <http://e/p> "v3" >> <http://e/p> "v" >>',
             "http://e/p", "v2", True, XS, None, None),
        Quad("http://e/x", "http://e/ref",
             "<< <http://e/b> <http://e/k> _:b0 >>", False, None, None,
             "http://g/1"),
        Quad('<< <http://e/b> <http://e/k> "has >> inside" >>', "http://e/c",
             "ok", True, XS, None, None),
        Quad('<< <http://e/b> <http://e/k> "x"^^<http://e/dt> >>',
             "http://e/c", "3", True,
             "http://www.w3.org/2001/XMLSchema#integer", None, "_:g0"),
    ]
    assert sorted(parse_nquads(quads_to_nquads(qs))) == sorted(qs)


def test_pipeline_rdfstar_nquads_roundtrip(spark):
    """Full circle: rdfstar pipeline → N-Quads-star sink text → parse."""
    from jsonld_spark.operators.nquads import nquad_col
    from jsonld_spark.pipeline import KGPipeline
    from jsonld_spark.rdf_model import parse_nquads

    doc = {"@id": "http://e/bob",
           "http://e/knows": {"@id": "http://e/fred",
                              "@annotation": {"http://e/c": "high"}}}
    html = ('<script type="application/ld+json">' + json.dumps(doc)
            + "</script>").encode()
    pages = spark.createDataFrame([("http://p.e/", html)],
                                  "url string, html binary")
    rows = (KGPipeline(spark, rdfstar=True).triples(pages)
            .select(nquad_col().alias("nq")).collect())
    text = "\n".join(r.nq for r in rows)
    back = parse_nquads(text)
    assert len(back) == 2
    assert any(q.subj.startswith("<<") for q in back)


def test_from_rdf_star_roundtrip():
    """Full circle (from_rdf.rb:196-207 parity): annotated JSON-LD →
    quoted-term quads → fromRdf (embedded @id representation, JCS-keyed)
    → create_annotations refold == the original flattened document."""
    from jsonld_spark.flatten import flatten_expanded
    from jsonld_spark.from_rdf import from_quads

    doc = {"@id": "http://e/bob",
           "http://e/knows": {"@id": "http://e/fred",
                              "@annotation": {"http://e/certainty": {"@value": "high"}}}}
    quads = doc_to_quads(json.loads(json.dumps(doc)), rdfstar=True)
    back = from_quads(quads, ordered=True)
    star_nodes = [n for n in back if isinstance(n.get("@id"), dict)]
    assert len(star_nodes) == 1
    assert star_nodes[0]["@id"] == {
        "@id": "http://e/bob",
        "http://e/knows": [{"@id": "http://e/fred"}],
    }
    refolded = flatten_expanded(json.loads(json.dumps(back)), create_annotations_=True)
    orig = flatten_expanded(
        expand_document(json.loads(json.dumps(doc)), rdfstar=True),
        create_annotations_=True,
    )
    assert refolded == orig


def test_from_rdf_star_nested_and_type():
    """Nested quoted subjects and rdf:type inside embedded statements."""
    from jsonld_spark.from_rdf import from_quads
    from jsonld_spark.rdf_model import Quad

    RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    quads = [
        Quad('<< << <http://e/r> <http://e/p> "v" >> <http://e/q> <http://e/o> >>',
             "http://e/c", "x", True,
             "http://www.w3.org/2001/XMLSchema#string", None, None),
        Quad(f"<< <http://e/s> <{RDF_TYPE}> <http://e/T> >>",
             "http://e/c", "y", True,
             "http://www.w3.org/2001/XMLSchema#string", None, None),
    ]
    out = from_quads(quads, ordered=True)
    ids = [n["@id"] for n in out if isinstance(n.get("@id"), dict)]
    assert {"@id": {"@id": "http://e/r", "http://e/p": [{"@value": "v"}]},
            "http://e/q": [{"@id": "http://e/o"}]} in ids
    assert {"@id": "http://e/s", "@type": "http://e/T"} in ids


def test_streaming_reader_rdfstar_parity():
    """The bounded reader honors rdfstar on spine AND node-property
    paths — quoted-term output isomorphic to batch."""
    from jsonld_spark.canon import canonicalize_quads
    from jsonld_spark.streaming.reader import stream_doc_quads

    docs = [
        [{"@id": "http://e/b",
          "http://e/k": [{"@id": "http://e/f",
                          "@annotation": [{"http://e/c": [{"@value": "hi"}]}]}]}],
        {"@id": "http://e/b",
         "http://e/k": {"@id": "http://e/f", "@annotation": {"http://e/c": "hi"}}},
    ]
    for doc in docs:
        b = set(canonicalize_quads(sorted(set(
            doc_to_quads(json.loads(json.dumps(doc)), base="http://b/", rdfstar=True)))))
        s = set(canonicalize_quads(sorted(set(
            stream_doc_quads(json.loads(json.dumps(doc)), base="http://b/", rdfstar=True)))))
        assert s == b
        assert any(q.subj.startswith("<<") for q in b)


def test_quoted_term_escaping_matches_asserted_literal():
    """A \\b (U+0008) in the annotated literal must serialize identically
    inside the quoted term and in the asserted quad (rdf_model's writer
    escaping), or set/canonical comparisons diverge."""
    doc = {
        "@id": "http://ex/s",
        "http://ex/p": {
            "@value": "a\bb",
            "@annotation": {"http://ex/conf": 1},
        },
    }
    quads = doc_to_quads(doc, rdfstar=True)
    asserted = [q for q in quads if q.subj == "http://ex/s"]
    annot = [q for q in quads if q.subj.startswith("<<")]
    assert asserted and annot
    from jsonld_spark.rdf_model import quad_to_nquads
    line = quad_to_nquads(asserted[0])
    lit_text = line.split(" ", 2)[2].rsplit(" .", 1)[0]
    assert lit_text in annot[0].subj, (lit_text, annot[0].subj)
    assert "\b" not in annot[0].subj  # raw control byte never embedded


def test_embedded_bnode_type_tracks_asserted_rename():
    """A bnode @type inside an embedded statement (used as @id) must get
    the same renamed label as the asserted @type occurrence — the
    upfront rename pass covers @type values, not just @id strings."""
    doc = [
        {
            "@id": {"@id": "http://ex/x", "@type": "_:t"},
            "http://ex/q": "v",
        },
        {"@id": "http://ex/x", "@type": "_:t"},
    ]
    quads = doc_to_quads(doc, rdfstar=True)
    type_objs = {
        q.obj for q in quads
        if q.pred == "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
        and q.subj == "http://ex/x"
    }
    assert type_objs and all(o.startswith("_:") and o != "_:t" for o in type_objs)
    renamed = next(iter(type_objs))
    star_subjects = [q.subj for q in quads if q.subj.startswith("<<")]
    assert star_subjects
    for t in star_subjects:
        assert "_:t" not in t.replace(renamed, ""), (renamed, t)
        assert renamed in t, (renamed, t)
