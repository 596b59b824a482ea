"""Bounded-memory streaming reader tests: equivalence with the batch
toRdf path, chunked Arrow emission, Spark end-to-end parity."""

import json

import pandas as pd
import pytest

from jsonld_spark import doc_to_quads
from jsonld_spark.streaming.reader import (
    make_streaming_pages_to_triples,
    stream_doc_quads,
)

CTX = {"@vocab": "http://v.e/", "name": {"@language": "en"}}


def _entity(i: int) -> dict:
    return {
        "@id": f"http://e.com/{i}",
        "@type": "Thing",
        "name": f"thing {i}",
        "n": i,
        "child": {"p": f"c{i}"},  # anonymous bnode per entity
    }


ARRAY_DOC = [{"@context": CTX, **_entity(i)} for i in range(5)]
GRAPH_DOC = {"@context": CTX, "@graph": [_entity(i) for i in range(5)]}
NAMED_GRAPH_DOC = {
    "@context": CTX,
    "@id": "http://e.com/graph1",
    "@graph": [_entity(i) for i in range(3)],
}
GRAPH_WITH_PROPS = {
    "@context": CTX,
    "@id": "http://e.com/root",
    "name": "root",
    "@graph": [_entity(0)],  # wrapper carries a property → round-4 streaming
}
REVERSE_DOC = {
    "@context": CTX,
    "@id": "http://e.com/hub",
    "name": "hub",
    "@reverse": {"child": [{"@id": "http://e.com/a"}, {"@id": "http://e.com/b"}]},
}
INCLUDED_DOC = {
    "@context": CTX,
    "@id": "http://e.com/main",
    "name": "main",
    "@included": [_entity(1), _entity(2)],
}
INDEX_DOC = {
    "@context": CTX,
    "@id": "http://e.com/idx",
    "@index": "an-index",
    "name": "indexed",
}
NEST_DOC = {
    "@context": CTX,
    "@id": "http://e.com/nested",
    "@nest": {"name": "inner", "n": 4},
}
ANON_GRAPH_DOC = {
    "@context": CTX,
    "name": "anon wrapper",
    "@graph": [_entity(0), _entity(1)],
}
BNODE_GRAPH_DOC = {
    "@context": CTX,
    "@id": "_:g",
    "@graph": [_entity(0), _entity(1)],
}
SET_DOC = {"@context": CTX, "@set": [_entity(0), _entity(1)]}


@pytest.mark.parametrize(
    "doc",
    [ARRAY_DOC, GRAPH_DOC, NAMED_GRAPH_DOC, GRAPH_WITH_PROPS, _entity(7),
     REVERSE_DOC, INCLUDED_DOC, INDEX_DOC, NEST_DOC, BNODE_GRAPH_DOC,
     SET_DOC],
    ids=["array", "graph-wrapper", "named-graph", "graph-with-props",
         "single-node", "reverse", "included", "index", "nest",
         "bnode-named-graph", "set-wrapper"],
)
def test_stream_equals_batch(doc):
    batch = set(doc_to_quads(doc, base="http://base.e/"))
    streamed = set(stream_doc_quads(doc, base="http://base.e/"))
    assert streamed == batch  # shared namer ⇒ identical labels


def test_stream_anon_graph_wrapper_isomorphic():
    """Anonymous wrapper with properties + @graph: the graph name is a
    fresh bnode — labels differ from batch (sentinel vs emission-order
    mint) but the graphs must be isomorphic."""
    from jsonld_spark.canon import canonicalize_quads

    batch = doc_to_quads(ANON_GRAPH_DOC, base="http://base.e/")
    streamed = list(stream_doc_quads(ANON_GRAPH_DOC, base="http://base.e/"))
    assert set(canonicalize_quads(sorted(set(streamed)))) == set(
        canonicalize_quads(sorted(set(batch)))
    )


@pytest.mark.parametrize(
    "doc,poison_probe",
    [
        (
            {
                "@context": CTX,
                "@id": "http://e.com/hub",
                "@reverse": {
                    "child": [{"@id": "http://e.com/ok"}, {"@id": True}]
                },
            },
            "http://e.com/ok",
        ),
        (
            {
                "@context": CTX,
                "@id": "http://e.com/main",
                "@included": [
                    {"@id": "http://e.com/inc", "name": "ok"},
                    {"@id": True},  # invalid — raises when reached
                ],
            },
            "http://e.com/inc",
        ),
        (
            {
                "@context": CTX,
                "@id": "http://e.com/root",
                "@graph": [
                    {"@id": "http://e.com/g1", "name": "ok"},
                    {"@id": False},  # invalid — raises when reached
                ],
            },
            "http://e.com/g1",
        ),
    ],
    ids=["reverse", "included", "graph-with-props"],
)
def test_new_shapes_stream_lazily(doc, poison_probe):
    """VERDICT r3 #5: the round-4 shapes stream item by item — earlier
    items' quads are yielded BEFORE a poisoned later item raises, so no
    batch fallback is buffering the whole document."""
    it = stream_doc_quads(doc, base="http://base.e/")
    got = []
    try:
        for q in it:
            got.append(q)
    except Exception:
        assert any(
            poison_probe in (q.subj, q.obj, q.graph or "") for q in got
        ), f"no quads before poison: {got}"
        return
    raise AssertionError(f"poison item did not raise; got {got}")


def test_stream_is_lazy():
    """The generator yields the first element's quads without touching
    later elements — a poisoned tail element only raises when reached."""
    doc = [
        {"@context": CTX, **_entity(0)},
        {"@context": CTX, "@id": True},  # invalid @id — raises when expanded
    ]
    it = stream_doc_quads(doc, base="http://base.e/")
    first = next(it)
    assert first.subj in ("_:b0", "http://e.com/0")  # element 0's quads
    for _ in range(10):  # element 0 has a handful of quads
        try:
            next(it)
        except StopIteration:
            raise AssertionError("poison element was never reached")
        except Exception:
            return  # poison reached only after element 0 fully streamed
    raise AssertionError("poison element did not raise")


def _page_batch(n_entities: int, url: str = "http://s.e/p") -> pd.DataFrame:
    doc = {"@context": CTX, "@graph": [_entity(i) for i in range(n_entities)]}
    html = (
        '<script type="application/ld+json">' + json.dumps(doc) + "</script>"
    ).encode()
    return pd.DataFrame({"url": [url], "html": [html]})


def test_chunked_emission_bounds_worker_memory():
    """One page with many entities must leave the UDF in ≤chunk_rows
    pieces, not one giant frame."""
    fn = make_streaming_pages_to_triples(None, chunk_rows=100)
    chunks = list(fn(iter([_page_batch(200)])))  # 200 entities × 5 quads
    assert len(chunks) > 5
    assert all(len(c) <= 100 for c in chunks)
    total = sum(len(c) for c in chunks)
    assert total == 200 * 5
    assert all(c["error"].isna().all() for c in chunks)


def test_streaming_spark_parity(spark):
    """mapInPandas streaming output == batch pipeline output (canonical
    relabeling off — streaming cannot do a whole-doc pass) on real pages."""
    from jsonld_spark.pipeline import KGPipeline
    from jsonld_spark.udfs import TRIPLES_SCHEMA

    rows = []
    for i in range(20):
        doc = {"@context": CTX, "@graph": [_entity(j) for j in range(i % 4 + 1)]}
        html = (
            '<script type="application/ld+json">' + json.dumps(doc) + "</script>"
        ).encode()
        rows.append((f"http://site.e/{i}", html))
    pages = spark.createDataFrame(rows, "url string, html binary")

    fn = make_streaming_pages_to_triples(None, chunk_rows=7)
    streamed = pages.mapInPandas(fn, TRIPLES_SCHEMA)

    pipe = KGPipeline(spark, canonical_bnodes=False)
    batch = pipe.extract(pages)

    cols = [c for c in batch.columns]
    s = {tuple(r) for r in streamed.select(cols).collect()}
    b = {tuple(r) for r in batch.select(cols).collect()}
    assert s == b
    assert len(s) > 0


def test_json_typed_array_streams_as_one_literal():
    """A term with ``@type: @json`` must turn the WHOLE array into ONE
    JSON literal — per-item splitting would emit "[1]","[2]","[3]"
    instead of "[1,2,3]" (silent corruption on the property-stream
    path)."""
    doc = {
        "@context": {"@vocab": "http://v.e/", "data": {"@type": "@json"}},
        "@id": "http://e.com/x",
        "data": [1, 2, 3],
    }
    batch = set(doc_to_quads(doc, base="http://base.e/"))
    streamed = set(stream_doc_quads(doc, base="http://base.e/"))
    assert streamed == batch
    lits = [q.obj for q in streamed if q.obj_is_literal]
    assert lits == ["[1,2,3]"]


def test_json_typed_scoped_array_streams_as_one_literal():
    """Same @json rule when the coercion arrives via a TYPE-SCOPED
    context — the container probe must use the scoped context."""
    doc = {
        "@context": {
            "@vocab": "http://v.e/",
            "Widget": {
                "@id": "http://v.e/Widget",
                "@context": {"data": {"@id": "http://v.e/data", "@type": "@json"}},
            },
        },
        "@id": "http://e.com/x",
        "@type": "Widget",
        "data": [{"a": 1}, {"b": 2}],
    }
    batch = set(doc_to_quads(doc, base="http://base.e/"))
    streamed = set(stream_doc_quads(doc, base="http://base.e/"))
    assert streamed == batch


def test_rdf_type_valued_property_not_suppressed():
    """Shell type-quad suppression must eat ONLY the re-included @type
    copies, once per mini-doc — a regular term whose IRI is rdf:type
    keeps its own (legitimately duplicate) type quad, so the streamed
    MULTISET matches batch (ADVICE r4: equality suppression dropped
    these)."""
    doc = {
        "@context": {
            "@vocab": "http://v.e/",
            "typ": {
                "@id": "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
                "@type": "@id",
            },
        },
        "@id": "http://e.com/x",
        "@type": ["Thing", "Thing2"],
        "typ": ["http://v.e/Thing", "http://v.e/Other"],
        "name": ["a", "b"],
    }
    batch = sorted(doc_to_quads(doc, base="http://base.e/"))
    streamed = sorted(stream_doc_quads(doc, base="http://base.e/"))
    assert streamed == batch  # multiset equality, not just set


def test_anonymous_top_node_sentinel_collision():
    """A document that uses the synthetic anonymous-top-node label
    itself must NOT merge with the anonymous node: batch emits
    _:b0 → _:b1, a colliding sentinel would emit a _:b0 → _:b0
    self-loop."""
    doc = {
        "@context": CTX,
        "p": [{"@id": "_:jsonldstreamtop", "name": "inner"}],
    }
    streamed = set(stream_doc_quads(doc, base="http://base.e/"))
    edges = [q for q in streamed if q.pred == "http://v.e/p"]
    assert len(edges) == 1
    assert edges[0].subj != edges[0].obj, "sentinel collided with doc label"
    # and the stream is still graph-equivalent to batch
    from jsonld_spark.canon import canonicalize_quads

    assert set(canonicalize_quads(list(streamed))) == set(
        canonicalize_quads(list(doc_to_quads(doc, base="http://base.e/")))
    )


def test_node_property_stream_is_lazy():
    """Property streaming: a poisoned LATER property item only raises
    after the earlier items' quads have been yielded — memory stays
    bounded by one property value, not the node."""
    doc = {
        "@context": CTX,
        "@id": "http://e.com/org",
        "member": [
            {"@id": "http://e.com/m0"},
            {"@id": True},  # invalid — raises only when reached
        ],
    }
    it = stream_doc_quads(doc, base="http://base.e/")
    first = next(it)
    assert first.obj == "http://e.com/m0"
    try:
        next(it)
    except Exception:
        return
    raise AssertionError("poison item did not raise")


def _drive_streaming_udf(pages_rows, rdfstar=False):
    """Drive the mapInPandas fn directly with pandas batches (no Spark)."""
    from jsonld_spark.streaming.reader import make_streaming_pages_to_triples
    from jsonld_spark.udfs import TRIPLE_COLS

    fn = make_streaming_pages_to_triples(None, rdfstar=rdfstar)
    pdf = pd.DataFrame(pages_rows, columns=["url", "html"])
    out = pd.concat(list(fn(iter([pdf]))), ignore_index=True)
    assert list(out.columns) == TRIPLE_COLS
    return out


def _page(ld: str) -> bytes:
    return (
        '<html><body><script type="application/ld+json">'
        + ld
        + "</script></body></html>"
    ).encode()


def test_streaming_udf_emits_warning_rows():
    """Round-5 review fix: the streaming UDF surfaces 'warning:' rows
    (dropped keys etc.) exactly like the batch path — previously they
    were silently discarded."""
    doc = json.dumps(
        {"@context": {"name": "http://v.e/name"},
         "@id": "http://e/x", "name": "n", "junkkey": "dropped"}
    )
    out = _drive_streaming_udf([("http://p.e/1", _page(doc))])
    warnings = out[out.error.str.startswith("warning:").fillna(False)]
    assert len(warnings) == 1 and "junkkey" in warnings.iloc[0].error
    quads = out[out.error.isna()]
    assert len(quads) == 1  # warnings never suppress output


def test_streaming_udf_salts_quoted_terms_like_batch():
    """Round-5 review fix: bnode labels INSIDE RDF-star quoted terms are
    salted in the streaming UDF, so the annotation references the same
    salted id as the asserted triple (batch parity)."""
    from jsonld_spark.context import ContextCache
    from jsonld_spark.udfs import page_to_rows

    doc = json.dumps(
        {
            "@context": {"@vocab": "http://v.e/"},
            "p": {"@value": "v", "@annotation": {"q": "a"}},
        }
    )
    url = "http://p.e/star"
    out = _drive_streaming_udf([(url, _page(doc))], rdfstar=True)
    got = {
        (r.subj, r.pred, r.obj)
        for r in out[out.error.isna()].itertuples()
    }
    batch = {
        (r[1], r[2], r[3])
        for r in page_to_rows(url, _page(doc), ContextCache(), rdfstar=True,
                              canonical_bnodes=False)
        if r[1] is not None
    }
    assert got == batch
    quoted = [s for s, _, _ in got if s.startswith("<<")]
    assert quoted, "expected an annotation with a quoted-term subject"
    for q in quoted:
        assert "_:b" not in q and "_:h" in q, q  # inner labels salted


def test_streaming_double_graph_key_error_parity():
    """Round-5 review fix: a second key expanding to @graph must raise
    CollidingKeywords in streaming exactly as in batch (previously the
    node probe streamed both graphs, emitting quads batch rejects)."""
    import pytest as _pytest

    from jsonld_spark import errors as err

    doc = {
        "@context": {"g": "@graph"},
        "@id": "http://e/x",
        "@graph": [{"@id": "http://e/a", "http://v.e/p": "1"}],
        "g": [{"@id": "http://e/b", "http://v.e/p": "2"}],
    }
    with _pytest.raises(err.CollidingKeywords):
        doc_to_quads(json.loads(json.dumps(doc)), base="http://base.e/")
    with _pytest.raises(err.CollidingKeywords):
        list(stream_doc_quads(json.loads(json.dumps(doc)), base="http://base.e/"))
