"""context_from_vocabulary tests (reference context.rb:1062-1122)."""

import pytest

from jsonld_spark import expand_document
from jsonld_spark.functions.vocab import context_from_vocabulary, vocabulary_terms

EX = "http://vocab.example/ns#"
XSD = "http://www.w3.org/2001/XMLSchema#"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
RDFS_RANGE = "http://www.w3.org/2000/01/rdf-schema#range"
OWL_OBJECT_PROP = "http://www.w3.org/2002/07/owl#ObjectProperty"
OWL_DT_PROP = "http://www.w3.org/2002/07/owl#DatatypeProperty"
RDFS_CLASS = "http://www.w3.org/2000/01/rdf-schema#Class"


@pytest.fixture(scope="module")
def vocab_triples(spark):
    rows = [
        # a class in the vocab
        (EX + "Person", RDF_TYPE, RDFS_CLASS),
        # an object property → @type: @id
        (EX + "knows", RDF_TYPE, OWL_OBJECT_PROP),
        (EX + "knows", RDFS_RANGE, EX + "Person"),
        # a typed datatype property → @type: xsd:date
        (EX + "born", RDF_TYPE, OWL_DT_PROP),
        (EX + "born", RDFS_RANGE, XSD + "date"),
        # a plain-text property → skipped (schema:Text range)
        (EX + "bio", RDF_TYPE, OWL_DT_PROP),
        (EX + "bio", RDFS_RANGE, "http://schema.org/Text"),
        # an xsd:string property → @language: null under a default language
        (EX + "code", RDF_TYPE, OWL_DT_PROP),
        (EX + "code", RDFS_RANGE, XSD + "string"),
        # a class OUTSIDE the vocab → term kept even with @vocab set
        ("http://other.example/Thing", RDF_TYPE, RDFS_CLASS),
        # bnode subjects are ignored
        ("_:b0", RDF_TYPE, RDFS_CLASS),
    ]
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def test_vocabulary_terms_shape(spark, vocab_triples):
    rows = {r.subject: r for r in vocabulary_terms(vocab_triples).collect()}
    assert "_:b0" not in rows
    assert rows[EX + "knows"].is_property
    assert not rows[EX + "Person"].is_property
    assert rows[EX + "born"].ranges == [XSD + "date"]


def test_context_rules(spark, vocab_triples):
    ctx = context_from_vocabulary(vocab_triples, vocab=EX, default_language="en")
    assert ctx["@vocab"] == EX
    assert ctx["knows"] == {"@id": EX + "knows", "@type": "@id"}
    assert ctx["born"] == {"@id": EX + "born", "@type": XSD + "date"}
    assert "bio" not in ctx  # text range → plain term under @vocab
    assert ctx["code"] == {"@id": EX + "code", "@language": None}
    assert "Person" not in ctx  # class inside @vocab → reachable via @vocab
    assert ctx["Thing"] == "http://other.example/Thing"


def test_derived_context_drives_expansion(spark, vocab_triples):
    """The generated context is a working @context: coercions apply."""
    ctx = context_from_vocabulary(vocab_triples, vocab=EX)
    doc = {
        "@context": ctx,
        "@id": "http://e/a",
        "knows": "http://e/b",
        "born": "1990-01-02",
    }
    (node,) = expand_document(doc)
    assert node[EX + "knows"] == [{"@id": "http://e/b"}]
    assert node[EX + "born"] == [{"@value": "1990-01-02", "@type": XSD + "date"}]


def test_no_vocab_keeps_rangeless_properties(spark, vocab_triples):
    ctx = context_from_vocabulary(vocab_triples)
    # without @vocab every named subject needs a term to be reachable
    assert ctx["Person"] == EX + "Person"
