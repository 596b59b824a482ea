"""Edge cases: RFC 3986 resolution, error codes, canonical lexical forms."""

import math

import pytest

from jsonld_spark import errors as err
from jsonld_spark.expand import expand_document
from jsonld_spark.iri import (
    is_absolute_iri,
    remove_dot_segments,
    resolve_iri,
)
from jsonld_spark.rdf_model import (
    Quad,
    canonical_double,
    jcs_canonicalize,
    parse_nquads,
    quad_to_nquads,
)

BASE = "http://a/b/c/d;p?q"

# RFC 3986 §5.4 reference-resolution examples (normal + abnormal)
RFC3986_CASES = [
    ("g:h", "g:h"),
    ("g", "http://a/b/c/g"),
    ("./g", "http://a/b/c/g"),
    ("g/", "http://a/b/c/g/"),
    ("/g", "http://a/g"),
    ("//g", "http://g"),
    ("?y", "http://a/b/c/d;p?y"),
    ("g?y", "http://a/b/c/g?y"),
    ("#s", "http://a/b/c/d;p?q#s"),
    ("g#s", "http://a/b/c/g#s"),
    ("g?y#s", "http://a/b/c/g?y#s"),
    (";x", "http://a/b/c/;x"),
    ("g;x", "http://a/b/c/g;x"),
    ("g;x?y#s", "http://a/b/c/g;x?y#s"),
    ("", "http://a/b/c/d;p?q"),
    (".", "http://a/b/c/"),
    ("./", "http://a/b/c/"),
    ("..", "http://a/b/"),
    ("../", "http://a/b/"),
    ("../g", "http://a/b/g"),
    ("../..", "http://a/"),
    ("../../", "http://a/"),
    ("../../g", "http://a/g"),
    # abnormal
    ("../../../g", "http://a/g"),
    ("../../../../g", "http://a/g"),
    ("/./g", "http://a/g"),
    ("/../g", "http://a/g"),
    ("g.", "http://a/b/c/g."),
    (".g", "http://a/b/c/.g"),
    ("g..", "http://a/b/c/g.."),
    ("..g", "http://a/b/c/..g"),
    ("./../g", "http://a/b/g"),
    ("./g/.", "http://a/b/c/g/"),
    ("g/./h", "http://a/b/c/g/h"),
    ("g/../h", "http://a/b/c/h"),
    ("g;x=1/./y", "http://a/b/c/g;x=1/y"),
    ("g;x=1/../y", "http://a/b/c/y"),
]


@pytest.mark.parametrize("ref,expected", RFC3986_CASES)
def test_rfc3986_resolution(ref, expected):
    assert resolve_iri(BASE, ref) == expected


def test_resolution_non_http_schemes():
    assert resolve_iri("tag:example,2024:x/y", "z") == "tag:example,2024:x/z"
    assert resolve_iri("urn:isbn:0451450523", "foo:bar") == "foo:bar"


def test_remove_dot_segments():
    assert remove_dot_segments("/a/b/c/./../../g") == "/a/g"
    assert remove_dot_segments("mid/content=5/../6") == "mid/6"


def test_is_absolute():
    assert is_absolute_iri("http://x/y")
    assert is_absolute_iri("urn:a:b")
    assert not is_absolute_iri("relative/path")
    assert not is_absolute_iri("http://x y")  # whitespace


# --- negative expand tests (error codes per json-ld11-api) -------------------


def _expect(doc, exc):
    with pytest.raises(exc):
        expand_document(doc)


def test_error_invalid_base():
    _expect({"@context": {"@base": True}, "@id": "x"}, err.InvalidBaseIRI)


def test_error_invalid_vocab():
    _expect({"@context": {"@vocab": 4}, "p": "v"}, err.InvalidVocabMapping)


def test_error_invalid_default_language():
    _expect({"@context": {"@language": 1}, "p": "v"}, err.InvalidDefaultLanguage)


def test_error_keyword_redefinition():
    _expect({"@context": {"@id": "http://x/"}, "p": "v"}, err.KeywordRedefinition)


def test_error_cyclic_iri_mapping():
    _expect(
        {"@context": {"a": "b:x", "b": "a:y"}, "a": "v"}, err.CyclicIRIMapping
    )


def test_error_invalid_container():
    _expect(
        {"@context": {"p": {"@id": "http://x/p", "@container": "@bogus"}}, "p": "v"},
        err.InvalidContainerMapping,
    )


def test_error_list_and_id_container():
    _expect(
        {
            "@context": {
                "p": {"@id": "http://x/p", "@container": ["@list", "@id"]}
            },
            "p": "v",
        },
        err.InvalidContainerMapping,
    )


def test_error_invalid_type_mapping():
    _expect(
        {"@context": {"p": {"@id": "http://x/p", "@type": 3}}, "p": "v"},
        err.InvalidTypeMapping,
    )


def test_error_invalid_reverse_with_id():
    _expect(
        {
            "@context": {
                "p": {"@id": "http://x/p", "@reverse": "http://x/q"}
            },
            "p": "v",
        },
        err.InvalidReverseProperty,
    )


def test_error_invalid_id_value():
    _expect({"@id": 42}, err.InvalidIdValue)


def test_error_invalid_type_value():
    _expect({"@id": "http://e/a", "@type": 42}, err.InvalidTypeValue)


def test_error_colliding_keywords():
    _expect(
        {
            "@context": {"id1": "@id", "id2": "@id"},
            "id1": "http://e/a",
            "id2": "http://e/b",
            "@context2": None,
        },
        err.CollidingKeywords,
    )


def test_error_invalid_reverse_value():
    _expect({"@id": "http://e/a", "@reverse": "x"}, err.InvalidReverseValue)


def test_error_invalid_language_tagged_string():
    _expect(
        {"@id": "http://e/a", "http://x/p": {"@value": "v", "@language": 5}},
        err.InvalidLanguageTaggedString,
    )


def test_error_invalid_value_object_value():
    _expect(
        {"@id": "http://e/a", "http://x/p": {"@value": {"a": 1}}},
        err.InvalidValueObjectValue,
    )


def test_error_invalid_set_or_list():
    _expect(
        {"@id": "http://e/a", "http://x/p": {"@set": ["x"], "@id": "http://y"}},
        err.InvalidSetOrListObject,
    )


def test_error_context_overflow():
    # self-referential remote context chain > MAX_CONTEXTS_LOADED
    from jsonld_spark.context import ContextCache

    entries = {
        f"http://c.example/{i}": {"@context": f"http://c.example/{i + 1}"}
        for i in range(60)
    }
    with pytest.raises(err.ContextOverflow):
        expand_document(
            {"@context": "http://c.example/0", "http://x/p": "v"},
            cache=ContextCache(entries),
        )


def test_error_invalid_version():
    _expect({"@context": {"@version": 1.2}, "p": "v"}, err.InvalidVersionValue)


def test_processing_mode_10_rejects_11_features():
    with pytest.raises(err.JsonLdError):
        expand_document(
            {"@context": {"@version": 1.1}, "http://x/p": "v"},
            processing_mode="json-ld-1.0",
        )


# --- canonical forms ----------------------------------------------------------


def test_canonical_double_more():
    assert canonical_double(0.0) == "0.0E0"
    assert canonical_double(123.456) == "1.23456E2"
    assert canonical_double(-0.001) == "-1.0E-3"
    # double(1e-21) is slightly below 1e-21; %.15E (same as the
    # reference's RDF::Literal::Double canonicalize) rounds to 16
    # significant digits
    assert canonical_double(1e-21) == "9.999999999999999E-22"
    assert canonical_double(float("inf")) == "INF"
    assert canonical_double(float("-inf")) == "-INF"
    assert canonical_double(float("nan")) == "NaN"


def test_jcs_rfc8785_number_vectors():
    # selected vectors from RFC 8785 appendix (ES number serialization)
    cases = {
        1: "1",
        -1: "-1",
        0.5: "0.5",
        1e30: "1e+30",
        5e-324: "5e-324",
        9007199254740996.0: "9007199254740996",
        1.7976931348623157e308: "1.7976931348623157e+308",
        333333333.3333333: "333333333.3333333",
    }
    for v, expected in cases.items():
        assert jcs_canonicalize(v) == expected, v


def test_jcs_unicode_key_sort():
    # JCS sorts by UTF-16 code units
    doc = {"€": 1, "a": 2, "𐀀".encode("utf-16", "surrogatepass").decode("utf-16"): 3}
    out = jcs_canonicalize(doc)
    assert out.index('"a"') < out.index("€")


def test_nquads_escaping_roundtrip():
    q = Quad(
        "http://e/a",
        "http://p/x",
        'line1\nline2\t"quoted"\\backslash',
        True,
        "http://www.w3.org/2001/XMLSchema#string",
        None,
        None,
    )
    line = quad_to_nquads(q)
    assert "\\n" in line and '\\"' in line and "\\\\" in line
    assert parse_nquads(line) == [q]


def test_nquads_unicode_passthrough():
    q = Quad("http://e/a", "http://p/x", "日本語 ünïcode", True,
             "http://www.w3.org/2001/XMLSchema#string", None, None)
    assert parse_nquads(quad_to_nquads(q)) == [q]


def test_nquads_generalized_bnode_predicate_roundtrip():
    # to_rdf under produce_generalized_rdf emits bnode predicates
    # (reference api.rb toRdf with generalized option); the parser must
    # read the module's own output back
    for q in [
        Quad("_:s", "_:p", "http://e/o", False, None, None, None),
        Quad("http://e/s", "_:p", "v", True,
             "http://www.w3.org/2001/XMLSchema#string", None, "http://e/g"),
        Quad("_:s", "_:p", "x", True,
             "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString",
             "en", "_:g"),
    ]:
        assert parse_nquads(quad_to_nquads(q)) == [q]


# --- additional negative / conformance cases ---------------------------------


def test_error_invalid_prefix_value():
    _expect(
        {"@context": {"p": {"@id": "http://x/p", "@prefix": "yes"}}, "p": "v"},
        err.InvalidPrefixValue,
    )


def test_error_graph_language_container():
    _expect(
        {
            "@context": {
                "p": {"@id": "http://x/p", "@container": ["@graph", "@language"]}
            },
            "p": "v",
        },
        err.InvalidContainerMapping,
    )


def test_error_graph_id_index_container():
    _expect(
        {
            "@context": {
                "p": {
                    "@id": "http://x/p",
                    "@container": ["@graph", "@id", "@index"],
                }
            },
            "p": "v",
        },
        err.InvalidContainerMapping,
    )


def test_error_context_alias():
    _expect(
        {"@context": {"ctx": "@context"}, "ctx": {}},
        err.InvalidKeywordAlias,
    )


def test_error_invalid_nest_value():
    _expect(
        {"@context": {"n": {"@id": "http://x/n", "@nest": "@id"}}, "n": "v"},
        err.InvalidNestValue,
    )


def test_error_nest_value_object():
    _expect(
        {
            "@context": {"@vocab": "http://v/", "meta": "@nest"},
            "@id": "http://e/a",
            "meta": {"@value": "v"},
        },
        err.InvalidNestValue,
    )


def test_error_invalid_reverse_property_value():
    _expect(
        {
            "@context": {"children": {"@reverse": "http://x/parent"}},
            "@id": "http://e/a",
            "children": "just a string",
        },
        err.InvalidReversePropertyValue,
    )


def test_error_invalid_propagate():
    _expect(
        {"@context": {"@propagate": "yes", "@vocab": "http://v/"}, "p": "v"},
        err.InvalidPropagateValue,
    )


def test_error_invalid_import_value():
    _expect(
        {"@context": {"@import": True}, "p": "v"}, err.InvalidImportValue
    )


def test_error_index_not_string():
    _expect(
        {"@id": "http://e/a", "http://x/p": {"@value": 1, "@index": 5}},
        err.InvalidIndexValue,
    )


def test_remove_base_self_and_directory_parity():
    """remove_base parity with context.rb @base_and_parents (round 5):
    an IRI EQUAL to the base relativizes to its last path segment; a
    directory base under itself gives './'; fragments/queries on the
    base stay suffix-only.  Every output must resolve back to the
    input."""
    from jsonld_spark.iri import remove_base, resolve_iri

    cases = [
        ("http://e.com/a/foo", "http://e.com/a/foo", "foo"),
        ("http://e.com/a/", "http://e.com/a/", "./"),
        ("http://e.com/a/foo", "http://e.com/a/foo#x", "#x"),
        ("http://e.com/a/foo", "http://e.com/a/foo?q=1", "?q=1"),
        ("http://e.com/a/foo", "http://e.com/a/bar", "bar"),
        ("http://e.com/a/foo", "http://other.com/a/foo", "http://other.com/a/foo"),
    ]
    for base, iri, want in cases:
        got = remove_base(base, iri)
        assert got == want, (base, iri, got, want)
        assert resolve_iri(base, got) == iri, (base, iri, got)
