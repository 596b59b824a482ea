"""Expansion-algorithm unit tests.

Cases modeled on the W3C JSON-LD 1.1 expand test suite semantics (the
reference runs the same suite from spec/suite_expand_spec.rb); each
case here was written from the spec, not copied from suite files.
"""

import pytest

from jsonld_spark import expand_document
from jsonld_spark.context import Context, ContextCache
from jsonld_spark import errors as err


def exp(doc, **kw):
    return expand_document(doc, **kw)


def test_simple_term_expansion():
    doc = {
        "@context": {"name": "http://xmlns.com/foaf/0.1/name"},
        "name": "Gregg Kellogg",
    }
    assert exp(doc) == [
        {"http://xmlns.com/foaf/0.1/name": [{"@value": "Gregg Kellogg"}]}
    ]


def test_id_and_type():
    doc = {
        "@context": {"@vocab": "http://schema.org/"},
        "@id": "http://example.com/me",
        "@type": "Person",
        "name": "Alice",
    }
    assert exp(doc) == [
        {
            "@id": "http://example.com/me",
            "@type": ["http://schema.org/Person"],
            "http://schema.org/name": [{"@value": "Alice"}],
        }
    ]


def test_curie_and_prefix():
    doc = {
        "@context": {"foaf": "http://xmlns.com/foaf/0.1/"},
        "foaf:name": "Bob",
    }
    assert exp(doc) == [{"http://xmlns.com/foaf/0.1/name": [{"@value": "Bob"}]}]


def test_type_coercion_id():
    doc = {
        "@context": {
            "knows": {"@id": "http://xmlns.com/foaf/0.1/knows", "@type": "@id"}
        },
        "@id": "http://example.com/a",
        "knows": "http://example.com/b",
    }
    assert exp(doc) == [
        {
            "@id": "http://example.com/a",
            "http://xmlns.com/foaf/0.1/knows": [{"@id": "http://example.com/b"}],
        }
    ]


def test_typed_value():
    doc = {
        "@context": {
            "age": {
                "@id": "http://ex.org/age",
                "@type": "http://www.w3.org/2001/XMLSchema#integer",
            }
        },
        "@id": "http://example.com/a",
        "age": "33",
    }
    assert exp(doc) == [
        {
            "@id": "http://example.com/a",
            "http://ex.org/age": [
                {
                    "@value": "33",
                    "@type": "http://www.w3.org/2001/XMLSchema#integer",
                }
            ],
        }
    ]


def test_language_default_and_override():
    doc = {
        "@context": {
            "@language": "en",
            "label": "http://ex.org/label",
            "nolang": {"@id": "http://ex.org/nolang", "@language": None},
        },
        "@id": "http://example.com/a",
        "label": "hello",
        "nolang": "raw",
    }
    out = exp(doc)[0]
    assert out["http://ex.org/label"] == [{"@value": "hello", "@language": "en"}]
    assert out["http://ex.org/nolang"] == [{"@value": "raw"}]


def test_list_container():
    doc = {
        "@context": {
            "authors": {"@id": "http://ex.org/authors", "@container": "@list"}
        },
        "@id": "http://example.com/a",
        "authors": ["x", "y"],
    }
    assert exp(doc)[0]["http://ex.org/authors"] == [
        {"@list": [{"@value": "x"}, {"@value": "y"}]}
    ]


def test_explicit_list():
    doc = {
        "@context": {"p": "http://ex.org/p"},
        "@id": "http://example.com/a",
        "p": {"@list": [1, 2]},
    }
    assert exp(doc)[0]["http://ex.org/p"] == [
        {"@list": [{"@value": 1}, {"@value": 2}]}
    ]


def test_language_map():
    doc = {
        "@context": {
            "label": {"@id": "http://ex.org/label", "@container": "@language"}
        },
        "@id": "http://example.com/a",
        "label": {"en": "hello", "de": ["hallo", "servus"]},
    }
    vals = exp(doc, ordered=True)[0]["http://ex.org/label"]
    assert {"@value": "hello", "@language": "en"} in vals
    assert {"@value": "hallo", "@language": "de"} in vals
    assert {"@value": "servus", "@language": "de"} in vals
    assert len(vals) == 3


def test_index_map():
    doc = {
        "@context": {"p": {"@id": "http://ex.org/p", "@container": "@index"}},
        "@id": "http://example.com/a",
        "p": {"A": "a", "B": "b"},
    }
    vals = exp(doc)[0]["http://ex.org/p"]
    assert {"@value": "a", "@index": "A"} in vals
    assert {"@value": "b", "@index": "B"} in vals


def test_id_map():
    doc = {
        "@context": {
            "@vocab": "http://ex.org/",
            "items": {"@id": "http://ex.org/items", "@container": "@id"},
        },
        "items": {
            "http://example.com/x": {"label": "X"},
        },
    }
    vals = exp(doc)[0]["http://ex.org/items"]
    assert vals == [
        {
            "@id": "http://example.com/x",
            "http://ex.org/label": [{"@value": "X"}],
        }
    ]


def test_type_map():
    doc = {
        "@context": {
            "@vocab": "http://ex.org/",
            "items": {"@container": "@type"},
        },
        "items": {"Person": {"@id": "http://example.com/x"}},
    }
    vals = exp(doc)[0]["http://ex.org/items"]
    assert vals == [{"@id": "http://example.com/x", "@type": ["http://ex.org/Person"]}]


def test_nested_node_and_relative_iri():
    doc = {
        "@context": {"@vocab": "http://ex.org/"},
        "@id": "a",
        "child": {"@id": "b", "name": "kid"},
    }
    out = exp(doc, base="http://base.example/dir/doc")[0]
    assert out["@id"] == "http://base.example/dir/a"
    child = out["http://ex.org/child"][0]
    assert child["@id"] == "http://base.example/dir/b"


def test_reverse_term():
    doc = {
        "@context": {
            "children": {"@reverse": "http://ex.org/parent"}
        },
        "@id": "http://example.com/a",
        "children": [{"@id": "http://example.com/b"}],
    }
    out = exp(doc)[0]
    assert out["@reverse"]["http://ex.org/parent"] == [{"@id": "http://example.com/b"}]


def test_reverse_keyword():
    doc = {
        "@id": "http://example.com/a",
        "@reverse": {"http://ex.org/parent": {"@id": "http://example.com/b"}},
    }
    out = exp(doc)[0]
    assert out["@reverse"]["http://ex.org/parent"] == [{"@id": "http://example.com/b"}]


def test_graph_keyword():
    doc = {
        "@context": {"@vocab": "http://ex.org/"},
        "@id": "http://example.com/g1",
        "@graph": [{"@id": "http://example.com/a", "p": "v"}],
    }
    out = exp(doc)[0]
    assert out["@graph"] == [
        {"@id": "http://example.com/a", "http://ex.org/p": [{"@value": "v"}]}
    ]


def test_drop_unmapped_keys():
    doc = {"@id": "http://example.com/a", "unmapped": "x"}
    assert exp(doc) == []  # only @id remains → free-floating drop


def test_free_floating_values_dropped():
    assert exp("scalar") == []
    assert exp({"@value": "v"}) == []
    assert exp({"@list": ["a"]}) == []


def test_null_values_dropped():
    doc = {
        "@context": {"p": "http://ex.org/p"},
        "@id": "http://example.com/a",
        "p": None,
    }
    assert exp(doc) == []


def test_value_null_dropped():
    doc = {
        "@context": {"p": "http://ex.org/p"},
        "@id": "http://example.com/a",
        "p": {"@value": None},
    }
    assert exp(doc) == []


def test_set_collapses():
    doc = {
        "@context": {"p": "http://ex.org/p"},
        "@id": "http://example.com/a",
        "p": {"@set": ["x", "y"]},
    }
    assert exp(doc)[0]["http://ex.org/p"] == [{"@value": "x"}, {"@value": "y"}]


def test_json_literal():
    doc = {
        "@context": {"p": {"@id": "http://ex.org/p", "@type": "@json"}},
        "@id": "http://example.com/a",
        "p": {"b": 1, "a": [True, None]},
    }
    assert exp(doc)[0]["http://ex.org/p"] == [
        {"@value": {"b": 1, "a": [True, None]}, "@type": "@json"}
    ]


def test_nest():
    doc = {
        "@context": {"@vocab": "http://ex.org/", "meta": "@nest"},
        "@id": "http://example.com/a",
        "meta": {"p": "v"},
    }
    assert exp(doc)[0]["http://ex.org/p"] == [{"@value": "v"}]


def test_scoped_context_property():
    doc = {
        "@context": {
            "@vocab": "http://ex.org/",
            "child": {"@context": {"name": "http://other.org/name"}},
        },
        "@id": "http://example.com/a",
        "child": {"name": "inner"},
    }
    child = exp(doc)[0]["http://ex.org/child"][0]
    assert child == {"http://other.org/name": [{"@value": "inner"}]}


def test_type_scoped_context():
    doc = {
        "@context": {
            "@vocab": "http://ex.org/",
            "Person": {"@id": "http://ex.org/Person", "@context": {"name": "http://person.org/name"}},
        },
        "@id": "http://example.com/a",
        "@type": "Person",
        "name": "Alice",
    }
    out = exp(doc)[0]
    assert out["@type"] == ["http://ex.org/Person"]
    assert out["http://person.org/name"] == [{"@value": "Alice"}]


def test_remote_context_via_cache():
    cache = ContextCache(
        {"http://remote.example/ctx": {"@context": {"p": "http://ex.org/p"}}}
    )
    doc = {
        "@context": "http://remote.example/ctx",
        "@id": "http://example.com/a",
        "p": "v",
    }
    assert exp(doc, cache=cache)[0]["http://ex.org/p"] == [{"@value": "v"}]


def test_remote_context_https_http_canon():
    cache = ContextCache(
        {"https://remote.example/ctx": {"@context": {"p": "http://ex.org/p"}}}
    )
    doc = {
        "@context": "http://remote.example/ctx",
        "@id": "http://example.com/a",
        "p": "v",
    }
    assert exp(doc, cache=cache)[0]["http://ex.org/p"] == [{"@value": "v"}]


def test_missing_remote_context_raises():
    doc = {"@context": "http://nowhere.example/ctx", "p": "v"}
    with pytest.raises(err.LoadingRemoteContextFailed):
        exp(doc)


def test_invalid_value_object():
    with pytest.raises(err.InvalidValueObject):
        exp(
            {
                "@context": {"p": "http://ex.org/p"},
                "@id": "http://e.com/a",
                "p": {"@value": "v", "@id": "http://x"},
            }
        )


def test_keyword_like_terms_ignored():
    doc = {
        "@context": {"@fancy": "http://ex.org/fancy", "p": "http://ex.org/p"},
        "@id": "http://example.com/a",
        "@fancy": "x",
        "p": "v",
    }
    out = exp(doc)[0]
    assert "http://ex.org/fancy" not in out
    assert out["http://ex.org/p"] == [{"@value": "v"}]


def test_graph_container():
    doc = {
        "@context": {
            "@vocab": "http://ex.org/",
            "claims": {"@container": "@graph"},
        },
        "@id": "http://example.com/a",
        "claims": {"p": "v"},
    }
    vals = exp(doc)[0]["http://ex.org/claims"]
    assert vals == [{"@graph": [{"http://ex.org/p": [{"@value": "v"}]}]}]


def test_included():
    doc = {
        "@context": {"@vocab": "http://ex.org/"},
        "@id": "http://example.com/a",
        "p": "v",
        "@included": [{"@id": "http://example.com/b", "p": "w"}],
    }
    out = exp(doc)[0]
    assert out["@included"] == [
        {"@id": "http://example.com/b", "http://ex.org/p": [{"@value": "w"}]}
    ]


def test_propagate_false_type_scoped_reverts():
    # type-scoped contexts do not propagate to nested nodes by default
    doc = {
        "@context": {
            "@vocab": "http://ex.org/",
            "Foo": {
                "@id": "http://ex.org/Foo",
                "@context": {"name": "http://scoped.org/name"},
            },
        },
        "@id": "http://example.com/a",
        "@type": "Foo",
        "name": "top",
        "child": {"@id": "http://example.com/b", "name": "inner"},
    }
    out = exp(doc)[0]
    assert out["http://scoped.org/name"] == [{"@value": "top"}]
    child = out["http://ex.org/child"][0]
    # nested node: scoped context reverted → vocab mapping
    assert child["http://ex.org/name"] == [{"@value": "inner"}]


def test_base_in_context():
    doc = {
        "@context": {"@base": "http://base.example/", "p": "http://ex.org/p"},
        "@id": "rel",
        "p": "v",
    }
    assert exp(doc)[0]["@id"] == "http://base.example/rel"


def test_vocab_relative_to_base():
    doc = {
        "@context": {"@vocab": ""},
        "@id": "http://example.com/a",
        "p": "v",
    }
    out = exp(doc, base="http://base.example/doc")
    # @vocab:"" → vocab = base; terms are string-concatenated onto it
    assert out[0]["http://base.example/docp"] == [{"@value": "v"}]


def test_double_and_int_values_pass_through():
    doc = {
        "@context": {"p": "http://ex.org/p"},
        "@id": "http://example.com/a",
        "p": [1, 1.5, True],
    }
    assert exp(doc)[0]["http://ex.org/p"] == [
        {"@value": 1},
        {"@value": 1.5},
        {"@value": True},
    ]


def test_protected_term_redefinition():
    doc = {
        "@context": [
            {"@protected": True, "p": "http://ex.org/p"},
            {"p": "http://other.org/p"},
        ],
        "@id": "http://example.com/a",
        "p": "v",
    }
    with pytest.raises(err.ProtectedTermRedefinition):
        exp(doc)


def test_property_index_container():
    doc = {
        "@context": {
            "@vocab": "http://ex.org/",
            "prop": {"@container": "@index", "@index": "schema:name"},
            "schema": "http://schema.org/",
        },
        "@id": "http://example.com/a",
        "prop": {"A": {"@id": "http://example.com/x"}},
    }
    vals = exp(doc)[0]["http://ex.org/prop"]
    assert vals == [
        {
            "@id": "http://example.com/x",
            "http://schema.org/name": [{"@value": "A"}],
        }
    ]
