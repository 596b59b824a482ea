"""Harder spec-corner cases: nested lists, @propagate, @import,
protected overrides, graph containers with @id/@index, expandContext,
included blocks, scoped-context re-application."""

import pytest

from jsonld_spark import doc_to_quads, expand_document
from jsonld_spark.context import ContextCache
from jsonld_spark import errors as err
from jsonld_spark.rdf_model import RDF_FIRST, RDF_NIL, RDF_REST


def test_nested_lists_expand_and_to_rdf():
    # JSON-LD 1.1 allows lists of lists
    doc = {
        "@context": {"p": {"@id": "http://e/p", "@container": "@list"}},
        "@id": "http://e/a",
        "p": [["x", "y"], ["z"]],
    }
    out = expand_document(doc)[0]["http://e/p"]
    assert out == [
        {
            "@list": [
                {"@list": [{"@value": "x"}, {"@value": "y"}]},
                {"@list": [{"@value": "z"}]},
            ]
        }
    ]
    quads = doc_to_quads(doc)
    firsts = [q for q in quads if q.pred == RDF_FIRST]
    # outer list: 2 firsts pointing at inner heads; inner: 3 value firsts
    assert len(firsts) == 5
    inner_heads = [q.obj for q in firsts if not q.obj_is_literal]
    assert len(inner_heads) == 2


def test_empty_nested_list():
    doc = {
        "@context": {"p": {"@id": "http://e/p", "@container": "@list"}},
        "@id": "http://e/a",
        "p": [[]],
    }
    quads = doc_to_quads(doc)
    # outer single-element list whose item is rdf:nil
    nil_first = [q for q in quads if q.pred == RDF_FIRST and q.obj == RDF_NIL]
    assert len(nil_first) == 1


def test_propagate_false_inline_context():
    doc = {
        "@context": {"@vocab": "http://v/"},
        "@id": "http://e/a",
        "child": {
            "@context": {"@propagate": False, "name": "http://scoped/name"},
            "@id": "http://e/b",
            "name": "b",
            "child": {"@id": "http://e/c", "name": "c"},
        },
    }
    out = expand_document(doc)[0]
    b = out["http://v/child"][0]
    assert b["http://scoped/name"] == [{"@value": "b"}]
    c = b["http://v/child"][0]
    # @propagate: false → reverted for the grandchild
    assert c["http://v/name"] == [{"@value": "c"}]


def test_import_merges_context():
    cache = ContextCache(
        {"http://ctx.example/base": {"@context": {"name": "http://i/name"}}}
    )
    doc = {
        "@context": {
            "@import": "http://ctx.example/base",
            "age": "http://i/age",
        },
        "@id": "http://e/a",
        "name": "x",
        "age": 3,
    }
    out = expand_document(doc, cache=cache)[0]
    assert out["http://i/name"] == [{"@value": "x"}]
    assert out["http://i/age"] == [{"@value": 3}]


def test_import_inside_import_fails():
    cache = ContextCache(
        {
            "http://ctx.example/a": {
                "@context": {"@import": "http://ctx.example/b"}
            },
            "http://ctx.example/b": {"@context": {}},
        }
    )
    doc = {"@context": {"@import": "http://ctx.example/a"}, "p": "v"}
    with pytest.raises(err.InvalidContextEntry):
        expand_document(doc, cache=cache)


def test_protected_override_in_scoped_context():
    # property-scoped contexts may override protected terms
    doc = {
        "@context": {
            "@protected": True,
            "name": "http://a/name",
            "child": {
                "@id": "http://a/child",
                "@context": {"name": "http://b/name"},
            },
        },
        "@id": "http://e/x",
        "name": "outer",
        "child": {"name": "inner"},
    }
    out = expand_document(doc)[0]
    assert out["http://a/name"] == [{"@value": "outer"}]
    assert out["http://a/child"][0]["http://b/name"] == [{"@value": "inner"}]


def test_graph_id_container():
    doc = {
        "@context": {
            "@vocab": "http://v/",
            "claims": {"@container": ["@graph", "@id"]},
        },
        "@id": "http://e/a",
        "claims": {
            "http://g/1": {"p": "v1"},
            "http://g/2": {"p": "v2"},
        },
    }
    vals = expand_document(doc, ordered=True)[0]["http://v/claims"]
    assert {"@graph": [{"http://v/p": [{"@value": "v1"}]}], "@id": "http://g/1"} in vals
    quads = doc_to_quads(doc)
    graphs = {q.graph for q in quads if q.pred == "http://v/p"}
    assert graphs == {"http://g/1", "http://g/2"}


def test_graph_index_container():
    doc = {
        "@context": {
            "@vocab": "http://v/",
            "claims": {"@container": ["@graph", "@index"]},
        },
        "@id": "http://e/a",
        "claims": {"A": {"p": "v1"}},
    }
    vals = expand_document(doc)[0]["http://v/claims"]
    assert vals[0]["@index"] == "A"
    assert "@graph" in vals[0]


def test_expand_context_option():
    doc = {"@id": "http://e/a", "name": "x"}
    out = expand_document(
        doc, expand_context={"@context": {"name": "http://x/name"}}
    )
    assert out[0]["http://x/name"] == [{"@value": "x"}]


def test_included_nested_blocks():
    doc = {
        "@context": {"@vocab": "http://v/"},
        "@id": "http://e/a",
        "p": "v",
        "@included": {
            "@id": "http://e/b",
            "p": "w",
            "@included": {"@id": "http://e/c", "p": "u"},
        },
    }
    quads = doc_to_quads(doc)
    subs = {q.subj for q in quads}
    assert subs == {"http://e/a", "http://e/b", "http://e/c"}


def test_type_scoped_context_applies_to_sibling_keys():
    # type-scoped terms visible for all keys of the typed node
    doc = {
        "@context": {
            "@vocab": "http://v/",
            "Employee": {
                "@id": "http://v/Employee",
                "@context": {"boss": {"@id": "http://v/boss", "@type": "@id"}},
            },
        },
        "@id": "http://e/a",
        "boss": "http://e/b",
        "@type": "Employee",
    }
    out = expand_document(doc)[0]
    assert out["http://v/boss"] == [{"@id": "http://e/b"}]


def test_scoped_null_context_clears():
    doc = {
        "@context": {
            "@vocab": "http://v/",
            "raw": {"@id": "http://v/raw", "@context": None},
        },
        "@id": "http://e/a",
        "raw": {"@id": "http://e/b", "anything": "dropped"},
    }
    out = expand_document(doc)[0]
    inner = out["http://v/raw"][0]
    # null scoped context → no @vocab → unmapped keys dropped
    assert inner == {"@id": "http://e/b"}


def test_value_object_with_index_only_keys():
    doc = {
        "@context": {"p": "http://e/p"},
        "@id": "http://e/a",
        "p": {"@value": 5, "@index": "idx"},
    }
    out = expand_document(doc)[0]["http://e/p"]
    assert out == [{"@value": 5, "@index": "idx"}]
    quads = doc_to_quads(doc)
    assert any(q.obj == "5" for q in quads)  # @index dropped at RDF layer


def test_language_map_none_key():
    doc = {
        "@context": {
            "label": {"@id": "http://e/label", "@container": "@language"},
            "none": "@none",
        },
        "@id": "http://e/a",
        "label": {"en": "color", "none": "plain"},
    }
    vals = expand_document(doc, ordered=True)[0]["http://e/label"]
    assert {"@value": "plain"} in vals
    assert {"@value": "color", "@language": "en"} in vals


def test_cache_version_invalidates_resume(spark, pages_path):
    import os
    import shutil

    from conftest import DATA_DIR
    from jsonld_spark.pipeline import KGPipeline
    from jsonld_spark.sources.pages import build_context_cache_entries

    out = os.path.join(DATA_DIR, "kg_out_cachever")
    shutil.rmtree(out, ignore_errors=True)
    pages = spark.read.parquet(pages_path)
    p1 = KGPipeline(spark, build_context_cache_entries(), cache_version="v1")
    s1 = p1.run(pages, out, run_id="r1")
    assert s1["skipped_buckets"] == 0
    # same version resumes…
    s2 = p1.run(pages, out, run_id="r2")
    assert s2["skipped_buckets"] > 0
    # …new context-cache version invalidates completed buckets
    p2 = KGPipeline(spark, build_context_cache_entries(), cache_version="v2")
    s3 = p2.run(pages, out, run_id="r3")
    assert s3["skipped_buckets"] == 0
    assert s3["triples"] == s1["triples"]


# --- round-2 expansion corners ----------------------------------------------


def test_vocab_empty_string_resolves_to_base():
    doc = {
        "@context": {"@vocab": ""},
        "@id": "http://e/doc",
        "p": "v",
    }
    out = expand_document(doc, base="http://base.e/dir/")
    assert out[0]["http://base.e/dir/p"] == [{"@value": "v"}]


def test_vocab_relative_resolves_against_vocab():
    doc = {
        "@context": [{"@vocab": "http://v.e/ns#"}, {"@vocab": "sub/"}],
        "@id": "http://e/a",
        "p": "v",
    }
    out = expand_document(doc)
    assert "http://v.e/ns#sub/p" in out[0]


def test_id_container_map():
    doc = {
        "@context": {
            "@vocab": "http://v/",
            "byId": {"@id": "http://p/m", "@container": "@id"},
        },
        "byId": {"http://e/a": {"prop": "x"}, "@none": {"prop": "y"}},
    }
    (node,) = expand_document(doc)
    vals = node["http://p/m"]
    ids = {v.get("@id") for v in vals}
    assert "http://e/a" in ids
    assert None in ids or any("@id" not in v for v in vals)


def test_type_none_keeps_value_untyped():
    doc = {
        "@context": {"t": {"@id": "http://p/x", "@type": "@none"}},
        "t": 5,
    }
    (node,) = expand_document(doc)
    assert node["http://p/x"] == [{"@value": 5}]


def test_null_language_overrides_default():
    doc = {
        "@context": {
            "@language": "en",
            "plain": {"@id": "http://p/plain", "@language": None},
        },
        "plain": "text",
        "http://p/tagged": "tagged",
    }
    (node,) = expand_document(doc)
    assert node["http://p/plain"] == [{"@value": "text"}]
    assert node["http://p/tagged"] == [{"@value": "tagged", "@language": "en"}]


def test_scoped_context_propagates_by_default_for_property():
    doc = {
        "@context": {
            "@vocab": "http://v/",
            "outer": {"@context": {"inner": "http://scoped/inner"}},
        },
        "outer": {"deep": {"inner": "v"}},
    }
    (node,) = expand_document(doc)
    deep = node["http://v/outer"][0]["http://v/deep"][0]
    assert deep["http://scoped/inner"] == [{"@value": "v"}]


def test_type_scoped_context_does_not_propagate():
    doc = {
        "@context": {
            "@vocab": "http://v/",
            "T": {"@id": "http://v/T", "@context": {"q": "http://typed/q"}},
        },
        "@type": "T",
        "q": "top",
        "child": {"q": "nested"},
    }
    (node,) = expand_document(doc)
    assert node["http://typed/q"] == [{"@value": "top"}]
    child = node["http://v/child"][0]
    assert child["http://v/q"] == [{"@value": "nested"}]


def test_graph_container_with_index():
    doc = {
        "@context": {
            "g": {"@id": "http://p/g", "@container": ["@graph", "@index"]},
        },
        "g": {"k1": {"http://p/x": "v"}},
    }
    (node,) = expand_document(doc)
    entry = node["http://p/g"][0]
    assert "@graph" in entry and entry.get("@index") == "k1"


def test_list_container_null_stays_empty():
    doc = {
        "@context": {"l": {"@id": "http://p/l", "@container": "@list"}},
        "l": None,
    }
    out = expand_document(doc)
    assert out == []  # null value drops the property, and the node


def test_json_type_preserves_raw_value():
    doc = {
        "@context": {"j": {"@id": "http://p/j", "@type": "@json"}},
        "j": {"z": 1, "a": [None, {"b": False}]},
    }
    (node,) = expand_document(doc)
    assert node["http://p/j"] == [
        {"@value": {"z": 1, "a": [None, {"b": False}]}, "@type": "@json"}
    ]


def test_index_preserved_on_values():
    doc = {
        "@context": {"c": {"@id": "http://p/c", "@container": "@index"}},
        "c": {"idx1": ["a", "b"]},
    }
    (node,) = expand_document(doc)
    vals = node["http://p/c"]
    assert all(v["@index"] == "idx1" for v in vals)
    assert {v["@value"] for v in vals} == {"a", "b"}


def test_alias_of_type_with_array():
    doc = {
        "@context": {"kind": "@type", "@vocab": "http://v/"},
        "@id": "http://e/a",
        "kind": ["T1", "T2"],
    }
    (node,) = expand_document(doc)
    assert node["@type"] == ["http://v/T1", "http://v/T2"]
