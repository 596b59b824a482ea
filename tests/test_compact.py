"""Compaction tests — roundtrip expand→compact plus targeted cases."""

from jsonld_spark import expand_document
from jsonld_spark.compact import compact_document


def rt(doc, context=None, **kw):
    ctx = context if context is not None else doc.get("@context")
    return compact_document(expand_document(doc), ctx, **kw)


def test_simple_term():
    doc = {
        "@context": {"name": "http://xmlns.com/foaf/0.1/name"},
        "name": "Gregg",
    }
    assert rt(doc) == doc


def test_vocab_and_type():
    doc = {
        "@context": {"@vocab": "http://schema.org/"},
        "@id": "http://e/a",
        "@type": "Person",
        "name": "Alice",
    }
    assert rt(doc) == doc


def test_id_coercion():
    doc = {
        "@context": {
            "knows": {"@id": "http://xmlns.com/foaf/0.1/knows", "@type": "@id"}
        },
        "@id": "http://e/a",
        "knows": "http://e/b",
    }
    assert rt(doc) == doc


def test_typed_value_collapses():
    doc = {
        "@context": {
            "age": {
                "@id": "http://ex/age",
                "@type": "http://www.w3.org/2001/XMLSchema#integer",
            }
        },
        "@id": "http://e/a",
        "age": "33",
    }
    assert rt(doc) == doc


def test_curie_selection():
    doc = {
        "@context": {"foaf": "http://xmlns.com/foaf/0.1/"},
        "@id": "http://e/a",
        "foaf:name": "Bob",
    }
    assert rt(doc) == doc


def test_list_container():
    doc = {
        "@context": {"authors": {"@id": "http://ex/authors", "@container": "@list"}},
        "@id": "http://e/a",
        "authors": ["x", "y"],
    }
    assert rt(doc) == doc


def test_explicit_list():
    doc = {
        "@context": {"p": "http://ex/p"},
        "@id": "http://e/a",
        "p": {"@list": [1, 2]},
    }
    assert rt(doc) == doc


def test_language_map():
    doc = {
        "@context": {"label": {"@id": "http://ex/label", "@container": "@language"}},
        "@id": "http://e/a",
        "label": {"de": "Farbe", "en": "color"},
    }
    out = rt(doc, ordered=True)
    assert out["label"] == {"de": "Farbe", "en": "color"}


def test_index_map():
    doc = {
        "@context": {"p": {"@id": "http://ex/p", "@container": "@index"}},
        "@id": "http://e/a",
        "p": {"A": "a", "B": "b"},
    }
    assert rt(doc, ordered=True)["p"] == {"A": "a", "B": "b"}


def test_id_map():
    doc = {
        "@context": {
            "@vocab": "http://ex/",
            "items": {"@id": "http://ex/items", "@container": "@id"},
        },
        "items": {"http://e/x": {"label": "X"}},
    }
    out = rt(doc, ordered=True)
    assert out["items"] == {"http://e/x": {"label": "X"}}


def test_reverse_property():
    doc = {
        "@context": {"children": {"@reverse": "http://ex/parent"}},
        "@id": "http://e/a",
        "children": {"@id": "http://e/b"},
    }
    out = rt(doc)
    assert out["children"] == {"@id": "http://e/b"}


def test_language_default_collapse():
    doc = {
        "@context": {"@language": "en", "label": "http://ex/label"},
        "@id": "http://e/a",
        "label": "hello",
    }
    assert rt(doc) == doc


def test_base_relative_id():
    doc = {
        "@context": {"@base": "http://e/", "p": "http://ex/p"},
        "@id": "a",
        "p": "v",
    }
    out = rt(doc)
    assert out["@id"] == "a"


def test_keyword_alias():
    doc = {
        "@context": {"id": "@id", "type": "@type", "@vocab": "http://ex/"},
        "id": "http://e/a",
        "type": "Thing",
    }
    out = rt(doc)
    assert out["id"] == "http://e/a"
    assert out["type"] == "Thing"


def test_compact_arrays_false():
    doc = {
        "@context": {"p": "http://ex/p"},
        "@id": "http://e/a",
        "p": "v",
    }
    out = rt(doc, compact_arrays=False)
    # compactArrays=false keeps the top-level array → wrapped under @graph
    assert out["@graph"][0]["p"] == ["v"]


def test_graph_container():
    doc = {
        "@context": {
            "@vocab": "http://ex/",
            "claims": {"@container": "@graph"},
        },
        "@id": "http://e/a",
        "claims": {"p": "v"},
    }
    out = rt(doc)
    assert out["claims"] == {"p": "v"}


def test_multiple_values_stay_array():
    doc = {
        "@context": {"p": "http://ex/p"},
        "@id": "http://e/a",
        "p": ["x", "y"],
    }
    assert rt(doc)["p"] == ["x", "y"]


def test_set_container_keeps_array():
    doc = {
        "@context": {"p": {"@id": "http://ex/p", "@container": "@set"}},
        "@id": "http://e/a",
        "p": "x",
    }
    assert rt(doc)["p"] == ["x"]


def test_top_level_graph():
    docs = [
        {"@id": "http://e/a", "http://ex/p": [{"@value": "1"}]},
        {"@id": "http://e/b", "http://ex/p": [{"@value": "2"}]},
    ]
    out = compact_document(docs, {"p": "http://ex/p"})
    assert "@graph" in out
    assert len(out["@graph"]) == 2


def test_flatten_with_context_compacts():
    from jsonld_spark.flatten import flatten_document

    doc = {
        "@context": {"@vocab": "http://v/"},
        "@id": "http://e/a",
        "name": "top",
        "child": {"name": "kid", "child": {"@id": "http://e/a"}},
    }
    out = flatten_document(doc, context={"@vocab": "http://v/"})
    assert out["@context"] == {"@vocab": "http://v/"}
    graph = out["@graph"]
    ids = {n.get("@id") for n in graph}
    assert "http://e/a" in ids and any(i.startswith("_:") for i in ids)
    top = next(n for n in graph if n.get("@id") == "http://e/a")
    assert top["name"] == "top"


def test_language_container_selection():
    # values with @language compact into the @language-container term
    doc = [
        {
            "@id": "http://e/a",
            "http://v/label": [
                {"@value": "Farbe", "@language": "de"},
                {"@value": "color", "@language": "en"},
            ],
        }
    ]
    ctx = {"label": {"@id": "http://v/label", "@container": "@language"}}
    from jsonld_spark.compact import compact_document

    out = compact_document(doc, ctx, ordered=True)
    assert out["label"] == {"de": "Farbe", "en": "color"}


def test_typed_term_preferred_over_plain():
    doc = [
        {
            "@id": "http://e/a",
            "http://v/when": [
                {
                    "@value": "2024-01-01",
                    "@type": "http://www.w3.org/2001/XMLSchema#date",
                }
            ],
        }
    ]
    ctx = {
        "when": {
            "@id": "http://v/when",
            "@type": "http://www.w3.org/2001/XMLSchema#date",
        },
        "whenPlain": "http://v/when",
    }
    from jsonld_spark.compact import compact_document

    out = compact_document(doc, ctx)
    assert out["when"] == "2024-01-01"
    assert "whenPlain" not in out


def test_language_map_drops_direction_reference_parity():
    """Reference parity (compact.rb:316-317): a value object with
    @direction compacting into a @language container keeps only @value —
    direction is dropped by BOTH engines."""
    doc = [
        {
            "@id": "http://e/a",
            "http://v/label": [
                {"@value": "x", "@language": "ar", "@direction": "rtl"}
            ],
        }
    ]
    ctx = {"label": {"@id": "http://v/label", "@container": "@language"}}
    from jsonld_spark.compact import compact_document

    out = compact_document(doc, ctx)
    assert out["label"] == {"ar": "x"}


def test_nest_roundtrip():
    doc = {
        "@context": {
            "@vocab": "http://v/",
            "meta": "@nest",
            "score": {"@id": "http://v/score", "@nest": "meta"},
        },
        "@id": "http://e/a",
        "name": "top",
        "meta": {"score": 5},
    }
    from jsonld_spark import expand_document
    from jsonld_spark.compact import compact_document

    expanded = expand_document(doc)
    out = compact_document(expanded, doc["@context"])
    assert out["meta"]["score"] == 5
    assert out["name"] == "top"
    # and re-expansion matches
    assert expand_document(out) == expanded


def test_type_set_container_keeps_single_type_as_array():
    doc = [
        {"@id": "http://e/a", "@type": ["http://v/T"]}
    ]
    ctx = {"@vocab": "http://v/", "type": {"@id": "@type", "@container": "@set"}}
    from jsonld_spark.compact import compact_document

    out = compact_document(doc, ctx)
    assert out["type"] == ["T"]


def test_value_compaction_language_and_direction():
    """{@value,@language,@direction} compacts to a bare string when BOTH
    match the default mappings (spec Value Compaction step 8; the
    reference has no member-count gate)."""
    doc = {
        "@context": {
            "@language": "nl",
            "@direction": "ltr",
            "label": "http://ex.org/label",
        },
        "label": "hoi",
    }
    assert rt(doc) == doc


def test_value_compaction_direction_mismatch_stays_expanded():
    expanded = [
        {
            "http://ex.org/label": [
                {"@value": "hoi", "@language": "nl", "@direction": "rtl"}
            ]
        }
    ]
    ctx = {"@language": "nl", "@direction": "ltr", "label": "http://ex.org/label"}
    out = compact_document(expanded, ctx)
    assert out["label"] == {
        "@value": "hoi",
        "@language": "nl",
        "@direction": "rtl",
    }


def test_inverse_context_default_direction_term_selection():
    """Default @direction registers the language-less '_<dir>' inverse key
    (reference context.rb:1924) — a default language of 'nl' must not
    mangle it into 'l_ltr' (the old char-set lstrip bug)."""
    doc = {
        "@context": {
            "@language": "nl",
            "@direction": "ltr",
            "etiket": "http://ex.org/etiket",
        },
        "etiket": "waarde",
    }
    assert rt(doc) == doc


# --- round-2 compaction corners ---------------------------------------------


def test_index_container_compacts_to_map():
    doc = {
        "@context": {"c": {"@id": "http://p/c", "@container": "@index"}},
        "c": {"k1": "a", "k2": "b"},
    }
    assert rt(doc) == doc


def test_id_container_compacts_to_map():
    doc = {
        "@context": {
            "@vocab": "http://v/",
            "byId": {"@id": "http://p/m", "@container": "@id"},
        },
        "byId": {"http://e/a": {"prop": "x"}},
    }
    assert rt(doc) == doc


def test_reverse_folds_into_term():
    doc = {
        "@context": {
            "children": {"@reverse": "http://p/parent"},
        },
        "@id": "http://e/root",
        "children": {"@id": "http://e/kid"},
    }
    assert rt(doc) == doc


def test_list_compacts_with_coercion():
    doc = {
        "@context": {
            "ids": {"@id": "http://p/l", "@container": "@list", "@type": "@id"}
        },
        "ids": ["http://e/a", "http://e/b"],
    }
    assert rt(doc) == doc


def test_language_container_roundtrip():
    doc = {
        "@context": {"label": {"@id": "http://p/l", "@container": "@language"}},
        "label": {"de": "Hallo", "en": "Hello"},
    }
    assert rt(doc) == doc


def test_graph_container_roundtrip():
    doc = {
        "@context": {"g": {"@id": "http://p/g", "@container": "@graph"}},
        "g": {"http://p/x": "v"},
    }
    assert rt(doc) == doc


def test_type_map_with_set_compacts_id_only_node_to_iri():
    """Spec 12.8.9.6.3: a node with ONLY @id inside a @type map compacts
    to the bare IRI — and re-expands to the node+type form."""
    doc = {
        "@context": {
            "@vocab": "http://v/",
            "byType": {"@id": "http://p/m", "@container": ["@type", "@set"]},
        },
        "byType": {"T": [{"@id": "http://e/a"}]},
    }
    out = rt(doc)
    assert out["byType"] == {"T": ["http://e/a"]}
    assert expand_document(out) == expand_document(doc)


def test_compact_iri_picks_shortest_term():
    doc = {
        "@context": {
            "long-prefix": "http://long.example/ns#",
            "s": "http://long.example/ns#",
        },
        "s:thing": {"@id": "http://e/a"},
    }
    expanded = expand_document(doc)
    out = compact_document(expanded, doc["@context"])
    assert "s:thing" in out


def test_keyword_alias_roundtrip():
    doc = {
        "@context": {"id": "@id", "type": "@type", "@vocab": "http://v/"},
        "id": "http://e/a",
        "type": "T",
    }
    assert rt(doc) == doc


def test_compact_arrays_false_keeps_arrays():
    doc = {
        "@context": {"p": "http://p/x"},
        "p": "v",
    }
    expanded = expand_document(doc)
    out = compact_document(expanded, doc["@context"], compact_arrays=False)
    # spec: with compactArrays false the top-level array stays an array,
    # so the result is wrapped in @graph
    assert out["@graph"][0]["p"] == ["v"]


def test_compact_to_relative_false():
    """api.rb:237-245 parity: compactToRelative=False withholds the base
    from compaction — absolute IRIs stay absolute instead of being
    shortened to base-relative references."""
    from jsonld_spark.compact import compact_document

    expanded = [{"@id": "http://base.e/a/b", "http://p/q": [{"@value": "v"}]}]
    rel = compact_document(expanded, {}, base="http://base.e/a/")
    assert rel["@id"] == "b"
    absolute = compact_document(
        expanded, {}, base="http://base.e/a/", compact_to_relative=False
    )
    assert absolute["@id"] == "http://base.e/a/b"
