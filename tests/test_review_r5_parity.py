"""Regression pins for the round-5 expand/compact/context/iri review:
each test encodes the reference behavior the fix restored (cited in the
fix's comment), on inputs the spec sweeps never exercised."""

import pytest

from jsonld_spark import errors as err
from jsonld_spark.compact import compact_document
from jsonld_spark.context import Context, ContextCache, parse_initial_cached
from jsonld_spark.expand import expand_document
from jsonld_spark.iri import remove_base, resolve_iri


def test_language_case_preserved_in_expansion():
    """context.rb:788/890 lowercase only under lowercaseLanguage; the
    expanded doc keeps 'en-US' (RDF emission lowercases separately)."""
    out = expand_document(
        {"@context": {"@language": "en-US"}, "http://ex/p": "hi"}
    )
    assert out[0]["http://ex/p"][0]["@language"] == "en-US"
    out = expand_document(
        {
            "@context": {"t": {"@id": "http://ex/t", "@language": "pt-BR"}},
            "t": "oi",
        }
    )
    assert out[0]["http://ex/t"][0]["@language"] == "pt-BR"


def test_language_map_keys_case_preserved():
    out = expand_document(
        {
            "@context": {
                "t": {"@id": "http://ex/t", "@container": "@language"}
            },
            "t": {"en-US": "hi"},
        }
    )
    assert out[0]["http://ex/t"][0]["@language"] == "en-US"


def test_rdf_literal_language_still_lowercased():
    from jsonld_spark.to_rdf import doc_to_quads

    qs = doc_to_quads({"@context": {"@language": "en-US"}, "@id": "http://s", "http://ex/p": "hi"})
    assert qs[0].obj_lang == "en-us"


def test_parse_memo_keyed_by_processing_mode():
    """A memoized 1.1 parse must not satisfy a 1.0-mode request — the
    1.0 parse raises ProcessingModeConflict on @version 1.1."""
    cache = ContextCache()
    ctx = {"@version": 1.1, "t": {"@id": "http://ex/t", "@prefix": True}}
    parse_initial_cached(None, "json-ld-1.1", cache, ctx, None)  # warm
    with pytest.raises(err.JsonLdError):
        parse_initial_cached(None, "json-ld-1.0", cache, ctx, None)


def test_named_graph_object_not_double_wrapped():
    """utils.rb:60/225: @id may accompany @graph — a named graph object
    in a @graph+@id container map passes through un-rewrapped."""
    out = expand_document(
        {
            "@context": {
                "input": {
                    "@id": "http://ex/input",
                    "@container": ["@graph", "@id"],
                }
            },
            "input": {
                "http://ex/g": {
                    "@id": "http://ex/g2",
                    "@graph": {"http://ex/p": "v"},
                }
            },
        }
    )
    items = out[0]["http://ex/input"]
    assert len(items) == 1
    item = items[0]
    assert item.get("@id") in ("http://ex/g", "http://ex/g2")
    inner = item["@graph"]
    # no graph nested directly inside a graph wrapper
    assert not any(set(x) <= {"@graph", "@id", "@index"} and "@graph" in x
                   and "@id" not in x for x in inner), item


def test_remove_base_authority_only_round_trips():
    base = "http://example.com/doc"
    rel = remove_base(base, "http://example.com")
    assert resolve_iri(base, rel) == "http://example.com"


def test_index_container_selected_for_empty_property():
    """context.rb:1511 `unless index?(value)` — nil value still gets the
    @index containers, so {'http://ex/prop': []} compacts to the term."""
    ctx = {"idx": {"@id": "http://ex/prop", "@container": "@index"}}
    out = compact_document([{"http://ex/prop": []}], ctx)
    assert "idx" in out, out


def test_protected_redefinition_string_vs_dict_accepted():
    """TermDefinition#== (context.rb:2317) ignores bookkeeping: a string
    definition re-stated as an identical dict is NOT a redefinition."""
    out = expand_document(
        {
            "@context": [
                {"@protected": True, "foo": "http://ex/foo"},
                {"foo": {"@id": "http://ex/foo"}},
            ],
            "foo": "v",
        }
    )
    assert out[0]["http://ex/foo"][0]["@value"] == "v"


def test_direction_only_value_avoids_language_map():
    """context.rb:1494-1496: a direction-only value must not land in a
    language map (re-expansion would lose @direction)."""
    ctx = {
        "@version": 1.1,
        "t": {"@id": "http://ex/t", "@container": "@language"},
    }
    expanded = [{"http://ex/t": [{"@value": "x", "@direction": "rtl"}]}]
    out = compact_document(expanded, ctx)
    # must compact via the IRI (or a plain term), NOT into t's language map
    t_val = out.get("t")
    assert t_val is None or not isinstance(t_val, dict), out


def test_link_header_cycle_raises_not_recurses():
    cache = ContextCache(
        {
            "http://ex/a": {
                "@remote-document": True,
                "contentType": "application/json",
                "contextUrl": "http://ex/b",
                "document": {},
            },
            "http://ex/b": {
                "@remote-document": True,
                "contentType": "application/json",
                "contextUrl": "http://ex/a",
                "document": {},
            },
        }
    )
    ctx = Context(cache=cache)
    with pytest.raises(err.JsonLdError):
        ctx.parse("http://ex/a")


def test_default_subtree_warnings_surface():
    """Warnings raised inside @default values reach expand_document's
    warnings sink (frame expansion)."""
    warnings: list = []
    expand_document(
        {"http://ex/p": {"@default": {"unmapped": 1}}},
        frame_expansion=True,
        warnings_out=warnings,
    )
    assert any("unmapped" in w or "dropped" in w.lower() for w in warnings), warnings
