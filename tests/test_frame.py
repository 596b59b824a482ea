"""Framing tests — common query-by-example shapes."""

from jsonld_spark.frame import frame_document

CTX = {"@vocab": "http://example.org/"}

LIBRARY = {
    "@context": CTX,
    "@graph": [
        {
            "@id": "http://example.org/library",
            "@type": "Library",
            "contains": {"@id": "http://example.org/library/the-republic"},
        },
        {
            "@id": "http://example.org/library/the-republic",
            "@type": "Book",
            "creator": "Plato",
            "title": "The Republic",
            "contains": {"@id": "http://example.org/library/the-republic#introduction"},
        },
        {
            "@id": "http://example.org/library/the-republic#introduction",
            "@type": "Chapter",
            "description": "An introductory chapter on The Republic.",
            "title": "The Introduction",
        },
    ],
}


def test_frame_by_type_embeds_recursively():
    frame = {
        "@context": CTX,
        "@type": "Library",
        "contains": {"@type": "Book", "contains": {"@type": "Chapter"}},
    }
    out = frame_document(LIBRARY, frame)
    assert out["@type"] == "Library"
    book = out["contains"]
    assert book["@type"] == "Book"
    assert book["creator"] == "Plato"
    chapter = book["contains"]
    assert chapter["@type"] == "Chapter"
    assert chapter["title"] == "The Introduction"


def test_frame_wildcard_matches_all():
    frame = {"@context": CTX, "@type": "Book"}
    out = frame_document(LIBRARY, frame)
    assert out["@type"] == "Book"
    assert out["title"] == "The Republic"


def test_embed_never_keeps_reference():
    frame = {
        "@context": CTX,
        "@type": "Library",
        "contains": {"@embed": "@never"},
    }
    out = frame_document(LIBRARY, frame)
    assert out["contains"] == {"@id": "http://example.org/library/the-republic"}


def test_explicit_drops_unframed_properties():
    frame = {
        "@context": CTX,
        "@type": "Book",
        "@explicit": True,
        "title": {},
    }
    out = frame_document(LIBRARY, frame)
    assert out["title"] == "The Republic"
    assert "creator" not in out


def test_default_value_for_missing_property():
    frame = {
        "@context": CTX,
        "@type": "Book",
        "@explicit": True,
        "publisher": {"@default": "Unknown"},
    }
    out = frame_document(LIBRARY, frame)
    assert out["publisher"] == "Unknown"


def test_omit_default_skips_missing():
    frame = {
        "@context": CTX,
        "@type": "Book",
        "@explicit": True,
        "publisher": {"@default": "Unknown", "@omitDefault": True},
    }
    out = frame_document(LIBRARY, frame)
    assert "publisher" not in out


def test_id_match():
    frame = {
        "@context": CTX,
        "@id": "http://example.org/library/the-republic",
    }
    out = frame_document(LIBRARY, frame)
    assert out["@id"] == "http://example.org/library/the-republic"
    assert out["creator"] == "Plato"


def test_value_pattern_match():
    frame = {
        "@context": CTX,
        "creator": {"@value": "Plato"},
    }
    out = frame_document(LIBRARY, frame)
    assert out["creator"] == "Plato"


def test_value_pattern_reject():
    frame = {
        "@context": CTX,
        "@type": "Book",
        "creator": {"@value": "Aristotle"},
    }
    out = frame_document(LIBRARY, frame)
    # no book by Aristotle → no match → empty result
    assert "creator" not in out or out.get("@graph") in ([], None)


def test_require_all():
    frame = {
        "@context": CTX,
        "@requireAll": True,
        "title": {},
        "description": {},
    }
    out = frame_document(LIBRARY, frame)
    # only the chapter has both title and description
    assert out["@type"] == "Chapter"


def test_bnode_pruning():
    doc = {
        "@context": CTX,
        "@type": "Thing",
        "child": {"name": "anon"},
    }
    frame = {"@context": CTX, "@type": "Thing"}
    out = frame_document(doc, frame)
    assert "@id" not in out["child"]  # single-use bnode id pruned


def test_embed_always_duplicates():
    frame = {
        "@context": CTX,
        "@type": "Library",
        "@embed": "@always",
        "contains": {},
    }
    out = frame_document(LIBRARY, frame)
    # the book is embedded under the library even though query also
    # matches it at top level elsewhere
    assert out["contains"]["@type"] == "Book"
    assert out["contains"]["creator"] == "Plato"


def test_frame_reverse():
    doc = {
        "@context": CTX,
        "@graph": [
            {"@id": "http://e/parent", "@type": "Person"},
            {
                "@id": "http://e/child",
                "@type": "Person",
                "parentOf": {"@id": "http://e/grandchild"},
            },
            {
                "@id": "http://e/mid",
                "parentOf": {"@id": "http://e/child"},
            },
        ],
    }
    frame = {
        "@context": CTX,
        "@id": "http://e/child",
        "@reverse": {"parentOf": {}},
    }
    out = frame_document(doc, frame)
    assert out["@id"] == "http://e/child"
    rev = out["@reverse"]["parentOf"]
    rev_ids = rev["@id"] if isinstance(rev, dict) else {r["@id"] for r in rev}
    assert "http://e/mid" in (rev_ids if isinstance(rev_ids, set) else {rev_ids})


def test_embed_once_deduplicates_second_reference():
    """@once (the default): the first encounter embeds, later references
    stay node references."""
    doc = {
        "@context": CTX,
        "@graph": [
            {
                "@id": "http://example.org/a",
                "@type": "Top",
                "left": {"@id": "http://example.org/shared"},
                "right": {"@id": "http://example.org/shared"},
            },
            {"@id": "http://example.org/shared", "@type": "Leaf", "title": "S"},
        ],
    }
    frame = {"@context": CTX, "@type": "Top"}
    out = frame_document(doc, frame)
    vals = [out["left"], out["right"]]
    embedded = [v for v in vals if isinstance(v, dict) and "title" in v]
    refs = [v for v in vals if isinstance(v, dict) and set(v) == {"@id"}]
    assert len(embedded) == 1 and len(refs) == 1


def test_frame_cycle_terminates_with_reference():
    """Mutually-referencing nodes must frame without infinite embedding."""
    doc = {
        "@context": CTX,
        "@graph": [
            {"@id": "http://example.org/x", "@type": "Node",
             "next": {"@id": "http://example.org/y"}},
            {"@id": "http://example.org/y", "@type": "Node",
             "next": {"@id": "http://example.org/x"}},
        ],
    }
    frame = {"@context": CTX, "@type": "Node"}
    out = frame_document(doc, frame)
    nodes = out["@graph"] if "@graph" in out else [out]
    # however it is rooted, some 'next' chain must bottom out in a bare ref
    def has_ref(n, depth=0):
        if depth > 10:
            return False
        nxt = n.get("next")
        if isinstance(nxt, dict):
            if set(nxt) == {"@id"}:
                return True
            return has_ref(nxt, depth + 1)
        return False

    assert any(has_ref(n) for n in nodes)


def test_frame_nested_property_frame_filters_embeds():
    """A sub-frame on a property restricts which nodes are embedded."""
    frame = {
        "@context": CTX,
        "@type": "Library",
        "contains": {"@type": "Book", "contains": {"@type": "Chapter"}},
    }
    out = frame_document(LIBRARY, frame)
    book = out["contains"]
    assert book["title"] == "The Republic"
    assert book["contains"]["title"] == "The Introduction"


def test_frame_preserves_frame_context_keys():
    """Output is compacted with the frame's context (terms, not IRIs)."""
    frame = {"@context": CTX, "@type": "Book"}
    out = frame_document(LIBRARY, frame)
    assert "creator" in out and "title" in out
    assert not any(k.startswith("http://") for k in out if k != "@id")


def test_validate_frame_runs_on_expanded_frame():
    """ADVICE r2: context aliases for @id/@type must not escape
    validation — the EXPANDED frame is validated (reference validates
    inside every recursive frame() call, frame.rb:28)."""
    import pytest

    from jsonld_spark import errors as err

    doc = {"@context": {"@vocab": "http://v/"}, "@id": "http://e/a", "name": "x"}
    bad = {"@context": {"id": "@id"}, "id": 7}
    with pytest.raises(err.JsonLdError):
        frame_document(doc, bad)
    # invalid @embed is still caught separately
    with pytest.raises(err.InvalidEmbedValue):
        frame_document(doc, {"@embed": "@bogus"})


def test_validate_frame_recursion_catches_nested_invalid():
    import pytest

    from jsonld_spark import errors as err

    doc = {
        "@context": {"@vocab": "http://v/"},
        "@id": "http://e/a",
        "knows": {"@id": "http://e/b", "name": "y"},
    }
    nested = {"@context": {"@vocab": "http://v/"}, "knows": {"@type": [7]}}
    with pytest.raises(err.JsonLdError):
        frame_document(doc, nested)


def test_empty_frame_still_wildcards():
    doc = {"@context": {"@vocab": "http://v/"}, "@id": "http://e/a", "name": "x"}
    out = frame_document(doc, {})
    # context-less frames still compact (against the empty context) and
    # the 1.1 default omit_graph unwraps the single match
    assert out == {"@id": "http://e/a", "http://v/name": "x"}


def test_nested_node_pattern_honors_enclosing_require_all():
    """frame.rb:423 threads the ENCLOSING frame's @requireAll flag into
    nested node patterns — a nested pattern with two properties must
    require both when @requireAll is on, even if the API option is off."""
    doc = [
        {
            "@id": "http://ex/x",
            "http://ex/p": [{"@id": "http://ex/a"}],
        },
        {"@id": "http://ex/a", "@type": ["http://ex/T"]},  # lacks ex:q
    ]
    frame = {
        "@requireAll": True,
        "http://ex/p": {"@type": ["http://ex/T"], "http://ex/q": [{}]},
    }
    out = frame_document(doc, frame, require_all=False)
    graph = out.get("@graph", [out] if "@graph" not in out else [])
    txt = str(out)
    # x itself must not match: its ex:p value fails the nested pattern
    assert "http://ex/x" not in txt or "http://ex/p" not in txt


def test_array_frame_keeps_context():
    doc = {"@id": "http://ex/a", "http://ex/name": "A"}
    frame = [{"@context": {"name": "http://ex/name"}, "name": {}}]
    out = frame_document(doc, frame)
    assert out.get("@context") == {"name": "http://ex/name"}
    assert "name" in str(out)


def test_omit_default_falls_back_to_api_option():
    """frame.rb:188 consults get_frame_flag(n, OPTIONS, :omitDefault) —
    the frame-level @omitDefault does not leak into per-property
    default processing (only the property subframe's own flag or the
    API option count)."""
    doc = {"@id": "http://ex/a", "@type": ["http://ex/T"]}
    frame = {"@omitDefault": True, "@type": ["http://ex/T"], "http://ex/p": [{}]}
    out = frame_document(doc, frame, omit_default=False)
    # API option False → default @null → property present as null
    assert "http://ex/p" in str(out)


def test_type_default_map_with_trailing_elements_is_wildcard():
    """frame.rb:382 checks only v.first: [{'@default': ...}, 'ex:Other']
    still matches every subject."""
    doc = [
        {"@id": "http://ex/a", "@type": ["http://ex/T"]},
        {"@id": "http://ex/b", "@type": ["http://ex/Other"]},
    ]
    frame = {"@type": [{"@default": "http://ex/D"}, "http://ex/Other"]}
    out = frame_document(doc, frame)
    txt = str(out)
    assert "http://ex/a" in txt and "http://ex/b" in txt
