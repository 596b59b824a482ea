"""Hand-authored toRdf mini-suite: (input JSON-LD, expected N-Quads)
pairs written from the W3C JSON-LD 1.1 spec semantics — the shape of
the official toRdf manifest (which isn't vendored in the reference
snapshot), compared by graph isomorphism like be_equivalent_graph."""

import itertools

import pytest

from jsonld_spark import doc_to_quads, parse_nquads


def _bnodes(quads):
    out = set()
    for q in quads:
        if q.subj.startswith("_:"):
            out.add(q.subj)
        if not q.obj_is_literal and q.obj.startswith("_:"):
            out.add(q.obj)
        if q.graph and q.graph.startswith("_:"):
            out.add(q.graph)
    return sorted(out)


def _relabel(quads, m):
    return {
        (
            m.get(q.subj, q.subj),
            q.pred,
            q.obj if q.obj_is_literal else m.get(q.obj, q.obj),
            q.obj_is_literal,
            q.obj_datatype,
            q.obj_lang,
            m.get(q.graph, q.graph) if q.graph else None,
        )
        for q in quads
    }


def assert_isomorphic(ours, expected_nq, options=None):
    expected = parse_nquads(expected_nq)
    ba, bb = _bnodes(ours), _bnodes(expected)
    assert len(ba) == len(bb), f"bnode count {ba} vs {bb}"
    fixed = _relabel(expected, {})
    for perm in itertools.permutations(bb):
        if _relabel(ours, dict(zip(ba, perm))) == fixed:
            return
    raise AssertionError(
        "not isomorphic:\nours=%s\nexpected=%s"
        % (sorted(_relabel(ours, {})), sorted(fixed))
    )


CASES = {
    "base-relative-ids": (
        {"@id": "frag", "http://p/x": [{"@id": "../other"}]},
        {"base": "http://ex.org/dir/doc"},
        '<http://ex.org/dir/frag> <http://p/x> <http://ex.org/other> .',
    ),
    "vocab-relative-type": (
        {
            "@context": {"@vocab": "http://vocab/"},
            "@id": "http://e/a",
            "@type": "Type",
            "p": {"@id": "http://e/b"},
        },
        {},
        """<http://e/a> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://vocab/Type> .
<http://e/a> <http://vocab/p> <http://e/b> .""",
    ),
    "language-case-normalized": (
        {
            "@id": "http://e/a",
            "http://p/l": {"@value": "x", "@language": "EN-us"},
        },
        {},
        '<http://e/a> <http://p/l> "x"@en-us .',
    ),
    "mixed-type-list": (
        {
            "@id": "http://e/a",
            "http://p/l": {"@list": [1, "s", True, 2.5]},
        },
        {},
        """<http://e/a> <http://p/l> _:b0 .
_:b0 <http://www.w3.org/1999/02/22-rdf-syntax-ns#first> "1"^^<http://www.w3.org/2001/XMLSchema#integer> .
_:b0 <http://www.w3.org/1999/02/22-rdf-syntax-ns#rest> _:b1 .
_:b1 <http://www.w3.org/1999/02/22-rdf-syntax-ns#first> "s" .
_:b1 <http://www.w3.org/1999/02/22-rdf-syntax-ns#rest> _:b2 .
_:b2 <http://www.w3.org/1999/02/22-rdf-syntax-ns#first> "true"^^<http://www.w3.org/2001/XMLSchema#boolean> .
_:b2 <http://www.w3.org/1999/02/22-rdf-syntax-ns#rest> _:b3 .
_:b3 <http://www.w3.org/1999/02/22-rdf-syntax-ns#first> "2.5E0"^^<http://www.w3.org/2001/XMLSchema#double> .
_:b3 <http://www.w3.org/1999/02/22-rdf-syntax-ns#rest> <http://www.w3.org/1999/02/22-rdf-syntax-ns#nil> .""",
    ),
    "reverse-inside-graph": (
        {
            "@id": "http://g/1",
            "@graph": [
                {
                    "@id": "http://e/a",
                    "@reverse": {"http://p/parent": {"@id": "http://e/b"}},
                }
            ],
        },
        {},
        '<http://e/b> <http://p/parent> <http://e/a> <http://g/1> .',
    ),
    "double-canonical-forms": (
        {
            "@id": "http://e/a",
            "http://p/d": [
                {"@value": 1.0e21},
                {"@value": 0.005},
                {"@value": -123456.789},
            ],
        },
        {},
        """<http://e/a> <http://p/d> "1.0E21"^^<http://www.w3.org/2001/XMLSchema#double> .
<http://e/a> <http://p/d> "5.0E-3"^^<http://www.w3.org/2001/XMLSchema#double> .
<http://e/a> <http://p/d> "-1.23456789E5"^^<http://www.w3.org/2001/XMLSchema#double> .""",
    ),
    "json-literal-unicode": (
        {
            "@id": "http://e/a",
            "http://p/j": {"@value": {"k": "日本", "a": [1.5]}, "@type": "@json"},
        },
        {},
        '<http://e/a> <http://p/j> "{\\"a\\":[1.5],\\"k\\":\\"日本\\"}"^^<http://www.w3.org/1999/02/22-rdf-syntax-ns#JSON> .',
    ),
    "bnode-predicate-dropped": (
        {
            "@id": "http://e/a",
            "_:p": "v",
            "http://p/x": "kept",
        },
        {},
        '<http://e/a> <http://p/x> "kept" .',
    ),
    "shared-bnode-object": (
        {
            "@context": {"@vocab": "http://v/"},
            "@id": "http://e/a",
            "knows": [
                {"@id": "_:x", "name": "shared"},
                {"@id": "_:x"},
            ],
        },
        {},
        """<http://e/a> <http://v/knows> _:x .
_:x <http://v/name> "shared" .""",
    ),
    "type-coercion-vocab": (
        {
            "@context": {
                "@vocab": "http://v/",
                "kind": {"@id": "http://v/kind", "@type": "@vocab"},
            },
            "@id": "http://e/a",
            "kind": "Widget",
        },
        {},
        '<http://e/a> <http://v/kind> <http://v/Widget> .',
    ),
    "graph-in-graph-flattens": (
        {
            "@id": "http://g/outer",
            "@graph": [
                {
                    "@id": "http://g/inner",
                    "@graph": [{"@id": "http://e/a", "http://p/x": "v"}],
                }
            ],
        },
        {},
        '<http://e/a> <http://p/x> "v" <http://g/inner> .',
    ),
    "index-ignored-at-rdf": (
        {
            "@context": {"p": {"@id": "http://p/x", "@container": "@index"}},
            "@id": "http://e/a",
            "p": {"A": "v1", "B": "v2"},
        },
        {},
        """<http://e/a> <http://p/x> "v1" .
<http://e/a> <http://p/x> "v2" .""",
    ),
    "nested-anon-nodes": (
        {
            "@context": {"@vocab": "http://v/"},
            "name": "anon-root-dropped-unless-props",
            "@id": "http://e/a",
            "child": {"child": {"name": "leaf"}},
        },
        {},
        """<http://e/a> <http://v/name> "anon-root-dropped-unless-props" .
<http://e/a> <http://v/child> _:b0 .
_:b0 <http://v/child> _:b1 .
_:b1 <http://v/name> "leaf" .""",
    ),
    "explicit-xsd-string-stays-plain": (
        {
            "@id": "http://e/a",
            "http://p/x": {
                "@value": "v",
                "@type": "http://www.w3.org/2001/XMLSchema#string",
            },
        },
        {},
        '<http://e/a> <http://p/x> "v" .',
    ),
    "numeric-zero-dedup": (
        # 0 and -0.0 compare equal → node-map dedup keeps the first
        # (same as the reference's add_value allow_duplicate:false)
        {
            "@id": "http://e/a",
            "http://p/n": [{"@value": 0}, {"@value": -0.0}, {"@value": 0.5}],
        },
        {},
        """<http://e/a> <http://p/n> "0"^^<http://www.w3.org/2001/XMLSchema#integer> .
<http://e/a> <http://p/n> "5.0E-1"^^<http://www.w3.org/2001/XMLSchema#double> .""",
    ),
    "negative-zero-is-integer": (
        # reference parity: (-0.0).ceil == -0.0 → integer path → "0"
        # (to_rdf.rb:42 'Don't serialize as double if no fractional bits')
        {"@id": "http://e/a", "http://p/n": {"@value": -0.0}},
        {},
        '<http://e/a> <http://p/n> "0"^^<http://www.w3.org/2001/XMLSchema#integer> .',
    ),
    "graph-default-alias": (
        {
            "@context": {"@vocab": "http://v/"},
            "@graph": [
                {"@id": "http://e/a", "p": "v1"},
                {"@id": "http://e/b", "p": "v2"},
            ],
        },
        {},
        """<http://e/a> <http://v/p> "v1" .
<http://e/b> <http://v/p> "v2" .""",
    ),
}


RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

# round-2 growth: list corners, @json shapes, direction modes, @included,
# graph containers — the manifest classes the original 17 didn't reach
CASES.update(
    {
        "empty-list-is-nil": (
            {"@id": "http://e/a", "http://p/l": {"@list": []}},
            {},
            f"<http://e/a> <http://p/l> <{RDF}nil> .",
        ),
        "list-of-lists": (
            {"@id": "http://e/a", "http://p/l": {"@list": [{"@list": ["x"]}]}},
            {},
            f"""<http://e/a> <http://p/l> _:o .
_:o <{RDF}first> _:i .
_:o <{RDF}rest> <{RDF}nil> .
_:i <{RDF}first> "x" .
_:i <{RDF}rest> <{RDF}nil> .""",
        ),
        "list-with-nodes": (
            {
                "@id": "http://e/a",
                "http://p/l": {"@list": [{"@id": "http://e/b"}, "s"]},
            },
            {},
            f"""<http://e/a> <http://p/l> _:c0 .
_:c0 <{RDF}first> <http://e/b> .
_:c0 <{RDF}rest> _:c1 .
_:c1 <{RDF}first> "s" .
_:c1 <{RDF}rest> <{RDF}nil> .""",
        ),
        "json-literal-object-jcs": (
            {
                "@id": "http://e/a",
                "http://p/j": {"@value": {"b": 2, "a": [True, 1.0]}, "@type": "@json"},
            },
            {},
            '<http://e/a> <http://p/j> "{\\"a\\":[true,1],\\"b\\":2}"'
            f"^^<{RDF}JSON> .",
        ),
        "json-literal-scalar": (
            {"@id": "http://e/a", "http://p/j": {"@value": 5, "@type": "@json"}},
            {},
            f'<http://e/a> <http://p/j> "5"^^<{RDF}JSON> .',
        ),
        "included-emits-siblings": (
            {
                "@id": "http://e/a",
                "http://p/x": "v",
                "@included": [{"@id": "http://e/b", "http://p/y": "w"}],
            },
            {},
            """<http://e/a> <http://p/x> "v" .
<http://e/b> <http://p/y> "w" .""",
        ),
        "language-map-emits-tagged": (
            {
                "@context": {
                    "label": {"@id": "http://p/label", "@container": "@language"}
                },
                "@id": "http://e/a",
                "label": {"en": "hi", "de": "hallo"},
            },
            {},
            """<http://e/a> <http://p/label> "hi"@en .
<http://e/a> <http://p/label> "hallo"@de .""",
        ),
        "type-map-assigns-types": (
            {
                "@context": {
                    "@vocab": "http://v/",
                    "byType": {"@id": "http://p/m", "@container": "@type"},
                },
                "@id": "http://e/a",
                "byType": {"T1": {"@id": "http://e/b"}},
            },
            {},
            f"""<http://e/a> <http://p/m> <http://e/b> .
<http://e/b> <{RDF}type> <http://v/T1> .""",
        ),
        "bnode-named-graph": (
            {"@graph": [{"@id": "http://e/a", "http://p/x": "v"}], "@id": "_:g"},
            {},
            '<http://e/a> <http://p/x> "v" _:g .',
        ),
        "multiple-types": (
            {"@id": "http://e/a", "@type": ["http://t/A", "http://t/B"]},
            {},
            f"""<http://e/a> <{RDF}type> <http://t/A> .
<http://e/a> <{RDF}type> <http://t/B> .""",
        ),
        "double-e21-threshold": (
            {"@id": "http://e/a", "http://p/d": 1e21},
            {},
            '<http://e/a> <http://p/d> "1.0E21"'
            '^^<http://www.w3.org/2001/XMLSchema#double> .',
        ),
        "reverse-of-reverse-forward": (
            {
                "@id": "http://e/a",
                "@reverse": {
                    "http://p/r": {
                        "@id": "http://e/b",
                        "@reverse": {"http://p/s": {"@id": "http://e/c"}},
                    }
                },
            },
            {},
            """<http://e/b> <http://p/r> <http://e/a> .
<http://e/c> <http://p/s> <http://e/b> .""",
        ),
        "set-unwraps": (
            {"@id": "http://e/a", "http://p/x": {"@set": ["v", "w"]}},
            {},
            """<http://e/a> <http://p/x> "v" .
<http://e/a> <http://p/x> "w" .""",
        ),
        "graph-container-anon": (
            {
                "@context": {"g": {"@id": "http://p/g", "@container": "@graph"}},
                "@id": "http://e/a",
                "g": {"http://p/x": [{"@value": "v"}], "@id": "http://e/inner"},
            },
            {},
            """<http://e/a> <http://p/g> _:gr .
<http://e/inner> <http://p/x> "v" _:gr .""",
        ),
        "relative-iri-property-dropped": (
            {"@id": "http://e/a", "relative-prop": "v", "http://p/x": "w"},
            {"base": "http://base.e/"},
            '<http://e/a> <http://p/x> "w" .',
        ),
    }
)


# (input, expected) pairs exercising rdf_direction modes (api option,
# reference to_rdf.rb:56-68)
DIRECTION_CASES = {
    "i18n-datatype": (
        "i18n-datatype",
        {
            "@id": "http://e/a",
            "http://p/t": {"@value": "hi", "@language": "en", "@direction": "ltr"},
        },
        '<http://e/a> <http://p/t> "hi"^^<https://www.w3.org/ns/i18n#en_ltr> .',
    ),
    "i18n-datatype-no-language": (
        "i18n-datatype",
        {"@id": "http://e/a", "http://p/t": {"@value": "hi", "@direction": "rtl"}},
        '<http://e/a> <http://p/t> "hi"^^<https://www.w3.org/ns/i18n#_rtl> .',
    ),
    "compound-literal": (
        "compound-literal",
        {
            "@id": "http://e/a",
            "http://p/t": {"@value": "hi", "@language": "en", "@direction": "ltr"},
        },
        f"""<http://e/a> <http://p/t> _:c .
_:c <{RDF}value> "hi" .
_:c <{RDF}language> "en" .
_:c <{RDF}direction> "ltr" .""",
    ),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_tordf_case(name):
    doc, opts, expected = CASES[name]
    quads = doc_to_quads(doc, base=opts.get("base"))
    assert_isomorphic(quads, expected)


@pytest.mark.parametrize("name", sorted(DIRECTION_CASES))
def test_tordf_direction_case(name):
    mode, doc, expected = DIRECTION_CASES[name]
    quads = doc_to_quads(doc, rdf_direction=mode)
    assert_isomorphic(quads, expected)
