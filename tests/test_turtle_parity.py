"""toRdf parity vs the reference's Turtle golden files (read at test
time, not copied) — graph isomorphism via bnode bijection."""

import itertools
import json
import os

import pytest

from jsonld_spark import doc_to_quads
from jsonld_spark.sources.turtle import parse_turtle

FIXTURES = "/root/reference/spec/test-files"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(FIXTURES), reason="reference fixtures not present"
)


def _bnodes(quads):
    out = set()
    for q in quads:
        for t in (q.subj, q.obj if not q.obj_is_literal else None, q.graph):
            if t and t.startswith("_:"):
                out.add(t)
    return sorted(out)


def _relabel(quads, mapping):
    out = set()
    for q in quads:
        s = mapping.get(q.subj, q.subj)
        o = q.obj if q.obj_is_literal else mapping.get(q.obj, q.obj)
        g = mapping.get(q.graph, q.graph) if q.graph else None
        out.add((s, q.pred, o, q.obj_is_literal, q.obj_datatype, q.obj_lang, g))
    return out


def isomorphic(a, b) -> bool:
    """Exhaustive bijection search — fine for fixture-sized graphs."""
    ba, bb = _bnodes(a), _bnodes(b)
    if len(ba) != len(bb):
        return False
    fixed_b = _relabel(b, {})
    if len(ba) > 7:
        raise ValueError("too many bnodes for brute force")
    for perm in itertools.permutations(bb):
        mapping = dict(zip(ba, perm))
        if _relabel(a, mapping) == fixed_b:
            return True
    return False


CASES = ["1", "2", "3", "4", "5", "6", "7", "8"]


@pytest.mark.parametrize("n", CASES)
def test_to_rdf_matches_reference_ttl(n):
    inp = os.path.join(FIXTURES, f"test-{n}-input.jsonld")
    ttl = os.path.join(FIXTURES, f"test-{n}-rdf.ttl")
    if not (os.path.exists(inp) and os.path.exists(ttl)):
        pytest.skip("fixture missing")
    with open(inp) as f:
        doc = json.load(f)
    ours = doc_to_quads(doc)
    with open(ttl) as f:
        expected = parse_turtle(f.read())
    assert isomorphic(ours, expected), (
        f"ours={sorted(ours)}\nexpected={sorted(expected)}"
    )


def test_langtag_prefixed_by_directive_keyword():
    """'@baseball' is a valid LANGTAG — '@base' must not greedily match."""
    from jsonld_spark.sources.turtle import parse_turtle

    qs = parse_turtle('<http://s> <http://p> "x"@baseball .')
    assert qs[0].obj_lang == "baseball"
    qs = parse_turtle('<http://s> <http://p> "y"@prefixed .')
    assert qs[0].obj_lang == "prefixed"


def test_trig_block_final_bnode_statement_no_dot():
    from jsonld_spark.sources.turtle import parse_turtle

    qs = parse_turtle("<http://g> { [ <http://p> <http://o> ] }")
    assert len(qs) == 1
    assert qs[0].graph == "http://g" and qs[0].pred == "http://p"


def test_collection_as_subject():
    from jsonld_spark.sources.turtle import parse_turtle

    qs = parse_turtle("(1 2) <http://p> <http://o> .")
    objs = {(q.pred, q.obj) for q in qs}
    assert ("http://p", "http://o") in objs
    assert ("http://www.w3.org/1999/02/22-rdf-syntax-ns#first", "1") in objs


def test_base_directive_requires_iri():
    import pytest

    from jsonld_spark.sources.turtle import TurtleError, parse_turtle

    with pytest.raises(TurtleError):
        parse_turtle("@prefix ex: <http://e/> . @base ex:b . <s> <p> <o> .")
