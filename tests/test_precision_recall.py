"""Triple precision/recall vs the reference's golden RDF — the north
rule's headline metric (target ≥ 0.95).

Corpus: every reference fixture with an RDF golden file
(/root/reference/spec/test-files/test-N-rdf.ttl, read at test time).
P/R computed after optimal bnode alignment per document.
"""

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
        if q.subj.startswith("_:"):
            out.add(q.subj)
        if not q.obj_is_literal and q.obj.startswith("_:"):
            out.add(q.obj)
    return sorted(out)


def _relabel(quads, mapping):
    return {
        (
            mapping.get(q.subj, q.subj),
            q.pred,
            q.obj if q.obj_is_literal else mapping.get(q.obj, q.obj),
            q.obj_is_literal,
            q.obj_datatype,
            q.obj_lang,
        )
        for q in quads
    }


def _best_overlap(ours, expected) -> int:
    """Max |ours ∩ expected| over bnode bijections (small fixtures)."""
    ba, bb = _bnodes(ours), _bnodes(expected)
    fixed = _relabel(expected, {})
    best = 0
    smaller, larger = (ba, bb) if len(ba) <= len(bb) else (bb, ba)
    for perm in itertools.permutations(larger, len(smaller)):
        mapping = dict(zip(smaller, perm))
        if len(ba) <= len(bb):
            cand = _relabel(ours, mapping)
            best = max(best, len(cand & fixed))
        else:
            cand = _relabel(expected, mapping)
            best = max(best, len(_relabel(ours, {}) & cand))
    return best


def test_triple_precision_recall_vs_reference():
    total_ours = total_expected = total_overlap = 0
    n_docs = 0
    for n in range(1, 10):
        inp = os.path.join(FIXTURES, f"test-{n}-input.jsonld")
        ttl = os.path.join(FIXTURES, f"test-{n}-rdf.ttl")
        if not (os.path.exists(inp) and os.path.exists(ttl)):
            continue
        with open(inp) as f:
            ours = doc_to_quads(json.load(f))
        with open(ttl) as f:
            expected = parse_turtle(f.read())
        total_ours += len(ours)
        total_expected += len(expected)
        total_overlap += _best_overlap(ours, expected)
        n_docs += 1
    assert n_docs >= 8
    precision = total_overlap / total_ours
    recall = total_overlap / total_expected
    print(
        f"\nTriple P/R vs reference golden RDF over {n_docs} docs: "
        f"precision={precision:.4f} recall={recall:.4f} "
        f"({total_overlap}/{total_ours} ours, {total_overlap}/{total_expected} expected)"
    )
    assert precision >= 0.95, precision
    assert recall >= 0.95, recall
