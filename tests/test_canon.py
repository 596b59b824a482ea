"""URDNA2015-style canonical bnode labeling tests."""

import json
import random

from jsonld_spark.canon import canonical_bnode_labels, canonicalize_quads
from jsonld_spark.context import ContextCache
from jsonld_spark.udfs import page_to_rows
from jsonld_spark import doc_to_quads


def _shuffle_keys(obj, rng):
    if isinstance(obj, dict):
        items = list(obj.items())
        rng.shuffle(items)
        return {k: _shuffle_keys(v, rng) for k, v in items}
    if isinstance(obj, list):
        return [_shuffle_keys(v, rng) for v in obj]
    return obj


DOC = {
    "@context": {"@vocab": "http://v/"},
    "@id": "http://e/a",
    "knows": [
        {"name": "anon1", "age": 1, "likes": {"name": "leaf1"}},
        {"name": "anon2", "age": 2, "likes": {"name": "leaf2"}},
    ],
    "owner": {"name": "anon3"},
}


def test_labels_invariant_under_key_order():
    rng = random.Random(3)
    base = canonicalize_quads(doc_to_quads(json.loads(json.dumps(DOC))))
    for _ in range(5):
        shuffled = _shuffle_keys(json.loads(json.dumps(DOC)), rng)
        other = canonicalize_quads(doc_to_quads(shuffled))
        assert set(other) == set(base)


def test_salted_ids_stable_across_serializations():
    """The end-to-end property the pipeline needs: same content, any
    key order → identical salted global bnode IDs."""
    rng = random.Random(4)
    cache = ContextCache()

    def rows_for(doc):
        html = (
            '<script type="application/ld+json">' + json.dumps(doc) + "</script>"
        ).encode()
        return set(page_to_rows("http://u/x", html, cache))

    base = rows_for(DOC)
    for _ in range(4):
        assert rows_for(_shuffle_keys(json.loads(json.dumps(DOC)), rng)) == base


def test_distinguishes_distinct_bnodes():
    quads = doc_to_quads(
        {
            "@context": {"@vocab": "http://v/"},
            "@id": "http://e/a",
            "p": [{"name": "x"}, {"name": "y"}],
        }
    )
    labels = canonical_bnode_labels(quads)
    assert len(set(labels.values())) == 2


def test_symmetric_bnodes_get_deterministic_labels():
    # two structurally identical bnodes (automorphic) — labels must
    # still be assigned deterministically
    doc = {
        "@context": {"@vocab": "http://v/"},
        "@id": "http://e/a",
        "p": [{"name": "same"}, {"name": "same"}],
    }
    # identical value objects dedup in the node map → craft via distinct ids
    q1 = canonicalize_quads(doc_to_quads(json.loads(json.dumps(doc))))
    q2 = canonicalize_quads(doc_to_quads(json.loads(json.dumps(doc))))
    assert set(q1) == set(q2)


def test_list_chain_canonical():
    doc = {
        "@context": {"p": {"@id": "http://v/p", "@container": "@list"}},
        "@id": "http://e/a",
        "p": ["x", "y", "z"],
    }
    rng = random.Random(5)
    base = canonicalize_quads(doc_to_quads(json.loads(json.dumps(doc))))
    shuffled = _shuffle_keys(json.loads(json.dumps(doc)), rng)
    assert set(canonicalize_quads(doc_to_quads(shuffled))) == set(base)
