"""Parity against the reference's own round-trip fixtures.

Reads /root/reference/spec/test-files/test-N-{input,context,expanded,
compacted,frame,framed}.jsonld AT TEST TIME (read-only; nothing is
copied into this repo) and checks that our expand / compact / frame
produce the same JSON the Ruby gem's specs expect — the "matches the
reference's results on its own test queries" gate.
"""

import json
import os

import pytest

from jsonld_spark import expand_document
from jsonld_spark.compact import compact_document
from jsonld_spark.frame import frame_document

FIXTURES = "/root/reference/spec/test-files"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(FIXTURES), reason="reference fixtures not present"
)


def _load(name):
    path = os.path.join(FIXTURES, name)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def _norm(v, in_list=False):
    """Order-insensitive JSON normalization (expanded-form arrays are
    unordered except inside @list) — mirrors the reference's
    order-independent comparison (spec/matchers.rb produce_jsonld)."""
    if isinstance(v, dict):
        return tuple(
            sorted((k, _norm(val, in_list=(k == "@list"))) for k, val in v.items())
        )
    if isinstance(v, list):
        items = [_norm(x) for x in v]
        return tuple(items) if in_list else tuple(sorted(items, key=repr))
    return (type(v).__name__, v)


CASES = [str(i) for i in range(1, 10)]


@pytest.mark.parametrize("n", CASES)
def test_expand_matches_reference(n):
    doc = _load(f"test-{n}-input.jsonld")
    expected = _load(f"test-{n}-expanded.jsonld")
    if doc is None or expected is None:
        pytest.skip("fixture missing")
    out = expand_document(doc)
    assert _norm(out) == _norm(expected), json.dumps(out, indent=1)


@pytest.mark.parametrize("n", CASES)
def test_compact_matches_reference(n):
    doc = _load(f"test-{n}-input.jsonld")
    context = _load(f"test-{n}-context.jsonld")
    expected = _load(f"test-{n}-compacted.jsonld")
    if doc is None or context is None or expected is None:
        pytest.skip("fixture missing")
    expanded = expand_document(doc)
    out = compact_document(expanded, context)
    # expected files omit/attach @context in one form; compare sans @context
    out.pop("@context", None)
    exp = dict(expected)
    exp.pop("@context", None)
    assert _norm(out) == _norm(exp), json.dumps(out, indent=1)


def test_frame_matches_reference():
    doc = _load("test-8-input.jsonld")
    frame = _load("test-8-frame.jsonld")
    expected = _load("test-8-framed.jsonld")
    if doc is None or frame is None or expected is None:
        pytest.skip("fixture missing")
    out = frame_document(doc, frame)
    out.pop("@context", None)
    exp = dict(expected)
    exp.pop("@context", None)
    assert _norm(out) == _norm(exp), json.dumps(out, indent=1)
