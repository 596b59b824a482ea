"""JSON-LD 1.1 Framing (W3C json-ld11-framing) — query-by-example.

Capability parity with /root/reference/lib/json/ld/frame.rb:26-457
(recursive embed, filter_subject matching, @embed policies, @default
handling, @preserve/@null cleanup, single-use bnode pruning) and
api.rb:382-509 orchestration.

Relational reading (SURVEY.md §2.7): ``filter_subjects`` is a semi-join
of subjects against a predicate; embedding is a recursive self-join —
per-document here, with the triples-table analog left to iterative
DataFrame joins if cross-document framing is ever needed.
"""

from __future__ import annotations

import copy
from typing import Any

from . import errors as err
from .expand import expand_document
from .flatten import node_map_from_expanded, merge_node_map_graphs
from .iri import is_keyword


class FrameState:
    def __init__(self, graph_map, embed, explicit, omit_default, require_all):
        self.graph_map = graph_map
        self.embed = embed
        self.explicit = explicit
        self.omit_default = omit_default
        self.require_all = require_all
        self.graph = "@merged"
        self.link: dict = {}
        self.embedded: set[str] = set()
        self.parents: list[str] = []

    @property
    def subjects(self) -> dict:
        return self.graph_map.get(self.graph, {})


def _flag(frame: dict, options_value, name: str):
    v = frame.get(name)
    if isinstance(v, list):
        v = v[0] if v else None
    if isinstance(v, dict):
        v = v.get("@value")
    if v is None:
        return options_value
    return v


def _node_ref(v) -> bool:
    return isinstance(v, dict) and set(v) == {"@id"}


def _value_obj(v) -> bool:
    return isinstance(v, dict) and "@value" in v


def _list_obj(v) -> bool:
    return isinstance(v, dict) and "@list" in v


def value_match(pattern: dict, value: dict) -> bool:
    """frame.rb:592-608 value-pattern matching."""
    v1, t1, l1 = value.get("@value"), value.get("@type"), value.get("@language")
    v2 = pattern.get("@value", {})
    t2 = pattern.get("@type", {})
    l2 = pattern.get("@language", {})
    if v2 == {} and t2 == {} and l2 == {}:
        return True

    def match(actual, pat, lower=False):
        if pat == {} or pat == [{}]:
            return actual is not None
        if pat == [] :
            return actual is None
        vals = pat if isinstance(pat, list) else [pat]
        if actual is None:
            return not vals
        if lower and isinstance(actual, str):
            actual = actual.lower()
            vals = [x.lower() if isinstance(x, str) else x for x in vals]
        return actual in vals

    if "@value" in pattern and not match(v1, v2):
        return False
    if "@type" in pattern and not match(t1, t2):
        return False
    if "@language" in pattern and not match(l1, l2, lower=True):
        return False
    return True


def node_match(state: FrameState, pattern: dict, value: dict) -> bool:
    if "@id" not in value:
        return False
    node = state.subjects.get(value["@id"])
    return node is not None and filter_subject(state, node, pattern, state.require_all)


def filter_subject(
    state: FrameState, subject: dict, frame: dict, require_all: bool
) -> bool:
    """frame.rb:346-457."""
    matches_some = False
    for k in frame:
        v = frame[k]
        node_values = subject.get(k, [])
        if not isinstance(node_values, list):
            node_values = [node_values]

        if k == "@id":
            ids = v if isinstance(v, list) else [v]
            if ids in ([], [{}]) or ids == [{}]:
                pass  # wildcard
            elif subject.get("@id") not in ids:
                return False
            matches_some = True
            continue
        if k == "@type":
            types = subject.get("@type", [])
            if v == [] :
                if types:
                    return False
            elif v == [{}] or v == {}:
                if not types:
                    return False
            elif isinstance(v, list) and len(v) == 1 and isinstance(v[0], dict) and set(v[0]) == {"@default"}:
                pass  # match any, with default
            else:
                vals = v if isinstance(v, list) else [v]
                if not set(types) & set(x for x in vals if isinstance(x, str)):
                    return False
            matches_some = True
            continue
        if is_keyword(k):
            continue

        # property matching
        subframe = v[0] if isinstance(v, list) and v and isinstance(v[0], dict) else (
            v if isinstance(v, dict) else {}
        )
        has_default = isinstance(subframe, dict) and "@default" in subframe
        is_empty_match_none = v == []
        is_wildcard = v in ({}, [{}])

        if is_empty_match_none:
            if node_values:
                return False
            matches_some = True
            continue
        if not node_values:
            if has_default:
                matches_some = True
                continue
            if require_all:
                return False
            continue
        if is_wildcard:
            matches_some = True
            continue
        # some node value must match the subframe pattern
        matched = False
        for nv in node_values:
            if _value_obj(nv):
                if value_match(subframe, nv):
                    matched = True
                    break
            elif _list_obj(nv):
                sub_list = subframe.get("@list", []) if isinstance(subframe, dict) else []
                pat = sub_list[0] if isinstance(sub_list, list) and sub_list else {}
                for item in nv["@list"]:
                    if _value_obj(item) and isinstance(pat, dict) and value_match(pat, item):
                        matched = True
                        break
                    if _node_ref(item) and isinstance(pat, dict) and node_match(state, pat, item):
                        matched = True
                        break
                if matched:
                    break
            elif isinstance(nv, dict) and "@id" in nv:
                if node_match(state, subframe, nv):
                    matched = True
                    break
            elif subframe == {}:
                matched = True
                break
        if not matched:
            return False
        matches_some = True
    if matches_some:
        return True
    # match-any semantics: with no matched constraint, the node only
    # passes when the frame carries no constraints at all
    has_constraints = any(
        k == "@id" or k == "@type" or not is_keyword(k) for k in frame
    )
    return not has_constraints


def filter_subjects(state: FrameState, subjects, frame: dict, require_all: bool):
    out = {}
    for sid in subjects:
        node = state.subjects.get(sid)
        if node is not None and filter_subject(state, node, frame, require_all):
            out[sid] = node
    return out


def _add_frame_output(parent, prop, output):
    if isinstance(parent, dict):
        parent.setdefault(prop, []).append(output)
    else:
        parent.append(output)


def frame_node(state: FrameState, subjects, frame: dict, parent, active_property):
    """frame.rb:26-215 recursive embed.  Like the reference (frame.rb:28),
    the frame is re-validated on EVERY recursion, so nested sub-frames
    with invalid @id/@type values fail with InvalidFrame rather than
    silently matching nothing."""
    validate_frame(frame)
    if isinstance(frame, list):
        frame = frame[0] if frame else {}
    embed = _flag(frame, state.embed, "@embed") or "@once"
    explicit = bool(_flag(frame, state.explicit, "@explicit"))
    require_all = bool(_flag(frame, state.require_all, "@requireAll"))
    omit_default = bool(_flag(frame, state.omit_default, "@omitDefault"))
    if embed not in ("@always", "@never", "@once", "@link", "@first", "@last", True, False, None):
        raise err.InvalidEmbedValue(repr(embed))

    matches = filter_subjects(state, subjects, frame, require_all)
    for sid in sorted(matches):
        node = matches[sid]
        output: dict[str, Any] = {"@id": sid}

        if embed in ("@never", False) or sid in state.parents:
            _add_frame_output(parent, active_property, {"@id": sid})
            continue
        if embed in ("@once", "@first") and sid in state.embedded:
            _add_frame_output(parent, active_property, {"@id": sid})
            continue
        state.embedded.add(sid)
        state.parents.append(sid)

        # copy properties
        for prop in sorted(node):
            values = node[prop]
            if prop == "@id":
                continue
            if is_keyword(prop):
                if prop == "@type":
                    output["@type"] = list(values)
                else:
                    output[prop] = copy.deepcopy(values)
                continue
            if explicit and prop not in frame:
                continue
            for item in values:
                subframe = None
                if prop in frame:
                    fv = frame[prop]
                    subframe = (
                        fv[0]
                        if isinstance(fv, list) and fv and isinstance(fv[0], dict)
                        else (fv if isinstance(fv, dict) else {})
                    )
                else:
                    subframe = {
                        "@embed": embed,
                        "@explicit": explicit,
                        "@requireAll": require_all,
                        "@omitDefault": omit_default,
                    }
                if _list_obj(item):
                    lst_out: dict[str, Any] = {"@list": []}
                    sub_list = subframe.get("@list") if isinstance(subframe, dict) else None
                    item_frame = (
                        sub_list[0]
                        if isinstance(sub_list, list) and sub_list and isinstance(sub_list[0], dict)
                        else {"@embed": embed, "@explicit": explicit}
                    )
                    for li in item["@list"]:
                        if _node_ref(li):
                            frame_node(state, [li["@id"]], item_frame, lst_out, "@list")
                        else:
                            lst_out["@list"].append(copy.deepcopy(li))
                    output.setdefault(prop, []).append(lst_out)
                elif _node_ref(item):
                    frame_node(state, [item["@id"]], subframe, output, prop)
                else:
                    if prop in frame and isinstance(subframe, dict) and not value_match(
                        {k: v for k, v in subframe.items() if k in ("@value", "@type", "@language")},
                        item if isinstance(item, dict) else {"@value": item},
                    ):
                        continue
                    output.setdefault(prop, []).append(copy.deepcopy(item))

        # defaults for frame-only properties
        for prop in sorted(frame):
            if prop == "@type":
                tv = frame[prop]
                if not (
                    isinstance(tv, list)
                    and len(tv) == 1
                    and isinstance(tv[0], dict)
                    and set(tv[0]) == {"@default"}
                ):
                    continue
            elif is_keyword(prop):
                continue
            if prop in output:
                continue
            fv = frame[prop]
            subframe = (
                fv[0]
                if isinstance(fv, list) and fv and isinstance(fv[0], dict)
                else (fv if isinstance(fv, dict) else {})
            )
            if bool(_flag(subframe, omit_default, "@omitDefault")):
                continue
            default = subframe.get("@default", "@null")
            if default is None:
                default = "@null"
            if not isinstance(default, list):
                default = [default]
            output[prop] = [{"@preserve": copy.deepcopy(default)}]

        # @reverse framing
        for rprop, rframe in (frame.get("@reverse") or {}).items():
            for osid, onode in state.subjects.items():
                refs = onode.get(rprop, [])
                if any(_node_ref(r) and r["@id"] == sid for r in refs):
                    rev = output.setdefault("@reverse", {})
                    sub = (
                        rframe[0]
                        if isinstance(rframe, list) and rframe and isinstance(rframe[0], dict)
                        else {}
                    )
                    frame_node(state, [osid], sub, rev, rprop)

        state.parents.pop()
        _add_frame_output(parent, active_property, output)


def _cleanup_preserve(element):
    if isinstance(element, list):
        out = []
        for item in element:
            c = _cleanup_preserve(item)
            if isinstance(item, dict) and "@preserve" in item:
                pres = item["@preserve"]
                pres = pres if isinstance(pres, list) else [pres]
                for p in pres:
                    if p != "@null":
                        out.append(_cleanup_preserve(p))
            elif c is not None:
                out.append(c)
        return out
    if isinstance(element, dict):
        if "@preserve" in element:
            pres = element["@preserve"]
            pres = pres if isinstance(pres, list) else [pres]
            vals = [p for p in pres if p != "@null"]
            return _cleanup_preserve(vals[0]) if vals else None
        return {k: _cleanup_preserve(v) for k, v in element.items()}
    return element


def _count_bnodes(element, counts: dict):
    if isinstance(element, list):
        for i in element:
            _count_bnodes(i, counts)
    elif isinstance(element, dict):
        for k, v in element.items():
            if k == "@id" and isinstance(v, str) and v.startswith("_:"):
                counts[v] = counts.get(v, 0) + 1
            else:
                _count_bnodes(v, counts)


def _prune_bnodes(element, single_use: set):
    if isinstance(element, list):
        return [_prune_bnodes(i, single_use) for i in element]
    if isinstance(element, dict):
        out = {}
        for k, v in element.items():
            if k == "@id" and isinstance(v, str) and v in single_use:
                continue
            out[k] = _prune_bnodes(v, single_use)
        return out
    return element


def validate_frame(frame) -> None:
    """Frame syntax checks (reference frame.rb:459-476): the frame must
    be a map (or one-element array of a map); @id must be the [{}]
    wildcard or IRI strings; @type must be wildcards / {"@default": ...}
    maps / IRI strings.  Strings are accepted as-is (compact and
    relative IRIs resolve during frame expansion)."""
    if isinstance(frame, list):
        if len(frame) != 1 or not isinstance(frame[0], dict):
            raise err.InvalidFrame(f"frame must be an object: {frame!r}")
        frame = frame[0]
    if not isinstance(frame, dict):
        raise err.InvalidFrame(f"frame must be an object: {frame!r}")

    ids = frame.get("@id", [])
    ids = ids if isinstance(ids, list) else [ids]
    if ids != [{}] and not all(isinstance(v, str) for v in ids):
        raise err.InvalidFrame(f"invalid value of @id: {frame.get('@id')!r}")

    types = frame.get("@type", [])
    types = types if isinstance(types, list) else [types]
    for v in types:
        if isinstance(v, dict):
            if set(v) - {"@default"}:
                raise err.InvalidFrame(f"invalid value of @type: {frame.get('@type')!r}")
        elif not isinstance(v, str):
            raise err.InvalidFrame(f"invalid value of @type: {frame.get('@type')!r}")


def frame_document(
    doc,
    frame,
    base: str | None = None,
    cache=None,
    embed: str = "@once",
    explicit: bool = False,
    omit_default: bool = False,
    require_all: bool = False,
    prune_blank_node_identifiers: bool = True,
    frame_default: bool = False,
    ordered: bool = False,
    omit_graph: bool = True,
):
    """API.frame equivalent (reference api.rb:382-509)."""
    validate_frame(frame)
    expanded = expand_document(doc, base=base, cache=cache)
    expanded_frame = expand_document(frame, base=base, cache=cache, frame_expansion=True)
    # validate the EXPANDED frame too (reference validates inside the
    # recursive frame() call over expanded input, frame.rb:28): context
    # aliases for @id/@type are resolved by now, so aliased invalid
    # values cannot escape validation (an empty frame expands to [] —
    # the wildcard — exactly as the reference frames with {} then)
    validate_frame(expanded_frame[0] if expanded_frame else {})

    node_map, _ = node_map_from_expanded(expanded)
    node_map["@merged"] = merge_node_map_graphs(
        {k: v for k, v in node_map.items() if k != "@merged"}
    )
    state = FrameState(node_map, embed, explicit, omit_default, require_all)
    state.graph = "@default" if frame_default else "@merged"

    f0 = expanded_frame[0] if expanded_frame else {}
    results: list = []
    frame_node(state, sorted(state.subjects), f0, results, None)

    results = _cleanup_preserve(results)
    if prune_blank_node_identifiers:
        counts: dict = {}
        _count_bnodes(results, counts)
        single = {b for b, c in counts.items() if c == 1}
        results = _prune_bnodes(results, single)

    # compact with the frame's context
    from .compact import compact_document

    frame_ctx = frame.get("@context") if isinstance(frame, dict) else None
    if frame_ctx is not None:
        compacted = compact_document(results, frame_ctx, base=base, cache=cache, ordered=ordered)
        graph_key = "@graph"
        if (
            omit_graph
            and isinstance(compacted, dict)
            and isinstance(compacted.get(graph_key), list)
            and len(compacted[graph_key]) == 1
        ):
            inner = compacted[graph_key][0]
            compacted = {"@context": compacted["@context"], **inner}
        return compacted
    return results
