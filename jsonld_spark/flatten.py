"""JSON-LD 1.1 Flattening — node-map generation + blank-node naming.

From-scratch implementation of the W3C "Node Map Generation" /
"Generate Blank Node Identifier" / "Flattening" algorithms
(https://www.w3.org/TR/json-ld11-api/#flattening-algorithms).
Capability parity with /root/reference/lib/json/ld/flatten.rb:30-201
(create_node_map) and utils.rb:245-311 (namers).

Cluster-scale note (SURVEY.md §2.4): the namer here is *document-local*
(labels ``b0..bn`` in deterministic first-visit order).  Global
uniqueness across 10^12 docs is applied afterwards by the pipeline as a
salted hash ``_:sha256(url ‖ label)`` — no shared mutable state.
"""

from __future__ import annotations

from typing import Any

from . import errors as err
from .expand import expand_document
from .iri import is_keyword


class BlankNodeNamer:
    """Deterministic doc-local namer (reference: utils.rb:283-309)."""

    __slots__ = ("prefix", "counter", "mapping")

    def __init__(self, prefix: str = "b"):
        self.prefix = prefix
        self.counter = 0
        self.mapping: dict[str, str] = {}

    def get_name(self, old: str | None = None) -> str:
        if old is not None:
            existing = self.mapping.get(old)
            if existing is not None:
                return existing
        name = f"_:{self.prefix}{self.counter}"
        self.counter += 1
        if old is not None:
            self.mapping[old] = name
        return name


def json_eq(a, b) -> bool:
    """JSON-faithful equality: Python's ``==`` conflates ``0 == False``
    and ``1 == True``; JSON (and the reference's Ruby, where
    ``0 == false`` is falsy) distinguishes booleans from numbers, while
    ``1 == 1.0`` stays equal in both.  Recurses into containers."""
    if isinstance(a, bool) != isinstance(b, bool):
        return False
    if isinstance(a, dict) and isinstance(b, dict):
        return a.keys() == b.keys() and all(json_eq(v, b[k]) for k, v in a.items())
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(json_eq(x, y) for x, y in zip(a, b))
    return a == b


def _add_value_dedup(obj: dict, key: str, value) -> None:
    """Append value to obj[key] array unless an equal value exists
    (reference add_value(..., allow_duplicate: false), utils.rb:163-185)."""
    arr = obj.setdefault(key, [])
    if not any(json_eq(value, existing) for existing in arr):
        arr.append(value)


def create_node_map(
    element,
    node_map: dict,
    namer: BlankNodeNamer,
    active_graph: str = "@default",
    active_subject=None,
    active_property: str | None = None,
    list_: dict | None = None,
) -> None:
    """W3C Node Map Generation. Mutates ``node_map`` (and ``element``)."""
    if isinstance(element, list):
        for item in element:
            create_node_map(
                element=item,
                node_map=node_map,
                namer=namer,
                active_graph=active_graph,
                active_subject=active_subject,
                active_property=active_property,
                list_=list_,
            )
        return

    if not isinstance(element, dict):
        return

    graph = node_map.setdefault(active_graph, {})
    subject_node = (
        graph.get(active_subject) if isinstance(active_subject, str) else None
    )

    # 3: relabel bnode @type values
    if "@type" in element:
        types = element["@type"]
        if isinstance(types, list):
            element["@type"] = [
                namer.get_name(t) if isinstance(t, str) and t.startswith("_:") else t
                for t in types
            ]
        elif isinstance(types, str) and types.startswith("_:"):
            element["@type"] = namer.get_name(types)

    # 4: value object
    if "@value" in element:
        if list_ is None:
            if subject_node is not None and active_property is not None:
                _add_value_dedup(subject_node, active_property, element)
        else:
            list_["@list"].append(element)
        return

    # 5: list object
    if "@list" in element:
        result: dict[str, Any] = {"@list": []}
        create_node_map(
            element=element["@list"],
            node_map=node_map,
            namer=namer,
            active_graph=active_graph,
            active_subject=active_subject,
            active_property=active_property,
            list_=result,
        )
        if list_ is None:
            if subject_node is not None and active_property is not None:
                subject_node.setdefault(active_property, []).append(result)
        else:
            list_["@list"].append(result)
        return

    # 6: node object
    if "@id" in element:
        id_ = element.pop("@id")
        if isinstance(id_, str) and id_.startswith("_:"):
            id_ = namer.get_name(id_)
    else:
        id_ = namer.get_name()
    if not isinstance(id_, str):
        return  # frame wildcards etc. — not valid here

    if id_ not in graph:
        graph[id_] = {"@id": id_}
    node = graph[id_]

    # 6.5/6.6: link from referencing node
    if isinstance(active_subject, dict):
        # reverse reference: active_subject is the referenced node def
        _add_value_dedup(node, active_property, active_subject)
    elif active_property is not None:
        reference = {"@id": id_}
        if list_ is None:
            if subject_node is not None:
                _add_value_dedup(subject_node, active_property, reference)
        else:
            list_["@list"].append(reference)

    # 6.7: @type merge
    if "@type" in element:
        types = element.pop("@type")
        types = types if isinstance(types, list) else [types]
        for t in types:
            _add_value_dedup(node, "@type", t)

    # 6.8: @index
    if "@index" in element:
        idx = element.pop("@index")
        if "@index" in node and node["@index"] != idx:
            raise err.ConflictingIndexes(id_)
        node["@index"] = idx

    # 6.9: @reverse
    if "@reverse" in element:
        referenced = {"@id": id_}
        reverse_map = element.pop("@reverse")
        for prop, values in reverse_map.items():
            for value in values:
                create_node_map(
                    element=value,
                    node_map=node_map,
                    namer=namer,
                    active_graph=active_graph,
                    active_subject=referenced,
                    active_property=prop,
                )

    # 6.10: @graph
    if "@graph" in element:
        sub = element.pop("@graph")
        create_node_map(
            element=sub, node_map=node_map, namer=namer, active_graph=id_
        )

    # 6.11: @included
    if "@included" in element:
        inc = element.pop("@included")
        create_node_map(
            element=inc, node_map=node_map, namer=namer, active_graph=active_graph
        )

    # 6.12: remaining properties
    for property_ in sorted(k for k in element if k != "@id"):
        value = element[property_]
        if property_.startswith("_:"):
            property_ = namer.get_name(property_)
        if is_keyword(property_):
            node[property_] = value
            continue
        node.setdefault(property_, [])
        create_node_map(
            element=value,
            node_map=node_map,
            namer=namer,
            active_graph=active_graph,
            active_subject=id_,
            active_property=property_,
        )


def node_map_from_expanded(expanded) -> tuple[dict, BlankNodeNamer]:
    namer = BlankNodeNamer()
    node_map: dict[str, dict] = {"@default": {}}
    create_node_map(expanded, node_map, namer)
    return node_map, namer


def merge_node_map_graphs(node_map: dict) -> dict:
    """Union of all graphs' node maps (reference flatten.rb:274-296).
    Relational analog: ``triples.drop("graph").dropDuplicates()``."""
    merged: dict[str, dict] = {}
    for graph_name in sorted(node_map):
        for id_, node in node_map[graph_name].items():
            merged_node = merged.setdefault(id_, {"@id": id_})
            for prop, values in node.items():
                if prop == "@id":
                    continue
                if is_keyword(prop):
                    if prop == "@type":
                        for v in values if isinstance(values, list) else [values]:
                            _add_value_dedup(merged_node, "@type", v)
                    else:
                        merged_node[prop] = values
                else:
                    for v in values:
                        _add_value_dedup(merged_node, prop, v)
    return merged


def flatten_expanded(expanded, ordered: bool = False) -> list:
    """Flatten an already-expanded document → flattened expanded array
    (W3C Flattening Algorithm steps 2-7, no compaction)."""
    node_map, _ = node_map_from_expanded(expanded)
    default_graph = node_map["@default"]
    for graph_name in sorted(k for k in node_map if k != "@default"):
        entry = default_graph.setdefault(graph_name, {"@id": graph_name})
        graph_list = entry.setdefault("@graph", [])
        for id_ in sorted(node_map[graph_name]):
            node = node_map[graph_name][id_]
            if len(node) > 1 or "@id" not in node:
                graph_list.append(node)
    flattened = []
    for id_ in sorted(default_graph):
        node = default_graph[id_]
        if len(node) > 1 or "@id" not in node:
            flattened.append(node)
    return flattened


def flatten_document(
    doc,
    context=None,
    base: str | None = None,
    cache=None,
    expand_context=None,
    ordered: bool = False,
) -> Any:
    """API.flatten equivalent (reference api.rb:290-351), sans compaction
    unless ``context`` given (compaction wired in compact.py)."""
    expanded = expand_document(
        doc, base=base, cache=cache, expand_context=expand_context, ordered=ordered
    )
    flattened = flatten_expanded(expanded, ordered=ordered)
    if context is not None:
        from .compact import compact_document

        return compact_document(
            flattened, context, base=base, cache=cache
        )
    return flattened
