"""URDNA2015-style per-document blank-node canonicalization.

The pipeline's global bnode identity is ``sha256(url ‖ script ‖ label)``.
With traversal-order labels, the SAME content serialized with different
JSON key order yields different labels → different global IDs → phantom
duplicate entities across re-crawls.  Canonical labeling makes the
label a function of the GRAPH, not the serialization (the north star's
"URDNA2015-style per-document labeling").

Algorithm (RDF Dataset Canonicalization shape, sized for per-document
graphs): first-degree neighborhood hashing, then iterative label
gossip for ties, then a deterministic serialization tie-break.  Full
URDNA2015's N-degree path exploration is replaced by the gossip+
tie-break (equivalent outcomes on non-pathological graphs; documents
with adversarial automorphic bnode clusters still get deterministic —
just not spec-exact — labels).
"""

from __future__ import annotations

import hashlib

from .rdf_model import Quad

_SELF = "\x01self"
_OTHER = "\x01blank"


def _term_repr(term: str, me: str, labels: dict[str, str] | None):
    if not term.startswith("_:"):
        return term
    if term == me:
        return _SELF
    if labels is not None:
        return _OTHER + labels.get(term, "")
    return _OTHER


def _hash_neighborhood(bnode: str, quads, labels=None) -> str:
    lines = []
    for q in quads:
        if bnode not in (q.subj, q.obj if not q.obj_is_literal else None, q.graph):
            continue
        lines.append(
            "|".join(
                (
                    _term_repr(q.subj, bnode, labels),
                    q.pred,
                    _term_repr(q.obj, bnode, labels)
                    if not q.obj_is_literal
                    else f"L{q.obj}\x02{q.obj_datatype}\x02{q.obj_lang}",
                    _term_repr(q.graph, bnode, labels) if q.graph else "",
                )
            )
        )
    lines.sort()
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()


def canonical_bnode_labels(quads: list[Quad], prefix: str = "c") -> dict[str, str]:
    """→ {old_label: canonical label} with labels ``_:c0.._:cn`` assigned
    in canonical (content-determined) order."""
    bnodes = set()
    for q in quads:
        if q.subj.startswith("_:"):
            bnodes.add(q.subj)
        if not q.obj_is_literal and q.obj.startswith("_:"):
            bnodes.add(q.obj)
        if q.graph and q.graph.startswith("_:"):
            bnodes.add(q.graph)
    if not bnodes:
        return {}
    if len(bnodes) == 1:
        # fast path: a single bnode needs no canonical ordering — the
        # common crawl case (one anonymous node per doc)
        return {next(iter(bnodes)): f"_:{prefix}0"}

    # round 0: first-degree hashes
    hashes = {b: _hash_neighborhood(b, quads) for b in bnodes}

    # gossip rounds: refine ties using neighbors' current hashes
    for _ in range(len(bnodes)):
        groups: dict[str, list[str]] = {}
        for b, h in hashes.items():
            groups.setdefault(h, []).append(b)
        if all(len(g) == 1 for g in groups.values()):
            break
        new_hashes = {}
        for b in bnodes:
            new_hashes[b] = hashlib.sha256(
                (hashes[b] + "|" + _hash_neighborhood(b, quads, hashes)).encode()
            ).hexdigest()
        if new_hashes == hashes:
            break
        hashes = new_hashes

    # deterministic final order: (hash, full serialization relative to b)
    def tiebreak(b: str) -> tuple:
        return (hashes[b], _hash_neighborhood(b, quads, {x: x for x in bnodes}))

    ordered = sorted(bnodes, key=tiebreak)
    return {b: f"_:{prefix}{i}" for i, b in enumerate(ordered)}


def canonicalize_quads(quads: list[Quad], prefix: str = "c") -> list[Quad]:
    """Relabel all bnodes canonically (order of quads preserved)."""
    mapping = canonical_bnode_labels(quads, prefix)
    if not mapping:
        return quads
    out = []
    for q in quads:
        out.append(
            Quad(
                mapping.get(q.subj, q.subj),
                mapping.get(q.pred, q.pred),
                q.obj if q.obj_is_literal else mapping.get(q.obj, q.obj),
                q.obj_is_literal,
                q.obj_datatype,
                q.obj_lang,
                mapping.get(q.graph, q.graph) if q.graph else q.graph,
            )
        )
    return out
