"""SPARQL 1.1 property-path evaluation over the triples table.

The reference's query layer (ruby-rdf: SPARQL property paths over any
``RDF::Queryable``, which each JSON-LD document becomes) walks paths
edge-by-edge per solution; here a path EXPRESSION compiles to a
DataFrame of all (src, dst) pairs it connects — sequence = join,
alternative = union, inverse = column swap, ``+`` = the iterative-
doubling transitive closure (operators/graph.py), ``*``/``?`` = the
same plus the zero-length identity over the graph's node set.  The
result composes with :func:`~jsonld_spark.operators.bgp.bgp_match`
output by an ordinary join, so "?x foaf:knows+ ?y" is one more
Catalyst subtree, not a per-row traversal.

Path AST (plain tuples, no parser — the programmatic surface):

- ``"iri"``                      predicate IRI
- ``("inv", p)``                 ``^p``
- ``("seq", p1, p2, ...)``       ``p1 / p2 / ...``
- ``("alt", p1, p2, ...)``       ``p1 | p2 | ...``
- ``("plus", p)``                ``p+``
- ``("star", p)``                ``p*``
- ``("opt", p)``                 ``p?``
- ``("neg", iri, ...)``          ``!(iri | ...)`` — negated property set
- ``("neg_inv", iri, ...)``      ``!(^iri | ...)`` — its inverse half

Zero-length paths (``*``/``?``) match every term occurring as a
subject or object in the graph, each paired with itself — SPARQL 1.1
§9.3's zero-length-path node set.  All results are DISTINCT pairs
(path solutions are set-valued per SPARQL's path semantics; duplicate
route counting is explicitly not path semantics).

100-TB shape: every combinator is a shuffle-or-broadcast join / union
on (src, dst) — AQE sizes each; ``plus`` inherits the closure's
⌈log₂ diameter⌉ round bound and per-round reliable checkpoints.  The
output of a closure is the closure RELATION, so a dense graph's ``p+``
is quadratic in output no matter the engine — intended for
ontology-shaped relations, same caveat as ``transitive_closure``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .graph import transitive_closure


def _nodes(triples: DataFrame) -> DataFrame:
    """Zero-length-path node set: every subject or object term."""
    return (
        triples.select(F.col("subj").alias("src"))
        .union(triples.select(F.col("obj").alias("src")))
        .distinct()
        .select("src", F.col("src").alias("dst"))
    )


def property_path(triples: DataFrame, path, *, max_iter: int = 20) -> DataFrame:
    """Evaluate a property-path AST → DataFrame(src, dst), the distinct
    set of term pairs the path connects (see module docstring for the
    AST and the zero-length node-set convention)."""
    if isinstance(path, str):
        return (
            triples.filter(F.col("pred") == F.lit(path))
            .select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
            .distinct()
        )
    if not isinstance(path, tuple) or not path:
        raise ValueError(f"property_path: bad path node {path!r}")
    op, *args = path
    if op == "inv":
        (p,) = args
        inner = property_path(triples, p, max_iter=max_iter)
        return inner.select(
            F.col("dst").alias("src"), F.col("src").alias("dst")
        )
    if op == "seq":
        if len(args) < 2:
            raise ValueError("seq needs >= 2 steps")
        out = property_path(triples, args[0], max_iter=max_iter)
        for step in args[1:]:
            nxt = property_path(triples, step, max_iter=max_iter).select(
                F.col("src").alias("_m"), F.col("dst").alias("_d")
            )
            out = (
                out.join(nxt, out.dst == nxt._m)
                .select("src", F.col("_d").alias("dst"))
                .distinct()
            )
        return out
    if op == "alt":
        if len(args) < 2:
            raise ValueError("alt needs >= 2 branches")
        out = property_path(triples, args[0], max_iter=max_iter)
        for branch in args[1:]:
            out = out.union(property_path(triples, branch, max_iter=max_iter))
        return out.distinct()
    if op == "plus":
        (p,) = args
        inner = property_path(triples, p, max_iter=max_iter)
        return transitive_closure(inner, max_iter=max_iter)
    if op == "star":
        (p,) = args
        plus = property_path(triples, ("plus", p), max_iter=max_iter)
        return plus.union(_nodes(triples)).distinct()
    if op == "opt":
        (p,) = args
        inner = property_path(triples, p, max_iter=max_iter)
        return inner.union(_nodes(triples)).distinct()
    if op in ("neg", "neg_inv"):
        # SPARQL 1.1 negated property set: one edge whose predicate is
        # NONE of the listed IRIs (forward for "neg"; "neg_inv" is the
        # reversed-edge half of a mixed NPS — SPARQL splits
        # !(p1|^p2) into !(p1) ∪ ^(!(^p2)), composable here via "alt").
        if not args or not all(isinstance(a, str) for a in args):
            raise ValueError(f"{op} needs one or more predicate IRIs")
        df = triples.filter(~F.col("pred").isin(*args)).select(
            F.col("subj").alias("src"), F.col("obj").alias("dst")
        )
        if op == "neg_inv":
            df = df.select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            )
        return df.distinct()
    raise ValueError(f"property_path: unknown operator {op!r}")
