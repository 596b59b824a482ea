"""SPARQL-style Basic Graph Pattern matching over the triples table.

The reference feeds ``RDF::Queryable`` (each JSON-LD document becomes an
enumerable of statements that ruby-rdf's ``RDF::Query`` pattern-matches
— see /root/reference/README.md usage with RDF::Repository); here the
equivalent query capability is compiled STRAIGHT to Catalyst: each
pattern is one filtered scan of the triples DataFrame (constants become
pushed-down predicates), shared variables become equi-join keys, and
the optimizer picks broadcast vs shuffle per join from runtime sizes
(AQE).  Nothing is collected; a BGP over a 100-TB triple store is just
a join tree.

Pattern syntax: ``(s, p, o)`` string triples; a component starting with
``"?"`` is a variable, anything else is a constant matched against the
``subj`` / ``pred`` / ``obj`` columns (object constants match the
lexical form; datatype-sensitive matching can be layered with an extra
filter on ``obj_datatype``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_POSITIONS = ("subj", "pred", "obj")


def _pattern_df(triples: DataFrame, pattern, idx: int) -> tuple[DataFrame, set]:
    """One pattern → filtered scan projecting its variables."""
    if len(pattern) != 3:
        raise ValueError(f"pattern #{idx} must be a (s, p, o) triple: {pattern!r}")
    df = triples
    seen: dict[str, str] = {}  # var -> first column bound to it
    cols = []
    for col, term in zip(_POSITIONS, pattern):
        if isinstance(term, str) and term.startswith("?"):
            var = term[1:]
            if not var:
                raise ValueError(f"pattern #{idx}: bare '?' is not a variable")
            if var in seen:  # ?x p ?x — same-row equality, select once
                df = df.filter(F.col(seen[var]) == F.col(col))
            else:
                seen[var] = col
                cols.append(F.col(col).alias(var))
        else:
            df = df.filter(F.col(col) == F.lit(term))
    if not cols:  # ground pattern: contributes only an existence check
        cols = [F.lit(1).alias(f"_ground_{idx}")]
    return df.select(*cols).distinct(), set(seen)


def bgp_match(
    triples: DataFrame,
    patterns,
    *,
    allow_cartesian: bool = False,
) -> DataFrame:
    """→ DataFrame with one column per distinct variable: every binding
    of the variables such that ALL patterns hold (SPARQL BGP semantics,
    set projection — each pattern scan is de-duplicated, so a variable
    set is a solution once regardless of how many triples witness it).

    Join order: most-constant pattern first (selectivity heuristic),
    then greedily any pattern sharing a variable with the bound set —
    a disconnected pattern group is a cross product, refused unless
    ``allow_cartesian=True`` (at web scale that is almost always a
    query bug, not an intent).
    """
    pats = list(patterns)
    if not pats:
        raise ValueError("bgp_match: empty pattern list")
    parts = [_pattern_df(triples, p, i) for i, p in enumerate(pats)]

    def n_consts(i):
        return sum(
            not (isinstance(t, str) and t.startswith("?")) for t in pats[i]
        )

    remaining = sorted(range(len(pats)), key=lambda i: (-n_consts(i), i))
    first = remaining.pop(0)
    out, bound = parts[first]
    while remaining:
        nxt = next(
            (i for i in remaining if parts[i][1] & bound),
            None,
        )
        if nxt is None:
            if not allow_cartesian:
                raise ValueError(
                    "bgp_match: disconnected pattern group (cross product); "
                    "pass allow_cartesian=True to run it anyway"
                )
            nxt = remaining[0]
        remaining.remove(nxt)
        df, vs = parts[nxt]
        shared = sorted(vs & bound)
        out = out.join(df, on=shared) if shared else out.crossJoin(df)
        bound |= vs
    ground = [c for c in out.columns if c.startswith("_ground_")]
    return out.drop(*ground) if ground else out
