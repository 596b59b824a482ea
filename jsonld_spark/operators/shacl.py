"""SHACL-lite shape validation over the triples table.

KG-construction quality assurance (W3C SHACL core, the constraint
subset that covers most published shapes): a shape names a target
class and per-path constraints; validation emits a VIOLATIONS
DataFrame — errors are data, same philosophy as the extraction
pipeline's error rows, so a 100-TB validation run is a join plan whose
output is only what's wrong, not a driver-side walk.

Shape syntax (plain dicts — the programmatic surface)::

    {
        "name": "DocumentShape",
        "target_class": "http://vocab.example/Document",
        "properties": [
            {"path": ".../lang", "min_count": 1, "max_count": 1,
             "pattern": "^e"},            # regex on the lexical form
            {"path": ".../n_chars", "datatype": XSD + "integer"},
            {"path": ".../sameAs", "node_kind": "iri"},  # or "literal"
        ],
    }

Constraint → plan mapping (each an independent subplan, unioned):

- ``min_count`` / ``max_count``: LEFT join focus→values grouped by
  focus with a partial-agg count (absent path ⇒ count 0, so
  ``min_count`` catches missing properties).
- ``datatype``: filter on ``obj_datatype`` over literal values (NULL
  datatype is xsd:string by the pipeline's schema convention).
- ``node_kind``: ``obj_is_literal`` check ("iri" also rejects bnodes
  — lite simplification, bnode targets are rare in published data).
- ``pattern``: ``rlike`` on the lexical form (Java regex — keep to the
  RE2-safe subset if the oracle mirrors it).
- ``cls``: sh:class — every value an instance of the class, one
  left-anti join against the type scan (pass saturated triples when
  subclass membership should count).
- ``in``: sh:in — value from an enumerated lexical-form list (an IN
  predicate on the scan).
- ``min_length`` / ``max_length``: sh:minLength/sh:maxLength —
  character length of the lexical form (a length shape on an
  IRI-valued path flags the IRI too: modeling error worth a row).
- ``min_inclusive`` / ``max_inclusive`` / ``min_exclusive`` /
  ``max_exclusive``: numeric range facets over ``try_cast(double)``
  of the lexical form (ANSI-safe); a non-numeric value violates any
  range constraint.

→ (focus, shape, path, constraint, value) — one row per violation,
``value`` the offending lexical form or stringified count.

100-TB shape: focus sets are pushed-down type-triple scans; every
constraint is a filtered scan + at most one equi-join on focus keyed
by subject IRI (fine-grained; mega-domain skew lives in the SUBJECT
distribution and is no worse than any per-subject groupBy — AQE skew
handling applies); violations (the output) are usually tiny next to
the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"

_VIOLATION_COLS = ("focus", "shape", "path", "constraint", "value")


def _violation(df, shape, path, constraint, value_col):
    return df.select(
        F.col("focus"),
        F.lit(shape).alias("shape"),
        F.lit(path).alias("path"),
        F.lit(constraint).alias("constraint"),
        value_col.cast("string").alias("value"),
    )


def validate_shapes(triples: DataFrame, shapes) -> DataFrame:
    """Validate ``shapes`` (see module docstring) against the triples
    table → DISTINCT violations (focus, shape, path, constraint,
    value), ordered by all columns."""
    shapes = list(shapes)
    if not shapes:
        raise ValueError("validate_shapes: empty shape list")
    outs = []
    for shape in shapes:
        name = shape.get("name") or shape["target_class"]
        focus = (
            triples.filter(
                (F.col("pred") == RDF_TYPE)
                & (F.col("obj") == shape["target_class"])
            )
            .select(F.col("subj").alias("focus"))
            .distinct()
        )
        for prop in shape.get("properties", []):
            unknown = set(prop) - {
                "path", "min_count", "max_count",
                "datatype", "node_kind", "pattern", "cls", "in",
                "min_length", "max_length",
                "min_inclusive", "max_inclusive",
                "min_exclusive", "max_exclusive",
            }
            if unknown:
                # a typo'd key would otherwise be silently ignored —
                # a validator that skips constraints is worse than none
                raise ValueError(
                    f"unknown constraint key(s) {sorted(unknown)} in "
                    f"shape {name!r}"
                )
            path = prop["path"]
            vals = triples.filter(F.col("pred") == path).select(
                F.col("subj").alias("focus"),
                F.col("obj").alias("v"),
                "obj_is_literal",
                "obj_datatype",
            )
            fvals = focus.join(vals, "focus")  # values at in-target foci
            if "min_count" in prop or "max_count" in prop:
                # distinct VALUE NODES per focus (SHACL counts values;
                # a duplicated triple is one value, and this stays
                # correct over multiset triple tables)
                counts = focus.join(
                    vals.groupBy("focus").agg(
                        F.countDistinct("v").alias("n")
                    ),
                    "focus",
                    "left",
                ).withColumn("n", F.coalesce("n", F.lit(0)))
                if "min_count" in prop:
                    outs.append(
                        _violation(
                            counts.filter(F.col("n") < prop["min_count"]),
                            name, path, f"minCount {prop['min_count']}",
                            F.col("n"),
                        )
                    )
                if "max_count" in prop:
                    outs.append(
                        _violation(
                            counts.filter(F.col("n") > prop["max_count"]),
                            name, path, f"maxCount {prop['max_count']}",
                            F.col("n"),
                        )
                    )
            if "datatype" in prop:
                dt = prop["datatype"]
                # pipeline convention: NULL obj_datatype on a literal
                # means xsd:string
                bad = fvals.filter(
                    (~F.col("obj_is_literal"))
                    | (
                        F.coalesce("obj_datatype", F.lit(XSD_STRING))
                        != F.lit(dt)
                    )
                )
                outs.append(
                    _violation(bad, name, path, f"datatype {dt}", F.col("v"))
                )
            if "node_kind" in prop:
                kind = prop["node_kind"]
                if kind not in ("iri", "literal"):
                    raise ValueError(f"node_kind must be iri|literal: {kind}")
                bad = fvals.filter(
                    F.col("obj_is_literal")
                    if kind == "iri"
                    else ~F.col("obj_is_literal")
                )
                outs.append(
                    _violation(
                        bad, name, path, f"nodeKind {kind}", F.col("v")
                    )
                )
            if "cls" in prop:
                # sh:class: every value must be an instance of cls —
                # one left-anti join against the type-triple scan.
                # Pass SATURATED triples (infer_types / forward_chain)
                # when subclass membership should count.
                cls = prop["cls"]
                typed = triples.filter(
                    (F.col("pred") == RDF_TYPE) & (F.col("obj") == cls)
                ).select(F.col("subj").alias("v"))
                bad = fvals.join(typed, "v", "left_anti")
                outs.append(
                    _violation(bad, name, path, f"class {cls}", F.col("v"))
                )
            if "in" in prop:
                # sh:in — value from an enumerated list (lexical forms)
                allowed = list(prop["in"])
                if not allowed:
                    raise ValueError(f"'in' list empty in shape {name!r}")
                bad = fvals.filter(~F.col("v").isin(*allowed))
                outs.append(
                    _violation(
                        bad, name, path,
                        f"in [{', '.join(allowed)}]", F.col("v"),
                    )
                )
            if "pattern" in prop:
                pat = prop["pattern"]
                bad = fvals.filter(~F.col("v").rlike(pat))
                outs.append(
                    _violation(bad, name, path, f"pattern {pat}", F.col("v"))
                )
            if "min_length" in prop or "max_length" in prop:
                # sh:minLength/sh:maxLength over the lexical form
                # (characters, per SHACL's string facet); non-literals
                # violate length constraints by definition (sh:minLength
                # does not apply to IRIs in spirit, but a length shape
                # on an IRI-valued path is a modeling error worth a row)
                ln = F.length("v")
                if "min_length" in prop:
                    bad = fvals.filter(ln < prop["min_length"])
                    outs.append(
                        _violation(
                            bad, name, path,
                            f"minLength {prop['min_length']}", F.col("v"),
                        )
                    )
                if "max_length" in prop:
                    bad = fvals.filter(ln > prop["max_length"])
                    outs.append(
                        _violation(
                            bad, name, path,
                            f"maxLength {prop['max_length']}", F.col("v"),
                        )
                    )
            range_keys = (
                ("min_inclusive", "<"), ("max_inclusive", ">"),
                ("min_exclusive", "<="), ("max_exclusive", ">="),
            )
            if any(k in prop for k, _ in range_keys):
                # sh:minInclusive etc. — numeric comparison over the
                # lexical form; a NON-numeric lexical form cannot
                # satisfy a range constraint, so it violates too
                # (try_cast NULL → the coalesce(False) path fires;
                # ANSI-safe: a plain cast would crash the job)
                n = F.col("v").try_cast("double")
                for key, op in range_keys:
                    if key not in prop:
                        continue
                    bound = float(prop[key])
                    cmp = {
                        "<": n < bound, ">": n > bound,
                        "<=": n <= bound, ">=": n >= bound,
                    }[op]
                    bad = fvals.filter(
                        n.isNull() | F.coalesce(cmp, F.lit(True))
                    )
                    camel = key.split("_")
                    label = camel[0] + camel[1].capitalize()
                    outs.append(
                        _violation(
                            bad, name, path, f"{label} {prop[key]}",
                            F.col("v"),
                        )
                    )
    if not outs:
        raise ValueError("validate_shapes: shapes declare no constraints")
    out = outs[0]
    for o in outs[1:]:
        out = out.union(o)
    return out.distinct().orderBy(*_VIOLATION_COLS)
