"""Derive a JSON-LD @context from a vocabulary graph (Context
``from_vocabulary``, reference context.rb:1062-1122).

Spark-first restatement: the vocabulary is a (subj, pred, obj) triples
DataFrame (e.g. a crawled ontology run through the pipeline); term
statistics are aggregated relationally and only the per-term summary —
vocabularies are tiny next to the corpus — is collected to build the
context dict, which then feeds ``Context.parse`` / the broadcast cache.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
RDFS_RANGE = "http://www.w3.org/2000/01/rdf-schema#range"
RDFS_LITERAL = "http://www.w3.org/2000/01/rdf-schema#Literal"
SCHEMA_RANGE_INCLUDES = "http://schema.org/rangeIncludes"
SCHEMA_TEXT = "http://schema.org/Text"
XSD = "http://www.w3.org/2001/XMLSchema#"

# first-range → @type coercion (the reference's datatype switch,
# context.rb:1100-1110); schema.org shorthands map to the same slots
_TYPED_RANGES = {
    XSD + n
    for n in (
        "boolean",
        "date",
        "dateTime",
        "time",
        "duration",
        "decimal",
        "float",
        "integer",
    )
} | {
    "http://schema.org/" + n
    for n in ("Boolean", "Date", "DateTime", "Time", "Duration", "Number", "Float", "Integer")
}


def vocabulary_terms(triples: DataFrame) -> DataFrame:
    """Per-subject vocabulary summary: (subject, term, is_property,
    ranges ARRAY sorted).  Pure DataFrame aggregation — runs distributed
    over a vocabulary of any size."""
    named = triples.filter(~F.col("subj").startswith("_:"))
    types = (
        named.filter(F.col("pred") == RDF_TYPE)
        .groupBy("subj")
        .agg(
            F.max(F.col("obj").contains("Property").cast("int")).alias("is_prop")
        )
    )
    ranges = (
        named.filter(F.col("pred").isin(RDFS_RANGE, SCHEMA_RANGE_INCLUDES))
        .groupBy("subj")
        .agg(F.sort_array(F.collect_set("obj")).alias("ranges"))
    )
    return (
        named.select("subj")
        .distinct()
        .join(types, "subj", "left")
        .join(ranges, "subj", "left")
        .select(
            F.col("subj").alias("subject"),
            F.element_at(F.split("subj", "[/#]"), -1).alias("term"),
            F.coalesce(F.col("is_prop") == 1, F.lit(False)).alias("is_property"),
            F.coalesce("ranges", F.array()).alias("ranges"),
        )
    )


def context_from_vocabulary(
    triples: DataFrame,
    vocab: str | None = None,
    default_language: str | None = None,
) -> dict:
    """→ a JSON-LD context dict with one term definition per class /
    property of the vocabulary, mirroring the reference's rules:

    - properties whose range includes rdfs:Literal / schema:Text are
      skipped (plain-string terms need no definition under @vocab), as
      are range-less properties when ``vocab`` is set;
    - xsd:string range + a default language → ``{"@language": null}``;
    - date/time/numeric/boolean ranges → ``{"@type": <range>}``;
    - any other (object) range → ``{"@type": "@id"}``;
    - non-properties inside ``vocab`` are skipped (reachable via @vocab).

    Range choice is the lexicographically-first range (the reference
    takes first-in-statement-order, which a DataFrame does not have; the
    sorted choice is deterministic across partitionings).
    """
    rows = vocabulary_terms(triples).collect()
    ctx: dict = {}
    if vocab:
        ctx["@vocab"] = vocab
    if default_language:
        ctx["@language"] = default_language
    for r in sorted(rows, key=lambda r: r.subject):
        term = r.term
        # DELIBERATE deviation from the reference: colliding local names
        # resolve FIRST-WINS over lexicographic subject order.  The
        # reference's `term_definitions[term] = ...` is last-wins over
        # GRAPH ENUMERATION order — nondeterministic across runs; a
        # distributed build needs a reproducible winner.
        if not term or term in ctx:
            continue
        if r.is_property:
            ranges = list(r.ranges)
            if vocab and not ranges:
                continue
            if SCHEMA_TEXT in ranges or RDFS_LITERAL in ranges:
                continue
            first = ranges[0] if ranges else None
            if first == XSD + "string":
                td: dict = {"@id": r.subject}
                if default_language:
                    td["@language"] = None
                ctx[term] = td if len(td) > 1 else r.subject
            elif first in _TYPED_RANGES:
                ctx[term] = {"@id": r.subject, "@type": first}
            else:
                ctx[term] = {"@id": r.subject, "@type": "@id"}
        else:
            if vocab and r.subject.startswith(vocab):
                continue
            ctx[term] = r.subject
    return ctx
