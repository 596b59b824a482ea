"""N-Quads serialization as JVM-side column expressions.

Golden-file comparison and N-Quads export stay inside whole-stage
codegen — no Python in the hot path (reference emits via RDF::NQuads,
spec/suite_helper.rb:270; here it's a string-concat expression tree).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"
RDF_LANGSTRING = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"


def _escape(col: Column) -> Column:
    # order matters: backslash first
    c = F.regexp_replace(col, r"\\", r"\\\\")
    c = F.regexp_replace(c, '"', '\\\\"')
    c = F.regexp_replace(c, "\n", r"\\n")
    c = F.regexp_replace(c, "\r", r"\\r")
    c = F.regexp_replace(c, "\t", r"\\t")
    return c


def _resource(col: Column) -> Column:
    # quoted triples (N-Quads-star `<< … >>`, already serialized by the
    # rdfstar toRdf path) pass through like bnodes
    return F.when(col.startswith("_:") | col.startswith("<<"), col).otherwise(
        F.concat(F.lit("<"), col, F.lit(">"))
    )


def nquad_col(
    subj: Column | str = "subj",
    pred: Column | str = "pred",
    obj: Column | str = "obj",
    obj_is_literal: Column | str = "obj_is_literal",
    obj_datatype: Column | str = "obj_datatype",
    obj_lang: Column | str = "obj_lang",
    graph: Column | str = "graph",
) -> Column:
    def _c(c):
        return c if isinstance(c, Column) else F.col(c)

    subj, pred, obj = _c(subj), _c(pred), _c(obj)
    lit, dt, lang, g = (
        _c(obj_is_literal),
        _c(obj_datatype),
        _c(obj_lang),
        _c(graph),
    )
    literal = F.concat(F.lit('"'), _escape(obj), F.lit('"'))
    literal = (
        F.when(
            lang.isNotNull() & (dt == RDF_LANGSTRING),
            F.concat(literal, F.lit("@"), lang),
        )
        .when(
            dt.isNotNull() & (dt != XSD_STRING),
            F.concat(literal, F.lit("^^<"), dt, F.lit(">")),
        )
        .otherwise(literal)
    )
    term = F.when(lit, literal).otherwise(_resource(obj))
    line = F.concat_ws(" ", _resource(subj), _resource(pred), term)
    return F.when(
        g.isNotNull(), F.concat_ws(" ", line, _resource(g), F.lit("."))
    ).otherwise(F.concat_ws(" ", line, F.lit(".")))


def with_nquads(triples: DataFrame, col_name: str = "nquad") -> DataFrame:
    return triples.withColumn(col_name, nquad_col())


def write_nquads(triples: DataFrame, path: str, partitions: int | None = None) -> None:
    """N-Quads text sink — the cluster analog of the reference's
    StreamingWriter (streaming_writer.rb:41-73): its grouped-by-graph-
    then-subject emission precondition becomes ``sortWithinPartitions``;
    each task streams one sorted part file, no driver involvement."""
    df = triples
    if partitions:
        df = df.repartition(partitions, "graph", "subj")
    (
        df.sortWithinPartitions("graph", "subj", "pred")
        .select(nquad_col().alias("value"))
        .write.mode("overwrite")
        .text(path)
    )
