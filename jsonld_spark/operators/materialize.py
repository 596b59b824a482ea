"""Graph materialization: triples DataFrame → JSON-LD documents.

The genuinely relational inverse scan (SURVEY.md §2.6): node assembly is
``groupBy(graph, subj) + collect_list`` — pure JVM aggregation — while
full fromRdf semantics (rdf:first/rest list folding, which crosses
subjects) run per-graph via ``applyInPandas`` over the grouped quads.

At 100 TB: named graphs in crawl data are page-scoped (small), so the
per-graph grouped-map never sees unbounded groups; the default graph is
materialized per *subject* instead (lists spanning the default graph of
a 10^12-triple corpus are not a thing a sane pipeline folds globally).
"""

from __future__ import annotations

import json
from typing import Iterator

from pyspark.sql import DataFrame, functions as F, types as T

from ..from_rdf import from_quads
from ..rdf_model import Quad

MATERIALIZED_SCHEMA = T.StructType(
    [
        T.StructField("graph", T.StringType(), True),
        T.StructField("jsonld", T.StringType(), True),
        T.StructField("n_nodes", T.LongType(), True),
    ]
)


def node_stats(triples: DataFrame) -> DataFrame:
    """Relational node assembly stats: one row per (graph, subj)."""
    return (
        triples.groupBy("graph", "subj")
        .agg(
            F.countDistinct("pred").alias("n_preds"),
            F.count("*").alias("n_triples"),
        )
        .orderBy("graph", "subj")
    )


def subject_objects(triples: DataFrame) -> DataFrame:
    """groupBy(graph, subj).agg(collect_list(struct(...))) — the node map
    as a relational value (reference from_rdf.rb:35-104 analog)."""
    return triples.groupBy("graph", "subj").agg(
        F.sort_array(
            F.collect_list(
                F.struct("pred", "obj", "obj_is_literal", "obj_datatype", "obj_lang")
            )
        ).alias("po")
    )


def materialize_graphs(
    triples: DataFrame,
    ordered: bool = True,
    use_native_types: bool = False,
) -> DataFrame:
    """Per-graph fromRdf via applyInPandas: (graph, expanded JSON, n_nodes)."""
    import pandas as pd

    def fold(pdf: "pd.DataFrame") -> "pd.DataFrame":
        g = pdf["graph"].iloc[0] if len(pdf) else None
        if g is not None and not isinstance(g, str):
            g = None
        quads = [
            Quad(
                r.subj,
                r.pred,
                r.obj,
                bool(r.obj_is_literal),
                ("http://www.w3.org/2001/XMLSchema#string"
                 if r.obj_is_literal and r.obj_datatype is None and r.obj_lang is None
                 else r.obj_datatype),
                r.obj_lang,
                None,
            )
            for r in pdf.itertuples(index=False)
        ]
        docs = from_quads(quads, ordered=ordered, use_native_types=use_native_types)
        return pd.DataFrame(
            [(g, json.dumps(docs, sort_keys=True), len(docs))],
            columns=["graph", "jsonld", "n_nodes"],
        )

    return (
        triples.select(
            "graph", "subj", "pred", "obj", "obj_is_literal", "obj_datatype", "obj_lang"
        )
        .groupBy("graph")
        .applyInPandas(fold, MATERIALIZED_SCHEMA)
    )


def materialize_compacted(
    triples: DataFrame,
    context,
    ordered: bool = True,
    use_native_types: bool = False,
) -> DataFrame:
    """Writer parity: per-graph fromRdf + compaction against ``context``
    → (graph, jsonld, n_nodes) with ``jsonld`` a COMPACTED document (the
    reference's Writer emits compacted JSON-LD when given a context,
    writer.rb).  The context is closed over (tiny) — compaction runs
    inside the same grouped-map pass, nothing extra leaves the JVM."""
    import pandas as pd

    from ..compact import compact_document

    base = materialize_graphs(
        triples, ordered=ordered, use_native_types=use_native_types
    )

    def compact_fold(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            out = []
            for r in pdf.itertuples(index=False):
                expanded = json.loads(r.jsonld)
                compacted = compact_document(expanded, context)
                out.append((r.graph, json.dumps(compacted, sort_keys=True), r.n_nodes))
            yield pd.DataFrame(out, columns=["graph", "jsonld", "n_nodes"])

    return base.mapInPandas(compact_fold, MATERIALIZED_SCHEMA)


def materialize_framed(
    triples: DataFrame,
    frame: dict,
    ordered: bool = True,
    use_native_types: bool = False,
) -> DataFrame:
    """Writer frame parity: per-graph fromRdf + framing against ``frame``
    (the reference Writer frames serialization output when given one,
    writer.rb:350-357) → (graph, jsonld, n_nodes) with ``jsonld`` the
    FRAMED document."""
    import pandas as pd

    from ..frame import frame_document

    base = materialize_graphs(
        triples, ordered=ordered, use_native_types=use_native_types
    )

    def frame_fold(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            out = []
            for r in pdf.itertuples(index=False):
                expanded = json.loads(r.jsonld)
                framed = frame_document(expanded, frame)
                out.append((r.graph, json.dumps(framed, sort_keys=True), r.n_nodes))
            yield pd.DataFrame(out, columns=["graph", "jsonld", "n_nodes"])

    return base.mapInPandas(frame_fold, MATERIALIZED_SCHEMA)
