"""Derive a deterministic ``pages`` table from the driver's ``documents``
parquet — entirely with JVM-side column expressions.

Each document becomes an HTML page embedding exactly one ld+json block
with a FIXED template, so the triples the JSON-LD stack emits are
SQL-predictable: the driver's DuckDB oracle can state, per document,
exactly which (subj, pred, obj) rows must come out of the full
extract → expand → node-map → toRdf path.  That turns the whole
KG-construction spine into a value-hash-checkable query instead of a
rows-only smoke test.

Template (per doc):
  subj  = http://doc.example/{doc_id}
  type  = http://vocab.example/Document
  lang/source (xsd:string), n_chars (xsd:integer)
  sameAs → http://canon.example/{doc_id % 100}   (drives entity linking)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

VOCAB = "http://vocab.example/"
DOC_NS = "http://doc.example/"
CANON_NS = "http://canon.example/"
SAME_AS = "http://schema.org/sameAs"

_HTML_PREFIX = (
    '<html><head><script type="application/ld+json">'
    '{"@context":{"@vocab":"' + VOCAB + '",'
    '"sameAs":{"@id":"' + SAME_AS + '","@type":"@id"}},'
)


def _json_esc(col):
    """JSON-string-escape an interpolated column (backslash + quote —
    the chars that would truncate/corrupt the template; the parser
    unescapes them back, so oracle predictions over the RAW column still
    hold).  NULL columns still null the page (documented: fixtures are
    non-null; a null field has no SQL-predictable triple set)."""
    return F.replace(
        F.replace(col, F.lit("\\"), F.lit("\\\\")), F.lit('"'), F.lit('\\"')
    )


def pages_from_documents(docs: DataFrame) -> DataFrame:
    """documents(doc_id, text, lang, source, n_chars) → pages(url, warc_ts,
    html, text, lang)."""
    jsonld = F.concat(
        F.lit(_HTML_PREFIX),
        F.lit('"@id":"' + DOC_NS),
        F.col("doc_id").cast("string"),
        F.lit('","@type":"Document","lang":"'),
        _json_esc(F.col("lang")),
        F.lit('","source":"'),
        _json_esc(F.col("source")),
        F.lit('","n_chars":'),
        F.col("n_chars").cast("string"),
        F.lit(',"sameAs":"' + CANON_NS),
        F.pmod(F.col("doc_id"), F.lit(100)).cast("string"),
        F.lit('"}</script></head><body><p>'),
        # '<' → '&lt;': body text containing a literal '<script' tag
        # must not inject a second ld+json block into the page
        F.replace(F.col("text"), F.lit("<"), F.lit("&lt;")),
        F.lit("</p></body></html>"),
    )
    return docs.select(
        F.concat(
            F.lit("http://docs.example/"),
            F.col("source"),
            F.lit("/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_interval(secs=F.col("doc_id").cast("double"))
        ).alias("warc_ts"),
        F.encode(jsonld, "utf-8").alias("html"),
        F.col("text"),
        F.col("lang"),
    )


def pages_from_documents_annotated(docs: DataFrame) -> DataFrame:
    """JSON-LD-star variant of :func:`pages_from_documents`: each page's
    block annotates its ``linked`` edge —
    ``{"@id": canon, "@annotation": {"confidence": doc_id % 7}}`` — so
    the rdfstar pipeline must emit exactly one asserted triple plus one
    quoted-term annotation triple per document, both SQL-predictable."""
    jsonld = F.concat(
        F.lit(
            '<html><head><script type="application/ld+json">'
            '{"@context":{"@vocab":"' + VOCAB + '"},'
        ),
        F.lit('"@id":"' + DOC_NS),
        F.col("doc_id").cast("string"),
        F.lit('","linked":{"@id":"' + CANON_NS),
        F.pmod(F.col("doc_id"), F.lit(100)).cast("string"),
        F.lit('","@annotation":{"confidence":'),
        F.pmod(F.col("doc_id"), F.lit(7)).cast("string"),
        F.lit("}}}</script></head><body></body></html>"),
    )
    return docs.select(
        F.concat(
            F.lit("http://docs.example/star/"), F.col("doc_id").cast("string")
        ).alias("url"),
        F.encode(jsonld, "utf-8").alias("html"),
    )


def pages_from_documents_tagged(docs: DataFrame) -> DataFrame:
    """Language-tagged variant of :func:`pages_from_documents` for the
    SPARQL expression layer's oracle: each page's block carries a
    ``title`` LANGUAGE-TAGGED literal (tag = the document's lang, with
    a ``-us`` region subtag for doc_id % 3 == 0 rows so langMatches must
    prove RFC 4647 prefix-at-boundary matching, not equality) plus the
    ``n_chars`` integer — giving the emitted triples non-null obj_lang
    and a numeric datatype to FILTER on."""
    # _json_esc like the sibling template: a lang containing '"' or '\'
    # must not break the JSON block (the parser unescapes back, so
    # oracle predictions over the raw column still hold)
    tag = F.concat(
        _json_esc(F.col("lang")),
        F.when(F.col("doc_id") % 3 == 0, F.lit("-us")).otherwise(F.lit("")),
    )
    jsonld = F.concat(
        F.lit(_HTML_PREFIX),
        F.lit('"@id":"' + DOC_NS),
        F.col("doc_id").cast("string"),
        F.lit('","@type":"Document","title":{"@value":"Doc '),
        F.col("doc_id").cast("string"),
        F.lit('","@language":"'),
        tag,
        F.lit('"},"n_chars":'),
        F.col("n_chars").cast("string"),
        F.lit("}</script></head><body></body></html>"),
    )
    return docs.select(
        F.concat(
            F.lit("http://docs.example/tagged/"), F.col("doc_id").cast("string")
        ).alias("url"),
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_interval(secs=F.col("doc_id").cast("double"))
        ).alias("warc_ts"),
        F.encode(jsonld, "utf-8").alias("html"),
        F.lit("").alias("text"),
        F.col("lang"),
    )
