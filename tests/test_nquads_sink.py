"""N-Quads text sink test (StreamingWriter analog)."""

import os
import shutil

from conftest import DATA_DIR
from jsonld_spark.operators.nquads import write_nquads
from jsonld_spark.rdf_model import parse_nquads


def test_write_nquads_sink(spark):
    triples = spark.createDataFrame(
        [
            ("http://e/a", "http://p/x", "v\nw", True, None, None, None),
            ("http://e/a", "http://p/y", "http://e/b", False, None, None, None),
            ("_:h1", "http://p/x", "5", True, "http://www.w3.org/2001/XMLSchema#integer", None, "http://g/1"),
            ("http://e/c", "http://p/l", "bonjour", True, "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString", "fr", None),
        ],
        "subj string, pred string, obj string, obj_is_literal boolean, obj_datatype string, obj_lang string, graph string",
    )
    out = os.path.join(DATA_DIR, "nq_out")
    shutil.rmtree(out, ignore_errors=True)
    write_nquads(triples, out, partitions=2)
    text = "\n".join(
        open(os.path.join(out, f)).read()
        for f in sorted(os.listdir(out))
        if f.startswith("part-")
    )
    quads = parse_nquads(text)
    assert len(quads) == 4
    lines = [ln for ln in text.splitlines() if ln.strip()]
    assert any('"v\\nw"' in ln for ln in lines)  # escaped newline
    assert any("@fr" in ln for ln in lines)
    assert any('"5"^^<http://www.w3.org/2001/XMLSchema#integer> <http://g/1>' in ln for ln in lines)


def test_nquad_col_accepts_column_args(spark):
    """Signature says Column | str — Column inputs must not crash."""
    from pyspark.sql import functions as F

    from jsonld_spark.operators.nquads import nquad_col

    df = spark.createDataFrame(
        [("http://s", "http://p", "http://o", False, None, None, None)],
        "subj string, pred string, obj string, obj_is_literal boolean,"
        " obj_datatype string, obj_lang string, graph string",
    )
    out = df.select(
        nquad_col(subj=F.col("subj"), pred="pred").alias("line")
    ).collect()
    assert out[0].line == "<http://s> <http://p> <http://o> .\n" or "<http://s>" in out[0].line
