"""Structured Streaming tests: availableNow micro-batches, checkpoint
resume (only new files processed), watermark dedup plan."""

import os
import shutil

from pyspark.sql import functions as F

from conftest import DATA_DIR
from jsonld_spark.sources.pages import (
    build_context_cache_entries,
    write_pages_parquet,
)
from jsonld_spark.streaming import (
    stream_pages_to_triples,
    streaming_dedup_pages,
    PAGES_SCHEMA,
)


def test_stream_and_resume(spark):
    base = os.path.join(DATA_DIR, "stream_test")
    shutil.rmtree(base, ignore_errors=True)
    pages_dir = os.path.join(base, "pages")
    out_dir = os.path.join(base, "triples")
    cp_dir = os.path.join(base, "cp")
    os.makedirs(pages_dir)

    write_pages_parquet(os.path.join(pages_dir, "batch0.parquet"), 100, seed=1)
    q = stream_pages_to_triples(
        spark, pages_dir, out_dir, cp_dir, build_context_cache_entries()
    )
    q.awaitTermination(120)
    n1 = spark.read.parquet(out_dir).count()
    assert n1 > 0

    # new file lands → restarted stream processes ONLY the new file
    write_pages_parquet(os.path.join(pages_dir, "batch1.parquet"), 50, seed=2)
    q = stream_pages_to_triples(
        spark, pages_dir, out_dir, cp_dir, build_context_cache_entries()
    )
    q.awaitTermination(120)
    n2 = spark.read.parquet(out_dir).count()
    assert n2 > n1

    # third run with no new input: checkpoint ⇒ no duplicates
    q = stream_pages_to_triples(
        spark, pages_dir, out_dir, cp_dir, build_context_cache_entries()
    )
    q.awaitTermination(120)
    assert spark.read.parquet(out_dir).count() == n2


def test_watermark_dedup_is_streaming_plan(spark):
    base = os.path.join(DATA_DIR, "stream_dedup")
    shutil.rmtree(base, ignore_errors=True)
    pages_dir = os.path.join(base, "pages")
    os.makedirs(pages_dir)
    write_pages_parquet(os.path.join(pages_dir, "b0.parquet"), 20, seed=3)

    stream = (
        spark.readStream.schema(PAGES_SCHEMA).parquet(pages_dir)
    )
    dedup = streaming_dedup_pages(stream, "30 minutes")
    assert dedup.isStreaming
    out_dir = os.path.join(base, "out")
    cp = os.path.join(base, "cp")
    q = (
        dedup.select("url", "warc_ts")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", cp)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert spark.read.parquet(out_dir).count() == 20
