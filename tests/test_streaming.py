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


def test_windowed_crawl_stats(spark):
    import os
    import shutil

    from jsonld_spark.streaming import windowed_crawl_stats
    from jsonld_spark.streaming.stream import PAGES_SCHEMA

    base = os.path.join(DATA_DIR, "stream_window")
    shutil.rmtree(base, ignore_errors=True)
    pages_dir = os.path.join(base, "pages")
    os.makedirs(pages_dir)
    # warc_ts advances 1s per page → 100 pages span <2 windows of 1 min
    write_pages_parquet(os.path.join(pages_dir, "b0.parquet"), 100, seed=4)
    out, cp = os.path.join(base, "out"), os.path.join(base, "cp")

    def run_once():
        stream = spark.readStream.schema(PAGES_SCHEMA).parquet(pages_dir)
        stats = windowed_crawl_stats(stream, window="1 minute", watermark="0 seconds")
        assert stats.isStreaming
        q = (
            stats.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", cp)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    # a later micro-batch advances the watermark past the first window's
    # end, closing it (append mode emits only closed windows)
    write_pages_parquet(os.path.join(pages_dir, "b1.parquet"), 5, seed=5)
    run_once()
    rows = spark.read.parquet(out).collect()
    total = sum(r.n_pages for r in rows)
    assert total == 60  # window [00:00, 01:00) closed with 60 pages
    assert all(r.html_bytes > 0 for r in rows)


def test_stateful_first_seen_across_batches(spark):
    import os
    import shutil

    from jsonld_spark.streaming.stateful import first_seen_pages
    from jsonld_spark.streaming.stream import PAGES_SCHEMA

    base = os.path.join(DATA_DIR, "stream_stateful")
    shutil.rmtree(base, ignore_errors=True)
    pages_dir = os.path.join(base, "pages")
    os.makedirs(pages_dir)
    out, cp = os.path.join(base, "out"), os.path.join(base, "cp")

    def run_once():
        stream = spark.readStream.schema(PAGES_SCHEMA).parquet(pages_dir)
        q = (
            first_seen_pages(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", cp)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # batch 0: 50 unique urls (seed 7)
    write_pages_parquet(os.path.join(pages_dir, "b0.parquet"), 50, seed=7)
    run_once()
    n1 = spark.read.parquet(out).count()
    assert n1 == 50

    # batch 1: SAME 50 urls re-crawled (same seed → same urls) + 10 new
    write_pages_parquet(os.path.join(pages_dir, "b1.parquet"), 50, seed=7)
    write_pages_parquet(os.path.join(pages_dir, "b2.parquet"), 60, seed=7)
    run_once()
    rows = spark.read.parquet(out).collect()
    urls = [r.url for r in rows]
    # unbounded-state dedup: re-crawled urls NOT re-emitted
    assert len(urls) == len(set(urls))
    assert len(urls) == 60  # 50 originals + 10 genuinely new


def test_stream_with_bounded_reader(spark, tmp_path):
    """Streaming query with the bounded per-document reader produces the
    same triples as the batch UDF path (canonical relabeling off)."""
    import os

    from jsonld_spark.pipeline import KGPipeline
    from jsonld_spark.streaming.stream import stream_pages_to_triples

    pages_dir = str(tmp_path / "pages_bounded")
    os.makedirs(pages_dir)
    write_pages_parquet(os.path.join(pages_dir, "batch0.parquet"), 80, seed=5)
    out = str(tmp_path / "out_bounded")
    ckpt = str(tmp_path / "ckpt_bounded")
    q = stream_pages_to_triples(
        spark, pages_dir, out, ckpt, available_now=True, bounded_reader=True
    )
    q.awaitTermination(120)
    streamed = spark.read.parquet(out)

    batch = KGPipeline(spark, canonical_bnodes=False).triples(
        spark.read.parquet(pages_dir)
    )
    cols = batch.columns
    assert {tuple(r) for r in streamed.select(cols).collect()} == {
        tuple(r) for r in batch.select(cols).collect()
    }


def test_streaming_near_dup_across_batches(spark, tmp_path):
    """A near-identical recrawl in a LATER micro-batch is flagged against
    the first batch's page via the stateful LSH band registry."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from jsonld_spark.streaming.stateful import streaming_near_dup_pages

    base_text = " ".join(f"tok{i}" for i in range(60))
    near = base_text.replace("tok59", "changed")  # one shingle differs
    other = " ".join(f"zz{i}" for i in range(60))

    pages_dir = tmp_path / "nd_pages"
    pages_dir.mkdir()

    def write(name, rows):
        t = pa.table(
            {"url": [r[0] for r in rows], "text": [r[1] for r in rows]}
        )
        pq.write_table(t, str(pages_dir / name))

    write("batch0.parquet", [("http://s.e/orig", base_text)])

    schema = "url string, text string"
    out_dir = str(tmp_path / "nd_out")
    ckpt = str(tmp_path / "nd_ckpt")

    def run_once():
        stream = spark.readStream.schema(schema).parquet(str(pages_dir))
        q = (
            streaming_near_dup_pages(stream)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    write("batch1.parquet", [("http://s.e/recrawl", near), ("http://s.e/other", other)])
    run_once()

    rows = spark.read.parquet(out_dir).collect()
    flagged = {(r.url, r.dup_of) for r in rows}
    assert ("http://s.e/recrawl", "http://s.e/orig") in flagged
    assert all(u != "http://s.e/other" for u, _ in flagged)


def test_bounded_reader_partial_emission_and_strict_drop(spark):
    """ADVICE r2: the bounded reader emits at-least-partial quads when a
    document fails mid-spine; drop_failed_pages retracts them by url."""
    import json

    from jsonld_spark.pipeline import KGPipeline
    from jsonld_spark.streaming.reader import make_streaming_pages_to_triples
    from jsonld_spark.udfs import TRIPLES_SCHEMA

    # element 1 is fine, element 2 has an invalid @id (non-string) that
    # raises during expansion AFTER element 1's quads already streamed out
    bad_doc = [
        {"@id": "http://e/ok", "http://v/p": [{"@value": "good"}]},
        {"@id": 7, "http://v/p": [{"@value": "bad"}]},
    ]
    good_doc = {"@id": "http://e/fine", "http://v/p": [{"@value": "x"}]}
    pages = spark.createDataFrame(
        [
            (
                "http://bad.e/",
                f'<script type="application/ld+json">{json.dumps(bad_doc)}</script>'.encode(),
            ),
            (
                "http://good.e/",
                f'<script type="application/ld+json">{json.dumps(good_doc)}</script>'.encode(),
            ),
        ],
        "url string, html binary",
    )
    fn = make_streaming_pages_to_triples(None)
    extracted = pages.mapInPandas(fn, TRIPLES_SCHEMA)
    rows = extracted.collect()
    partial = [r for r in rows if r.url == "http://bad.e/" and r.error is None]
    errs = [r for r in rows if r.url == "http://bad.e/" and r.error is not None]
    assert partial, "element 1's quads should have been emitted (at-least-partial)"
    assert errs, "the failing element should contribute an error row"

    strict = KGPipeline.drop_failed_pages(extracted).collect()
    assert all(r.url == "http://good.e/" for r in strict)
    assert len(strict) == 1


def test_stateful_first_seen_min_over_all_chunks(spark):
    """A key's rows arrive as an ITERATOR of Arrow chunks; the emitted
    warc_ts must be the min over ALL chunks, not the first non-empty
    chunk's min.  Forced by shrinking maxRecordsPerBatch so one url's
    rows split across several chunks, with the smallest ts LAST."""
    import os
    import shutil

    from jsonld_spark.streaming.stateful import first_seen_pages
    from jsonld_spark.streaming.stream import PAGES_SCHEMA

    base = os.path.join(DATA_DIR, "stream_chunk_min")
    shutil.rmtree(base, ignore_errors=True)
    pages_dir = os.path.join(base, "pages")
    os.makedirs(pages_dir)
    out, cp = os.path.join(base, "out"), os.path.join(base, "cp")

    from datetime import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    # one url, 9 rows, descending ts so the global min sits in the LAST
    # arrow chunk; a second url pins normal behavior
    rows = [
        ("http://x.example/only", datetime(2026, 1, 9 - i), None, "t", "en")
        for i in range(9)
    ] + [("http://x.example/other", datetime(2026, 2, 1), None, "t", "en")]
    # single top-level file — the file-stream source does not recurse
    pq.write_table(
        pa.table(
            {
                "url": [r[0] for r in rows],
                "warc_ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
                "html": pa.array([r[2] for r in rows], type=pa.binary()),
                "text": [r[3] for r in rows],
                "lang": [r[4] for r in rows],
            }
        ),
        os.path.join(pages_dir, "b0.parquet"),
    )

    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        stream = spark.readStream.schema(PAGES_SCHEMA).parquet(pages_dir)
        q = (
            first_seen_pages(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", cp)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)

    got = {r.url: r for r in spark.read.parquet(out).collect()}
    assert got["http://x.example/only"].n_occurrences == 9
    assert got["http://x.example/only"].warc_ts == datetime(2026, 1, 1)
    assert got["http://x.example/other"].n_occurrences == 1


def test_extract_links_streams(spark):
    """extract_links is all narrow ops (decode + regexp + explode), so
    the link graph extracts under Structured Streaming unchanged —
    same checkpointed availableNow pattern as the triples stream."""
    from jsonld_spark.sources.html_jsonld import extract_links

    base = os.path.join(DATA_DIR, "stream_links_test")
    shutil.rmtree(base, ignore_errors=True)
    pages_dir = os.path.join(base, "pages")
    out_dir = os.path.join(base, "links")
    cp_dir = os.path.join(base, "cp")
    os.makedirs(pages_dir)

    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [
        {
            "url": f"http://h{i % 2}.example/d/p{i}",
            "html": (
                f'<a href="/x/{i % 3}">a</a><a href="http://ex.com/{i % 5}">b</a>'
            ).encode(),
        }
        for i in range(40)
    ]
    t = pa.Table.from_pylist(
        rows, schema=pa.schema([("url", pa.string()), ("html", pa.binary())])
    )
    pq.write_table(t, os.path.join(pages_dir, "b0.parquet"))

    stream = spark.readStream.schema("url string, html binary").parquet(
        pages_dir
    )
    q = (
        extract_links(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", cp_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out_dir)
    assert got.count() == 80  # 2 links per page
    assert got.filter("href = 'http://h0.example/x/0'").count() > 0
