"""spark-submit entry point for the KG-construction pipeline.

Cluster launch (north rule: two cluster sizes, N and 4N executors):

    python scripts/make_pyfiles.py                        # build dist/jsonld_spark.zip
    spark-submit --py-files dist/jsonld_spark.zip \\
        --num-executors $N --executor-cores 4 \\
        --driver-memory 8g --executor-memory 8g \\
        scripts/run_pipeline.py \\
        --pages s3://crawl/pages --out s3://kg/triples \\
        --run-id run-$(date +%s) --buckets 4096 --link-entities

Local sandbox equivalent:

    spark-submit --master 'local[32]' --driver-memory 24g \\
        --py-files dist/jsonld_spark.zip \\
        scripts/run_pipeline.py --pages data/pages_bench_800000.parquet \\
        --out data/kg_out --run-id r1

Size --driver-memory for local mode: Arrow direct memory is capped by
the JVM's MaxDirectMemorySize (defaults to heap size); 32 concurrent
Arrow-batched tasks at spark-submit's 1g default exhaust it
(io.netty OutOfDirectMemoryError). ~0.5-1 GB heap per concurrent core
is a safe floor for html-heavy pages.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--pages", required=True, help="pages table path (parquet/iceberg)")
    p.add_argument("--out", required=True, help="output directory for triples + lineage")
    p.add_argument("--run-id", default="run-0")
    p.add_argument("--buckets", type=int, default=64)
    p.add_argument("--cache-version", default="v1")
    p.add_argument("--link-entities", action="store_true")
    p.add_argument(
        "--dedup-pages",
        action="store_true",
        help="drop recrawled duplicate pages (identical html) before extraction",
    )
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--context-cache", help="JSON file: {url: context-doc}")
    p.add_argument("--rdf-direction", choices=["i18n-datatype", "compound-literal"])
    p.add_argument("--generalized-rdf", action="store_true")
    # --format selects the OUTPUT table format (KGPipeline.run's
    # table_format); the pages INPUT format is independent — the
    # north-rule deployment reads parquet pages and writes Iceberg
    p.add_argument("--format", default="parquet", choices=["parquet", "iceberg"])
    p.add_argument(
        "--input-format", default="parquet", choices=["parquet", "iceberg"]
    )
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    from jsonld_spark.pipeline import KGPipeline
    from jsonld_spark.sources.pages import build_context_cache_entries

    # spark-submit owns master/deploy config; just get-or-create.
    # Belt-and-braces with the per-writer option in KGPipeline.run:
    # dynamic partition overwrite keeps resume exactly-once (static mode
    # would truncate completed buckets' output).
    spark = (
        SparkSession.builder.appName("jsonld_spark_pipeline")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    if args.context_cache:
        with open(args.context_cache) as f:
            entries = json.load(f)
    else:
        entries = build_context_cache_entries()

    pipe = KGPipeline(
        spark,
        entries,
        cache_version=args.cache_version,
        rdf_direction=args.rdf_direction,
        produce_generalized_rdf=args.generalized_rdf,
        num_buckets=args.buckets,
    )
    pages = (
        spark.read.format("iceberg").load(args.pages)
        if args.input_format == "iceberg"
        else spark.read.parquet(args.pages)
    )
    stats = pipe.run(
        pages,
        args.out,
        run_id=args.run_id,
        resume=not args.no_resume,
        link_entities=args.link_entities,
        dedup=args.dedup_pages,
        table_format=args.format,
    )
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    sys.exit(main())
