"""spark-submit launch path + skew-distribution checks."""

import json
import os
import shutil
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

from conftest import DATA_DIR, REPO


def test_pyfiles_zip_builds():
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import make_pyfiles

    out = make_pyfiles.build(os.path.join(DATA_DIR, "jsonld_spark.zip"))
    assert os.path.getsize(out) > 10_000


@pytest.mark.slow
def test_spark_submit_end_to_end(pages_path):
    """The actual spark-submit --py-files launch (north rule)."""
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import make_pyfiles

    zip_path = make_pyfiles.build(os.path.join(DATA_DIR, "jsonld_spark.zip"))
    out_dir = os.path.join(DATA_DIR, "submit_out")
    shutil.rmtree(out_dir, ignore_errors=True)
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        import pyspark

        spark_submit = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    proc = subprocess.run(
        [
            spark_submit,
            "--master",
            "local[4]",
            "--py-files",
            zip_path,
            os.path.join(REPO, "scripts", "run_pipeline.py"),
            "--pages",
            pages_path,
            "--out",
            out_dir,
            "--run-id",
            "submit-test",
            "--buckets",
            "16",
        ],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=DATA_DIR,  # away from the repo root: only the zip provides the pkg
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    stats = json.loads(proc.stdout.strip().splitlines()[-1])
    assert stats["triples"] > 0


def test_url_bucketing_spreads_mega_domains(spark, pages_path):
    """~30% of pages share 5 mega-domains; url-hash bucketing must still
    spread rows near-uniformly (the skew defence of the north rule)."""
    from jsonld_spark.pipeline import KGPipeline

    pipe = KGPipeline(spark, num_buckets=16)
    pages = spark.read.parquet(pages_path)
    counts = [
        r.n
        for r in pipe.with_bucket(pages)
        .groupBy("part_id")
        .agg(F.count("*").alias("n"))
        .collect()
    ]
    assert len(counts) == 16
    avg = sum(counts) / len(counts)
    assert max(counts) < 2.5 * avg  # no bucket dominated by a mega-domain

    # counter-example: bucketing by DOMAIN would concentrate ~30% of rows
    # in 5 buckets — document why url (not domain/subject) is the key
    domain_counts = [
        r.n
        for r in pages.withColumn(
            "d", F.regexp_extract("url", r"https://([^/]+)/", 1)
        )
        .groupBy("d")
        .agg(F.count("*").alias("n"))
        .collect()
    ]
    assert max(domain_counts) > 3 * (sum(domain_counts) / len(domain_counts))
