"""Bucketed triples table: subject self-joins run without exchanges."""

from pyspark.sql import functions as F

from jsonld_spark.pipeline import KGPipeline


def test_bucketed_subject_join_has_no_exchange(spark, pages_path):
    pipe = KGPipeline(spark, num_buckets=8)
    triples = pipe.triples(spark.read.parquet(pages_path)).limit(2000)
    pipe.write_bucketed_table(triples, "triples_bucketed", buckets=8)

    t = spark.table("triples_bucketed")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = t.alias("a")
        b = t.alias("b")
        joined = a.join(b, F.col("a.subj") == F.col("b.subj")).select(
            F.col("a.subj"), F.col("a.pred"), F.col("b.pred").alias("pred2")
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        # the whole point: equal subjects are co-located at write time
        assert "Exchange" not in plan, plan[:2000]
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS triples_bucketed")
