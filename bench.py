"""Benchmark harness.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line ``{"metric", "value", "unit", "queries", "sf", ...}``.

Scaling-efficiency proxy for the north rule's N→4N executor criterion
(no real cluster in the sandbox): the same pages→triples job runs at
local[8] and local[32] on the same input; both throughputs and the
efficiency ``(t8/t32)/4`` are reported (and written to BENCH.md).
Set SPARK_GRAFT_SCALING=0 to skip the second session.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_PAGES = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "800000"))
SCALE_TRIALS = int(os.environ.get("SPARK_GRAFT_SCALE_TRIALS", "4"))
DO_SCALING = os.environ.get("SPARK_GRAFT_SCALING", "1") != "0"

PAGES_PATH = os.path.join(REPO, "data", f"pages_bench_{BENCH_PAGES}.parquet")


def _session(cores: int):
    from jsonld_spark.pipeline import default_session

    return default_session(
        cores=cores,
        shuffle_partitions=max(8, cores),
        app_name=f"jsonld_spark_bench_{cores}",
    )


def _pages_job(spark, trials: int = 1) -> tuple[float, int]:
    """Fused extract→expand→toRdf over the synthetic crawl; returns
    (best seconds over ``trials``, triples).  Steady-state measurement:
    one full warm pass (python-daemon forks + JIT + page cache), then
    min over timed trials — run-to-run variance in local mode is large
    until workers and codegen are warm."""
    from pyspark.sql import functions as F

    from jsonld_spark.pipeline import KGPipeline
    from jsonld_spark.sources.pages import build_context_cache_entries

    # the crawl is written as 64 part files → the scan itself provides
    # parallel splits (as a 100 TB crawl would); no repartition shuffle
    pages = spark.read.parquet(PAGES_PATH)
    pipe = KGPipeline(spark, build_context_cache_entries())

    def run():
        return pipe.extract(pages).filter(F.col("error").isNull()).count()

    n = run()  # warm pass (full input)
    best = float("inf")
    for _ in range(max(1, trials)):
        t0 = time.time()
        run()
        best = min(best, time.time() - t0)
    return best, n


def _scale_probe(cores: int) -> None:
    # Pin the WHOLE process tree (JVM + python workers) to exactly
    # ``cores`` CPUs: a local[8] session on a 32-core box would otherwise
    # run its JVM scan/Arrow/agg threads on the 24 idle cores for free —
    # something an 8-core executor in a real cluster never gets.  With
    # affinity pinning, local[8] vs local[32] is an honest proxy for a
    # cluster at N vs 4N total cores.
    try:
        os.sched_setaffinity(0, set(range(cores)))
    except (AttributeError, OSError):
        pass
    spark = _session(cores)
    sec, _ = _pages_job(spark, trials=SCALE_TRIALS)
    print(f"PROBE_SEC {sec:.3f}")
    spark.stop()


def main() -> None:
    from jsonld_spark.sources.pages import ensure_pages

    if len(sys.argv) >= 3 and sys.argv[1] == "--scale-probe":
        ensure_pages(PAGES_PATH, BENCH_PAGES, seed=42, n_files=64)
        _scale_probe(int(sys.argv[2]))
        return

    ensure_pages(PAGES_PATH, BENCH_PAGES, seed=42, n_files=64)

    import __spark_entry__ as E

    results: dict[str, float] = {}
    extra: dict = {"sf_dir": SF_DIR, "bench_pages": BENCH_PAGES, "cpus": CPUS}

    spark = _session(CPUS)

    # flagship: synthetic-crawl pages → triples throughput (min of 2
    # timed trials after the warm pass — single trials are noisy on a
    # shared VM)
    sec, n_triples = _pages_job(spark, trials=2)
    results["pages_to_triples"] = round(sec, 3)
    extra["pages_triples"] = n_triples
    extra["pages_triples_per_sec"] = round(n_triples / sec, 1)
    extra["pages_per_sec"] = round(BENCH_PAGES / sec, 1)

    # headline operator queries at SF_DIR
    headline = [
        "jsonld_pred_counts",
        "jsonld_sameas_canonical",
        "tpch_q1",
        "top_revenue_join",
        "events_first_per_user",
        "dedup_exact",
        "minhash_signature",
        "simhash",
        "jaccard_pairs",
        "cosine_topk",
        "ann_topk_lsh",
        "payload_meta",
    ]
    qs = E.queries()
    for name in headline:
        t0 = time.time()
        cnt = qs[name](spark, SF_DIR).count()
        results[name] = round(time.time() - t0, 3)
        extra.setdefault("rows", {})[name] = cnt

    # full north-rule pipeline on a crawl subset: extract → sameAs
    # connected components → broadcast link → bucketed write + lineage
    import glob
    import shutil

    subset_files = sorted(glob.glob(os.path.join(PAGES_PATH, "part-*")))[:16]
    if subset_files:
        from jsonld_spark.pipeline import KGPipeline
        from jsonld_spark.sources.pages import build_context_cache_entries

        kg_out = os.path.join(REPO, "data", "bench_kg_out")
        shutil.rmtree(kg_out, ignore_errors=True)
        pipe = KGPipeline(spark, build_context_cache_entries(), num_buckets=64)
        sub = spark.read.parquet(*subset_files)
        stats = pipe.run(sub, kg_out, run_id="bench", resume=False, link_entities=True)
        results["full_pipeline_linked"] = round(stats["seconds"], 3)
        extra["full_pipeline_triples"] = stats["triples"]
        extra["full_pipeline_pages"] = sub.count()

    spark.stop()

    # scaling-efficiency proxy: local[8] vs local[CPUS] on the SAME input.
    # Each config runs in its own subprocess — consecutive sessions in one
    # driver process contaminate each other (lingering JVM state).
    if DO_SCALING:
        import subprocess

        t_small = t_big = None
        for cores, key in ((8, "t_local8"), (CPUS, f"t_local{CPUS}")):
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--scale-probe", str(cores)],
                capture_output=True,
                text=True,
                env={**os.environ, "SPARK_GRAFT_BENCH_PAGES": str(BENCH_PAGES)},
            )
            sec = None
            for line in proc.stdout.splitlines():
                if line.startswith("PROBE_SEC "):
                    sec = float(line.split()[1])
            if sec is None:
                raise RuntimeError(f"scale probe {cores} failed: {proc.stderr[-2000:]}")
            extra[key] = round(sec, 3)
            if cores == 8:
                t_small = sec
            else:
                t_big = sec
        ratio = CPUS / 8
        eff = (t_small / t_big) / ratio
        extra["scaling_efficiency_8_to_%d" % CPUS] = round(eff, 3)
        extra["throughput_pages_per_sec_8"] = round(BENCH_PAGES / t_small, 1)
        extra["throughput_pages_per_sec_%d" % CPUS] = round(BENCH_PAGES / t_big, 1)
        _write_bench_md(extra)

    out = {
        "metric": "pages_to_triples_sec",
        "value": results["pages_to_triples"],
        "unit": "sec",
        "queries": results,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        **extra,
    }
    print(json.dumps(out))


def _write_bench_md(extra: dict) -> None:
    cpus = extra["cpus"]
    eff_key = f"scaling_efficiency_8_to_{cpus}"
    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write(
            f"""# BENCH — scaling efficiency (sandbox proxy for N→4N executors)

Same pages→triples job (fused extract→expand→toRdf mapInPandas stage)
on the same {extra['bench_pages']}-page synthetic crawl at two
parallelism levels (north rule: ≥0.8 efficiency from N to 4N):

| config | wall sec | pages/sec |
|---|---|---|
| local[8]  | {extra['t_local8']} | {extra['throughput_pages_per_sec_8']} |
| local[{cpus}] | {extra[f't_local{cpus}']} | {extra[f'throughput_pages_per_sec_{cpus}']} |

**Scaling efficiency (8→{cpus} cores): {extra[eff_key]}**
(= (t8/t{cpus}) / {cpus // 8})

Emitted triples: {extra['pages_triples']} ({extra['pages_triples_per_sec']}/sec
at local[{cpus}]).
"""
        )


if __name__ == "__main__":
    main()
