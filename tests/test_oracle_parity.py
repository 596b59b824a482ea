"""Driver-gate rehearsal: run every ``queries()`` entry on Spark and its
``oracle_sql()`` on DuckDB over the same parquet, compare row-count +
column names + values (order-insensitive, like the driver).

VERDICT r4 #6: parity runs at TWO scale factors (sf0.01 — the driver's
gate — AND sf0.1) in the same session, pinning scale-dependent
divergence (overflow, collect bounds, AQE plan flips) every round."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod
from conftest import TESTDATA

SF_DIR = os.path.join(TESTDATA, "sf0.01")
SF_DIRS = ["sf0.01", "sf0.1"]

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="module", params=SF_DIRS, ids=SF_DIRS)
def sf_dir(request):
    d = os.path.join(TESTDATA, request.param)
    if not os.path.isdir(d):
        pytest.skip(f"{d} not generated")
    return d


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    yield con
    con.close()


def _norm(v):
    import numpy as np

    if isinstance(v, np.ndarray):
        return tuple(_norm(x) for x in v.tolist())
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if hasattr(v, "item"):  # numpy scalar
        return _norm(v.item())
    return v


def _rows(df_pandas, cols):
    return sorted(
        tuple(_norm(v) for v in row)
        for row in df_pandas[cols].itertuples(index=False, name=None)
    )


ORACLE_KEYS = sorted(entry_mod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_oracle_parity(spark, duck, sf_dir, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, sf_dir).toPandas()
    odf = duck.execute(entry_mod.oracle_sql()[name]).fetchdf()
    assert len(sdf) == len(odf), f"{name}: rowcount {len(sdf)} vs {len(odf)}"
    scols = sorted(sdf.columns)
    ocols = sorted(odf.columns)
    assert scols == ocols, f"{name}: columns {scols} vs {ocols}"
    srows = _rows(sdf, scols)
    orows = _rows(odf, scols)
    if srows != orows:
        diffs = [
            (a, b) for a, b in zip(srows, orows) if a != b
        ][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs {diffs}")


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert "subj" in df.columns


def test_rows_only_queries_run(spark):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    for name, q in qs.items():
        if name in oracles:
            continue
        n = q(spark, SF_DIR).count()
        assert n >= 0, name


def test_jaccard_stop_shingle_cap(spark):
    """max_df cap drops boilerplate shingles (skew defence) — result is
    a subset of the uncapped pairs."""
    from jsonld_spark.functions import text as textops

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    full = {
        (r.doc_a, r.doc_b)
        for r in textops.jaccard_pairs(docs, max_df=None).collect()
    }
    capped = {
        (r.doc_a, r.doc_b)
        for r in textops.jaccard_pairs(docs, max_df=50).collect()
    }
    assert capped <= full or len(capped - full) == 0
    # values agree between the capped posting-list path and the exact
    # self-join path wherever both produce the pair
    full_vals = {
        (r.doc_a, r.doc_b): r.jaccard_x1000
        for r in textops.jaccard_pairs(docs, max_df=None).collect()
    }
    cap_vals = {
        (r.doc_a, r.doc_b): r.jaccard_x1000
        for r in textops.jaccard_pairs(docs).collect()
    }
    assert all(full_vals.get(k) == v for k, v in cap_vals.items() if k in full_vals)
    # the DEFAULT plan is the bounded posting-list pattern: in-group pair
    # explode, no self-join, no cartesian product
    plan = (
        textops.jaccard_pairs(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "flatten(transform" in plan and "CartesianProduct" not in plan, plan


def test_passage_dedup_plan_no_text_on_exchange(spark):
    """passage_dedup's wide exchanges carry (digest, encoded int64) —
    never the text column — and the keeper election is an aggregate,
    not a window or self-join."""
    from jsonld_spark.functions import text as textops

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = (
        textops.passage_dedup(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan and "Window" not in plan, plan
    for ln in plan.splitlines():
        if "Exchange hashpartitioning" in ln:
            assert "text" not in ln, ln


def test_decontaminate_broadcasts_eval_side(spark):
    """The eval n-gram set is the SMALL side: it must broadcast, so
    training n-grams stream through a BroadcastHashJoin with no shuffle
    of the big side on the join key."""
    from jsonld_spark.functions import text as textops

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = (
        textops.decontaminate(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_quota_sample_plan_uses_window_group_limit(spark):
    """The per-group rank must plan as WindowGroupLimit: partial top-k
    runs per input partition BEFORE the exchange, so a mega-domain
    contributes at most `quota` rows per partition to the shuffle."""
    from jsonld_spark.functions import text as textops

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = (
        textops.quota_sample(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan, plan


def test_passage_dedup_semantics(spark):
    """Pin the keeper-election semantics independently of the oracle:
    an exact-duplicate later document has EVERY passage flagged; the
    earliest occurrence owns the passage; a repeated passage WITHIN one
    doc counts against its later offset."""
    from jsonld_spark.functions.text import passage_dedup

    words = " ".join(f"w{i}" for i in range(32))  # 2 passages of 16
    docs = spark.createDataFrame(
        [
            (1, words),
            (2, words),                      # exact dup of doc 1
            (3, " ".join(f"w{i}" for i in range(16)) + " " + " ".join(f"w{i}" for i in range(16))),
            # doc 3 = passage A twice: second offset is an internal dup
            (4, "unique tokens only here"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in passage_dedup(docs).collect()}
    assert rows[1].n_dup_passages == 0 and rows[1].n_passages == 2
    assert rows[2].n_dup_passages == 2 and rows[2].dup_ratio_x1000 == 1000
    # doc 3's first 16 tokens equal doc 1's first passage (owned by doc
    # 1), and its second passage equals its own first → both dups
    assert rows[3].n_dup_passages == 2
    assert rows[4].n_dup_passages == 0


def test_decontaminate_semantics(spark):
    """Pin eval-split semantics: a training doc sharing an 8-gram with
    an eval doc (doc_id % 20 == 0) is contaminated; disjoint text is
    not; eval docs themselves are excluded from the output."""
    from jsonld_spark.functions.text import decontaminate

    eval_text = " ".join(f"e{i}" for i in range(10))
    docs = spark.createDataFrame(
        [
            (20, eval_text),                       # eval split member
            (1, "prefix " + eval_text),            # shares 8-grams
            (2, " ".join(f"x{i}" for i in range(10))),  # disjoint
            (3, "too short"),                      # < 8 tokens: no grams
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in decontaminate(docs).collect()}
    assert 20 not in rows
    assert rows[1].contaminated and rows[1].n_overlap >= 1
    assert not rows[2].contaminated and rows[2].n_overlap == 0
    assert not rows[3].contaminated and rows[3].n_overlap == 0
