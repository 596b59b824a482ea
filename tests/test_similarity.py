"""Similarity-search tests: brute-force vs LSH recall, banding behavior."""

import os

import pytest
from pyspark.sql import functions as F

from conftest import TESTDATA
from jsonld_spark.functions import similarity

SF_DIR = os.path.join(TESTDATA, "sf0.01")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


def test_cosine_topk_shape(spark, emb):
    out = similarity.cosine_topk(emb, n_queries=5, k=3).collect()
    assert len(out) == 15
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rows in by_q.items():
        scores = [r.cos_x1e6 for r in sorted(rows, key=lambda r: r.rank)]
        assert scores == sorted(scores, reverse=True)
        assert all(r.neighbor_id != q for r in rows)


def test_lsh_buckets_cover_all_bands(spark, emb):
    b = similarity.lsh_buckets(emb)
    n_vec = emb.count()
    assert b.count() == n_vec * similarity.LSH_BANDS
    assert b.select("band_id").distinct().count() == similarity.LSH_BANDS
    rng = b.agg(F.min("bucket"), F.max("bucket")).collect()[0]
    assert rng[0] >= 0 and rng[1] < (1 << similarity.LSH_BITS_PER_BAND)


def test_ann_lsh_returns_candidates_and_overlaps_exact(spark, emb):
    exact = similarity.cosine_topk(emb, n_queries=10, k=5).collect()
    approx = similarity.ann_topk_lsh(emb, n_queries=10, k=5).collect()
    assert len(approx) > 0
    exact_set = {(r.query_id, r.neighbor_id) for r in exact}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    # random 64-dim data is the worst case for LSH; still expect signal
    assert recall >= 0.2, f"recall {recall}"


def test_near_dup_threshold(spark, emb):
    out = similarity.near_dup_embeddings(emb).collect()
    assert len(out) > 0
    assert all(r.cos_x1e6 >= 400_000 for r in out)
    assert all(r.vec_a < r.vec_b for r in out)


def test_ivf_ann_recall(spark, emb):
    exact = similarity.cosine_topk(emb, n_queries=10, k=5).collect()
    approx = similarity.ann_topk_ivf(emb, n_queries=10, k=5, n_cells=8, n_probe=4).collect()
    assert len(approx) == 50  # full k for every query (cells cover enough)
    exact_set = {(r.query_id, r.neighbor_id) for r in exact}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    # probing half the cells on random data should recover most of top-5
    assert recall >= 0.5, f"recall {recall}"


def test_ivf_assignment_covers_all(spark, emb):
    cents = similarity._kmeans_centroids(emb, 8)
    assigned = similarity.ivf_assign(emb, cents)
    assert assigned.count() == emb.count()
    cells = {r.cell for r in assigned.select("cell").distinct().collect()}
    assert cells <= set(range(8)) and len(cells) >= 4


def test_near_dup_default_has_no_cross_join(spark, emb):
    """Scale guard: the default near-dup path must use the LSH bucket
    join, never a cartesian product; exact=True keeps the O(n²) baseline
    behind an explicit flag."""
    all_pairs = ("CartesianProduct", "BroadcastNestedLoopJoin")
    default_plan = similarity.near_dup_embeddings(emb)._jdf.queryExecution().executedPlan().toString()
    assert not any(op in default_plan for op in all_pairs), default_plan
    exact_plan = similarity.near_dup_embeddings(emb, exact=True)._jdf.queryExecution().executedPlan().toString()
    assert any(op in exact_plan for op in all_pairs)


def test_near_dup_lsh_subset_of_exact(spark, emb):
    """LSH-candidate near-dups are a subset of the exact all-pairs result
    with identical scores (re-rank is exact; only recall differs)."""
    exact = {
        (r.vec_a, r.vec_b): r.cos_x1e6
        for r in similarity.near_dup_embeddings(emb, exact=True).collect()
    }
    approx = {
        (r.vec_a, r.vec_b): r.cos_x1e6
        for r in similarity.near_dup_embeddings(emb).collect()
    }
    assert set(approx) <= set(exact)
    assert all(exact[k] == v for k, v in approx.items())
    assert len(approx) > 0

def test_semdedup_semantics(spark, emb):
    """Drops are exactly the vectors with a lower-id same-cell neighbor at
    cos >= tau; dup_of is the smallest such neighbor; keepers pass through."""
    out = similarity.semdedup(emb).collect()
    assert len(out) == emb.count()
    cells = {r.vec_id: r.cell for r in out}
    dropped = {r.vec_id: r.dup_of for r in out if not r.keep}
    assert all(r.dup_of == -1 for r in out if r.keep)  # sentinel, not NULL
    assert len(dropped) > 0  # sf0.01 corpus has within-cell near-dups at 0.4
    # recompute ground truth from the exact all-pairs result
    exact = similarity.near_dup_embeddings(emb, exact=True).collect()
    expect = {}
    for r in exact:  # vec_a < vec_b, cos >= 400_000
        if cells[r.vec_a] == cells[r.vec_b]:
            expect[r.vec_b] = min(expect.get(r.vec_b, r.vec_a), r.vec_a)
    assert dropped == expect
    for r in out:
        assert r.keep == (r.dup_of == -1)


def test_semdedup_no_cross_join(spark, emb):
    """Scale guard: the pair stage is an equi-join on cell (cluster-bounded
    candidate groups), never a cartesian product."""
    plan = similarity.semdedup(emb)._jdf.queryExecution().executedPlan().toString()
    assert not any(
        op in plan for op in ("CartesianProduct", "BroadcastNestedLoopJoin")
    ), plan
