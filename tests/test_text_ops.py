

def test_decontaminate_fuzzy_semantics(spark):
    """A training doc that is a near-verbatim copy of an eval doc is
    flagged; an unrelated doc is not; a sub-shingle doc reports 0."""
    from jsonld_spark.functions.text import decontaminate_fuzzy

    eval_text = ("the quick brown fox jumps over the lazy dog " * 6).strip()
    # identical shingle set -> jaccard 1 -> ALL bands match
    # deterministically (a probabilistic near-dup could miss all 4
    # bands of 4 at jaccard ~0.75 and flake)
    near_dup = eval_text
    rows = [
        (0, eval_text),              # doc_id % 20 == 0 → eval split
        (1, near_dup),               # near-dup of eval → contaminated
        (2, "completely different content about spark shuffles and joins"
            " with many unrelated words in a long enough sentence"),
        (3, "xy"),                   # sub-shingle: no bands, 0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.n_shared_bands, r.contaminated)
           for r in decontaminate_fuzzy(df).collect()}
    assert set(got) == {1, 2, 3}     # eval doc itself excluded
    assert got[1] == (4, True)       # 4 bands of 4 over 16 hashes
    assert got[2] == (0, False)
    assert got[3] == (0, False)
