"""Edge-corpus differential parity: Spark builders vs DuckDB oracles on a
crafted ``documents`` table the sf* testdata never exercises — sub-shingle
docs (<3 tokens), NULL text, empty text, and hash-derived 64-bit doc_ids.

Regression anchors (all found by review, all previously crashing or
silently diverging under ANSI):
- ``sequence(0, size-3)`` DESCENDS for <3 tokens → [INVALID_ARRAY_INDEX]
  crash in every shingle consumer (minhash/jaccard), or bogus ''
  shingles (false near-dup pairs) with ANSI off;
- DuckDB ``concat('0x', md5(NULL))`` skips the NULL → CAST('0x') crash
  in every h32-based oracle, while Spark returns NULL;
- ``doc_id * 2^20 + pidx`` passage keys overflow int64 for
  doc_id ≥ 2^43 (hash-derived ids) — keeper election now min()s a
  (doc_id, pidx) struct, lexicographic in both engines;
- int32 accumulators in token_stats/quality_score (wrap past 2^31).
"""

import math
import os

import duckdb
import pytest
from pyspark.sql import functions as F

from jsonld_spark.functions import multimodal as mm
from jsonld_spark.functions import text as textops

NORMAL = (
    "the quick brown fox jumps over the lazy dog and runs far away "
    "to find a quiet place of rest and calm under the old oak tree "
    "while the wind blows gently through the leaves of the forest"
)

ROWS = [
    # doc_id, text, lang, source, n_chars
    (1, "hello", "en", "a", 5),                       # 1 token: no shingles
    (2, "two words", "en", "a", 9),                   # 2 tokens: no shingles
    (3, None, "en", "a", 0),                          # NULL text
    (4, "", "en", "b", 0),                            # empty: one '' token
    (5, "just three tokens", "en", "b", 17),          # exactly one shingle
    (6, NORMAL, "en", "b", len(NORMAL)),
    ((1 << 50) + 7, NORMAL, "en", "c", len(NORMAL)),  # hash-scale id, dup text
    (20, "eval split doc with the quick brown fox jumps over the lazy dog phrase", "en", "c", 71),
    # repeated lines, bullets, ellipsis, '#' symbols → repetition_stats
    (9, "same line\nsame line\n- bullet one\n* bullet two\ntrailing dots...\n# head ##\nsame line", "en", "c", 80),
    # PII shapes: digit-local-part email (counts once, as email), ip,
    # 9-digit run, sub-threshold 8-digit run, malformed almost-ip
    (10, "mail 12345678901@ex.org ip 8.8.8.8 ssn 123456789 ok 12345678 alm 1234.5.6.7", "en", "c", 75),
    # C4 line-rule shapes: terminal-punct keepers (period / quote /
    # curly quote), a <3-word line, a no-punct line, a javascript line,
    # lorem ipsum + curly brace page flags
    (
        11,
        "A proper keeper sentence stands here.\nshort.\nno terminal punctuation on this line\n"
        "This javascript line is dropped today.\nQuoted keeper line ends rightly.”\n"
        'Other quoted keeper ends now."\nlorem ipsum { appears here. Twice here. Thrice now. More still. Last one.',
        "en",
        "c",
        120,
    ),
    # closing-brace-only page: C4's curly-bracket gate must fire on '}' too
    (
        12,
        "Stray template artifact } remains. Plus four more words. Real sentences here. "
        "Another one lands. Final sentence now.",
        "en",
        "c",
        118,
    ),
]


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("edge_corpus")
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in ROWS], type=pa.int64()),
            "text": pa.array([r[1] for r in ROWS], type=pa.string()),
            "lang": pa.array([r[2] for r in ROWS], type=pa.string()),
            "source": pa.array([r[3] for r in ROWS], type=pa.string()),
            "n_chars": pa.array([r[4] for r in ROWS], type=pa.int64()),
        }
    )
    pq.write_table(t, os.path.join(str(d), "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def docs(spark, corpus_dir):
    return spark.read.parquet(os.path.join(corpus_dir, "documents.parquet"))


@pytest.fixture(scope="module")
def duck(corpus_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{os.path.join(corpus_dir, 'documents.parquet')}'"
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
    if hasattr(v, "item"):
        return _norm(v.item())
    return v


def _assert_parity(s_cols, s_rows, o_cols, o_rows, name):
    """Compare raw row lists (Spark ``collect`` vs DuckDB ``fetchall``),
    NOT pandas frames — pandas renders a NULL boolean/int column as
    float NaN, which would make SQL NULL indistinguishable from a
    genuine NaN and could mask a NULL-vs-NaN engine divergence."""
    assert sorted(s_cols) == sorted(o_cols), f"{name}: {s_cols} vs {o_cols}"
    s_order = [list(s_cols).index(c) for c in sorted(s_cols)]
    o_order = [list(o_cols).index(c) for c in sorted(o_cols)]
    s = sorted(
        (tuple(_norm(r[i]) for i in s_order) for r in s_rows),
        key=repr,  # None sorts fine under repr; rows stay comparable
    )
    o = sorted(
        (tuple(_norm(r[i]) for i in o_order) for r in o_rows),
        key=repr,
    )
    assert s == o, f"{name}: {[(a, b) for a, b in zip(s, o) if a != b][:5]}"


PAIRS = [
    ("exact_dedup", textops.exact_dedup, lambda: textops.EXACT_DEDUP_SQL),
    ("token_stats", textops.token_stats, lambda: textops.TOKEN_STATS_SQL),
    ("quality_score", textops.quality_score, lambda: textops.QUALITY_SCORE_SQL),
    ("token_count_bpe", textops.token_count_bpe, lambda: textops.TOKEN_COUNT_BPE_SQL),
    ("lang_id", textops.lang_id, lambda: textops.LANG_ID_SQL),
    ("fingerprint", textops.fingerprint, lambda: textops.FINGERPRINT_SQL),
    ("minhash_str", textops.minhash_signature_str, lambda: textops.MINHASH_STR_SQL),
    ("minhash_pairs", textops.minhash_candidate_pairs, textops.minhash_candidate_pairs_sql),
    ("simhash", textops.simhash, lambda: textops.SIMHASH_SQL),
    ("jaccard_pairs", textops.jaccard_pairs, textops.jaccard_pairs_sql),
    ("passage_dedup", textops.passage_dedup, textops.passage_dedup_sql),
    ("decontaminate", textops.decontaminate, textops.decontaminate_sql),
    ("quota_sample", lambda d: textops.quota_sample(d, quota=2), lambda: textops.quota_sample_sql(quota=2)),
    ("repetition_stats", textops.repetition_stats, lambda: textops.REPETITION_STATS_SQL),
    ("top_ngram_stats", textops.top_ngram_stats, textops.top_ngram_stats_sql),
    ("top_tokens", lambda d: textops.top_tokens(d, k=10), lambda: textops.top_tokens_sql(k=10)),
    ("sample_by_hash", textops.sample_by_hash, None),  # SQL resolved below
    ("pii_scrub", textops.pii_scrub, textops.pii_scrub_sql),
    ("dedup_groups", textops.dedup_groups, textops.dedup_groups_sql),
    ("c4_clean", textops.c4_clean, lambda: textops.C4_CLEAN_SQL),
    # capacity 16 forces docs to straddle chunk boundaries
    ("pack_chunks", lambda d: textops.pack_chunks(d, capacity=16), lambda: textops.pack_chunks_sql(capacity=16)),
    ("payload_meta", mm.payload_meta, lambda: mm.PAYLOAD_META_SQL),
    ("tfidf_top_terms", lambda d: textops.tfidf_top_terms(d, k=3), lambda: textops.tfidf_top_terms_sql(k=3)),
    ("boilerplate_lines", textops.boilerplate_lines, textops.boilerplate_lines_sql),
    ("domain_quality", textops.domain_quality, textops.domain_quality_sql),
    ("corpus_stats", textops.corpus_stats, lambda: textops.CORPUS_STATS_SQL),
    ("sample_frames", lambda d: mm.sample_frames(mm.attach_payload(d), n_frames=3).orderBy("doc_id", "frame_idx"), lambda: mm.sample_frames_sql(n_frames=3)),
]


def _sql_for(name, sql_thunk):
    if name == "sample_by_hash":
        fn = getattr(textops, "sample_by_hash_sql", None)
        return fn() if callable(fn) else getattr(textops, "SAMPLE_BY_HASH_SQL")
    return sql_thunk()


@pytest.mark.parametrize("name,builder,sql_thunk", PAIRS, ids=[p[0] for p in PAIRS])
def test_edge_corpus_parity(docs, duck, name, builder, sql_thunk):
    sdf = builder(docs)
    s_rows = sdf.collect()
    cur = duck.execute(_sql_for(name, sql_thunk))
    o_cols = [d[0] for d in cur.description]
    o_rows = cur.fetchall()
    assert len(s_rows) == len(o_rows), f"{name}: rowcount {len(s_rows)} vs {len(o_rows)}"
    _assert_parity(sdf.columns, s_rows, o_cols, o_rows, name)


def test_multimodal_features_null_payload(docs, duck):
    """NULL text → b'' payload on the Spark side; the oracle must not
    crash and must predict the same (0, md5(''), fake dims) row."""
    sdf = mm.extract_features(mm.attach_payload(docs))
    s_rows = sdf.collect()
    cur = duck.execute(mm.MULTIMODAL_FEATURES_SQL)
    o_cols = [d[0] for d in cur.description]
    o_rows = cur.fetchall()
    assert len(s_rows) == len(o_rows)
    _assert_parity(sdf.columns, s_rows, o_cols, o_rows, "multimodal_features")
    null_row = next(r for r in s_rows if r.doc_id == 3)
    assert null_row.n_bytes == 0
    assert null_row.digest == "d41d8cd98f00b204e9800998ecf8427e"


def test_short_docs_have_no_shingle_artifacts(docs):
    """<3-token docs: empty shingle set — NOT ['', '', ...] — so they
    produce no jaccard pairs with each other."""
    short = {1, 2, 3, 4}
    pairs = textops.jaccard_pairs(docs).toPandas()
    assert not [
        r for r in pairs.itertuples() if r.doc_a in short or r.doc_b in short
    ]
    # and the LSH path: no-shingle docs never enter a band bucket, so
    # they can't all collide in the md5('') hot bucket at crawl scale
    cand = textops.minhash_candidate_pairs(docs).toPandas()
    assert not [
        r for r in cand.itertuples() if r.doc_a in short or r.doc_b in short
    ]


def test_passage_dedup_hash_scale_doc_id(docs):
    """doc_id = 2^50 + 7 (hash-derived): keeper election must not
    overflow; the lower doc_id (5..6 range) wins for every shared
    passage, so the huge-id duplicate shows dup_ratio_x1000 == 1000."""
    out = {r.doc_id: r for r in textops.passage_dedup(docs).collect()}
    big = (1 << 50) + 7
    assert out[big].n_dup_passages == out[big].n_passages
    assert out[big].dup_ratio_x1000 == 1000
    assert out[6].n_dup_passages == 0


def test_token_stats_bigint_schema(docs):
    schema = dict(textops.token_stats(docs).dtypes)
    assert schema["token_chars"] == "bigint"


def test_repetition_stats_semantics(docs):
    """Pin the Gopher-signal arithmetic on the crafted repetitive doc."""
    r = {x.doc_id: x for x in textops.repetition_stats(docs).collect()}[9]
    assert r.n_lines == 7
    assert r.dup_line_frac_x1000 == 428       # floor(3000/7): 'same line' x3
    assert r.dup_line_char_frac_x1000 == 355  # floor(27000/76)
    assert r.bullet_line_frac_x1000 == 285    # 2 bullet lines
    assert r.ellipsis_line_frac_x1000 == 142  # 1 '...'-terminated line
    assert r.symbol_ratio_x1000 == 363        # (3 '#' + 1 '...') / 11 tokens


def test_dedup_groups_semantics(docs):
    """Identical-text docs 6 and 2^50+7 land in one group with
    min(doc_id)=6 canonical; every other doc — including NULL-text and
    sub-shingle docs that never enter a band bucket — is a singleton
    whose group_id is its own doc_id."""
    out = {r.doc_id: r for r in textops.dedup_groups(docs).collect()}
    assert len(out) == len(ROWS)
    big = (1 << 50) + 7
    assert out[big].group_id == 6 and not out[big].is_canonical
    assert out[6].group_id == 6 and out[6].is_canonical
    assert out[big].group_size == out[6].group_size == 2
    for doc_id in (1, 2, 3, 4, 5, 9, 10, 20):
        r = out[doc_id]
        assert (r.group_id, r.group_size, r.is_canonical) == (doc_id, 1, True)


def test_pii_scrub_semantics(docs):
    """Scrub order prevents double counting: the digit-only email local
    part is counted as email, never as idnum; 8-digit runs stay below
    the id threshold; '1234.5.6.7' is not an IP (no digit-run
    boundary)."""
    r = {x.doc_id: x for x in textops.pii_scrub(docs).collect()}[10]
    assert (r.n_email, r.n_ipv4, r.n_idnum) == (1, 1, 1)
    # NULL text propagates NULL counts and hash
    null_r = {x.doc_id: x for x in textops.pii_scrub(docs).collect()}[3]
    assert null_r.n_email is None and null_r.clean_md5 is None


def test_top_ngram_semantics(docs):
    """Mode 2-gram found by the struct-accumulator scan: doc 6 repeats
    'the quick'... verify against a plain Python count."""
    from collections import Counter

    r = {x.doc_id: x for x in textops.top_ngram_stats(docs).collect()}
    import re as _re

    texts = {r[0]: r[1] for r in ROWS}
    for doc_id, text in [(6, NORMAL), (9, texts[9])]:
        toks = _re.split(" +", text.strip())  # the engine's tokenizer:
        # spaces only — newlines stay inside tokens
        grams = [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]
        counts = Counter(grams)
        best = max(counts.values())
        expect_gram = min(g for g, c in counts.items() if c == best)
        assert r[doc_id].top_count == best, (doc_id, r[doc_id])
        assert r[doc_id].top_ngram == expect_gram, (doc_id, r[doc_id])
    # 1-token doc: no grams
    assert r[1].top_count == 0 and r[1].top_ngram == ""
    # NULL text propagates
    assert r[3].top_ngram is None


def test_c4_clean_semantics(docs):
    """Pin the C4 §2.2 rules on the crafted doc: which lines survive,
    which page flags fire, and the >=5-sentence page gate."""
    out = {r.doc_id: r for r in textops.c4_clean(docs).collect()}
    r = out[11]
    assert r.n_lines == 7
    # keepers: 'A proper keeper sentence stands here.', both quoted
    # keepers, and the lorem-ipsum line (line rules don't see page flags)
    assert r.n_kept_lines == 4
    assert r.has_lorem and r.has_brace
    assert not r.keep_doc  # page flags fire regardless of sentence count
    nul = out[3]
    assert nul.n_kept_lines is None and nul.keep_doc is None  # NULL text
    empty = out[4]
    assert empty.n_kept_lines == 0 and not empty.keep_doc
    assert empty.clean_len == 0
    closing = out[12]  # '}'-only page: the brace gate fires on either bracket
    assert closing.has_brace and not closing.keep_doc
    assert closing.n_sentences >= 5  # only the flag, not the gate, blocks it


def test_pack_chunks_semantics_and_plan(spark, docs):
    """The two-phase tape layout must (a) equal the single-window
    formulation byte-for-byte, (b) never plan a SinglePartition
    exchange, and (c) keep the tape gapless: consecutive docs in md5
    order have cum_before advancing by exactly n_tok."""
    from pyspark.sql import Window as W

    out = textops.pack_chunks(docs, capacity=16)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan

    rows = out.collect()
    got = {(r.doc_id): (r.n_tok, r.cum_before, r.chunk_first, r.chunk_last, r.n_chunks) for r in rows}
    base = docs.filter(F.col("text").isNotNull()).select(
        "doc_id",
        F.expr("cast(size(split(trim(text), ' +')) as bigint)").alias("n_tok"),
        F.expr("md5(cast(doc_id as string))").alias("_ord"),
    )
    w = W.orderBy("_ord", "doc_id").rowsBetween(W.unboundedPreceding, -1)
    exp = {}
    for r in base.withColumn("cb", F.coalesce(F.sum("n_tok").over(w), F.lit(0))).collect():
        first, last = r.cb // 16, (r.cb + r.n_tok - 1) // 16
        exp[r.doc_id] = (r.n_tok, r.cb, first, last, last - first + 1)
    assert got == exp
    # gapless tape + at least one straddling doc at capacity 16
    ordered = sorted(rows, key=lambda r: (r.cum_before, r.doc_id))
    for a, b in zip(ordered, ordered[1:]):
        assert a.cum_before + a.n_tok == b.cum_before
    assert any(r.n_chunks > 1 for r in rows)
