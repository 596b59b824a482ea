"""Differential fuzz for the KG query layer: bgp_match and
property_path vs naive pure-Python evaluators on random tiny graphs.

The Python evaluators are deliberately brute-force (nested loops over
binding dicts / iterated squaring of a pair set) — independent of any
join-order, gate, or distinct logic in the Spark implementations, so a
divergence pins a real planner bug rather than a shared assumption."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from jsonld_spark.operators.bgp import bgp_match
from jsonld_spark.operators.paths import property_path

SUBJ = ["s0", "s1", "s2"]
PRED = ["p0", "p1"]
OBJ = ["s0", "s1", "o0", "o1"]  # overlap with subjects → joinable chains
VARS = ["?x", "?y", "?z"]

triple_st = st.tuples(
    st.sampled_from(SUBJ), st.sampled_from(PRED), st.sampled_from(OBJ)
)
term_st = st.sampled_from(VARS + SUBJ + PRED + OBJ)
pattern_st = st.tuples(term_st, term_st, term_st)


def _match(pat, triple, binding):
    b = dict(binding)
    for term, val in zip(pat, triple):
        if term.startswith("?"):
            if b.get(term, val) != val:
                return None
            b[term] = val
        elif term != val:
            return None
    return b


def _eval_bgp(triples, patterns):
    sols = [{}]
    for pat in patterns:
        sols = [
            m
            for b in sols
            for t in triples
            if (m := _match(pat, t, b)) is not None
        ]
        # dedup binding dicts (set semantics per prefix keeps this small)
        sols = [dict(t) for t in {tuple(sorted(b.items())) for b in sols}]
    vars_ = sorted(
        {t[1:] for pat in patterns for t in pat if t.startswith("?")}
    )
    return {tuple(b["?" + v] for v in vars_) for b in sols}, vars_


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    triples=st.lists(triple_st, min_size=0, max_size=8),
    patterns=st.lists(pattern_st, min_size=1, max_size=3),
)
def test_bgp_match_vs_naive(spark, triples, patterns):
    df = spark.createDataFrame(
        triples or [("_", "_", "_")], "subj string, pred string, obj string"
    )
    if not triples:
        df = df.filter("subj <> '_'")
    expected, vars_ = _eval_bgp(triples, patterns)
    out = bgp_match(df, patterns, allow_cartesian=True)
    assert sorted(out.columns) == vars_
    got = {tuple(r[v] for v in vars_) for r in out.collect()}
    assert got == expected, (triples, patterns)


def _pairs(triples, pred):
    return {(s, o) for s, p, o in triples if p == pred}


def _closure(pairs):
    out = set(pairs)
    while True:
        nxt = out | {(a, d) for a, b in out for c, d in out if b == c}
        if nxt == out:
            return out
        out = nxt


def _eval_path(triples, path):
    if isinstance(path, str):
        return _pairs(triples, path)
    op, *args = path
    if op == "inv":
        return {(b, a) for a, b in _eval_path(triples, args[0])}
    if op == "seq":
        cur = _eval_path(triples, args[0])
        for step in args[1:]:
            nxt = _eval_path(triples, step)
            cur = {(a, d) for a, b in cur for c, d in nxt if b == c}
        return cur
    if op == "alt":
        out = set()
        for b in args:
            out |= _eval_path(triples, b)
        return out
    if op == "plus":
        return _closure(_eval_path(triples, args[0]))
    nodes = {t[0] for t in triples} | {t[2] for t in triples}
    ident = {(n, n) for n in nodes}
    if op == "star":
        return _closure(_eval_path(triples, args[0])) | ident
    if op == "opt":
        return _eval_path(triples, args[0]) | ident
    raise AssertionError(op)


path_st = st.recursive(
    st.sampled_from(PRED),
    lambda inner: st.one_of(
        st.tuples(st.just("inv"), inner),
        st.tuples(st.just("seq"), inner, inner),
        st.tuples(st.just("alt"), inner, inner),
        st.tuples(st.just("plus"), inner),
        st.tuples(st.just("star"), inner),
        st.tuples(st.just("opt"), inner),
    ),
    max_leaves=3,
)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    triples=st.lists(triple_st, min_size=1, max_size=7),
    path=path_st,
)
def test_property_path_vs_naive(spark, triples, path):
    df = spark.createDataFrame(
        triples, "subj string, pred string, obj string"
    )
    expected = _eval_path(triples, path)
    got = {
        (r.src, r.dst)
        for r in property_path(df, path, max_iter=10).collect()
    }
    assert got == expected, (triples, path)


# --- forward_chain vs naive datalog fixpoint ---------------------------------


def _naive_saturate(triples, rules, max_rounds=12):
    known = set(triples)
    for _ in range(max_rounds):
        new = set()
        for body, head in rules:
            sols, vars_ = _eval_bgp(sorted(known), body)
            for sol in sols:
                b = dict(zip(["?" + v for v in vars_], sol))
                for t in head:
                    fact = tuple(b.get(term, term) for term in t)
                    if fact not in known:
                        new.add(fact)
        if not new:
            return known
        known |= new
    return known


rule_head_terms = st.sampled_from(VARS[:2] + PRED + ["hN"])


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    triples=st.lists(triple_st, min_size=1, max_size=6),
    p1=st.sampled_from(PRED),
    p2=st.sampled_from(PRED),
    hp=st.sampled_from(PRED),
)
def test_forward_chain_vs_naive(spark, triples, p1, p2, hp):
    # random chain rule: (?x p1 ?y) ∧ (?y p2 ?z) → (?x hp ?z) — the
    # shape (join + projection) that exercises the semi-naive deltas
    rules = [
        (
            [("?x", p1, "?y"), ("?y", p2, "?z")],
            [("?x", hp, "?z")],
        )
    ]
    from jsonld_spark.operators.bgp import forward_chain

    df = spark.createDataFrame(
        triples, "subj string, pred string, obj string"
    )
    expected = _naive_saturate(triples, rules)
    got = {
        (r.subj, r.pred, r.obj) for r in forward_chain(df, rules).collect()
    }
    assert got == expected, (triples, rules)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    triples=st.lists(triple_st, min_size=2, max_size=6, unique=True),
    split=st.integers(min_value=1, max_value=5),
    p1=st.sampled_from(PRED),
    hp=st.sampled_from(PRED),
)
def test_incremental_equals_full_saturation(spark, triples, split, p1, hp):
    # saturate(T) == incremental(saturate(T0), T \ T0) for any split —
    # the monotone-maintenance contract
    from jsonld_spark.operators.bgp import (
        forward_chain,
        forward_chain_incremental,
    )

    split = min(split, len(triples) - 1)
    t0, extra = triples[:split], triples[split:]
    rules = [
        (
            [("?x", p1, "?y"), ("?y", p1, "?z")],
            [("?x", hp, "?z")],
        )
    ]
    cols = "subj string, pred string, obj string"
    full = forward_chain(spark.createDataFrame(triples, cols), rules)
    base = forward_chain(spark.createDataFrame(t0, cols), rules)
    inc = forward_chain_incremental(
        base, spark.createDataFrame(extra, cols), rules
    )
    f = {(r.subj, r.pred, r.obj) for r in full.collect()}
    i = {(r.subj, r.pred, r.obj) for r in inc.collect()}
    assert f == i, (triples, split, rules)


# --- expression-layer fuzz: FILTER vs a naive Python evaluator -----------------

LANGS = [None, "en", "en-us", "EN-GB", "de", ""]
DTS = [None, "http://www.w3.org/2001/XMLSchema#integer"]
LEX = ["1", "25", "300", "abc", "s0"]

term_row_st = st.tuples(
    st.sampled_from(SUBJ),
    st.sampled_from(PRED),
    st.sampled_from(LEX),
    st.booleans(),             # obj_is_literal
    st.sampled_from(LANGS),
    st.sampled_from(DTS),
)


def _naive_lang(lit, lg):
    return (lg or "") if lit else None


def _naive_langmatches(tag, rng):
    if tag is None:
        return None
    if rng == "*":
        return tag != ""
    t, r = tag.lower(), rng.lower()
    return t == r or t.startswith(r + "-")


def _naive_num(lex):
    try:
        return float(lex)
    except (TypeError, ValueError):
        return None


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(term_row_st, min_size=0, max_size=10),
    rng=st.sampled_from(["*", "en", "EN", "de", "en-us"]),
    lo=st.integers(min_value=0, max_value=30),
)
def test_bgp_filter_vs_naive(spark, rows, rng, lo):
    """langMatches(lang(?o), rng) OR num(?o) >= lo — mixed boolean
    expression with NULL (SPARQL error) propagation: a row survives iff
    the naive three-valued evaluation is exactly True."""
    from jsonld_spark.operators.bgp import (
        bgp_filter, bgp_match, lang, lang_matches, num,
    )

    # lang tags only make sense on literals: clear lang for non-literals
    rows = [
        (s, p, o, lit, lg if lit else None, dt if lit else None)
        for (s, p, o, lit, lg, dt) in rows
    ]
    cols = (
        "subj string, pred string, obj string, obj_is_literal boolean, "
        "obj_lang string, obj_datatype string"
    )
    df = spark.createDataFrame(
        rows or [("_", "_", "_", False, None, None)], cols
    )
    if not rows:
        df = df.filter("subj <> '_'")
    b = bgp_match(df, [("?s", "p0", "?o")], bind_meta=True)
    out = bgp_filter(
        b, lang_matches(lang("o"), rng) | (num("o") >= float(lo))
    )
    # set compare: two term variants (e.g. IRI '1' and literal '1') are
    # distinct SOLUTIONS but identical (s, o) projections
    got = sorted({(r.s, r.o) for r in out.collect()})

    def naive_keep(lit, lg, lex):
        a = _naive_langmatches(_naive_lang(lit, lg), rng)
        n = _naive_num(lex)
        c = None if n is None else n >= lo
        # SQL three-valued OR
        if a is True or c is True:
            return True
        return False

    expected = sorted(
        {(s, o) for (s, p, o, lit, lg, dt) in rows
         if p == "p0" and naive_keep(lit, lg, o)}
    )
    assert got == expected, (rows, rng, lo)
