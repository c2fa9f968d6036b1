"""Property-based tests (hypothesis): the compiler equivalences and
wt-interval invariants under generated inputs — deeper fuzz than the
seeded randomized tests."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from flink_rtcef_spark.models.wt import WtDistribution
from flink_rtcef_spark.plans.automata import build_nfa, determinize, formula_alphabet
from flink_rtcef_spark.plans.rewrite import apply_selection
from flink_rtcef_spark.plans.sre_ast import (
    Choice,
    Declarations,
    Iter,
    Neg,
    Predicate,
    Sent,
    Seq,
    SkipTillAny,
    SkipTillNext,
)

ATOMS = [Predicate("IsEventTypePredicate", (t,)) for t in ("A", "B", "C")]
DECLS = Declarations(extras=[list(ATOMS)], exclusives=[list(ATOMS)])


def formula_strategy(depth: int = 0):
    leaf = st.sampled_from(ATOMS).map(Sent)
    if depth >= 3:
        return leaf
    sub = st.deferred(lambda: formula_strategy(depth + 1))
    return st.one_of(
        leaf,
        st.lists(sub, min_size=2, max_size=3).map(lambda xs: Seq(tuple(xs))),
        st.lists(sub, min_size=2, max_size=3).map(lambda xs: Choice(tuple(xs))),
        sub.map(Iter),
        *([sub.map(Neg), sub.map(SkipTillAny), sub.map(SkipTillNext)] if depth < 2 else []),
    )


def sym_of(minterms, t):
    key = Predicate("IsEventTypePredicate", (t,)).key()
    for i, mt in enumerate(minterms):
        d = mt.as_dict()
        if d[key] and sum(d.values()) == 1:
            return i
    raise AssertionError


@settings(max_examples=60, deadline=None)
@given(formula_strategy(), st.lists(st.sampled_from("ABC"), max_size=10))
def test_nfa_sdfa_agree(formula, types):
    formula = apply_selection(formula)
    atoms, minterms = formula_alphabet(formula, DECLS)
    nfa = build_nfa(formula, minterms, streaming=False)
    sdfa = determinize(nfa, len(minterms))
    word = [sym_of(minterms, t) for t in types]
    assert nfa.accepts(word) == sdfa.accepts(word)


@settings(max_examples=60, deadline=None)
@given(formula_strategy(), st.lists(st.sampled_from("ABC"), min_size=1, max_size=12))
def test_streaming_detection_equals_suffix_oracle(formula, types):
    formula = apply_selection(formula)
    atoms, minterms = formula_alphabet(formula, DECLS)
    plain = build_nfa(formula, minterms, streaming=False)
    sdfa = determinize(build_nfa(formula, minterms, streaming=True), len(minterms))
    word = [sym_of(minterms, t) for t in types]
    state = sdfa.start
    for t in range(len(word)):
        state = int(sdfa.delta[state, word[t]])
        oracle = any(plain.accepts(word[s : t + 1]) for s in range(t + 2))
        assert (state in sdfa.finals) == oracle


@st.composite
def wt_strategy(draw):
    h = draw(st.integers(min_value=2, max_value=12))
    raw = draw(
        st.lists(
            st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
            min_size=h,
            max_size=h,
        )
    )
    total = sum(raw) or 1.0
    scale = draw(st.floats(min_value=0.3, max_value=1.0))
    return WtDistribution({i + 1: v / total * scale for i, v in enumerate(raw)})


@settings(max_examples=100, deadline=None)
@given(
    wt_strategy(),
    st.floats(min_value=0.05, max_value=0.95),
)
def test_interval_builders_invariants(wt, threshold):
    h = wt.horizon
    for method in ("argmax", "fullscan", "smartscan", "fixedspread"):
        fc = wt.forecast(method, threshold, max(h - 1, 1))
        if fc.valid:
            assert 1 <= fc.start <= fc.end <= h
            # reported probability matches the interval mass
            assert abs(fc.prob - wt.slice_prob(fc.start, fc.end)) < 1e-9
    # fullscan and smartscan agree on the minimal interval spread
    full = wt.forecast("fullscan", threshold, h)
    smart = wt.forecast("smartscan", threshold, h)
    assert full.valid == smart.valid
    if full.valid:
        assert (full.end - full.start) == (smart.end - smart.start)
    # classify_nextk probability is the prefix mass; empty distributions
    # yield the invalid Forecast (WtDistribution.buildForecast isEmpty)
    k = max(1, h // 2)
    fc = wt.forecast("classify_nextk", threshold, k)
    if wt.is_empty():
        assert not fc.valid
    else:
        assert abs(fc.prob - wt.slice_prob(1, k)) < 1e-9
        assert fc.positive == (fc.prob >= threshold)


# ---------------------------------------------------------------- NSRA fuzz
@settings(max_examples=60, deadline=None)
@given(
    events=st.lists(
        st.tuples(st.sampled_from("AB"), st.integers(0, 2)), min_size=1, max_size=25
    ),
    window=st.integers(2, 5),
)
def test_nsra_register_runtime_vs_derivational(events, window):
    """The configuration-set runtime must agree with the independent
    derivational matcher on generated event sequences and windows
    (pattern: stored A followed within the window by a B with a larger
    value, under skip-till-any)."""
    import numpy as np

    from flink_rtcef_spark.operators.cep_register import _run_nsra_segment
    from flink_rtcef_spark.plans.nsra import compile_register_pattern
    from flink_rtcef_spark.plans.sre_parser import parse_pattern
    from tests.test_cep_register import _brute_detections, _eval_sent

    pattern = (
        '#(;(IsEventTypePredicate(A)["x"],^(IsEventTypePredicate(B),'
        f'GTAttr(value,"x")))){{partitionBy:k}}{{window:{window}}}'
    )
    cp = compile_register_pattern(pattern)
    formula = apply_selection(parse_pattern(pattern).formula)
    evs = [
        {"_id": i, "event_type": t, "value": float(v)}
        for i, (t, v) in enumerate(events)
    ]
    expected = _brute_detections(formula, evs, window)
    bits = np.array(
        [
            sum((1 << i) for i, a in enumerate(cp.static_atoms) if _eval_sent(a, e, {}))
            for e in evs
        ],
        dtype=np.int64,
    )
    idx = np.arange(len(evs), dtype=np.int64)
    attrs = {a: np.array([e[a] for e in evs]) for a in cp.register_attrs}
    rows, _ = _run_nsra_segment(
        bits, idx, idx, attrs, cp.table, frozenset(cp.nsra.finals),
        cp.start_states, cp.window, cp.window_type,
    )
    assert [(int(r[0]), int(r[3]) - 1) for r in rows] == expected


# --------------------------------------------------------------------------
# temperature_rates invariants (driver-side arithmetic, no Spark)


@given(
    counts=st.dictionaries(
        st.text(st.characters(categories=("Ll",)), min_size=1, max_size=4),
        st.integers(min_value=1, max_value=10**9),
        min_size=1,
        max_size=8,
    ),
    alpha=st.floats(min_value=0.0, max_value=2.0, allow_nan=False),
)
@settings(max_examples=200, deadline=None)
def test_temperature_rates_invariants(counts, alpha):
    from flink_rtcef_spark.operators.sampling import temperature_rates

    rates = temperature_rates(counts, alpha)
    # every rate is a valid bernoulli probability and the scaling is
    # tight: at least one source is kept whole
    assert all(0.0 < r <= 1.0 + 1e-9 for r in rates.values())
    assert max(rates.values()) > 1.0 - 1e-9
    # sampled mass proportional to count^alpha: the ratio
    # (rate_i * c_i) / c_i^alpha must be constant across sources
    ref = None
    for s, r in rates.items():
        v = (r * counts[s]) / counts[s] ** alpha if counts[s] ** alpha else 0
        if ref is None:
            ref = v
        assert v == __import__("pytest").approx(ref, rel=1e-6)


@given(
    counts=st.dictionaries(
        st.text(st.characters(categories=("Ll",)), min_size=1, max_size=4),
        st.integers(min_value=1, max_value=10**6),
        min_size=1,
        max_size=6,
    ),
    target=st.integers(min_value=1, max_value=10**6),
)
@settings(max_examples=100, deadline=None)
def test_temperature_rates_target_total_cap(counts, target):
    from flink_rtcef_spark.operators.sampling import temperature_rates

    rates = temperature_rates(counts, 1.0, target_total=target)
    expected = sum(rates[s] * counts[s] for s in rates)
    # expected sampled size never exceeds the cap (and hits it when the
    # corpus is big enough)
    assert expected <= target + 1e-6 * max(1, target)
    if sum(counts.values()) >= target:
        assert expected == __import__("pytest").approx(target, rel=1e-6)


# --------------------------------------------------------------- r3 ops --
@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(["ab", "abc", "bc", "a", "cab"]), min_size=1, max_size=6)
        .map(" ".join),
        min_size=1,
        max_size=6,
    ),
    st.integers(min_value=1, max_value=8),
)
def test_bpe_distributed_equals_sequential(spark, texts, n_merges):
    """Distributed BPE training == the sequential reference algorithm
    on arbitrary corpora (freq-weighted, lexicographic ties)."""
    from flink_rtcef_spark.operators.bpe import train_bpe
    from tests.test_bpe import _reference_bpe

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = train_bpe(df, n_merges=n_merges, sample=None)
    want = _reference_bpe(" ".join(texts).split(), n_merges)
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(["x y", "y z", "common tail", "a b"]), min_size=1, max_size=4)
        .map("\n\n".join),
        min_size=1,
        max_size=6,
    )
)
def test_paragraph_dedup_each_content_survives_exactly_once(spark, texts):
    """Corpus-wide invariant: every distinct paragraph content keeps
    exactly ONE instance, and totals are conserved."""
    from flink_rtcef_spark.operators.text import dedup_paragraphs, split_paragraphs

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = dedup_paragraphs(df).collect()
    n_kept_total = sum(r["n_kept"] for r in out)
    n_paras_total = sum(r["n_paras"] for r in out)
    paras = split_paragraphs(df).collect()
    distinct_contents = {r["para"] for r in paras}
    assert n_paras_total == len(paras)
    assert n_kept_total == len(distinct_contents)


@settings(max_examples=8, deadline=None)
@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from("ab c"),
            min_size=0,
            max_size=40,
        ),
        min_size=1,
        max_size=20,
    )
)
def test_exact_dedup_idempotent_and_partition_invariant(spark, texts):
    """dedup(dedup(x)) == dedup(x), and the survivor set is identical
    under any input partitioning (hash-keyed, not position-keyed)."""
    from flink_rtcef_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    once = exact_dedup(df).drop("n_copies")
    ids1 = sorted(r["doc_id"] for r in once.collect())
    twice = exact_dedup(once).drop("n_copies")
    ids2 = sorted(r["doc_id"] for r in twice.collect())
    assert ids1 == ids2
    ids3 = sorted(
        r["doc_id"]
        for r in exact_dedup(df.repartition(7)).drop("n_copies").collect()
    )
    assert ids1 == ids3
    # survivors are exactly the distinct NORMALIZED contents (the
    # operator dedups on lower+trim by design)
    surv_norm = sorted(r["text"].strip().lower() for r in once.collect())
    assert surv_norm == sorted({t.strip().lower() for t in texts})


@settings(max_examples=6, deadline=None)
@given(
    texts=st.lists(
        st.text(alphabet=st.sampled_from("xy z"), min_size=0, max_size=30),
        min_size=1,
        max_size=12,
    )
)
def test_hashed_embedding_partition_and_duplicate_invariants(spark, texts):
    """Equal texts embed identically; embeddings are partitioning-
    invariant (content-hashed, no positional state)."""
    import numpy as np

    from flink_rtcef_spark.operators.embed import hashed_text_embedding

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    a = {
        r["doc_id"]: tuple(r["embedding"])
        for r in hashed_text_embedding(df, dim=16).collect()
    }
    b = {
        r["doc_id"]: tuple(r["embedding"])
        for r in hashed_text_embedding(df.repartition(5), dim=16).collect()
    }
    assert a == b
    by_text = {}
    for i, t in enumerate(texts):
        by_text.setdefault(t, []).append(i)
    for t, ids in by_text.items():
        vecs = {a[i] for i in ids}
        assert len(vecs) == 1, (t, ids)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=400), min_size=1, max_size=200),
)
def test_hll_duplication_and_merge_invariants(spark, values):
    """HLL registers are a pure function of the SET of values: feeding
    duplicates (df UNION df) cannot move the estimate, and the sketch of
    the whole equals the merge of the sketches of any 2-way split."""
    from flink_rtcef_spark.operators.sketch import (
        hll_distinct,
        hll_estimate,
        hll_merge,
        hll_registers,
    )

    df = spark.createDataFrame([(v,) for v in values], "v int")
    est_once = hll_distinct(df, "v").first()["hll_distinct"]
    est_twice = hll_distinct(df.union(df), "v").first()["hll_distinct"]
    assert est_once == est_twice

    a = hll_registers(df.filter("v % 2 = 0"), "v")
    b = hll_registers(df.filter("v % 2 = 1"), "v")
    merged_est = hll_estimate(hll_merge(a, b)).first()["hll_distinct"]
    assert merged_est == est_once


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.text(alphabet="abcxyz", min_size=1, max_size=4),
             min_size=1, max_size=120),
)
def test_cms_upper_bounds_truth_on_arbitrary_input(spark, values):
    """CMS estimates never undercount, on arbitrary value multisets;
    and the sketch is invariant to input partitioning."""
    from collections import Counter

    from flink_rtcef_spark.operators.sketch import cms_build, cms_lookup

    df = spark.createDataFrame([(v,) for v in values], "v string")
    probes = df.distinct()
    got = {
        r["v"]: r["cms_count"]
        for r in cms_lookup(cms_build(df, "v"), probes, "v").collect()
    }
    truth = Counter(values)
    for v, n in truth.items():
        assert got[v] >= n, (v, n, got[v])

    re_part = cms_build(df.repartition(7), "v")
    assert re_part.exceptAll(cms_build(df, "v")).count() == 0


@settings(max_examples=8, deadline=None)
@given(
    st.integers(min_value=2, max_value=40),
    st.lists(
        st.tuples(st.integers(0, 39), st.integers(0, 39)).filter(lambda p: p[0] != p[1]),
        max_size=30,
    ),
    st.integers(min_value=0, max_value=3),
)
def test_leakage_safe_split_never_straddles(spark, n_docs, raw_pairs, seed):
    """For ANY pair graph over the corpus, the cluster-aware split has
    zero straddling pairs (including transitive chains) and covers every
    document exactly once."""
    import pyspark.sql.functions as F

    from flink_rtcef_spark.operators.splits import (
        leakage_safe_split,
        split_leakage,
    )

    docs = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    pairs = [(a % n_docs, b % n_docs) for a, b in raw_pairs if a % n_docs != b % n_docs]
    prs = spark.createDataFrame(pairs or [(0, 1)][: n_docs - 1] or [(0, 0)],
                                "id_a long, id_b long")
    if not pairs and n_docs < 2:
        return
    assigned = leakage_safe_split(docs, prs, seed=seed)
    assert assigned.count() == n_docs
    assert assigned.filter("split IS NULL OR cluster IS NULL").count() == 0
    assert split_leakage(assigned, prs).count() == 0


@settings(max_examples=8, deadline=None)
@given(
    st.dictionaries(
        st.sampled_from(["s0", "s1", "s2"]),
        st.floats(min_value=0.0, max_value=4.0, allow_nan=False),
        min_size=1,
        max_size=3,
    ),
    st.integers(min_value=0, max_value=5),
)
def test_epoch_upsample_copies_bracket_weight(spark, weights, seed):
    """For ANY weight map: every doc appears floor(w) or ceil(w) times,
    epochs are 0..n-1, and the assignment is partitioning-invariant."""
    import math

    import pyspark.sql.functions as F

    from flink_rtcef_spark.operators.sampling import epoch_upsample

    df = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(60)], "doc_id long, source string"
    )
    up = epoch_upsample(df, weights, "source", "doc_id", seed=seed)
    per = {
        (r["doc_id"]): r["count"]
        for r in up.groupBy("doc_id").count().collect()
    }
    for i in range(60):
        w = weights.get(f"s{i % 3}", 1.0)
        n = per.get(i, 0)
        assert math.floor(w) <= n <= math.ceil(w), (i, w, n)
    # epochs are exactly 0..n-1 per doc
    bad = (
        up.groupBy("doc_id")
        .agg(F.max("epoch").alias("mx"), F.count("*").alias("n"))
        .filter("mx <> n - 1")
        .count()
    )
    assert bad == 0
    # partitioning-invariant
    up2 = epoch_upsample(df.repartition(13), weights, "source", "doc_id", seed=seed)
    assert up.exceptAll(up2).count() == 0 and up2.exceptAll(up).count() == 0


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 50000)),
        min_size=1,
        max_size=60,
        unique=True,
    ),
    st.integers(min_value=1, max_value=120),
)
def test_session_window_equals_lag_gap_on_random_events(spark, events, gap_s):
    """Native session_window == the LAG-gap SQL formulation for ANY
    event set and gap (same session count, membership, and spans)."""
    import datetime as dt

    import pyspark.sql.functions as F
    from pyspark.sql import Window as W

    from flink_rtcef_spark.streaming.sessions import sessionized

    base = dt.datetime(2024, 1, 1)
    rows = [
        (f"k{k}", i, base + dt.timedelta(seconds=s))
        for i, (k, s) in enumerate(events)
    ]
    df = spark.createDataFrame(rows, "user_id string, event_id long, ts timestamp")

    got = (
        sessionized(df, gap=f"{gap_s} seconds", watermark=None)
        .select("user_id", "n_events", "first_ts", "last_ts")
        .collect()
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    cum = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    want = (
        df.withColumn(
            "new_session",
            F.when(
                F.unix_millis("ts") - F.unix_millis(F.lag("ts").over(w))
                > gap_s * 1000,
                1,
            ).otherwise(0),
        )
        .withColumn("session_id", F.sum("new_session").over(cum))
        .groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
        .select("user_id", "n_events", "first_ts", "last_ts")
        .collect()
    )
    key = lambda r: (r["user_id"], r["first_ts"])
    assert sorted(map(tuple, got), key=lambda t: (t[0], t[2])) == sorted(
        map(tuple, want), key=lambda t: (t[0], t[2])
    )


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 1000), st.integers(0, 400)),
        min_size=1,
        max_size=25,
    ),
    st.lists(
        st.tuples(st.integers(0, 1000), st.integers(0, 400)),
        min_size=1,
        max_size=25,
    ),
    st.sampled_from([7, 64, 333, 5000]),
)
def test_interval_overlap_join_equals_bruteforce(spark, ia, ib, bw):
    """Binned overlap join == the quadratic definition for ANY interval
    sets and bin width, each overlapping pair exactly once."""
    from flink_rtcef_spark.operators.joins import interval_overlap_join

    la = spark.createDataFrame(
        [(i, lo, lo + span) for i, (lo, span) in enumerate(ia)],
        "a_id long, a_lo long, a_hi long",
    )
    rb = spark.createDataFrame(
        [(i, lo, lo + span) for i, (lo, span) in enumerate(ib)],
        "b_id long, b_lo long, b_hi long",
    )
    rows = interval_overlap_join(
        la, rb, "a_lo", "a_hi", "b_lo", "b_hi", bin_width=bw
    ).collect()
    got = [(r["a_id"], r["b_id"]) for r in rows]
    want = {
        (i, j)
        for i, (alo, aspan) in enumerate(ia)
        for j, (blo, bspan) in enumerate(ib)
        if alo <= blo + bspan and blo <= alo + aspan
    }
    assert set(got) == want
    assert len(got) == len(want)  # exactly once, no duplicate emission
