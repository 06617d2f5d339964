"""Corpus-curation ops: decontamination, bigram-LM scoring, mixture
stats (ops/corpus.py) and triangle counting (ops/graph.py)."""

from __future__ import annotations

from kgspark.ops import corpus
from kgspark.ops.graph import triangle_counts


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_decontaminate_pinned(spark):
    evalset = _docs(spark, [(100, "a b c d e f")])  # 5-grams: abcde, bcdef
    train = _docs(
        spark,
        [
            (0, "a b c d e x"),  # shares "a b c d e" -> 1 of 2
            (1, "z z z z z z"),  # clean -> absent
            (2, "a b c"),  # short doc: whole-text shingle, no hit -> absent
            (3, "a b c d e f"),  # verbatim leak -> 2 of 2
        ],
    )
    out = {r["doc_id"]: r for r in corpus.decontaminate(train, evalset, n=5).collect()}
    assert set(out) == {0, 3}
    assert out[0]["n_hits"] == 1 and out[0]["n_ngrams"] == 2
    assert out[0]["hit_ratio_e6"] == 500000
    assert out[3]["n_hits"] == 2 and out[3]["hit_ratio_e6"] == 1000000


def test_decontaminate_broadcasts_eval_side(spark):
    evalset = _docs(spark, [(100, "a b c d e f")])
    train = _docs(spark, [(0, "a b c d e x")])
    plan = (
        corpus.decontaminate(train, evalset)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the eval n-gram set must reach the screen as a broadcast, never a
    # shuffle of the corpus onto the n-gram key
    assert "BroadcastHashJoin" in plan


def test_bigram_lm_pinned(spark):
    docs = _docs(spark, [(0, "a b"), (1, "a b"), (2, "a c"), (3, "x")])
    # unigrams: a=3 b=2 c=1 x=1; bigrams: "a b"x2, "a c"x1
    out = {r["doc_id"]: r for r in corpus.bigram_lm_score(docs).collect()}
    assert set(out) == {0, 1, 2}  # single-token doc has no bigrams
    assert out[0]["n_bigrams"] == 1 and out[0]["lm_score_e6"] == 666666
    assert out[1]["lm_score_e6"] == 666666
    assert out[2]["lm_score_e6"] == 333333


def test_bigram_lm_repeated_phrase_scores_higher(spark):
    # the corpus-frequent continuation ("the end") outscores the rare one
    docs = _docs(spark, [(i, "the end") for i in range(9)] + [(9, "the start")])
    out = {r["doc_id"]: r["lm_score_e6"] for r in corpus.bigram_lm_score(docs).collect()}
    assert out[0] == 900000 and out[9] == 100000


def test_mixture_stats_pinned(spark):
    rows = [
        (0, "a b c", "s1"),
        (1, "x", "s1"),
        (2, "p q r s", "s2"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["source"]: r for r in corpus.mixture_stats(df).collect()}
    assert out["s1"]["n_docs"] == 2 and out["s1"]["n_tokens"] == 4
    assert out["s2"]["n_tokens"] == 4
    assert out["s1"]["weight_e6"] == 500000 and out["s2"]["weight_e6"] == 500000


def test_c4_filter_signals_match_individual_ops(spark):
    """Drift guard: the composite's single-pass signal columns must equal
    the individually-oracled ops' outputs on the same docs."""
    from kgspark.ops import textstats, webtext

    rows = [
        (0, "the cat was on the mat and it was good " * 3),
        (1, "x y z"),
        (2, "le la et de est le la et de est"),
        (3, "spam spam spam spam spam spam spam"),
        (4, ""),
    ]
    docs = _docs(spark, rows)
    comp = {r["doc_id"]: r for r in corpus.c4_filter(docs).collect()}
    q = {r["doc_id"]: r for r in textstats.quality_score(docs).collect()}
    lg = {r["doc_id"]: r for r in textstats.langid_heuristic(docs).collect()}
    rep = {r["doc_id"]: r for r in webtext.repetition_stats(docs).collect()}
    for i, _ in rows:
        assert comp[i]["quality_e6"] == q[i]["quality_e6"], i
        assert comp[i]["pred_lang"] == lg[i]["pred_lang"], i
        assert comp[i]["dup_2gram_frac_e6"] == rep[i]["dup_2gram_frac_e6"], i


def test_c4_filter_gate_order_and_reasons(spark):
    # doc 3: repetitive AND short -> too_short wins (first failing gate)
    rows = [
        (0, "the cat was on the mat and it was good and the dog was in the house it is fine"),
        (1, "x y z"),
        (2, "le la et de est " * 5),
        (3, "spam spam spam spam"),
    ]
    out = {r["doc_id"]: r for r in corpus.c4_filter(_docs(spark, rows)).collect()}
    assert out[0]["kept"] and out[0]["drop_reason"] == "kept"
    assert out[1]["drop_reason"] == "too_short"
    assert out[2]["drop_reason"] == "lang"  # 25 tokens, French lexicon
    assert out[3]["drop_reason"] == "too_short"  # short beats repetitive


def test_c4_filter_nondegenerate_on_testdata(spark):
    # the sf corpus must exercise keep AND multiple drop branches
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    reasons = {
        r["drop_reason"] for r in corpus.c4_filter(docs).select("drop_reason").distinct().collect()
    }
    assert "kept" in reasons and len(reasons) >= 3, reasons


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "a string, b string")


def test_triangles_pinned_with_pendant(spark):
    e = _edges(spark, [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")])
    out = {r["node"]: r["n_tri"] for r in triangle_counts(e).collect()}
    assert out == {"a": 1, "b": 1, "c": 1}  # pendant d in no triangle


def test_triangles_k4_counts(spark):
    nodes = ["a", "b", "c", "d"]
    e = _edges(
        spark,
        [(u, v) for i, u in enumerate(nodes) for v in nodes[i + 1 :]],
    )
    out = {r["node"]: r["n_tri"] for r in triangle_counts(e).collect()}
    # K4 has 4 triangles; every node sits in C(3,2) = 3 of them
    assert out == {n: 3 for n in nodes}


def test_triangles_normalizes_duplicates_and_orientation(spark):
    e = _edges(spark, [("b", "a"), ("a", "b"), ("b", "c"), ("c", "a")])
    out = {r["node"]: r["n_tri"] for r in triangle_counts(e).collect()}
    assert out == {"a": 1, "b": 1, "c": 1}


def test_triangles_star_has_none(spark):
    # hub star: max-degree node but zero triangles — the degree-oriented
    # enumeration must not fabricate wedge closures
    e = _edges(spark, [("hub", f"leaf{i}") for i in range(6)])
    assert triangle_counts(e).count() == 0


def test_triangles_random_graph_matches_bruteforce(spark):
    """Seeded Erdős–Rényi parity: the degree-oriented enumeration must
    agree with an O(n^3) Python reference on an arbitrary graph — guards
    the orientation algebra (ties between equal-degree nodes included)."""
    import itertools
    import random

    rng = random.Random(7)
    nodes = [f"n{i}" for i in range(12)]
    pairs = [(a, b) for a, b in itertools.combinations(nodes, 2) if rng.random() < 0.35]
    adj = {n: set() for n in nodes}
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    expected = {}
    for a, b, c in itertools.combinations(nodes, 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for v in (a, b, c):
                expected[v] = expected.get(v, 0) + 1
    assert sum(expected.values()) > 0  # non-degenerate fixture
    out = {r["node"]: r["n_tri"] for r in triangle_counts(_edges(spark, pairs)).collect()}
    assert out == expected


def test_decontaminate_random_corpus_matches_set_arithmetic(spark):
    """Seeded parity vs pure-Python n-gram set arithmetic (n=3): the
    broadcast screen must count exactly the distinct train n-grams present
    in the eval n-gram union."""
    import random

    rng = random.Random(11)
    vocab = ["a", "b", "c", "d", "e"]
    texts = [" ".join(rng.choice(vocab) for _ in range(rng.randint(1, 12))) for _ in range(40)]

    def grams(t, n=3):
        toks = t.split(" ")
        if len(toks) <= n:
            return {" ".join(toks)}
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    train = _docs(spark, list(enumerate(texts[:30])))
    evalset = _docs(spark, [(100 + i, t) for i, t in enumerate(texts[30:])])
    ev_union = set().union(*(grams(t) for t in texts[30:]))
    expected = {}
    for i, t in enumerate(texts[:30]):
        g = grams(t)
        hits = len(g & ev_union)
        if hits:
            expected[i] = (hits, len(g), hits * 1000000 // len(g))
    assert expected  # non-degenerate fixture
    out = {
        r["doc_id"]: (r["n_hits"], r["n_ngrams"], r["hit_ratio_e6"])
        for r in corpus.decontaminate(train, evalset, n=3).collect()
    }
    assert out == expected


def test_bigram_lm_random_corpus_matches_counts(spark):
    """Seeded parity vs Python bigram/unigram counting with the same
    int64 integral division."""
    import collections
    import random

    rng = random.Random(13)
    vocab = ["x", "y", "z", "w"]
    texts = [" ".join(rng.choice(vocab) for _ in range(rng.randint(1, 8))) for _ in range(25)]
    uni = collections.Counter(t for s in texts for t in s.split(" "))
    bi = collections.Counter(
        (toks[i], toks[i + 1])
        for s in texts
        for toks in [s.split(" ")]
        for i in range(len(toks) - 1)
    )
    expected = {}
    for i, s in enumerate(texts):
        toks = s.split(" ")
        bgs = [(toks[j], toks[j + 1]) for j in range(len(toks) - 1)]
        if bgs:
            expected[i] = (
                len(bgs),
                sum(bi[g] * 1000000 // uni[g[0]] for g in bgs),
            )
    out = {
        r["doc_id"]: (r["n_bigrams"], r["lm_score_e6"])
        for r in corpus.bigram_lm_score(_docs(spark, list(enumerate(texts)))).collect()
    }
    assert out == expected


def test_bigram_lm_plan_single_stream_join(spark):
    """r7 re-plan pin (r6 verdict #2): the (doc, bigram, cnt) stream joins
    exactly once, against a pre-built bigram->score_e6 lookup — the
    outermost join must be the stream-vs-lookup join on `bigram`, with the
    vocab-sized bi-join-uni (`w1`) folded inside the lookup side."""
    docs = spark.createDataFrame(
        [(i, "a b c a b " + ("x " * (i % 4))) for i in range(40)],
        "doc_id long, text string",
    )
    q = corpus.bigram_lm_score(docs)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "score_e6" in plan, plan  # lookup materialized before the join
    join_lines = [ln for ln in plan.splitlines() if "Join" in ln]
    assert len(join_lines) == 2, plan
    # outermost (first printed) join is the stream join on bigram, not w1
    assert "bigram" in join_lines[0] and "w1" not in join_lines[0], join_lines
    assert "w1" in join_lines[1], join_lines
