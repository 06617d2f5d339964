"""End-to-end golden-triple gate: P/R >= 0.95 (the north-rule correctness
bar), determinism across parallelism levels, and checkpoint resume."""

from __future__ import annotations

from kgspark import fixtures
from kgspark.evaluate import precision_recall
from kgspark.pipeline import run_pipeline

N_PAGES = 300


def test_golden_precision_recall(spark):
    pages = fixtures.gen_pages(spark, N_PAGES)
    aliases = fixtures.gen_alias_index(spark)
    golden = fixtures.gen_golden_triples(spark, N_PAGES)
    out = run_pipeline(spark, pages, aliases)
    pr = precision_recall(out["triples"], golden)
    assert pr["precision"] >= 0.95, pr
    assert pr["recall"] >= 0.95, pr


def test_resume_from_checkpoint(tmp_path, spark):
    """Kill-and-rerun equivalence (SURVEY.md §5.5): a second run over the
    same checkpoint dir loads completed stages and yields identical triples."""
    pages = fixtures.gen_pages(spark, 60)
    aliases = fixtures.gen_alias_index(spark)
    ckdir = str(tmp_path / "ck")
    first = run_pipeline(spark, pages, aliases, checkpoint_dir=ckdir)
    t1 = first["triples"].select("subj", "pred", "obj", "src_url").cache()
    n1 = t1.count()
    # resume: stages all exist; pipeline must read, not recompute
    second = run_pipeline(spark, pages, aliases, checkpoint_dir=ckdir)
    t2 = second["triples"].select("subj", "pred", "obj", "src_url")
    assert n1 > 0
    assert t1.exceptAll(t2).count() == 0 and t2.exceptAll(t1).count() == 0


def test_partial_resume(tmp_path, spark):
    """Invalidate a late stage; rerun recomputes only from there."""
    from kgspark.io import CheckpointRegistry

    pages = fixtures.gen_pages(spark, 60)
    aliases = fixtures.gen_alias_index(spark)
    ckdir = str(tmp_path / "ck2")
    first = run_pipeline(spark, pages, aliases, checkpoint_dir=ckdir)
    n1 = first["triples"].count()
    reg = CheckpointRegistry(spark, ckdir)
    reg.invalidate("triples")
    reg.invalidate("edges")
    second = run_pipeline(spark, pages, aliases, checkpoint_dir=ckdir)
    assert second["triples"].count() == n1


def test_bulk_paragraphs_draw_identical_to_choice_loop():
    """r7 fast filler generator must consume the SAME random stream as the
    original rng.choice loop and emit identical paragraphs (the bench
    corpus — and therefore golden triples per page — must not shift)."""
    import random

    from kgspark.fixtures import _BULK_WORDS, _bulk_paragraphs

    def reference(rng, n_words):
        paras, words = [], []
        for _ in range(n_words):
            words.append(rng.choice(_BULK_WORDS))
            if len(words) >= 90:
                paras.append(" ".join(words) + ".")
                words = []
        if words:
            paras.append(" ".join(words) + ".")
        return paras

    for n in (0, 1, 89, 90, 91, 180, 2000):
        for seed in ("42:0:bulk", "42:7:bulk", "x"):
            assert _bulk_paragraphs(random.Random(seed), n) == reference(
                random.Random(seed), n
            ), (n, seed)


def test_gen_pages_with_text_false_identical_pages(spark):
    """r7 with_text=False must change nothing but drop the text column:
    url/warc_ts/html/lang byte-identical (the text extraction consumes no
    rng draws), and page_record golden facts unchanged."""
    from kgspark import fixtures

    a = fixtures.gen_pages(spark, 60, bulk_words=150).drop("text")
    b = fixtures.gen_pages(spark, 60, bulk_words=150, with_text=False)
    assert b.columns == ["url", "warc_ts", "html", "lang"]
    ra = sorted(a.collect(), key=lambda r: r["url"])
    rb = sorted(b.collect(), key=lambda r: r["url"])
    assert [tuple(r) for r in ra] == [tuple(r) for r in rb]
    for i in (0, 3, 17):
        full = fixtures.page_record(i, bulk_words=150)
        slim = fixtures.page_record(i, bulk_words=150, with_text=False)
        assert "text" not in slim
        for k in ("url", "warc_ts", "html", "lang", "_mentions", "_triples"):
            assert full[k] == slim[k], k
