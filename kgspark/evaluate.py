"""Triple-set evaluation: precision / recall vs a golden triple set.

The correctness gate of the north rule: emitted (subj, pred, obj) triples
must match the reference-shaped golden set at P/R >= 0.95. Comparison is
set-based on distinct (subj, pred, obj, src_url) — the reference's
expected-count validation (SURVEY.md §5) made exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

KEY = ["subj", "pred", "obj", "src_url"]


def precision_recall(triples: DataFrame, golden: DataFrame) -> dict[str, float]:
    t = triples.select(KEY).distinct().cache()
    g = golden.select(KEY).distinct().cache()
    nt, ng = t.count(), g.count()
    tp = t.join(g, KEY, "inner").count()
    return {
        "emitted": nt,
        "golden": ng,
        "true_positives": tp,
        "precision": tp / nt if nt else 0.0,
        "recall": tp / ng if ng else 0.0,
    }
