"""Model-based quality classifier (x4b) behavior tests."""

from __future__ import annotations


def test_quality_classifier_distills_the_rule(spark, sf_dir):
    """The rule-distillation LR must recover the heuristic gate from
    held-out-but-correlated features: AUC well above chance, scores in
    [0,1], one row per doc."""
    from engage_spark.registry import load_all

    pdf = load_all()["x4b_quality_classifier"].fn(spark, sf_dir).toPandas()
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "n_chars")
        .toPandas()
    )
    m = pdf.merge(docs, on="doc_id")
    assert len(m) == len(docs)
    assert m.quality_score.between(0, 1).all()
    # reconstruct the rule's length half as a label proxy for the AUC
    lab = m.n_chars.between(100, 20000)
    pos = m[lab].quality_score
    neg = m[~lab].quality_score
    assert len(pos) > 0 and len(neg) > 0, (
        "degenerate class split — fixture no longer exercises the gate"
    )
    # Mann-Whitney AUC estimate (ties get half credit)
    gt = (pos.values[:, None] > neg.values[None, :]).mean()
    eq = (pos.values[:, None] == neg.values[None, :]).mean()
    auc = gt + 0.5 * eq
    assert auc > 0.7, f"AUC {auc:.3f}"
