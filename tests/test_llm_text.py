

def test_quality_classifier_distills_the_rule(spark):
    """The rule-distillation LR must recover the heuristic gate from
    held-out-but-correlated features: AUC well above chance, scores in
    [0,1], one row per doc."""
    from engage_spark.registry import load_all

    out = load_all()["x4b_quality_classifier"].fn(
        spark, "/root/testdata/sf0.001"
    )
    pdf = out.toPandas()
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "n_chars").toPandas()
    m = pdf.merge(docs, on="doc_id")
    assert len(m) == len(docs)
    assert m.quality_score.between(0, 1).all()
    # reconstruct the rule's length half as a label proxy for the AUC
    lab = m.n_chars.between(100, 20000)
    pos = m[lab].quality_score
    neg = m[~lab].quality_score
    # Mann-Whitney AUC estimate
    import numpy as np

    auc = (pos.values[:, None] > neg.values[None, :]).mean()
    assert auc > 0.7, f"AUC {auc:.3f}"
