"""M10 end-to-end: token-level confusion + macro PRF over the corpus.

Runs the tagging stage on real corpus sentences, joins word-level
predictions with the gold IOB (kernel A1 over the annotation table),
aggregates the confusion distributively and computes the reference's
macro metrics (/root/reference/src/NER/train_eval_ner.py:35-56
semantics). Also exercises the S6 sink on the resulting matrix.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from remediner_spark.kernels.iob import LABEL_ID, iob_tag_text
from remediner_spark.kernels.loss import plot_confusion
from remediner_spark.kernels.normalize import normalize_annotated_frame
from remediner_spark.metrics import confusion_counts, macro_prf_from_confusion
from remediner_spark.operators.ner import tag_sentences_stage
from remediner_spark.operators.text import filter_language, segmented_sentences
from remediner_spark.sources.corpus import generate_pages


def gold_label_ids(ann: pd.DataFrame) -> pd.DataFrame:
    norm = normalize_annotated_frame(ann)
    grouped = (
        norm.groupby(["url", "sent_idx"])
        .agg(text=("text", "first"), drug=("drug", list), effect=("effect", list))
        .reset_index()
    )
    rows = []
    for rec in grouped.itertuples(index=False):
        tags = iob_tag_text(rec.text, rec.drug, rec.effect)
        rows.append(
            (rec.url, int(rec.sent_idx), [LABEL_ID[t] for t in tags])
        )
    return pd.DataFrame(rows, columns=["url", "sent_idx", "label_ids"])


def test_token_level_eval_e2e(spark, tmp_path):
    from remediner_spark.plans.pipeline import default_tagger_bc

    pages_pdf, ann = generate_pages(200)
    pages = spark.createDataFrame(pages_pdf)
    sents = segmented_sentences(filter_language(pages))
    tagged = tag_sentences_stage(sents, default_tagger_bc(spark)).select(
        "url",
        "sent_idx",
        F.transform(
            "iob",
            lambda t: (
                F.when(t == "B-Drug", 1)
                .when(t == "I-Drug", 2)
                .when(t == "B-Effect", 3)
                .when(t == "I-Effect", 4)
                .otherwise(0)
            ).cast("int"),
        ).alias("pred_ids"),
    )
    gold = spark.createDataFrame(gold_label_ids(ann))
    joined = tagged.join(gold, ["url", "sent_idx"]).filter(
        F.size("pred_ids") == F.size("label_ids")
    )
    counts = confusion_counts(joined).toPandas()
    metrics = macro_prf_from_confusion(counts)
    # gazetteer vs its own gold lexicon: near-perfect diagonal, but the
    # gazetteer tags ALL occurrences while gold tags first occurrences
    # only (repeated-mention template) -> small, real off-diagonal mass
    assert metrics["macro_precision"] > 0.9, metrics
    assert metrics["macro_recall"] > 0.97, metrics
    cm = metrics["confusion_normalized"]
    assert cm[1][1] > 0.9 and cm[3][3] > 0.9  # B-Drug, B-Effect
    out = plot_confusion(
        cm, ["O", "B-Drug", "I-Drug", "B-Effect", "I-Effect"],
        str(tmp_path / "confusion"),
    )
    assert out.endswith((".png", ".txt"))
