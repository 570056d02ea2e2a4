"""Adversarial parity check with an INDEPENDENT gold.

The main e2e test scores the pipeline against gold built from the same
kernel modules — strong on plumbing, weak on shared-bug blindness.
This test derives expected triples straight from the annotation table
(each (url, sent_idx) row names its drug/effect pair by construction)
using only a literal transcription of the reference normalization
chain — no remediner_spark.kernels imports — and requires the full
distributed pipeline to match at P/R >= 0.95 (BASELINE.json:2).
"""

from __future__ import annotations

import pandas as pd
import pytest

from remediner_spark.metrics import triple_precision_recall
from remediner_spark.operators.ner import extract_triples_stage
from remediner_spark.operators.text import filter_language

_REF_PATTERN = (
    r"('s\b)|(?!(?:\b\w+\b|\d+(?:\.\d+)?|[a-zA-Z]=\d+(?:\.\d+)?))"
    r"([^\w\s\'.=]|(?<!\d)\.(?!\d))"
)


def _ref_normalize(s: pd.Series) -> pd.Series:
    s = s.str.strip()
    s = s.str.replace(_REF_PATTERN, " ", regex=True)
    s = s.str.replace("'", "", regex=True)
    s = s.str.replace(r"\.\s*$", "", regex=True)
    s = s.str.replace(r"\s+", " ", regex=True)
    s = s.str.replace(r"(\b\w)\s*=\s*", r"\1=", regex=True)
    return s


def independent_gold(ann: pd.DataFrame) -> pd.DataFrame:
    """One CAUSES triple per annotation ROW (multi-pair sentences carry
    several rows), surfaces normalized by the reference chain and
    lowercased — no engine kernels involved."""
    out = ann.copy()
    out["subj"] = _ref_normalize(out["drug"]).str.strip().str.lower()
    out["obj"] = _ref_normalize(out["effect"]).str.strip().str.lower()
    out["pred"] = "CAUSES"
    return out[["url", "sent_idx", "subj", "pred", "obj"]]


@pytest.mark.parametrize("n_pages", [400])
def test_pipeline_matches_independent_gold(spark, n_pages):
    from remediner_spark.plans.pipeline import default_tagger_bc
    from remediner_spark.sources.corpus import generate_pages

    pages_pdf, ann = generate_pages(n_pages)
    pages = spark.createDataFrame(pages_pdf)
    triples = extract_triples_stage(
        filter_language(pages), default_tagger_bc(spark)
    )
    gold = spark.createDataFrame(independent_gold(ann))
    scores = triple_precision_recall(triples, gold)
    assert scores["n_gold"] > 200
    assert scores["precision"] >= 0.95, scores
    assert scores["recall"] >= 0.95, scores
