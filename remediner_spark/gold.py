"""Driver-side gold generation — pure-pandas port of the reference path.

Gold triples are what the reference's composed inference pipeline
(entry point 3: NER -> M3 reconstruction -> RE pairing,
/root/reference/src/FINALMODEL/final_model.py:16-36) emits per
sentence given ideal NER: normalization -> first-occurrence IOB spans
(A1) -> per-sentence mask reconstruction -> positional relation
pairing (M6). Note this is the *inference-path* (stateless) masking;
the training-prep variant with cross-row state
(/root/reference/src/RE/data_utilities_re.py:42) is ported separately
in kernels.mask.mask_texts_batch and covered by its own unit tests.
"""

from __future__ import annotations

import pandas as pd

from .kernels.iob import iob_tag_text
from .kernels.normalize import normalize_annotated_frame
from .kernels.pairing import PRED_CAUSES
from .kernels.reconstruct import mentions_from_word_iob


def pair_mentions_positional(mentions: list[dict]) -> list[tuple[str, str, str]]:
    """Deterministic RE semantics: k-th unique drug pairs with k-th
    unique effect (surfaces deduped keeping first occurrence), the
    per-sentence specialization of the reference's relation-group gold
    (/root/reference/src/RE/data_utilities_re.py:24-40)."""
    drugs: list[str] = []
    effects: list[str] = []
    for m in mentions:
        target = drugs if m["type"] == "DRUG" else effects
        surface = m["surface"].lower()
        if surface not in target:
            target.append(surface)
    return [
        (d, PRED_CAUSES, e) for d, e in zip(drugs, effects)
    ]


def gold_triples(ann: pd.DataFrame) -> pd.DataFrame:
    """ade_annotations -> gold triple frame (url, sent_idx, subj, pred, obj)."""
    norm = normalize_annotated_frame(ann)
    # group relation rows of the same sentence (fixtures are 1 pair per
    # sentence, but the grouping keeps multi-pair sentences correct)
    grouped = (
        norm.groupby(["url", "sent_idx"])
        .agg(text=("text", "first"), drug=("drug", list), effect=("effect", list))
        .reset_index()
    )
    rows = []
    for rec in grouped.itertuples(index=False):
        tags = iob_tag_text(rec.text, rec.drug, rec.effect)
        _, mentions = mentions_from_word_iob(rec.text.split(), tags)
        for s, p, o in pair_mentions_positional(mentions):
            rows.append((rec.url, rec.sent_idx, s, p, o))
    return pd.DataFrame(
        rows, columns=["url", "sent_idx", "subj", "pred", "obj"]
    ).astype({"sent_idx": "int32"})
