"""In-engine fine-tune of the 5-class NER head (§2.5, minimal in-band
form).

The reference trains with a two-stage HuggingFace Trainer loop
(/root/reference/src/NER/train_eval_ner.py:73-150,
/root/reference/src/RE/train_eval_re.py:57-147) whose loss is the
masked weighted cross-entropy pinned in kernels/loss.py. Full in-band
BERT fine-tuning needs torch (absent); what IS expressible in the
engine — and the standard frozen-encoder recipe — is training the
per-token linear classification head on frozen encoder features, with
the exact reference loss semantics (class weights, -100 masking,
weighted-mean reduction).

Distributed shape (holds at 10^12 docs):

* ``encode_features`` — ONE map-only ``mapInPandas`` pass running the
  frozen numpy encoder (broadcast weights, per-executor singleton) and
  emitting per-row (hidden states, labels); persisted/written once,
  reused every epoch — the encoder never re-runs inside the loop.
* ``fit_ner_head`` — full-batch gradient descent. Each step broadcasts
  the (tiny, d×C) head, computes per-Arrow-batch float64 gradient
  partials map-side, and reduces ONE row per batch to the driver
  (metadata-grain: #partials == #Arrow batches, independent of row
  width). The weighted-mean denominator is resolved globally on the
  driver (sum of per-batch weight sums), so the update equals the
  single-process full-batch step exactly — no approximation from the
  distribution.

Gradient math (matches kernels.loss.masked_weighted_ce, which matches
torch CrossEntropyLoss(weight=w, ignore_index=-100, reduction='mean')):

    L = sum_i w[y_i] * (-log p_i[y_i]) / sum_i w[y_i]   over unmasked i
    dL/dlogits_i = w[y_i] * (softmax(logits_i) - onehot(y_i)) / denom
    dW = sum_i dlogits_i (outer) h_i ;  db = sum_i dlogits_i

pinned by a finite-difference check against masked_weighted_ce in
tests/test_train.py (an independent derivation of the same loss).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..kernels.loss import IGNORE_INDEX, log_softmax

N_LABELS = 5


# ------------------------------------------------------------- features


def encode_features(
    spark: SparkSession, framed: DataFrame, params_bc
) -> DataFrame:
    """Frozen-encoder feature pass: (ids, attention_mask, label_ids) rows ->
    (h flattened [T*d] float64, labels) rows, one map-only hop.

    ``params_bc`` is a broadcast of the encoder param dict (the same
    object NumpyBertTagger ships); only (ids, attention_mask, label_ids) cross
    the Arrow boundary (CLAUDE.md mapInPandas invariant)."""

    def gen(batches):
        from ..kernels.bert_encoder import bert_hidden_states

        p = params_bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            ids = np.array(list(pdf["ids"]))
            att = np.array(list(pdf["attention_mask"]))
            h = bert_hidden_states(ids, att, p)  # [B, T, d]
            yield pd.DataFrame(
                {
                    "h": list(h.reshape(len(pdf), -1)),
                    "label_ids": list(pdf["label_ids"]),
                }
            )

    return framed.select("ids", "attention_mask", "label_ids").mapInPandas(
        gen, schema="h array<double>, label_ids array<int>"
    )


# ------------------------------------------------------------- gradients


def _batch_partials(h, labels, w_cls, b_cls, class_weights):
    """Float64 partials for one in-memory batch.

    h [B, T, d]; labels [B, T]. Returns (gw_num [C, d], gb_num [C],
    loss_num, wsum): NUMERATOR gradient/loss sums (not yet divided by
    the global weight sum — the driver resolves the weighted-mean
    denominator across all batches)."""
    B, T, d = h.shape
    hh = h.reshape(B * T, d)
    yy = np.asarray(labels).reshape(B * T)
    mask = yy != IGNORE_INDEX
    if not mask.any():
        # shape from the head, NOT the module constant — a caller
        # training a non-default-size head would otherwise get
        # mismatched zero partials from fully-masked batches
        return np.zeros(w_cls.shape), np.zeros(w_cls.shape[0]), 0.0, 0.0
    hh, yy = hh[mask], yy[mask]
    logits = hh @ w_cls.T + b_cls
    logp = log_softmax(logits)
    w = (
        np.ones(len(yy))
        if class_weights is None
        else np.asarray(class_weights, dtype=np.float64)[yy]
    )
    # dL_num/dlogits = w * (softmax - onehot)
    dlog = np.exp(logp)
    dlog[np.arange(len(yy)), yy] -= 1.0
    dlog *= w[:, None]
    gw_num = dlog.T @ hh  # [C, d]
    gb_num = dlog.sum(axis=0)  # [C]
    loss_num = float(-(w * logp[np.arange(len(yy)), yy]).sum())
    return gw_num, gb_num, loss_num, float(w.sum())


def _grad_step(features: DataFrame, head_bc) -> tuple:
    """One distributed full-batch gradient evaluation: map-side
    per-Arrow-batch partials, deterministic driver-side reduction
    (partials sorted by (partition, batch) key before summing)."""

    def gen(it):
        from pyspark import TaskContext

        w_cls, b_cls, cw = head_bc.value
        pid = TaskContext.get().partitionId() if TaskContext.get() else 0
        for bi, pdf in enumerate(it):
            if not len(pdf):
                continue
            d = w_cls.shape[1]
            h = np.array(list(pdf["h"])).reshape(len(pdf), -1, d)
            labels = np.array(list(pdf["label_ids"]))
            gw, gb, ln, ws = _batch_partials(h, labels, w_cls, b_cls, cw)
            yield pd.DataFrame(
                {
                    "key": [pid * 100000 + bi],
                    "gw": [gw.reshape(-1)],
                    "gb": [gb],
                    "loss_num": [ln],
                    "wsum": [ws],
                }
            )

    parts = features.mapInPandas(
        gen,
        schema=(
            "key long, gw array<double>, gb array<double>, "
            "loss_num double, wsum double"
        ),
    ).collect()
    parts.sort(key=lambda r: r["key"])
    w_cls, _, _ = head_bc.value
    gw = np.zeros(w_cls.size)
    gb = np.zeros(w_cls.shape[0])
    loss_num = 0.0
    wsum = 0.0
    for r in parts:
        gw += np.asarray(r["gw"])
        gb += np.asarray(r["gb"])
        loss_num += r["loss_num"]
        wsum += r["wsum"]
    return gw.reshape(w_cls.shape), gb, loss_num, wsum


def fit_ner_head(
    spark: SparkSession,
    features: DataFrame,
    *,
    d: int,
    n_labels: int = N_LABELS,
    epochs: int = 10,
    lr: float = 0.5,
    class_weights=None,
    init_w: np.ndarray | None = None,
    init_b: np.ndarray | None = None,
) -> dict:
    """Full-batch GD on the linear head over frozen features.

    Returns {"w_cls": [C, d], "b_cls": [C], "losses": [epochs+1]} —
    losses[k] is the loss BEFORE step k (losses[-1] is the final
    post-training loss evaluated with one extra pass). The problem is
    convex (linear + CE), so with a sane lr the curve is monotone —
    asserted by tests, not assumed here."""
    sc = spark.sparkContext
    w_cls = (
        np.zeros((n_labels, d)) if init_w is None else init_w.astype(np.float64)
    )
    b_cls = np.zeros(n_labels) if init_b is None else init_b.astype(np.float64)
    cw = (
        None
        if class_weights is None
        else np.asarray(class_weights, dtype=np.float64)
    )
    losses: list[float] = []
    for _ in range(epochs):
        head_bc = sc.broadcast((w_cls, b_cls, cw))
        gw, gb, loss_num, wsum = _grad_step(features, head_bc)
        head_bc.destroy()
        if wsum == 0.0:
            # no trainable tokens anywhere: the loss is 0 at every
            # epoch and no update can change it — keep the documented
            # losses shape [epochs + 1] without further cluster passes
            losses.extend([0.0] * (epochs + 1 - len(losses)))
            return {"w_cls": w_cls, "b_cls": b_cls, "losses": losses}
        losses.append(loss_num / wsum)
        w_cls = w_cls - lr * gw / wsum
        b_cls = b_cls - lr * gb / wsum
    head_bc = sc.broadcast((w_cls, b_cls, cw))
    _, _, loss_num, wsum = _grad_step(features, head_bc)
    head_bc.destroy()
    losses.append(loss_num / wsum if wsum else 0.0)
    return {"w_cls": w_cls, "b_cls": b_cls, "losses": losses}


def head_token_accuracy(
    features: DataFrame, head_bc
) -> float:
    """Unmasked-token argmax accuracy of a head over a feature table —
    map-side counts, single global sum (two longs to the driver)."""

    def gen(it):
        w_cls, b_cls, _ = head_bc.value
        for pdf in it:
            if not len(pdf):
                continue
            d = w_cls.shape[1]
            h = np.array(list(pdf["h"])).reshape(len(pdf), -1, d)
            labels = np.array(list(pdf["label_ids"]))
            B, T, _ = h.shape
            hh = h.reshape(B * T, d)
            yy = labels.reshape(B * T)
            mask = yy != IGNORE_INDEX
            preds = (hh[mask] @ w_cls.T + b_cls).argmax(axis=-1)
            yield pd.DataFrame(
                {
                    "correct": [int((preds == yy[mask]).sum())],
                    "total": [int(mask.sum())],
                }
            )

    row = (
        features.mapInPandas(gen, schema="correct long, total long")
        .agg(F.sum("correct").alias("c"), F.sum("total").alias("t"))
        .collect()[0]
    )
    return (row["c"] or 0) / row["t"] if row["t"] else 0.0
