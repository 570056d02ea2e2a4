"""In-engine NER-head fine-tune (operators/train.py).

Three gates:
* finite-difference check — the analytic gradient matches numerical
  differentiation of kernels.loss.masked_weighted_ce (an independent
  implementation of the same reference loss) to 1e-7;
* distributed == single-process — the Spark full-batch GD trajectory
  equals an inline numpy reference on the collected features (rtol
  1e-9), loss is monotone decreasing, accuracy improves over init;
* the loss reported at step 0 equals masked_weighted_ce exactly.
"""

from __future__ import annotations

import numpy as np
import pytest

from remediner_spark.kernels.loss import masked_weighted_ce
from remediner_spark.operators.train import (
    _batch_partials,
    encode_features,
    fit_ner_head,
    head_token_accuracy,
)

N, T, D, C = 6, 10, 8, 5


def _rand_case(seed=0, weighted=True):
    rng = np.random.RandomState(seed)
    h = rng.randn(N, T, D)
    labels = rng.randint(0, C, size=(N, T))
    labels[rng.rand(N, T) < 0.3] = -100
    labels[:, 0] = -100  # CLS-style
    w_cls = rng.randn(C, D) * 0.1
    b_cls = rng.randn(C) * 0.1
    cw = (0.5 + rng.rand(C)) if weighted else None
    return h, labels, w_cls, b_cls, cw


@pytest.mark.parametrize("weighted", [False, True])
def test_gradient_matches_finite_difference(weighted):
    h, labels, w_cls, b_cls, cw = _rand_case(3, weighted)
    gw, gb, loss_num, wsum = _batch_partials(h, labels, w_cls, b_cls, cw)
    gw, gb = gw / wsum, gb / wsum

    def loss_at(w, b):
        return masked_weighted_ce(h @ w.T + b, labels, cw)

    assert abs(loss_num / wsum - loss_at(w_cls, b_cls)) < 1e-12
    eps = 1e-6
    for idx in [(0, 0), (2, 3), (4, 7), (1, 5)]:
        wp, wm = w_cls.copy(), w_cls.copy()
        wp[idx] += eps
        wm[idx] -= eps
        num = (loss_at(wp, b_cls) - loss_at(wm, b_cls)) / (2 * eps)
        assert abs(num - gw[idx]) < 1e-7, idx
    for c in range(C):
        bp, bm = b_cls.copy(), b_cls.copy()
        bp[c] += eps
        bm[c] -= eps
        num = (loss_at(w_cls, bp) - loss_at(w_cls, bm)) / (2 * eps)
        assert abs(num - gb[c]) < 1e-7, c


def _framed_df(spark, n_rows=48):
    """Tiny word/IOB rows through the REAL framing stage + encoder."""
    from remediner_spark.operators.bert_stub import NumpyBertTagger
    from remediner_spark.operators.framing import bert_framing_stage

    rows = []
    for i in range(n_rows):
        words = ["patient", "took", f"drug{i % 7}x", "and", "felt", f"pain{i % 5}a"]
        iob = ["O", "O", "B-Drug", "O", "O", "B-Effect"]
        rows.append((f"u{i}", 0, words, iob))
    tagged = spark.createDataFrame(
        rows, "url string, sent_idx int, words array<string>, iob array<string>"
    ).repartition(4)
    framed = bert_framing_stage(tagged, max_len=16)
    tagger = NumpyBertTagger.seeded(seed=7, d=D, n_layers=1, n_heads=2,
                                    d_ffn=16, max_len=16)
    params_bc = spark.sparkContext.broadcast(tagger._p)
    return encode_features(spark, framed, params_bc), params_bc


def test_fit_matches_single_process_and_improves(spark):
    features, params_bc = _framed_df(spark)
    features = features.cache()
    try:
        cw = [0.2, 1.0, 1.0, 1.0, 1.0]
        out = fit_ner_head(
            spark, features, d=D, epochs=6, lr=0.5, class_weights=cw
        )
        losses = out["losses"]
        # single-process reference on the collected features, inline math
        pdf = features.toPandas()
        h = np.array(list(pdf["h"])).reshape(len(pdf), -1, D)
        labels = np.array(list(pdf["label_ids"]))
        w = np.zeros((C, D))
        b = np.zeros(C)
        cwv = np.asarray(cw)
        ref_losses = []
        for _ in range(6):
            logits = h @ w.T + b
            ref_losses.append(masked_weighted_ce(logits, labels, cwv))
            sm = np.exp(logits - logits.max(-1, keepdims=True))
            sm /= sm.sum(-1, keepdims=True)
            mask = labels != -100
            yy = np.where(mask, labels, 0)
            dlog = sm.copy()
            np.put_along_axis(
                dlog, yy[..., None],
                np.take_along_axis(dlog, yy[..., None], -1) - 1.0, -1)
            dlog *= (cwv[yy] * mask)[..., None]
            denom = (cwv[yy] * mask).sum()
            gw = np.einsum("btc,btd->cd", dlog, h) / denom
            gb = dlog.sum((0, 1)) / denom
            w -= 0.5 * gw
            b -= 0.5 * gb
        ref_losses.append(masked_weighted_ce(h @ w.T + b, labels, cwv))
        assert np.allclose(losses, ref_losses, rtol=1e-9, atol=1e-12)
        assert np.allclose(out["w_cls"], w, rtol=1e-9, atol=1e-12)
        # convex problem, sane lr: strictly decreasing curve
        assert all(b_ < a_ for a_, b_ in zip(losses, losses[1:]))
        # an UNWEIGHTED fit must beat the zero init on raw token
        # accuracy (the weighted fit above deliberately trades
        # majority-class 'O' accuracy for entity recall, so raw
        # accuracy is the wrong yardstick for it)
        out_u = fit_ner_head(spark, features, d=D, epochs=12, lr=0.5)
        sc = spark.sparkContext
        bc0 = sc.broadcast((np.zeros((C, D)), np.zeros(C), None))
        acc0 = head_token_accuracy(features, bc0)
        bc1 = sc.broadcast((out_u["w_cls"], out_u["b_cls"], None))
        acc1 = head_token_accuracy(features, bc1)
        assert acc1 > acc0
        bc0.destroy()
        bc1.destroy()
    finally:
        features.unpersist()
        params_bc.destroy()


def test_initial_loss_equals_kernel_loss(spark):
    features, params_bc = _framed_df(spark, n_rows=12)
    try:
        out = fit_ner_head(spark, features, d=D, epochs=1, lr=0.0)
        pdf = features.toPandas()
        h = np.array(list(pdf["h"])).reshape(len(pdf), -1, D)
        labels = np.array(list(pdf["label_ids"]))
        expect = masked_weighted_ce(h @ np.zeros((C, D)).T + np.zeros(C), labels)
        assert abs(out["losses"][0] - expect) < 1e-12
        # lr=0: loss unchanged after the "step"
        assert abs(out["losses"][1] - expect) < 1e-12
    finally:
        params_bc.destroy()
