"""Masked weighted CE kernel + plot sink fallback."""

from __future__ import annotations

import math

import numpy as np
import pytest

from remediner_spark.kernels.loss import (
    log_softmax,
    masked_weighted_ce,
    plot_confusion,
)


def test_log_softmax_sums_to_one():
    x = np.array([[1.0, 2.0, 3.0], [1000.0, 1000.0, 1000.0]])
    p = np.exp(log_softmax(x))
    assert np.allclose(p.sum(axis=-1), 1.0)


def test_unweighted_matches_hand_computation():
    # one sequence, two tokens scored + one masked
    logits = np.array([[[2.0, 0.0], [0.0, 2.0], [5.0, 5.0]]])
    labels = np.array([[0, 0, -100]])
    # token0: -log(e^2/(e^2+1)); token1: -log(1/(1+e^2))
    t0 = -math.log(math.exp(2) / (math.exp(2) + 1))
    t1 = -math.log(1 / (1 + math.exp(2)))
    assert masked_weighted_ce(logits, labels) == pytest.approx((t0 + t1) / 2)


def test_weights_scale_and_renormalize():
    logits = np.array([[[1.0, 0.0], [0.0, 1.0]]])
    labels = np.array([[0, 1]])
    base = masked_weighted_ce(logits, labels)
    # equal weights on both classes change nothing (weighted mean)
    assert masked_weighted_ce(
        logits, labels, np.array([2.0, 2.0])
    ) == pytest.approx(base)
    # upweighting class 1 moves the mean toward token1's loss
    w = masked_weighted_ce(logits, labels, np.array([1.0, 3.0]))
    assert w == pytest.approx(base)  # symmetric logits -> same per-token loss
    asym = np.array([[[3.0, 0.0], [0.0, 1.0]]])
    lo = masked_weighted_ce(asym, labels, np.array([1.0, 9.0]))
    hi = masked_weighted_ce(asym, labels, np.array([9.0, 1.0]))
    assert lo != pytest.approx(hi)


def test_all_masked_is_zero():
    assert masked_weighted_ce(
        np.zeros((1, 2, 3)), np.full((1, 2), -100)
    ) == 0.0


def test_plot_sink_text_fallback(tmp_path):
    m = [[0.9, 0.1], [0.2, 0.8]]
    out = plot_confusion(m, ["O", "B-Drug"], str(tmp_path / "cm"))
    content = open(out).read()
    assert "B-Drug" in content
    assert "0.9000" in content or out.endswith(".png")
