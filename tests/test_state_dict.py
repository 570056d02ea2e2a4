"""Torch-free state_dict ingestion (kernels/state_dict.py): engine
params -> reference-named tensor dict -> params must be an exact
round trip, with bitwise-equal forwards — so a real trained checkpoint
(exported as npz/pickle) drops into the executed numpy path."""

from __future__ import annotations

import pickle

import numpy as np
import pytest

from remediner_spark.kernels.bert_encoder import (
    bert_token_logits,
    init_bert_params,
)
from remediner_spark.kernels.re_head import (
    init_re_head_params,
    re_head_forward,
)
from remediner_spark.kernels.state_dict import (
    bert_params_from_state_dict,
    bert_state_dict_from_params,
    re_head_params_from_state_dict,
    re_state_dict_from_params,
    read_tensor_dict,
)

DIMS = dict(vocab=64, d=16, n_layers=2, n_heads=4, d_ffn=32, max_len=12)


def _bert_inputs():
    rng = np.random.RandomState(5)
    ids = rng.randint(0, DIMS["vocab"], size=(3, DIMS["max_len"]))
    att = np.ones_like(ids)
    att[:, 9:] = 0
    return ids, att


def test_bert_roundtrip_bitwise():
    p = init_bert_params(11, **DIMS)
    sd = bert_state_dict_from_params(p)
    p2 = bert_params_from_state_dict(sd, n_heads=DIMS["n_heads"])
    assert sorted(p2) == sorted(p)
    ids, att = _bert_inputs()
    want = bert_token_logits(ids, att, p)
    got = bert_token_logits(ids, att, p2)
    assert np.array_equal(want, got)  # bitwise, not allclose


def test_bert_roundtrip_through_files(tmp_path):
    p = init_bert_params(11, **DIMS)
    sd = bert_state_dict_from_params(p)
    npz = tmp_path / "ner.npz"
    np.savez(npz, **sd)
    pkl = tmp_path / "ner.pkl"
    with open(pkl, "wb") as f:
        pickle.dump(sd, f)
    ids, att = _bert_inputs()
    want = bert_token_logits(ids, att, p)
    for path in (str(npz), str(pkl)):
        p2 = bert_params_from_state_dict(
            read_tensor_dict(path), n_heads=DIMS["n_heads"]
        )
        assert np.array_equal(want, bert_token_logits(ids, att, p2))


def test_bert_token_type_fold():
    """A checkpoint with a NONZERO token-type table must fold row 0
    into the position table (segment ids are always 0 downstream)."""
    p = init_bert_params(11, **DIMS)
    sd = bert_state_dict_from_params(p)
    tte = np.full((2, DIMS["d"]), 0.25)
    sd["bert.bert.embeddings.token_type_embeddings.weight"] = tte
    p2 = bert_params_from_state_dict(sd, n_heads=DIMS["n_heads"])
    assert np.array_equal(p2["pos"], p["pos"] + 0.25)


def test_bert_tagger_from_state_dict(tmp_path):
    """Operator surface: NumpyBertTagger.from_state_dict tags exactly
    like a tagger built from the same params directly. Params are
    sized to the real frozen vocab (a checkpoint's embedding rows must
    match the tokenizer that indexes them)."""
    from remediner_spark.kernels.wordpiece import WordPieceTokenizer
    from remediner_spark.operators.bert_stub import NumpyBertTagger

    tok = WordPieceTokenizer()
    params = init_bert_params(
        13, vocab=len(tok._id_to_tok), d=32, n_layers=2, n_heads=4,
        d_ffn=64, max_len=48,
    )
    base = NumpyBertTagger(params, max_len=48, tokenizer=tok)
    sd = bert_state_dict_from_params(base._p)
    path = tmp_path / "ner.npz"
    np.savez(path, **sd)
    loaded = NumpyBertTagger.from_state_dict(
        str(path), n_heads=4, max_len=base.max_len
    )
    words = [["zemtrax", "caused", "severe", "nauseola"],
             ["plain", "words", "only"]]
    assert loaded.tag_words_batch(words) == base.tag_words_batch(words)


def test_from_state_dict_vocab_mismatch_is_loud(tmp_path):
    """A checkpoint whose embedding table doesn't match the tokenizer
    vocab must refuse to load (silently wrong tags otherwise)."""
    from remediner_spark.operators.bert_stub import NumpyBertTagger

    base = NumpyBertTagger.seeded()  # vocab=4096 stand-in
    sd = bert_state_dict_from_params(base._p)
    path = tmp_path / "ner.npz"
    np.savez(path, **sd)
    with pytest.raises(ValueError, match="vocab size"):
        NumpyBertTagger.from_state_dict(str(path), n_heads=4)


def test_re_roundtrip_bitwise(tmp_path):
    p = init_re_head_params(7, d_in=24, hidden=8, max_len=10, reduced=12)
    sd = re_state_dict_from_params(p)
    assert set(sd) == {
        "lstm.weight_ih_l0", "lstm.weight_hh_l0",
        "lstm.bias_ih_l0", "lstm.bias_hh_l0",
        "lstm.weight_ih_l0_reverse", "lstm.weight_hh_l0_reverse",
        "lstm.bias_ih_l0_reverse", "lstm.bias_hh_l0_reverse",
        "dim_reduction.weight", "dim_reduction.bias",
        "final_linear.weight", "final_linear.bias",
    }
    path = tmp_path / "re.npz"
    np.savez(path, **sd)
    p2 = re_head_params_from_state_dict(read_tensor_dict(str(path)))
    assert int(p2["_d_in"][0]) == 24
    X = np.random.RandomState(3).randn(2, 10, 24)
    assert np.array_equal(re_head_forward(X, p), re_head_forward(X, p2))


def test_missing_key_is_loud():
    p = init_re_head_params(7, d_in=24, hidden=8, max_len=10, reduced=12)
    sd = re_state_dict_from_params(p)
    del sd["lstm.weight_hh_l0_reverse"]
    with pytest.raises(KeyError, match="lstm.weight_hh_l0_reverse"):
        re_head_params_from_state_dict(sd)
