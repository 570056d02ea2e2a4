"""Torch-free state_dict adapter: trained checkpoint tensors -> the
numpy parameter layouts executed by kernels/bert_encoder.py and
kernels/re_head.py.

The reference trains with torch and persists via
``torch.save(model.state_dict(), ...)``
(/root/reference/src/NER/train_eval_ner.py:154,
/root/reference/src/RE/train_eval_re.py:145). torch's own file format
needs torch to unpickle, so the portable interchange here is a plain
tensor dict — numpy ``.npz`` or a pickle of ``{key: ndarray}`` — with
the ORIGINAL state_dict key names. Producing it from a real checkpoint
is one torch-side line::

    np.savez(out, **{k: v.numpy() for k, v in sd.items()})

and from there this module is all that is needed to run the trained
weights through the executed numpy path (no torch at inference).

Key naming follows the reference models exactly:

* NER — ``NerModel`` wraps HuggingFace ``BertForTokenClassification``
  as ``self.bert`` (/root/reference/src/NER/model_ner.py:11-18), so
  keys look like ``bert.bert.embeddings.word_embeddings.weight`` and
  ``bert.classifier.weight``; pass ``prefix='bert.'`` for that wrapper
  or ``prefix=''`` for a bare HF checkpoint.
* RE — ``ReModel`` names its head modules ``lstm`` / ``dim_reduction``
  / ``final_linear`` (/root/reference/src/RE/model_re.py:24-35), so
  keys are torch's ``lstm.weight_ih_l0`` (+ ``_reverse`` for the
  backward direction), ``dim_reduction.weight`` etc.

Exactness notes:

* torch ``nn.Linear`` stores weight as [out, in]; the numpy forwards
  compute ``x @ w.T`` over the same [out, in] layout, so every linear
  maps over verbatim — no transposes.
* BERT adds ``token_type_embeddings[0]`` uniformly when all segment
  ids are zero (the reference never uses segment B). The numpy encoder
  has no token-type term, so the adapter FOLDS row 0 into the position
  table (``pos + tte[0]``) — bitwise-identical forward, one table
  fewer. The export direction emits a zero token-type table so a
  round-trip is exact.
* ``n_heads`` is not recoverable from tensor shapes (it lives in the
  HF config), so it is an explicit argument.
* Non-parameter buffers (``position_ids``) and modules the token
  classifier never evaluates (``pooler``) are ignored.
"""

from __future__ import annotations

import numpy as np

from .bert_encoder import N_LABELS


def read_tensor_dict(path: str) -> dict[str, np.ndarray]:
    """Load a tensor dict from .npz or a pickled {key: ndarray} dict.

    The file must contain numpy arrays (NOT torch tensors — those need
    torch to unpickle; see the module docstring for the one-line
    conversion)."""
    if path.endswith(".npz"):
        with np.load(path) as z:
            return {k: np.asarray(z[k]) for k in z.files}
    import pickle

    with open(path, "rb") as f:
        obj = pickle.load(f)
    if not isinstance(obj, dict):
        raise ValueError(f"expected a dict of arrays in {path}, got {type(obj)}")
    return {k: np.asarray(v) for k, v in obj.items()}


# ------------------------------------------------------------------ NER side

# (numpy key template, state_dict key template) per encoder layer
_BERT_LAYER_MAP = [
    ("l{i}_wq", "bert.encoder.layer.{i}.attention.self.query.weight"),
    ("l{i}_bq", "bert.encoder.layer.{i}.attention.self.query.bias"),
    ("l{i}_wk", "bert.encoder.layer.{i}.attention.self.key.weight"),
    ("l{i}_bk", "bert.encoder.layer.{i}.attention.self.key.bias"),
    ("l{i}_wv", "bert.encoder.layer.{i}.attention.self.value.weight"),
    ("l{i}_bv", "bert.encoder.layer.{i}.attention.self.value.bias"),
    ("l{i}_wo", "bert.encoder.layer.{i}.attention.output.dense.weight"),
    ("l{i}_bo", "bert.encoder.layer.{i}.attention.output.dense.bias"),
    ("l{i}_ln1_g", "bert.encoder.layer.{i}.attention.output.LayerNorm.weight"),
    ("l{i}_ln1_b", "bert.encoder.layer.{i}.attention.output.LayerNorm.bias"),
    ("l{i}_w1", "bert.encoder.layer.{i}.intermediate.dense.weight"),
    ("l{i}_b1", "bert.encoder.layer.{i}.intermediate.dense.bias"),
    ("l{i}_w2", "bert.encoder.layer.{i}.output.dense.weight"),
    ("l{i}_b2", "bert.encoder.layer.{i}.output.dense.bias"),
    ("l{i}_ln2_g", "bert.encoder.layer.{i}.output.LayerNorm.weight"),
    ("l{i}_ln2_b", "bert.encoder.layer.{i}.output.LayerNorm.bias"),
]


def bert_params_from_state_dict(
    sd: dict[str, np.ndarray], n_heads: int, prefix: str = "bert."
) -> dict:
    """HF BertForTokenClassification state_dict -> bert_encoder params.

    ``prefix`` is whatever wraps the HF model ('bert.' for the
    reference's NerModel, '' for a bare checkpoint). Dims are derived
    from tensor shapes except n_heads (config-only)."""

    def get(key: str) -> np.ndarray:
        full = prefix + key
        if full not in sd:
            raise KeyError(f"state_dict missing {full!r}")
        return np.asarray(sd[full], dtype=np.float64)

    emb = get("bert.embeddings.word_embeddings.weight")
    pos = get("bert.embeddings.position_embeddings.weight")
    tte = get("bert.embeddings.token_type_embeddings.weight")
    vocab, d = emb.shape
    if d % n_heads:
        raise ValueError(f"hidden size {d} not divisible by n_heads {n_heads}")
    layer_key = prefix + "bert.encoder.layer.{i}.attention.self.query.weight"
    n_layers = 0
    while layer_key.format(i=n_layers) in sd:
        n_layers += 1
    if n_layers == 0:
        raise KeyError(f"no encoder layers under prefix {prefix!r}")
    w_cls = get("classifier.weight")
    if w_cls.shape[0] != N_LABELS:
        raise ValueError(
            f"classifier has {w_cls.shape[0]} labels, engine expects {N_LABELS}"
        )
    d_ffn = get("bert.encoder.layer.0.intermediate.dense.weight").shape[0]
    p: dict = {
        "_dims": np.array([vocab, d, n_layers, n_heads, d_ffn, pos.shape[0]]),
        "emb": emb,
        # segment ids are always 0 in the reference -> fold tte[0] in
        "pos": pos + tte[0],
        "ln_e_g": get("bert.embeddings.LayerNorm.weight"),
        "ln_e_b": get("bert.embeddings.LayerNorm.bias"),
        "w_cls": w_cls,
        "b_cls": get("classifier.bias"),
    }
    for i in range(n_layers):
        for np_key, sd_key in _BERT_LAYER_MAP:
            p[np_key.format(i=i)] = get(sd_key.format(i=i))
    return p


def bert_state_dict_from_params(p: dict, prefix: str = "bert.") -> dict:
    """Inverse mapping, in the reference's key naming — for round-trip
    tests and for exporting engine-initialized weights in a form the
    torch path could load."""
    vocab, d, n_layers, _nh, _dffn, max_len = (int(v) for v in p["_dims"])
    sd = {
        prefix + "bert.embeddings.word_embeddings.weight": p["emb"],
        prefix + "bert.embeddings.position_embeddings.weight": p["pos"],
        # zero table: the forward adds tte[0] uniformly, so zeros make
        # the fold in bert_params_from_state_dict an exact round-trip
        prefix + "bert.embeddings.token_type_embeddings.weight": np.zeros((2, d)),
        prefix + "bert.embeddings.LayerNorm.weight": p["ln_e_g"],
        prefix + "bert.embeddings.LayerNorm.bias": p["ln_e_b"],
        prefix + "classifier.weight": p["w_cls"],
        prefix + "classifier.bias": p["b_cls"],
    }
    for i in range(n_layers):
        for np_key, sd_key in _BERT_LAYER_MAP:
            sd[prefix + sd_key.format(i=i)] = p[np_key.format(i=i)]
    return sd


# ------------------------------------------------------------------- RE side

_RE_MAP = [
    ("w_ih_f", "lstm.weight_ih_l0"),
    ("w_hh_f", "lstm.weight_hh_l0"),
    ("b_ih_f", "lstm.bias_ih_l0"),
    ("b_hh_f", "lstm.bias_hh_l0"),
    ("w_ih_b", "lstm.weight_ih_l0_reverse"),
    ("w_hh_b", "lstm.weight_hh_l0_reverse"),
    ("b_ih_b", "lstm.bias_ih_l0_reverse"),
    ("b_hh_b", "lstm.bias_hh_l0_reverse"),
    ("w_red", "dim_reduction.weight"),
    ("b_red", "dim_reduction.bias"),
    ("w_out", "final_linear.weight"),
    ("b_out", "final_linear.bias"),
]


def re_head_params_from_state_dict(
    sd: dict[str, np.ndarray], prefix: str = ""
) -> dict[str, np.ndarray]:
    """ReModel state_dict -> re_head params. The BERT-encoder tensors
    under ``bert.*`` belong to the NER-side adapter and are ignored
    here; the head consumes exactly the lstm/dim_reduction/final_linear
    tensors. ``_d_in`` (the encoder output width the head was trained
    against — 4*768 in the reference) is derived from the LSTM input
    projection shape."""
    p: dict[str, np.ndarray] = {}
    for np_key, sd_key in _RE_MAP:
        full = prefix + sd_key
        if full not in sd:
            raise KeyError(f"state_dict missing {full!r}")
        p[np_key] = np.asarray(sd[full], dtype=np.float64)
    p["_d_in"] = np.array([p["w_ih_f"].shape[1]])
    return p


def re_state_dict_from_params(
    p: dict[str, np.ndarray], prefix: str = ""
) -> dict[str, np.ndarray]:
    return {prefix + sd_key: p[np_key] for np_key, sd_key in _RE_MAP}
