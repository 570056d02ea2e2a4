"""Pluggable BERT tagger stage (M1/M5) — broadcast weights, lazy
per-executor singleton.

The reference's models (bert-base-cased token classifier for NER,
/root/reference/src/NER/model_ner.py:6-24; BERT+BiLSTM relation head,
/root/reference/src/RE/model_re.py:10-61) plug in behind the same
``tag_words`` interface as the deterministic GazetteerTagger, so the
pipeline swaps models without changing the plan:

    weights_bc = broadcast_weights(spark, "/path/ner.pt", "/path/re.pt")
    tagger_bc  = spark.sparkContext.broadcast(BertTagger(weights_bc))
    triples    = extract_triples_stage(pages, tagger_bc)

torch/transformers are NOT installed in this environment: constructing
a BertTagger raises ImportError with guidance, and every torch-touching
path is import-gated. The batching/broadcast plumbing is real and unit
tested via DummyModel.
"""

from __future__ import annotations

from typing import Sequence

# module-level model cache: one materialized model per executor python
# worker process, keyed by the broadcast id (broadcast ships bytes once
# per executor; this avoids re-deserializing per task)
_MODEL_CACHE: dict[int, object] = {}

IOB_LABELS = ["O", "B-Drug", "I-Drug", "B-Effect", "I-Effect"]


def torch_available() -> bool:
    try:
        import torch  # noqa: F401
        import transformers  # noqa: F401

        return True
    except ImportError:
        return False


def broadcast_weights(spark, *paths: str):
    """Read model state bytes driver-side, ship once per executor."""
    blobs = []
    for p in paths:
        with open(p, "rb") as f:
            blobs.append(f.read())
    return spark.sparkContext.broadcast(blobs)


class BertTagger:
    """Batched BERT token-classification tagger (NER stage).

    Mirrors the reference inference loop
    (/root/reference/src/FINALMODEL/test_final.py:75-93): wordpiece the
    words, frame to max_len, forward, argmax, project subtoken labels
    back to words (first-subtoken label wins, HF convention).
    """

    def __init__(self, weights_bc, model_name: str = "bert-base-cased",
                 max_len: int = 128, batch_size: int = 32):
        if not torch_available():
            raise ImportError(
                "BertTagger requires torch+transformers (not installed "
                "here). Use GazetteerTagger for the deterministic path; "
                "the plumbing below is exercised by DummyModel tests."
            )
        self._weights_bc = weights_bc
        self._model_name = model_name
        self.max_len = max_len
        self.batch_size = batch_size

    def _model(self):
        key = id(self._weights_bc)
        if key not in _MODEL_CACHE:
            import io

            import torch
            from transformers import AutoModelForTokenClassification, AutoTokenizer

            model = AutoModelForTokenClassification.from_pretrained(
                self._model_name, num_labels=len(IOB_LABELS)
            )
            state = torch.load(
                io.BytesIO(self._weights_bc.value[0]), map_location="cpu"
            )
            model.load_state_dict(state)
            model.eval()
            tok = AutoTokenizer.from_pretrained(self._model_name)
            _MODEL_CACHE[key] = (model, tok)
        return _MODEL_CACHE[key]

    def tag_words(self, words: Sequence[str]) -> list[str]:
        return self.tag_words_batch([list(words)])[0]

    def tag_words_batch(self, batch: list[list[str]]) -> list[list[str]]:
        import torch

        model, tok = self._model()
        out: list[list[str]] = []
        for i in range(0, len(batch), self.batch_size):
            chunk = batch[i : i + self.batch_size]
            enc = tok(
                chunk,
                is_split_into_words=True,
                truncation=True,
                padding="max_length",
                max_length=self.max_len,
                return_tensors="pt",
            )
            with torch.no_grad():
                logits = model(**enc).logits
            preds = logits.argmax(dim=-1).tolist()
            for row, words in enumerate(chunk):
                word_ids = enc.word_ids(batch_index=row)
                tags = ["O"] * len(words)
                seen: set[int] = set()
                for pos, wid in enumerate(word_ids):
                    if wid is None or wid in seen or wid >= len(words):
                        continue
                    seen.add(wid)
                    tags[wid] = IOB_LABELS[preds[row][pos]]
                out.append(tags)
        return out


class NumpyBertTagger:
    """BertTagger-shaped NER tagger executing the transcribed
    architecture in numpy (kernels/bert_encoder.py) — the M1 surface
    actually RUNS here, torch-free: wordpiece -> frame to max_len ->
    encoder forward -> per-token argmax -> first-subtoken label
    projection, the same decode chain as BertTagger.tag_words_batch
    (mirroring /root/reference/src/FINALMODEL/test_final.py:75-93).

    Weights are a dict of numpy arrays (seeded stand-ins for the
    trained checkpoint); broadcast the whole tagger once per executor,
    exactly like the torch path ships state_dict bytes.
    """

    def __init__(self, params: dict, max_len: int = 48,
                 batch_size: int = 64, tokenizer=None):
        from ..kernels.wordpiece import WordPieceTokenizer

        self._p = params
        self.max_len = max_len
        self.batch_size = batch_size
        self._tok = tokenizer or WordPieceTokenizer()

    @classmethod
    def seeded(cls, seed: int = 13, d: int = 32, n_layers: int = 2,
               n_heads: int = 4, d_ffn: int = 64, max_len: int = 48):
        from ..kernels.bert_encoder import init_bert_params

        params = init_bert_params(
            seed, vocab=4096, d=d, n_layers=n_layers, n_heads=n_heads,
            d_ffn=d_ffn, max_len=max_len,
        )
        return cls(params, max_len=max_len)

    @classmethod
    def from_state_dict(cls, path: str, n_heads: int = 12,
                        max_len: int = 128, tokenizer=None,
                        prefix: str = "bert."):
        """Build the tagger from a TRAINED checkpoint exported as a
        plain tensor dict (.npz or pickled {key: ndarray}) in the
        reference's state_dict naming — torch-free weight ingestion
        (kernels/state_dict.py). n_heads comes from the HF config
        (12 for bert-base); prefix='bert.' matches the reference's
        NerModel wrapper, '' a bare HF checkpoint."""
        from ..kernels.state_dict import (
            bert_params_from_state_dict,
            read_tensor_dict,
        )
        from ..kernels.wordpiece import WordPieceTokenizer

        params = bert_params_from_state_dict(
            read_tensor_dict(path), n_heads=n_heads, prefix=prefix
        )
        tok = tokenizer or WordPieceTokenizer()
        # a tokenizer whose id space doesn't match the checkpoint's
        # embedding table would index in-bounds garbage rows and emit
        # silently wrong tags — make the mismatch loud. The tokenizer
        # that produced the checkpoint's training data must be passed
        # (its vocab file defines the row order of `emb`).
        vocab_rows = params["emb"].shape[0]
        tok_vocab = len(getattr(tok, "_id_to_tok", ()))
        if tok_vocab and tok_vocab != vocab_rows:
            raise ValueError(
                f"tokenizer vocab size {tok_vocab} != checkpoint "
                f"embedding rows {vocab_rows}: pass the tokenizer "
                "(vocab file) the checkpoint was trained with"
            )
        return cls(params, max_len=max_len, tokenizer=tok)

    def tag_words(self, words: Sequence[str]) -> list[str]:
        return self.tag_words_batch([list(words)])[0]

    def tag_words_batch(self, batch: list[list[str]]) -> list[list[str]]:
        import numpy as np

        from ..kernels.bert_encoder import bert_token_logits
        from ..kernels.wordpiece import (
            frame_words_for_inference,
            project_first_subtoken,
        )

        out: list[list[str]] = []
        for i in range(0, len(batch), self.batch_size):
            chunk = batch[i : i + self.batch_size]
            framed = [
                frame_words_for_inference(words, self.max_len, self._tok)
                for words in chunk
            ]
            logits = bert_token_logits(
                np.array([f[0] for f in framed]),
                np.array([f[1] for f in framed]),
                self._p,
            )
            preds = logits.argmax(axis=-1)
            for row, words in enumerate(chunk):
                label_ids = project_first_subtoken(
                    preds[row], framed[row][2], len(words)
                )
                out.append([IOB_LABELS[i] for i in label_ids])
        return out


class DummyModel:
    """Deterministic stand-in exercising the broadcast/batch plumbing
    in tests without torch: 'predicts' B-Drug for words ending in 'x',
    B-Effect for words ending in 'a'."""

    def __init__(self, weights_bc=None):
        self._weights_bc = weights_bc

    def tag_words(self, words: Sequence[str]) -> list[str]:
        out = []
        for w in words:
            if w.endswith("x"):
                out.append("B-Drug")
            elif w.endswith("a"):
                out.append("B-Effect")
            else:
                out.append("O")
        return out
