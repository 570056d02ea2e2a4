"""Deterministic wordpiece-style tokenizer (model-free stand-in).

The reference uses HuggingFace's bert-base-cased wordpiece tokenizer
(e.g. /root/reference/src/NER/data_utilities_ner.py:87-128). That
library is not available in this environment, so the engine's
subtoken plumbing (label propagation A5, BERT framing A6, masked-text
reconstruction M3) runs against this deterministic stand-in: a word is
split into chunks of at most CHUNK characters, continuations prefixed
with ``##`` — structurally identical to wordpiece output, fully
invertible, and requiring no vocabulary download. The real tokenizer
drops in behind the same three-method interface (`tokenize`,
`convert_tokens_to_ids`, `convert_ids_to_tokens`).
"""

from __future__ import annotations

import zlib

CHUNK = 4

CLS, SEP, PAD = "[CLS]", "[SEP]", "[PAD]"
_SPECIAL_IDS = {PAD: 0, CLS: 101, SEP: 102}
_ID_SPECIAL = {v: k for k, v in _SPECIAL_IDS.items()}
_VOCAB_SIZE = 1 << 20


class DeterministicWordpiece:
    """Vocabulary-free tokenizer with stable ids via crc32."""

    def tokenize(self, word: str) -> list[str]:
        if not word:
            return []
        pieces = [word[:CHUNK]]
        for i in range(CHUNK, len(word), CHUNK):
            pieces.append("##" + word[i : i + CHUNK])
        return pieces

    def convert_tokens_to_ids(self, tokens: list[str]) -> list[int]:
        out = []
        for t in tokens:
            if t in _SPECIAL_IDS:
                out.append(_SPECIAL_IDS[t])
            else:
                out.append(103 + (zlib.crc32(t.encode()) % _VOCAB_SIZE))
        return out

    def convert_ids_to_tokens(self, ids: list[int]) -> list[str]:
        # crc ids are not invertible; callers on the engine path carry
        # tokens alongside ids (the reference only inverts ids because
        # HF materializes tensors — our Arrow batches keep the tokens).
        return [_ID_SPECIAL.get(i, f"<{i}>") for i in ids]


def tokenize_words_with_labels(
    words: list[str], labels: list, tokenizer=None
) -> tuple[list[str], list]:
    """A5: wordpiece each word, replicating its label per subtoken.

    Port of tokenize_text_ner / tokenize_text_re
    (/root/reference/src/NER/data_utilities_ner.py:87-128,
    /root/reference/src/RE/data_utilities_re.py:148-189), flattened.
    """
    tok = tokenizer or DeterministicWordpiece()
    out_tokens: list[str] = []
    out_labels: list = []
    for word, label in zip(words, labels):
        pieces = tok.tokenize(word)
        out_tokens.extend(pieces)
        out_labels.extend([label] * len(pieces))
    return out_tokens, out_labels


def frame_bert_input(
    tokens: list[str],
    labels: list[int],
    max_len: int,
    tokenizer=None,
) -> tuple[list[int], list[int], list[int]]:
    """A6: [CLS]+tokens+[SEP], truncate/pad to max_len, mask, -100 labels.

    Port of get_ner_inputs / get_re_inputs
    (/root/reference/src/NER/data_utilities_ner.py:132-168,
    /root/reference/src/RE/data_utilities_re.py:193-229) for one row.
    """
    tok = tokenizer or DeterministicWordpiece()
    framed = [CLS] + list(tokens) + [SEP]
    framed_labels = [-100] + list(labels) + [-100]
    if len(framed) > max_len:
        framed = framed[:max_len]
        framed_labels = framed_labels[:max_len]
    if len(framed) < max_len:
        pad_n = max_len - len(framed)
        framed = framed + [PAD] * pad_n
        framed_labels = framed_labels + [-100] * pad_n
    attention = [1 if t != PAD else 0 for t in framed]
    ids = tok.convert_tokens_to_ids(framed)
    return ids, attention, framed_labels
