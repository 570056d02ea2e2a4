"""M3 reconstruction vs a literal transcription of the reference.

Transcribes FinalModel.__convert_output_to_masked_text
(/root/reference/src/FINALMODEL/final_model.py:38-119) operating
directly on (subtokens, 5-class ids) — special tokens included, since
the reference strips them by index. Equality is asserted over
word-coherent labelings (every subtoken of a word shares its label),
which is the engine's domain (taggers label words, labels propagate
to subtokens), after normalizing the reference's sentence-final
duplicate-mask artifact (see kernels/reconstruct.py docstring).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from remediner_spark.kernels.reconstruct import reconstruct_masked_text

ID_LABEL = {0: "O", 1: "B-Drug", 2: "I-Drug", 3: "B-Effect", 4: "I-Effect"}


def reference_convert(tokens: list[str], entity_ids: list[int]) -> str:
    """Verbatim-order transcription for ONE row (batch loop removed)."""
    new_label_id = {"O": 0, "DRUG": 1, "EFFECT": 2}
    new_id_label = {v: k for k, v in new_label_id.items()}
    id_label = ID_LABEL

    new_entities = []
    for el in entity_ids:
        if id_label[el] == "O":
            new_entities.append(new_label_id["O"])
        elif id_label[el] in ("B-Drug", "I-Drug"):
            new_entities.append(new_label_id["DRUG"])
        else:
            new_entities.append(new_label_id["EFFECT"])

    tokens = list(tokens)
    indexes_to_remove = []
    for i, token in enumerate(tokens):
        if token in ("[CLS]", "[SEP]", "[PAD]"):
            indexes_to_remove.append(i)
    for i, index in enumerate(indexes_to_remove):
        del tokens[index - i]
        del new_entities[index - i]

    for i, token in enumerate(tokens):
        entity = new_entities[i]
        if new_id_label[entity] == "DRUG":
            tokens[i] = "DRUG"
        elif new_id_label[entity] == "EFFECT":
            tokens[i] = "EFFECT"

    text = []
    new_token = ""
    de_append = False
    for i, token in enumerate(tokens):
        if not token.startswith("##") and new_token != "":
            if new_token != "DRUG" and new_token != "EFFECT":
                text.append(new_token.lower())
                de_append = False
            else:
                if not de_append:
                    text.append(new_token)
                    de_append = True
            new_token = ""
        if token == "DRUG" or token == "EFFECT":
            new_token = token
        else:
            new_token += token.replace("##", "")
    text.append(new_token)
    return " ".join(text)


def normalize_sentence_end(text: str) -> str:
    """Undo the reference's two sentence-final artifacts, both caused
    by final_model.py:115 appending the pending token unconditionally:
    the duplicated trailing mask, and the last word escaping the
    lowercasing every other word receives."""
    words = text.split(" ")
    while (
        len(words) >= 2
        and words[-1] in ("DRUG", "EFFECT")
        and words[-2] == words[-1]
    ):
        words.pop()
    if words and words[-1] not in ("DRUG", "EFFECT"):
        words[-1] = words[-1].lower()
    return " ".join(words)


WORDS = ["Alpha", "beta", "GAMMA", "delta", "kapp", "zeta"]


def _mask_class(label: int) -> str:
    return {0: "O", 1: "D", 2: "D", 3: "E", 4: "E"}[label]


@st.composite
def coherent_row(draw):
    """Word-coherent labelings with no ADJACENT different-type masked
    words — the reference's de_append latch drops the second mask in
    that case (documented deviation, kernels/reconstruct.py), so it is
    outside the equivalence domain."""
    n_words = draw(st.integers(1, 7))
    subtokens, labels = ["[CLS]"], [0]
    prev_class = "O"
    for _ in range(n_words):
        word = draw(st.sampled_from(WORDS))
        n_pieces = draw(st.integers(1, 3))
        label = draw(st.sampled_from([0, 0, 1, 2, 3, 4]))
        if prev_class != "O" and _mask_class(label) not in ("O", prev_class):
            label = 0
        prev_class = _mask_class(label)
        for p in range(n_pieces):
            subtokens.append(word if p == 0 else f"##{word.lower()}")
            labels.append(label)
    subtokens.append("[SEP]")
    labels.append(0)
    pad = draw(st.integers(0, 3))
    subtokens += ["[PAD]"] * pad
    labels += [0] * pad
    return subtokens, labels


@settings(max_examples=300, deadline=None)
@given(coherent_row())
def test_reconstruction_matches_reference_on_coherent_rows(row):
    subtokens, labels = row
    # engine input: specials stripped, labels as IOB names
    stripped = [
        (t, ID_LABEL[lab])
        for t, lab in zip(subtokens, labels)
        if t not in ("[CLS]", "[SEP]", "[PAD]")
    ]
    got, _mentions = reconstruct_masked_text(
        [t for t, _ in stripped], [l for _, l in stripped]
    )
    want = normalize_sentence_end(reference_convert(subtokens, labels))
    assert got == want


def test_trailing_duplicate_quirk_is_real():
    # documents WHY the normalization exists: the reference emits the
    # final multi-subtoken mask twice
    tokens = ["[CLS]", "caus", "dorv", "##axin", "[SEP]"]
    labels = [0, 0, 1, 2, 0]
    raw = reference_convert(tokens, labels)
    assert raw == "caus DRUG DRUG"
    assert normalize_sentence_end(raw) == "caus DRUG"