"""Differential property tests: iob/mask kernels vs literal
transcriptions of the reference control flow.

The transcriptions below keep the reference's exact statement order
and mutable-state quirks (/root/reference/src/NER/
data_utilities_ner.py:10-64, /root/reference/src/RE/
data_utilities_re.py:10-83), with one substitution: the whitespace
span tokenizer replaces nltk's TreebankWordTokenizer (unavailable
here; equivalent on normalized text — asserted separately in
test_kernels). Hypothesis then drives randomized entity layouts
through both implementations.
"""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from remediner_spark.kernels.iob import iob_tag_text, span_tokenize
from remediner_spark.kernels.mask import mask_texts_batch


def reference_iob_tagging(text, drugs, effects):
    """Verbatim-order transcription of iob_tagging (ner:10-64)."""
    ds = []
    es = []
    for drug in drugs:
        m = re.search(re.escape(drug), text)
        ds.append(m.span() if m else (-1, -1))
    for effect in effects:
        m = re.search(re.escape(effect), text)
        es.append(m.span() if m else (-1, -1))
    span_list = span_tokenize(text)
    entities = ["Drug", "Effect"]
    iob_list = []
    i = 0
    for start, end in span_list:
        temp_iob_list = []
        iob_tag = "O"
        for (start_d, end_d), (start_e, end_e) in zip(ds, es):
            iob_tag = "O"
            if start == start_d or start == start_e:
                iob_tag = "B"
                if start == start_d:
                    i = 0
                else:
                    i = 1
            elif (start_d < start and end <= end_d) or (
                start_e < start and end <= end_e
            ):
                iob_tag = "I"
            if iob_tag != "O":
                iob_tag += "-{}".format(entities[i])
            temp_iob_list.append(iob_tag)
        for j in range(len(temp_iob_list)):
            if "B" in temp_iob_list[j]:
                iob_tag = temp_iob_list[j]
            elif "I" in temp_iob_list[j]:
                iob_tag = temp_iob_list[j]
        iob_list.append(iob_tag)
    return iob_list


def reference_mask_texts(texts, drugs, effects, concatenation=False):
    """Verbatim-order transcription of mask_texts (re:10-83)."""
    annotations = []
    masked_texts = []
    annotation = 1
    found_drugs = set()
    found_effects = set()
    if concatenation:
        drug_associations = {}
        effect_associations = {}
        for idx, (drug, effect) in enumerate(zip(drugs, effects)):
            drug_w = drug.split()
            effect_w = effect.split()
            for el in drug_w:
                found_drugs.add(el)
                drug_associations.setdefault(el, idx + 1)
            for el in effect_w:
                found_effects.add(el)
                first = drugs[idx].split()[0]
                effect_associations.setdefault(el, drug_associations[first])
    found_drugs = set()
    found_effects = set()
    for text, drug, effect in zip(texts, drugs, effects):
        associations = []
        new_sent = []
        sent = text.split()
        drug_w = drug.split()
        effect_w = effect.split()
        for w in sent:
            if w in drug_w:
                if w in found_drugs:
                    new_sent.append(w)
                    associations.append(0)
                elif "DRUG" not in new_sent:
                    new_sent.append("DRUG")
                    if concatenation:
                        associations.append(drug_associations[w])
                    else:
                        associations.append(annotation)
                found_drugs.add(w)
            elif w in effect_w:
                if w in found_effects:
                    new_sent.append(w)
                    associations.append(0)
                elif "EFFECT" not in new_sent:
                    new_sent.append("EFFECT")
                    if concatenation:
                        associations.append(effect_associations[w])
                    else:
                        associations.append(annotation)
                found_effects.add(w)
            else:
                new_sent.append(w)
                associations.append(0)
        annotations.append(associations)
        masked_texts.append(" ".join(new_sent))
    return annotations, masked_texts


WORDS = ["alpha", "beta", "gamma", "delta", "kappa", "zeta", "omega", "nu"]
ENTS = ["dorvax", "quilar", "nauseola", "vertigask", "myal", "edema"]


@st.composite
def tagged_sentence(draw):
    """(text, drugs, effects): entities guaranteed present as words."""
    n_drugs = draw(st.integers(1, 2))
    n_effects = draw(st.integers(1, 2))
    picks = draw(
        st.lists(
            st.sampled_from(ENTS),
            min_size=n_drugs + n_effects,
            max_size=n_drugs + n_effects,
            unique=True,
        )
    )
    drugs, effects = picks[:n_drugs], picks[n_drugs:]
    filler = draw(st.lists(st.sampled_from(WORDS), min_size=2, max_size=8))
    body = list(filler)
    for e in drugs + effects:
        pos = draw(st.integers(0, len(body)))
        body.insert(pos, e)
    # occasional repeat of the first drug (first-occurrence quirk)
    if draw(st.booleans()):
        body.append(drugs[0])
    return " ".join(body), drugs, effects


@settings(max_examples=200, deadline=None)
@given(tagged_sentence())
def test_iob_matches_reference_transcription(case):
    text, drugs, effects = case
    assert iob_tag_text(text, drugs, effects) == reference_iob_tagging(
        text, drugs, effects
    )


@settings(max_examples=100, deadline=None)
@given(st.lists(tagged_sentence(), min_size=1, max_size=5))
def test_mask_batch_matches_reference_transcription(cases):
    texts = [c[0] for c in cases]
    drugs = [c[1][0] for c in cases]
    effects = [c[2][0] for c in cases]
    got = mask_texts_batch(texts, drugs, effects)
    want = reference_mask_texts(texts, drugs, effects)
    assert got == tuple(want) or list(got) == list(want)


@settings(max_examples=100, deadline=None)
@given(st.lists(tagged_sentence(), min_size=2, max_size=4))
def test_mask_concat_matches_reference_transcription(cases):
    texts = [c[0] for c in cases]
    drugs = [c[1][0] for c in cases]
    effects = [c[2][0] for c in cases]
    got = mask_texts_batch(texts, drugs, effects, concatenation=True)
    want = reference_mask_texts(texts, drugs, effects, concatenation=True)
    assert list(got) == list(want)
