"""Entity masking + relation-group annotation (RE prep) — kernel port.

Reference: /root/reference/src/RE/data_utilities_re.py:10-83
(`mask_texts`) and 117-139 (`prepare_data_for_re`). Quirks reproduced:

* **Cross-row statefulness**: `found_drugs` / `found_effects` persist
  across every text of one call, so an entity word first seen in row k
  is *not* masked in any later row — it passes through with relation id
  0 (data_utilities_re.py:42-75). This makes the training-prep gold
  order-dependent; `mask_texts_batch` keeps that exact semantic and is
  therefore run over a deterministic, totally-ordered batch (gold
  generation is driver-side; the distributed inference path uses the
  stateless per-sentence variant below, matching FINALMODEL semantics).
* One mask per sentence per type: if ``DRUG`` is already in the rebuilt
  sentence, further drug words are dropped entirely (multi-word drugs
  collapse to a single mask) (data_utilities_re.py:56-63).
* Concatenation mode assigns relation-group ids per source row; an
  effect inherits the id of its paired drug's first word
  (data_utilities_re.py:24-40).
"""

from __future__ import annotations

from typing import Iterable, Sequence


def mask_texts_batch(
    texts: Sequence[str],
    drugs: Sequence[str],
    effects: Sequence[str],
    concatenation: bool = False,
) -> tuple[list[list[int]], list[str]]:
    """Stateful batch masking, semantics of reference `mask_texts`."""
    annotations: list[list[int]] = []
    masked_texts: list[str] = []
    annotation = 1

    drug_group: dict[str, int] = {}
    effect_group: dict[str, int] = {}
    if concatenation:
        for idx, (drug, effect) in enumerate(zip(drugs, effects)):
            d_words = drug.split()
            e_words = effect.split()
            for w in d_words:
                drug_group.setdefault(w, idx + 1)
            for w in e_words:
                first_drug_word = drugs[idx].split()[0]
                effect_group.setdefault(w, drug_group[first_drug_word])

    seen_drug_words: set[str] = set()
    seen_effect_words: set[str] = set()
    for text, drug, effect in zip(texts, drugs, effects):
        rel_ids: list[int] = []
        rebuilt: list[str] = []
        d_words = drug.split()
        e_words = effect.split()
        for w in text.split():
            if w in d_words:
                if w in seen_drug_words:
                    rebuilt.append(w)
                    rel_ids.append(0)
                elif "DRUG" not in rebuilt:
                    rebuilt.append("DRUG")
                    rel_ids.append(drug_group[w] if concatenation else annotation)
                seen_drug_words.add(w)
            elif w in e_words:
                if w in seen_effect_words:
                    rebuilt.append(w)
                    rel_ids.append(0)
                elif "EFFECT" not in rebuilt:
                    rebuilt.append("EFFECT")
                    rel_ids.append(effect_group[w] if concatenation else annotation)
                seen_effect_words.add(w)
            else:
                rebuilt.append(w)
                rel_ids.append(0)
        annotations.append(rel_ids)
        masked_texts.append(" ".join(rebuilt))

    return annotations, masked_texts


def mask_single(
    text: str, drugs: Iterable[str], effects: Iterable[str]
) -> tuple[list[int], str]:
    """Stateless per-sentence masking — the inference-path semantic.

    Equivalent to calling the reference `mask_texts` on a one-row batch
    with fresh state: each drug/effect word set collapses to one DRUG /
    one EFFECT mask with relation id 1.
    """
    d_words = {w for d in drugs for w in d.split()}
    e_words = {w for e in effects for w in e.split()}
    rel_ids: list[int] = []
    rebuilt: list[str] = []
    seen_d: set[str] = set()
    seen_e: set[str] = set()
    for w in text.split():
        if w in d_words:
            if w in seen_d:
                rebuilt.append(w)
                rel_ids.append(0)
            elif "DRUG" not in rebuilt:
                rebuilt.append("DRUG")
                rel_ids.append(1)
            seen_d.add(w)
        elif w in e_words:
            if w in seen_e:
                rebuilt.append(w)
                rel_ids.append(0)
            elif "EFFECT" not in rebuilt:
                rebuilt.append("EFFECT")
                rel_ids.append(1)
            seen_e.add(w)
        else:
            rebuilt.append(w)
            rel_ids.append(0)
    return rel_ids, " ".join(rebuilt)
