"""M3: IOB predictions -> masked text + mention list (NER->RE bridge).

Reference: FinalModel.__convert_output_to_masked_text
(/root/reference/src/FINALMODEL/final_model.py:38-119). Semantics:

* 5-class IOB ids collapse to {O, DRUG, EFFECT}
  (final_model.py:45-60);
* special tokens stripped (final_model.py:67-75);
* words rebuilt from ``##`` subtokens; any word containing a masked
  subtoken run becomes the literal mask; **consecutive masked words
  collapse to a single mask token** via the reference's ``de_append``
  latch (final_model.py:102-106); unmasked words are lowercased
  (final_model.py:95-98).

The reference discards the surfaces it masks; the KG needs them, so
alongside the masked text we emit the mention list
(surface, type, word_start) harvested from the same contiguous runs —
that is the engine-side extension (SURVEY.md M3/M6).

Two deliberate deviations from the reference, both text-sink artifacts
that would corrupt the KG if ported:

* final_model.py:115 appends the pending token unconditionally, so a
  sentence-final multi-subtoken entity emits its mask TWICE
  ("... caused DRUG DRUG"); the engine emits one mask per run
  everywhere (the duplicate would fabricate a second mention).
* a masked subtoken replaced by the literal mask loses its "##" prefix
  in the reference, so a word with mixed O/masked subtokens splits
  into two output words; the engine resolves word class as
  any-masked-subtoken-wins. Irrelevant for word-coherent labelings
  (our taggers label whole words, then propagate), which is the
  equivalence domain pinned by tests/test_reconstruct_differential.py.
* the de_append latch only resets when a NON-mask word is appended
  (final_model.py:95-106), so a mask immediately following a
  different-type mask is dropped entirely ("DRUG EFFECT" -> "DRUG"),
  silently losing the adjacent mention; the engine emits one mask per
  contiguous same-class run and keeps both mentions.
"""

from __future__ import annotations

IOB_TO_MASK = {
    "O": "O",
    "B-Drug": "DRUG",
    "I-Drug": "DRUG",
    "B-Effect": "EFFECT",
    "I-Effect": "EFFECT",
}


def reconstruct_masked_text(
    subtokens: list[str], sub_labels: list[str]
) -> tuple[str, list[dict]]:
    """Rebuild masked text from wordpiece subtokens + per-subtoken IOB.

    Returns (masked_text, mentions) where mentions is a list of dicts
    {surface, type, word_start}: surface is the original (pre-mask)
    word run, type in {DRUG, EFFECT}, word_start the output-word index
    of the mask token that replaced the run.
    """
    # Fold subtokens back into words, tracking per-word mask class and
    # original surface.
    word_surfaces: list[str] = []
    word_classes: list[str] = []  # O | DRUG | EFFECT (any masked subtoken wins)
    for tok, lab in zip(subtokens, sub_labels):
        mask_class = IOB_TO_MASK.get(lab, "O")
        if tok.startswith("##") and word_surfaces:
            word_surfaces[-1] += tok[2:]
            if mask_class != "O" and word_classes[-1] == "O":
                word_classes[-1] = mask_class
        else:
            word_surfaces.append(tok)
            word_classes.append(mask_class)

    out_words: list[str] = []
    mentions: list[dict] = []
    run_surface: list[str] = []
    run_class = "O"

    def flush_run():
        nonlocal run_surface, run_class
        if run_surface and run_class != "O":
            mentions.append(
                {
                    "surface": " ".join(run_surface),
                    "type": run_class,
                    "word_start": len(out_words),
                }
            )
            out_words.append(run_class)  # single mask per contiguous run
        run_surface = []
        run_class = "O"

    for surface, cls in zip(word_surfaces, word_classes):
        if cls == "O":
            flush_run()
            out_words.append(surface.lower())
        elif cls == run_class:
            run_surface.append(surface)  # extend the run: one mask total
        else:
            flush_run()
            run_class = cls
            run_surface = [surface]
    flush_run()

    return " ".join(out_words), mentions


def mentions_from_word_iob(
    words: list[str], tags: list[str]
) -> tuple[str, list[dict]]:
    """Word-level fast path: same semantics without the subtoken round-trip.

    Used when the tagger already produces word-aligned IOB (the
    deterministic gazetteer); equivalent to wordpiece-propagating and
    reconstructing, verified by test parity.
    """
    classes = [IOB_TO_MASK.get(t, "O") for t in tags]
    out_words: list[str] = []
    mentions: list[dict] = []
    i = 0
    n = len(words)
    while i < n:
        cls = classes[i] if i < len(classes) else "O"
        if cls == "O":
            out_words.append(words[i].lower())
            i += 1
        else:
            j = i
            while j < n and j < len(classes) and classes[j] == cls:
                j += 1
            mentions.append(
                {
                    "surface": " ".join(words[i:j]),
                    "type": cls,
                    "word_start": len(out_words),
                }
            )
            out_words.append(cls)
            i = j
    return " ".join(out_words), mentions
