"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md).

Generates, with a fixed seed and no external data:

* ``pages(url, warc_ts, html, text, lang)`` — the engine input shape
  mandated by BASELINE.json:15; ``html`` is a deterministic wrapping of
  ``text`` that kernels.webtext.extract_text inverts byte-identically.
* ``ade_annotations(url, sent_idx, text, drug, effect, split)`` — the
  ADE-style annotated split mirroring the reference's post-load frame
  (/root/reference/src/data_utilities.py:10-17), tied to pages.
* ``entity_dictionary(alias, canonical_id, canonical_name,
  entity_type)`` — canonicalization dictionary; ~15% of surfaces are
  deliberately absent to exercise the LSH residual path.

Lexicons are synthetic coinages so no term is a substring of template
prose (the reference's first-occurrence `re.search` has no word
boundaries — /root/reference/src/NER/data_utilities_ner.py:19-24 — so
substring collisions would silently shift gold spans).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

SEED = 42
# bump when generated content changes (bench corpus caches key on it)
CORPUS_VERSION = 2

# ~50 synthetic drug terms (1-3 words), ~80 synthetic effect terms.
_DRUG_STEMS = [
    "dorvax", "quilar", "zemtra", "bexole", "cavrin", "lumera", "tazonib",
    "rivexa", "mondel", "pretova", "salvex", "cortivan", "nubrexa", "oxitrel",
    "velgard", "amprezol", "fluzerta", "gratellin", "himbrosa", "ixelvan",
    "jantrix", "kelovir", "lorzepin", "mavrotec", "nelfira", "orbantil",
    "pexidrol", "quenzira", "rastivon", "sulbrena", "tremodal", "ulvestra",
    "vintrazol", "wexolide", "xanverin", "yotrezal", "zubrantin", "altherex",
    "bromivant", "cylestra", "dremozal", "eltruvax", "fornadel", "gilvoxam",
    "hastrine", "ivandrol", "jexopril", "klorvena", "lantrevin", "mirzotan",
]
_DRUG_SUFFIXES = ["", "", "", " xr", " forte", " depot"]

_EFFECT_TERMS = [
    "nauseola", "cephalgia verta", "dermic eruptia", "hepatic lysteria",
    "renovia failure", "cardiomexia", "neuropraxis", "thrombovenia",
    "agranulexia", "myalgora", "vertigask", "somnolexia", "pruritend",
    "edemara", "dyspnexa", "anaphylora", "hypotensia grave", "bradyxia",
    "tachyvexia", "arrhythmora", "pancreolitis", "nephroxia", "ototoxia",
    "retinovexia", "alopexia", "stomatovia", "glossinia", "dysgeusora",
    "xerostenia", "mucositex", "neutropexia", "anemora", "leukovenia",
    "eosinophora", "hyperkalemora", "hyponatrexia", "hypoglycora",
    "ketoacidora", "lactacidemia vex", "rhabdolyxia", "myopatex",
    "osteonecrora", "arthralgex", "tendonitex", "fasciitora", "seizurex",
    "tremolora", "dyskinesex", "akathisora", "dystonex", "parkinsora",
    "confusional vex", "hallucinora", "insomnex", "agitora", "anxiolexia",
    "depressora", "maniavex", "psychotora", "amnesora", "aphasora",
    "ataxovia", "diplopex", "blurrovia", "tinnitex", "hyperacusora",
    "photophobex", "epistaxora", "hemoptysex", "hematurora", "melenora",
    "purpurex", "petechora", "ecchymotex", "urticarex", "angioedemora",
    "bronchospasx", "laryngovexia", "pneumonitex", "fibrosora",
]

_FILLER_EN = [
    "The committee reviewed the quarterly housing report on Tuesday.",
    "Local volunteers planted three hundred trees along the river path.",
    "The museum extended its opening hours for the summer festival.",
    "Engineers completed the bridge inspection ahead of schedule.",
    "A new bakery opened on the corner of Elm Street last week.",
]
_FILLER_DE = [
    "Der Gemeinderat hat die neue Satzung am Dienstag beschlossen.",
    "Die Bibliothek bleibt im August wegen Renovierung geschlossen.",
]
_FILLER_FR = [
    "Le conseil municipal a adopté le nouveau budget mardi soir.",
    "La bibliothèque restera fermée pendant les travaux de rénovation.",
]

# Templates vary entity position; a slice injects punctuation so the
# normalization chain does real work, and slices exercise the
# first-occurrence / repeated-mention quirks.
_TEMPLATES = [
    "A 63 year old patient developed {effect} after taking {drug}.",
    "Treatment with {drug} caused severe {effect} within two weeks.",
    "{drug} induced {effect} in an elderly patient.",
    "We report a case of {effect} associated with {drug} therapy.",
    "Following administration of {drug}, the patient experienced {effect}.",
    "{effect} was observed (z = 2.27) after {drug} infusion.",
    "The patient's {effect} resolved after {drug} was discontinued.",
    "{drug} was given twice; {drug} later caused {effect}.",
    "High-dose {drug} therapy, started in March, led to {effect}.",
]


def drug_lexicon() -> list[str]:
    rng = np.random.RandomState(SEED)
    out = []
    for i, stem in enumerate(_DRUG_STEMS):
        suffix = _DRUG_SUFFIXES[rng.randint(0, len(_DRUG_SUFFIXES))]
        out.append((stem + suffix).strip())
    return out


def effect_lexicon() -> list[str]:
    return list(_EFFECT_TERMS)


def _zipf_probs(n: int) -> np.ndarray:
    w = 1.0 / np.arange(1, n + 1)
    return w / w.sum()


def typo_surface(term: str) -> str:
    """Deterministic 'crawl-noise' variant: duplicate the middle char of
    the first word (dorvax -> dorvvax). Distinct from the dictionary's
    alias-typo class (char swap, corpus.generate_entity_dictionary), so
    these surfaces are NOT dictionary aliases and must resolve through
    the MinHash-LSH residual path (M8)."""
    words = term.split()
    w = words[0]
    mid = len(w) // 2
    words[0] = w[:mid] + w[mid] + w[mid:]
    return " ".join(words)


TYPO_FRACTION = 0.08
MULTI_PAIR_FRACTION = 0.06

# two relation pairs in ONE sentence: drug/effect first-occurrence
# order is d1,d2 / e1,e2 so the reference's positional relation-group
# pairing yields (d1,e1) and (d2,e2) — matching the two gold rows.
_MULTI_TEMPLATES = [
    "Both {d1} and {d2} were administered; {d1} caused {e1} "
    "while {d2} produced {e2}.",
    "After starting {d1} and later {d2}, the patient developed {e1} "
    "and subsequently {e2}.",
]


def generate_annotations(n_pages: int, rng: np.random.RandomState) -> pd.DataFrame:
    """One row per (sentence, drug, effect) relation instance."""
    drugs = drug_lexicon()
    effects = effect_lexicon()
    d_probs = _zipf_probs(len(drugs))  # head-drug skew (exercises salting)
    rows = []
    n_medical = int(n_pages * 0.8)
    for page_i in range(n_medical):
        url = f"https://example.org/doc/{page_i:08d}"
        n_sents = 1 + rng.randint(0, 4)
        for sent_idx in range(n_sents):
            if rng.rand() < MULTI_PAIR_FRACTION:
                # two-relation sentence -> two annotation rows sharing
                # (url, sent_idx); entities all distinct
                i1, i2 = rng.choice(len(drugs), size=2, replace=False)
                j1, j2 = rng.choice(len(effects), size=2, replace=False)
                d1, d2 = drugs[i1], drugs[i2]
                e1, e2 = effects[j1], effects[j2]
                template = _MULTI_TEMPLATES[
                    rng.randint(0, len(_MULTI_TEMPLATES))
                ]
                text = template.format(d1=d1, d2=d2, e1=e1, e2=e2)
                rows.append((url, sent_idx, text, d1, e1))
                rows.append((url, sent_idx, text, d2, e2))
                continue
            drug = drugs[rng.choice(len(drugs), p=d_probs)]
            # a slice of mentions carries crawl noise: the typo'd
            # surface appears in BOTH the text and the gold mention
            # (the NER model generalizes to it; the dictionary doesn't)
            if rng.rand() < TYPO_FRACTION:
                drug = typo_surface(drug)
            effect = effects[rng.randint(0, len(effects))]
            template = _TEMPLATES[rng.randint(0, len(_TEMPLATES))]
            text = template.format(drug=drug, effect=effect)
            rows.append((url, sent_idx, text, drug, effect))
    df = pd.DataFrame(
        rows, columns=["url", "sent_idx", "text", "drug", "effect"]
    )
    df["sent_idx"] = df["sent_idx"].astype("int32")
    # 80/10/10 split, deterministic permutation (reference uses sklearn
    # random_state=0; we only need *a* fixed split, not sklearn parity,
    # for our own gold — documented deviation, split is seeded here).
    perm = np.random.RandomState(0).permutation(len(df))
    split = np.full(len(df), "train", dtype=object)
    n_test = len(df) // 10
    split[perm[:n_test]] = "test"
    split[perm[n_test : 2 * n_test]] = "val"
    df["split"] = split
    return df


def generate_pages(n_pages: int, seed: int = SEED) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Returns (pages, ade_annotations)."""
    rng = np.random.RandomState(seed)
    ann = generate_annotations(n_pages, rng)
    # medical pages: join their sentences in sent_idx order
    page_text = (
        ann.drop_duplicates(["url", "sent_idx"])
        .sort_values(["url", "sent_idx"])
        .groupby("url")["text"]
        .agg(" ".join)
    )
    urls = [f"https://example.org/doc/{i:08d}" for i in range(n_pages)]
    texts, langs = [], []
    n_medical = int(n_pages * 0.8)
    n_filler_en = int(n_pages * 0.1)
    for i, url in enumerate(urls):
        if i < n_medical:
            texts.append(page_text.get(url, _FILLER_EN[i % len(_FILLER_EN)]))
            langs.append("en")
        elif i < n_medical + n_filler_en:
            texts.append(_FILLER_EN[rng.randint(0, len(_FILLER_EN))])
            langs.append("en")
        else:
            if rng.randint(0, 2) == 0:
                texts.append(_FILLER_DE[rng.randint(0, len(_FILLER_DE))])
                langs.append("de")
            else:
                texts.append(_FILLER_FR[rng.randint(0, len(_FILLER_FR))])
                langs.append("fr")
    pages = pd.DataFrame(
        {
            "url": urls,
            # microsecond precision: Spark's parquet reader rejects
            # pandas' default TIMESTAMP(NANOS)
            "warc_ts": (
                pd.Timestamp("2024-01-01T00:00:00")
                + pd.to_timedelta(np.arange(n_pages), unit="s")
            ).astype("datetime64[us]"),
            "html": [
                b"<html><body><p>" + t.encode("utf-8") + b"</p></body></html>"
                for t in texts
            ],
            "text": texts,
            "lang": langs,
        }
    )
    return pages, ann


# bench cache-key version for the DERIVED links corpus: bump whenever
# add_outlinks' injection rule changes, or bench.py silently reuses a
# stale tiled corpus from /dev/shm and benches the old graph (r7
# ADVICE) — CORPUS_VERSION alone only tracks the BASE generator.
LINKS_VERSION = 1


def add_outlinks(pages: pd.DataFrame) -> pd.DataFrame:
    """Inject deterministic ``<a href>`` outlinks into each page's html
    — the web-graph dimension of a Common-Crawl-style corpus (link
    extraction, host graphs, PageRank over the crawl).

    Anchors carry EMPTY display text, so tag-stripping extraction
    yields byte-identical text (the north-rule invariant; pinned by
    tests/test_linkgraph.py). Targets are a pure function of the page
    index: 1 + i%4 internal links to other corpus docs plus, on every
    third page, one external asset-host link — so the link graph is
    reproducible everywhere without shipping an edge file."""
    n = len(pages)
    out = pages.copy()
    htmls = []
    for i, h in enumerate(out["html"]):
        anchors = []
        for j in range(1 + i % 4):
            t = (i * 31 + j * 17 + 1) % n
            anchors.append(
                f'<a href="https://example.org/doc/{t:08d}"></a>'
            )
        if i % 3 == 0:
            anchors.append(
                f'<a href="https://cdn{(i // 3) % 7}.example-assets.net'
                f'/l/{i % 11}"></a>'
            )
        htmls.append(
            h.replace(b"</body>", "".join(anchors).encode() + b"</body>")
        )
    out["html"] = htmls
    return out


def generate_entity_dictionary(seed: int = SEED) -> pd.DataFrame:
    """alias -> (canonical_id, canonical_name, entity_type).

    Aliases: canonical lowercase form + case variant + hyphen variant +
    one deterministic typo class; ~15% of lexicon entries get NO alias
    rows (unresolvable -> LSH residual path).
    """
    rng = np.random.RandomState(seed + 1)
    rows = []
    cid = 0
    for etype, lexicon in (("DRUG", drug_lexicon()), ("EFFECT", effect_lexicon())):
        for term in lexicon:
            cid += 1
            if rng.rand() < 0.15:
                continue  # deliberately missing from the dictionary
            canonical = term.lower()
            aliases = {canonical}
            aliases.add(canonical.replace(" ", "-"))
            if len(canonical) > 4:  # one-char-swap typo alias
                i = 1 + rng.randint(0, len(canonical) - 3)
                typo = canonical[:i] + canonical[i + 1] + canonical[i] + canonical[i + 2 :]
                aliases.add(typo)
            for a in sorted(aliases):
                rows.append((a, cid, canonical, etype))
    return pd.DataFrame(
        rows, columns=["alias", "canonical_id", "canonical_name", "entity_type"]
    ).astype({"canonical_id": "int64"})


def write_corpus(out_dir: str, n_pages: int, seed: int = SEED) -> None:
    """Materialize the three tables as parquet under out_dir."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    pages, ann = generate_pages(n_pages, seed)
    pages.to_parquet(os.path.join(out_dir, "pages.parquet"), index=False)
    ann.to_parquet(os.path.join(out_dir, "ade_annotations.parquet"), index=False)
    generate_entity_dictionary(seed).to_parquet(
        os.path.join(out_dir, "entity_dictionary.parquet"), index=False
    )
