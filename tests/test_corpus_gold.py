"""Synthetic corpus determinism + driver-side gold generation."""

from __future__ import annotations

import pandas as pd

from remediner_spark.gold import gold_triples, pair_mentions_positional
from remediner_spark.kernels.webtext import extract_text, split_sentences
from remediner_spark.sources.corpus import (
    drug_lexicon,
    effect_lexicon,
    generate_entity_dictionary,
    generate_pages,
)


def test_corpus_deterministic():
    p1, a1 = generate_pages(100)
    p2, a2 = generate_pages(100)
    pd.testing.assert_frame_equal(p1, p2)
    pd.testing.assert_frame_equal(a1, a2)


def test_pages_shape_and_langs(tmp_path):
    pages, ann = generate_pages(200)
    assert list(pages.columns) == ["url", "warc_ts", "html", "text", "lang"]
    assert set(pages["lang"]) == {"en", "de", "fr"}
    assert pages["url"].is_unique
    # ~80% medical + 10% english filler
    assert (pages["lang"] == "en").mean() >= 0.85


def test_html_extraction_inverts_byte_identically():
    pages, _ = generate_pages(150)
    extracted = extract_text(pages["html"])
    assert (extracted == pages["text"]).all()


def test_segmentation_recovers_annotation_sentences():
    pages, ann = generate_pages(150)
    sents = split_sentences(pages.set_index("url")["text"])
    for url, grp in ann.groupby("url"):
        expected = (
            grp.drop_duplicates(["url", "sent_idx"])
            .sort_values("sent_idx")["text"]
            .tolist()
        )
        assert sents[url] == expected


def test_gold_triples_cover_annotations():
    _, ann = generate_pages(150)
    gold = gold_triples(ann)
    # every annotation row yields exactly one CAUSES triple (multi-pair
    # sentences have one row per relation)
    assert len(gold) == len(ann)
    assert (gold["pred"] == "CAUSES").all()
    # the multi-pair slice exists
    per_sent = ann.groupby(["url", "sent_idx"]).size()
    assert (per_sent > 1).any()
    # subjects/objects are normalized lowercase lexicon surfaces, plus
    # the deterministic typo class (crawl-noise slice)
    from remediner_spark.sources.corpus import typo_surface

    drugs = {d.lower() for d in drug_lexicon()}
    drugs |= {typo_surface(d).lower() for d in drug_lexicon()}
    effects = {e.lower() for e in effect_lexicon()}
    assert set(gold["subj"]).issubset(drugs)
    assert set(gold["obj"]).issubset(effects)
    # the typo slice exists
    assert set(gold["subj"]) - {d.lower() for d in drug_lexicon()}


def test_pair_mentions_positional_dedupes():
    mentions = [
        {"surface": "dorvax", "type": "DRUG", "word_start": 0},
        {"surface": "dorvax", "type": "DRUG", "word_start": 3},
        {"surface": "nauseola", "type": "EFFECT", "word_start": 5},
    ]
    assert pair_mentions_positional(mentions) == [
        ("dorvax", "CAUSES", "nauseola")
    ]


def test_entity_dictionary():
    d = generate_entity_dictionary()
    assert list(d.columns) == [
        "alias",
        "canonical_id",
        "canonical_name",
        "entity_type",
    ]
    assert d["alias"].is_unique or True  # aliases may collide across types
    n_terms = len(drug_lexicon()) + len(effect_lexicon())
    covered = d["canonical_id"].nunique()
    # ~15% of terms deliberately missing
    assert 0.7 * n_terms < covered < 0.95 * n_terms
