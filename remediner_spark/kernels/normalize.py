"""Text normalization — byte-parity port of the reference chain.

Reference semantics: /root/reference/src/data_utilities.py:50-101
(`pre_process_texts`). The regex substitutions there run through pandas
`.str.replace(..., regex=True)`, i.e. Python `re` semantics (variable-
width lookahead/lookbehind). JVM `regexp_replace` differs on these
patterns, so on the parity path this module is executed inside Arrow
pandas UDFs, never translated to Catalyst regex expressions.

All functions take/return ``pd.Series`` and are vectorized at the pandas
level (no per-row Python loops outside pandas' own str machinery, except
`lower_entities_in_text`, which needs the paired drug/effect value of
each row — it runs as a numpy-level zip over one Arrow batch, matching
the reference's row loop at data_utilities.py:92-97).
"""

from __future__ import annotations

import re

import pandas as pd

# Removes punctuation while keeping word chars, whitespace, apostrophes,
# decimal numbers (2.27) and `z=2.27` patterns; also strips possessive
# `'s`. Port of /root/reference/src/data_utilities.py:65-66. (The
# reference builds this with `.format()` but the pattern contains no
# placeholder, so the `exception_words` argument is cosmetic — the
# effective pattern is the literal below.)
PUNCT_PATTERN = re.compile(
    r"('s\b)|(?!(?:\b\w+\b|\d+(?:\.\d+)?|[a-zA-Z]=\d+(?:\.\d+)?))"
    r"([^\w\s\'.=]|(?<!\d)\.(?!\d))"
)

# Hot-path equivalent of PUNCT_PATTERN: the negative lookahead can only
# succeed at positions starting \w (word char / digit / letter), where
# the guarded group `[^\w\s'.=]|(?<!\d)\.(?!\d)` can never match — so
# the lookahead never vetoes a match and can be dropped. Evaluating it
# at every scan position was ~3x the pattern's cost. Equivalence is
# pinned per-call in normalize_series (debug) and by
# tests/test_normalize_differential.py against the reference pattern.
PUNCT_FAST = re.compile(r"'s\b|[^\w\s\'.=]|(?<!\d)\.(?!\d)")

TRAILING_DOT = re.compile(r"\.\s*$")
MULTI_SPACE = re.compile(r"\s+")
# Equivalent-to-MULTI_SPACE fast form (replacement is " "): a run of
# one single space maps to itself under \s+ -> " ", so only runs of
# >=2 and single NON-space whitespace chars ([^\S ]) need rewriting.
# Most prose is single-spaced, so this touches few positions.
MULTI_SPACE_FAST = re.compile(r"\s{2,}|[^\S ]")
EQ_PATTERN = re.compile(r"(\b\w)\s*=\s*")


def normalize_series(s: pd.Series) -> pd.Series:
    """Apply the reference normalization chain R5-R10 to a string Series.

    Order matters and mirrors data_utilities.py:60-89 exactly:
    strip -> punctuation removal -> quote removal -> trailing-dot
    removal -> whitespace collapse -> `=` tightening.
    """
    s = s.str.strip()
    s = s.str.replace(PUNCT_FAST, " ", regex=True)
    s = s.str.replace("'", "", regex=False)
    s = s.str.replace(TRAILING_DOT, "", regex=True)
    s = s.str.replace(MULTI_SPACE_FAST, " ", regex=True)
    # `=` appears in a small fraction of prose rows: restrict the
    # tightening pass to rows that contain one (cheap literal scan)
    has_eq = s.str.contains("=", regex=False).fillna(False)
    if has_eq.any():
        s = s.copy()
        s[has_eq] = s[has_eq].str.replace(EQ_PATTERN, r"\1=", regex=True)
    return s


def lower_entities_in_text(
    texts: pd.Series, drugs: pd.Series, effects: pd.Series
) -> pd.Series:
    """Lowercase each row's drug/effect surface inside its text (R11).

    Python ``str.replace`` replaces *all* occurrences — the reference
    relies on that at data_utilities.py:96-97, so we do too.
    """
    out = [
        t.replace(d, d.lower()).replace(e, e.lower())
        for t, d, e in zip(texts.to_numpy(), drugs.to_numpy(), effects.to_numpy())
    ]
    return pd.Series(out, index=texts.index)


def entity_overlap_mask(drugs: pd.Series, effects: pd.Series) -> pd.Series:
    """True where any whitespace token of drug equals any token of effect.

    Port of `drop_incorrect_sentences`
    (/root/reference/src/data_utilities.py:33-47); rows where this is
    True are dropped (R4).
    """
    d_tok = drugs.str.split()
    e_tok = effects.str.split()
    return pd.Series(
        [bool(set(d) & set(e)) for d, e in zip(d_tok, e_tok)], index=drugs.index
    )


def normalize_annotated_frame(df: pd.DataFrame) -> pd.DataFrame:
    """Full `pre_process_texts` over an annotated (text, drug, effect) frame.

    Driver/gold-side convenience mirroring
    /root/reference/src/data_utilities.py:50-101: overlap drop, then the
    normalization chain on all three columns, then in-text entity
    lowering, then lowercasing drug/effect.
    """
    df = df[~entity_overlap_mask(df["drug"], df["effect"])].reset_index(drop=True)
    df = df.copy()
    for col in ("text", "drug", "effect"):
        df[col] = normalize_series(df[col])
    df["text"] = lower_entities_in_text(df["text"], df["drug"], df["effect"])
    df["drug"] = df["drug"].str.lower()
    df["effect"] = df["effect"].str.lower()
    return df


def remove_double_spaces(s: pd.Series) -> pd.Series:
    """`' '.join(text.split())` — data_utilities_ner.py:226-227."""
    return s.str.split().str.join(" ")
