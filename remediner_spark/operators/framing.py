"""A5/A6: wordpiece tokenization + BERT input framing as a Spark stage.

Turns word-level rows (words + labels) into model-ready rows
(ids, attention_mask, label_ids) — the distributed equivalent of the
reference's tensor building (get_ner_inputs,
/root/reference/src/NER/data_utilities_ner.py:132-168; get_re_inputs,
/root/reference/src/RE/data_utilities_re.py:193-229). Tensors are
never materialized globally: each Arrow batch frames its rows with
numpy-sized lists, ready for a model UDF to consume in the same
process.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from ..kernels.iob import LABEL_ID
from ..kernels.wordpiece import (
    DeterministicWordpiece,
    frame_bert_input,
    tokenize_words_with_labels,
)

FRAMING_SCHEMA = (
    "url string, sent_idx int, ids array<int>, attention_mask array<int>, "
    "label_ids array<int>"
)


def bert_framing_stage(
    tagged: DataFrame,
    max_len: int = 128,
    tokenizer_factory=DeterministicWordpiece,
) -> DataFrame:
    """(url, sent_idx, words, iob) -> framed model inputs.

    ``tokenizer_factory`` is constructed once per Python worker (the
    real HF tokenizer drops in behind the same 3-method interface).
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tok = tokenizer_factory()
        for pdf in batches:
            ids_col, mask_col, labels_col = [], [], []
            for words, tags in zip(pdf["words"], pdf["iob"]):
                label_ids = [LABEL_ID.get(t, 0) for t in tags]
                subtoks, sublabels = tokenize_words_with_labels(
                    list(words), label_ids, tok
                )
                ids, mask, framed = frame_bert_input(
                    subtoks, sublabels, max_len, tok
                )
                ids_col.append(ids)
                mask_col.append(mask)
                labels_col.append(framed)
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "sent_idx": pdf["sent_idx"],
                    "ids": ids_col,
                    "attention_mask": mask_col,
                    "label_ids": labels_col,
                }
            )

    return tagged.mapInPandas(fn, FRAMING_SCHEMA)
