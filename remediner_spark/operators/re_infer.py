"""M5 executed: batched RE-head inference as a mapInPandas stage.

The reference runs NER -> masked-text reframe (M4) -> ReModel forward
-> per-token argmax (/root/reference/src/FINALMODEL/test_final.py:75-95).
Torch is absent in this environment, so the forward is the numpy
transcription of the same head architecture (kernels/re_head.py);
weights ship once per executor via SparkContext.broadcast exactly like
the torch path (operators/bert_stub.broadcast_weights), and the
argmax -> first-subtoken word projection -> M6 assembly decode chain
is the real engine code either way.

Input rows:  (sent_id long, ids array<int>, word_ids array<int>)
             ids = framed subtoken ids (A6), word_ids = output-word
             index per subtoken position, -1 for CLS/SEP/PAD and
             continuation pieces.
Output rows: (sent_id long, rel_ids array<int>) — one relation-group
             id per output word (first-subtoken projection, the HF
             convention BertTagger uses).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..kernels.re_head import (
    init_re_head_params,
    re_head_forward,
    seeded_encoder,
)

D_IN_DEFAULT = 48  # stands for the reference's 4*768 concat width
HIDDEN_DEFAULT = 16  # reference: 128
REDUCED_DEFAULT = 24  # reference: 768 // 2


def broadcast_re_weights(
    spark: SparkSession,
    max_len: int,
    seed: int = 7,
    d_in: int = D_IN_DEFAULT,
    hidden: int = HIDDEN_DEFAULT,
    reduced: int = REDUCED_DEFAULT,
):
    """Materialize seeded head weights driver-side and broadcast —
    the same ship-once-per-executor contract as the torch weights."""
    params = init_re_head_params(seed, d_in, hidden, max_len, reduced)
    params["_d_in"] = np.array([d_in])
    return spark.sparkContext.broadcast(params)


def predict_word_rel_ids(
    ids_batch: np.ndarray, word_ids_batch: list, params: dict
) -> list[list[int]]:
    """ids [B, T] -> per-word relation ids (driver-reusable so the
    Spark stage has an exact in-process differential)."""
    from ..kernels.wordpiece import project_first_subtoken

    d_in = int(params["_d_in"][0])
    X = seeded_encoder(ids_batch, d_in)
    logits = re_head_forward(X, params)
    preds = logits.argmax(axis=-1)  # [B, T]
    out = []
    for row, word_ids in enumerate(word_ids_batch):
        wid_arr = np.asarray(word_ids)
        n_words = int(wid_arr.max()) + 1 if (wid_arr >= 0).any() else 0
        out.append(project_first_subtoken(preds[row], wid_arr, n_words))
    return out


def re_infer_stage(framed: DataFrame, weights_bc) -> DataFrame:
    """Batched inference over framed rows; ONE Arrow hop per batch."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        params = weights_bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = np.stack(pdf["ids"].to_numpy())
            rel = predict_word_rel_ids(
                ids, list(pdf["word_ids"].to_numpy()), params
            )
            yield pd.DataFrame({"sent_id": pdf["sent_id"], "rel_ids": rel})

    return framed.select("sent_id", "ids", "word_ids").mapInPandas(
        fn, "sent_id long, rel_ids array<int>"
    )
