"""Training-data preparation operators (A3/A4/A7/A8) — distributed.

These feed model training (out-of-band for the query engine) but are
part of the reference's dataflow surface, so they exist as Spark
operators with parity tests against literal pandas transcriptions.

* A3 concat augmentation: the reference's RNG stream
  (np.random.seed(0), /root/reference/src/NER/data_utilities_ner.py:
  198-223) is replayed driver-side into a tiny (group_id, pos,
  row_idx) index table; the heavy lifting — joining rows and
  order-preserving concatenation — is a distributed join + groupBy
  with sort_array(collect_list(struct(pos, ...))).
* A4 stateful RE prep: inherently sequential (cross-row found-sets,
  /root/reference/src/RE/data_utilities_re.py:42-75) -> runs the
  kernel over a single ordered partition; documented as the gold/
  training path only.
* A7 class weights: per-sentence weight vectors via an Arrow batch of
  the numpy kernel, then a distributed average.
* A8 split: two variants — the engine-native hash split (scales, no
  global ordering) and the driver-side permutation index table that
  reproduces a seeded shuffle exactly for parity-sized gold data.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..kernels.iob import LABEL_ID
from ..kernels.mask import mask_texts_batch
from ..kernels.weights import NUM_CLASSES, balanced_weights_one


def augmentation_index(
    n_rows: int, proportion: float = 0.33, seed: int = 0
) -> pd.DataFrame:
    """Replay the reference's exact np.random.randint stream into
    (group_id, pos, row_idx) rows (data_utilities_ner.py:209-213)."""
    np.random.seed(seed)
    size = int(np.ceil(n_rows * proportion))
    rows = []
    group_id = 0
    for concat_number in range(2, 5):
        for _ in range(size):
            idxs = [
                np.random.randint(low=0, high=n_rows)
                for _ in range(concat_number)
            ]
            for pos, ridx in enumerate(idxs):
                rows.append((group_id, pos, ridx))
            group_id += 1
    return pd.DataFrame(rows, columns=["group_id", "pos", "row_idx"])


def augment_concat_ner(
    spark: SparkSession, ann: DataFrame, proportion: float = 0.33, seed: int = 0
) -> DataFrame:
    """A3: original rows (drug/effect as 1-lists) + concatenated rows.

    ann must carry a contiguous 0-based ``row_idx`` column. Texts join
    with the reference's leading-space concatenation then double-space
    cleanup (concatenate_texts at data_utilities_ner.py:172-177 +
    remove_double_spaces at :226-227), reproduced by concat_ws over
    pos-sorted collect_list.
    """
    n_rows = ann.count()
    index_df = F.broadcast(
        spark.createDataFrame(augmentation_index(n_rows, proportion, seed))
    )
    joined = index_df.join(ann, "row_idx")
    concatenated = (
        joined.groupBy("group_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("pos", "text", "drug", "effect"))
            ).alias("parts")
        )
        .select(
            F.concat_ws(" ", F.transform("parts", lambda p: p.text)).alias(
                "text"
            ),
            F.transform("parts", lambda p: p.drug).alias("drug"),
            F.transform("parts", lambda p: p.effect).alias("effect"),
        )
    )
    originals = ann.select(
        "text", F.array("drug").alias("drug"), F.array("effect").alias("effect")
    )
    return originals.unionByName(concatenated)


def prepare_re_gold_stage(ann: DataFrame) -> DataFrame:
    """A4 (stateful training-prep path): masked_text + relation ids.

    The reference semantics are order-dependent across the WHOLE
    dataset (shared found-sets), so this stage repartitions to one
    ordered partition and runs the kernel sequentially — correct by
    construction, used only for gold/training prep at gold-data scale.
    The scalable inference-path masking lives in the fused triple
    stage (operators/ner.py).
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pdf = pd.concat(list(batches), ignore_index=True)
        if len(pdf) == 0:
            return
        pdf = pdf.sort_values("row_idx").reset_index(drop=True)
        annotations, masked = mask_texts_batch(
            pdf["text"].tolist(), pdf["drug"].tolist(), pdf["effect"].tolist()
        )
        yield pd.DataFrame(
            {
                "row_idx": pdf["row_idx"],
                "masked_text": [" ".join(m.split()) for m in masked],
                "annotated_text": annotations,
            }
        )

    return (
        ann.select("row_idx", "text", "drug", "effect")
        .coalesce(1)
        .mapInPandas(
            fn, "row_idx long, masked_text string, annotated_text array<int>"
        )
    )


def class_weights_stage(tagged: DataFrame, iob_col: str = "iob") -> list[float]:
    """A7: dataset-average balanced class weights from word-level IOB
    arrays. Per-row vectors are computed in an Arrow batch (numpy
    kernel), averaged by a distributed agg."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = [
                balanced_weights_one(
                    np.array([LABEL_ID[t] for t in tags], dtype=np.int64)
                )
                for tags in pdf[iob_col]
            ]
            out = pd.DataFrame(
                np.array(vecs), columns=[f"w{i}" for i in range(NUM_CLASSES)]
            )
            yield out

    cols = ", ".join(f"w{i} double" for i in range(NUM_CLASSES))
    vecs = tagged.select(iob_col).mapInPandas(fn, cols)
    row = vecs.agg(
        *[F.avg(f"w{i}").alias(f"w{i}") for i in range(NUM_CLASSES)]
    ).collect()[0]
    return [row[f"w{i}"] for i in range(NUM_CLASSES)]


def hash_split(
    df: DataFrame, key: str = "url", fractions=(0.8, 0.1, 0.1)
) -> DataFrame:
    """A8 (engine-native): deterministic hash split — scales without a
    global shuffle or ordering (split is a pure function of the key)."""
    buckets = 100
    h = F.pmod(F.xxhash64(F.col(key)), F.lit(buckets))
    train_hi = int(fractions[0] * buckets)
    val_hi = train_hi + int(fractions[1] * buckets)
    return df.withColumn(
        "split",
        F.when(h < train_hi, "train")
        .when(h < val_hi, "val")
        .otherwise("test"),
    )


def sklearn_split_indices(
    n_rows: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """A8 exact transcription of the reference's split chain
    (/root/reference/src/main.py:148-151 ->
    /root/reference/src/data_utilities.py:20-29):

        indices = np.arange(n)
        train, rest = train_test_split(indices, test_size=0.2,
                                       random_state=0)
        val, test   = train_test_split(rest,    test_size=0.5,
                                       random_state=0)

    sklearn's ShuffleSplit semantics (public source,
    sklearn/model_selection/_split.py::ShuffleSplit._iter_indices):
    rng = np.random.RandomState(random_state);
    perm = rng.permutation(n); test = perm[:n_test],
    train = perm[n_test:n_test+n_train], with n_test =
    ceil(test_size*n) and n_train = n - n_test. sklearn itself is not
    installed here; the transcription is pinned by a golden-index test
    (numpy's RandomState permutation is platform-stable).

    Returns (train_idx, val_idx, test_idx) in sklearn's output order.
    """
    import math

    def _shuffle_split(arr: np.ndarray, test_size: float, seed: int):
        n = len(arr)
        n_test = math.ceil(test_size * n)
        n_train = n - n_test
        perm = np.random.RandomState(seed).permutation(n)
        return arr[perm[n_test : n_test + n_train]], arr[perm[:n_test]]

    indices = np.arange(n_rows)
    train_idx, rest = _shuffle_split(indices, 0.2, 0)
    val_idx, test_idx = _shuffle_split(rest, 0.5, 0)
    return train_idx, val_idx, test_idx


def sklearn_exact_split(spark: SparkSession, n_rows: int) -> DataFrame:
    """A8 parity table: row_idx -> split with the reference's exact
    80/10/10 membership (sklearn_split_indices), joinable onto gold
    rows the same way main.py uses .iloc[indices]."""
    train_idx, val_idx, test_idx = sklearn_split_indices(n_rows)
    split = np.empty(n_rows, dtype=object)
    split[train_idx] = "train"
    split[val_idx] = "val"
    split[test_idx] = "test"
    return spark.createDataFrame(
        pd.DataFrame({"row_idx": np.arange(n_rows), "split": split})
    )


def permutation_split(
    spark: SparkSession, n_rows: int, fractions=(0.8, 0.1, 0.1), seed: int = 0
) -> DataFrame:
    """A8 (parity variant): a seeded permutation index table
    (row_idx -> split), joinable onto gold data — the same mechanism as
    the reference's fixed-seed sklearn splits
    (/root/reference/src/data_utilities.py:20-29), with a numpy RNG."""
    perm = np.random.RandomState(seed).permutation(n_rows)
    n_test = int(n_rows * fractions[2])
    n_val = int(n_rows * fractions[1])
    split = np.full(n_rows, "train", dtype=object)
    split[perm[:n_test]] = "test"
    split[perm[n_test : n_test + n_val]] = "val"
    pdf = pd.DataFrame({"row_idx": np.arange(n_rows), "split": split})
    return spark.createDataFrame(pdf)
