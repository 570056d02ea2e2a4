"""A7: balanced class-weight kernel — numpy port of the reference.

Reference: /root/reference/src/data_utilities.py:104-137
(`compute_weights` + `get_missed_class`). sklearn's 'balanced' rule is
n_samples / (n_classes_present * bincount); classes absent from a
sentence are inserted at their class index with max(weights) +
mean(weights), exactly as the reference's np.insert loop does.
"""

from __future__ import annotations

import numpy as np

NUM_CLASSES = 5


def balanced_weights_one(labels: np.ndarray) -> np.ndarray:
    """Per-sentence 5-vector (labels already -100-filtered)."""
    labels = np.asarray(labels)
    labels = labels[labels != -100]
    classes = np.unique(labels)
    counts = np.array([(labels == c).sum() for c in classes], dtype=float)
    # sklearn 'balanced': len(y) / (n_classes * bincount)
    weights = len(labels) / (len(classes) * counts)
    missing = [c for c in range(NUM_CLASSES) if c not in classes]
    for m in missing:
        fill = np.max(weights) + np.mean(weights)
        if m < len(weights):
            weights = np.insert(weights, m, fill)
        else:
            weights = np.append(weights, fill)
    return weights


def average_weights(label_rows: list[np.ndarray]) -> np.ndarray:
    """Dataset-level average of per-sentence weight vectors
    (data_utilities.py:117-137)."""
    total = np.zeros(NUM_CLASSES)
    for labels in label_rows:
        total += balanced_weights_one(np.asarray(labels))
    return total / len(label_rows)
