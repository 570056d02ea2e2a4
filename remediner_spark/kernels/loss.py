"""Masked weighted cross-entropy — numpy port of the training loss.

Reference: the custom Trainer loss shared by NER and RE
(/root/reference/src/NER/train_eval_ner.py:15-31,
/root/reference/src/RE/train_eval_re.py:13-29): per-token CE with
class weights, positions labeled -100 masked out, reduced as
sum(per-token loss) / count(non-masked). Training itself is
out-of-band for the engine (it consumes trained weights via
broadcast), but the loss semantics are part of the reference surface
and this kernel makes them testable without torch.
"""

from __future__ import annotations

import numpy as np

IGNORE_INDEX = -100


def log_softmax(logits: np.ndarray) -> np.ndarray:
    """Numerically-stable log-softmax over the last axis."""
    shifted = logits - logits.max(axis=-1, keepdims=True)
    return shifted - np.log(np.exp(shifted).sum(axis=-1, keepdims=True))


def masked_weighted_ce(
    logits: np.ndarray,
    labels: np.ndarray,
    class_weights: np.ndarray | None = None,
) -> float:
    """logits [N, L, C], labels [N, L] with -100 ignore positions.

    Matches torch.nn.CrossEntropyLoss(weight=w, ignore_index=-100,
    reduction='mean') semantics: per-token loss is -w[y] * logp[y];
    the mean divides by the SUM OF WEIGHTS of counted tokens (torch's
    weighted-mean convention), which reduces to count when w is None.
    """
    logits = np.asarray(logits, dtype=np.float64)
    labels = np.asarray(labels)
    mask = labels != IGNORE_INDEX
    if not mask.any():
        return 0.0
    logp = log_softmax(logits)
    safe_labels = np.where(mask, labels, 0)
    token_logp = np.take_along_axis(
        logp, safe_labels[..., None], axis=-1
    )[..., 0]
    if class_weights is None:
        w = np.ones_like(token_logp)
    else:
        w = np.asarray(class_weights, dtype=np.float64)[safe_labels]
    losses = -(w * token_logp)[mask]
    denom = w[mask].sum()
    return float(losses.sum() / denom)


def plot_confusion(matrix, labels, out_path: str) -> str:
    """S6 plot sink (/root/reference/src/plot.py:13-24): heatmap PNG
    when matplotlib is available, else a deterministic text rendering —
    the engine never depends on plotting libs."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(5, 4))
        im = ax.imshow(matrix, cmap="Blues")
        ax.set_xticks(range(len(labels)), labels, rotation=45)
        ax.set_yticks(range(len(labels)), labels)
        for i in range(len(labels)):
            for j in range(len(labels)):
                ax.text(j, i, f"{matrix[i][j]:.2f}", ha="center", va="center")
        fig.colorbar(im)
        fig.tight_layout()
        out = out_path if out_path.endswith(".png") else out_path + ".png"
        fig.savefig(out)
        return out
    except ImportError:
        out = out_path if out_path.endswith(".txt") else out_path + ".txt"
        with open(out, "w") as f:
            f.write("\t" + "\t".join(labels) + "\n")
            for lab, row in zip(labels, matrix):
                f.write(lab + "\t" + "\t".join(f"{v:.4f}" for v in row) + "\n")
        return out
