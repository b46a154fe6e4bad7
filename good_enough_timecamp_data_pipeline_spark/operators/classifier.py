"""Distributed training of a hashed bag-of-words logistic classifier.

The TRAIN half of the model-based quality-filter tier: the engine already
*scores* documents with a hashed linear model as a pure codegen scan
(`plans/round5d.py::t_hashed_classifier` — the fasttext/DCLM shape); this
module learns those weights from labeled documents, distributed:

- **featurize once**: tokenize → hash into V buckets → per-doc sparse
  index arrays (raw term frequency), persisted — the corpus is scanned
  once, not once per iteration;
- **full-batch gradient descent**, one Arrow pass per iteration: every
  partition computes a PARTIAL (gradient, loss, hits) via numpy
  (`mapInPandas` — same partial-sums shape as `clustering.py`'s k-means),
  the driver reduces the ≤(partitions × V)-float partials and updates the
  broadcast weight vector. Per-iteration driver traffic is O(partitions
  × V) — independent of corpus size, the property that matters when the
  corpus is 10^9 documents;
- **determinism**: partials are summed in partition order and each
  partition folds its rows in row order, so repeated runs on the same
  files produce bit-identical weights (asserted in tests). No rand():
  weights init at zero.

At 100 TB you would subsample to a training set first (`t_split` /
`t_balanced_sample` are the catalog's deterministic samplers) — gradient
descent needs labels, and labeled sets are small by construction; the
full-batch pass here demonstrates the unbounded-corpus path.
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from .text import tokenize

DEFAULT_FEATURES = 1024


def hashed_indices(text_col: Column, n_features: int = DEFAULT_FEATURES) -> Column:
    """Per-document array of hashed token buckets (xxhash64 % V, non-
    negative via pmod). Duplicates kept — term frequency enters through
    repetition, normalized per-doc at featurize time."""
    return F.transform(
        tokenize(text_col), lambda t: F.pmod(F.xxhash64(t), F.lit(n_features))
    )


@dataclass
class TrainedModel:
    weights: np.ndarray  # shape (V,)
    bias: float
    history: list[tuple[int, float, float]]  # (iteration, loss, accuracy)
    n_rows: int


def _partial_grad(n_features: int, w_b, b_b):
    """Build the per-partition (gradient, loss, hits) pass. The weight
    vector arrives via a Spark broadcast — one copy per executor, not
    per task."""

    def compute(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        w = w_b.value
        b = b_b.value
        grad = np.zeros(n_features + 1, dtype=np.float64)  # [V] = bias slot
        loss = 0.0
        hits = 0
        n = 0
        for pdf in pdfs:
            for idx, y in zip(pdf["idx"], pdf["label"]):
                idx = np.asarray(idx, dtype=np.int64)
                y = float(y)
                # raw term-frequency features (val = 1 per occurrence):
                # measured to converge ~2× faster here than 1/√n-normalized
                # docs (the gradient magnitude carries the signal)
                z = (float(w[idx].sum()) + b) if idx.size else b
                # numerically-stable sigmoid + log-loss
                if z >= 0:
                    ez = np.exp(-z)
                    p = 1.0 / (1.0 + ez)
                    loss += (1.0 - y) * z + np.log1p(ez)
                else:
                    ez = np.exp(z)
                    p = ez / (1.0 + ez)
                    loss += -y * z + np.log1p(ez)
                err = p - y
                if idx.size:
                    np.add.at(grad, idx, err)
                grad[n_features] += err
                hits += int((p >= 0.5) == (y >= 0.5))
                n += 1
        out = pd.DataFrame(
            {
                "grad": [grad.tolist()],
                "loss": [float(loss)],
                "hits": [int(hits)],
                "n": [int(n)],
            }
        )
        yield out

    return compute


def train_logreg_hashed(
    df: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    n_features: int = DEFAULT_FEATURES,
    n_iter: int = 15,
    lr: float = 1.0,
    l2: float = 1e-6,
) -> TrainedModel:
    """Learn (weights, bias) for P(label=1 | hashed-BoW(text)).

    One featurize pass (persisted), then ``n_iter`` Arrow passes, each
    producing per-partition partial gradients reduced on the driver in
    partition order (deterministic). Returns the model plus the
    (loss, accuracy) history — loss is the FULL-batch log-loss at the
    weights of that iteration's start, so history[0] is the zero-model
    baseline."""
    feats = (
        df.select(
            hashed_indices(F.col(text_col), n_features).alias("idx"),
            F.col(label_col).cast("double").alias("label"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    schema = "grad array<double>, loss double, hits bigint, n bigint"
    sc = feats.sparkSession.sparkContext
    w = np.zeros(n_features, dtype=np.float64)
    b = 0.0
    history: list[tuple[int, float, float]] = []
    n_rows = 0
    for it in range(n_iter):
        w_b = sc.broadcast(w)
        b_b = sc.broadcast(b)
        parts = feats.mapInPandas(
            _partial_grad(n_features, w_b, b_b), schema=schema
        ).collect()
        w_b.unpersist()
        b_b.unpersist()
        grad = np.zeros(n_features + 1, dtype=np.float64)
        loss = 0.0
        hits = 0
        n = 0
        for row in parts:  # partition order — deterministic reduce
            grad += np.asarray(row["grad"], dtype=np.float64)
            loss += row["loss"]
            hits += row["hits"]
            n += row["n"]
        if n == 0:
            raise ValueError("train_logreg_hashed: empty training input")
        n_rows = n
        history.append((it, loss / n, hits / n))
        step = grad / n
        # 1/√(1+t) decay: big early steps without the fixed-lr full-batch
        # oscillation (measured: flat lr 10–60 bounces around the optimum)
        lr_t = lr / np.sqrt(1.0 + it)
        w = w - lr_t * (step[:n_features] + l2 * w)
        b = b - lr_t * step[n_features]
    feats.unpersist()
    return TrainedModel(weights=w, bias=b, history=history, n_rows=n_rows)


def score_with_model(
    df: DataFrame,
    model: TrainedModel,
    text_col: str = "text",
    n_features: int = DEFAULT_FEATURES,
) -> DataFrame:
    """Inference with trained weights as a broadcast V-vector literal —
    the same zero-shuffle scan shape as `t_hashed_classifier`, with the
    learned array replacing the md5 stand-in weights. Adds `p_keep`."""
    weights = F.array(*[F.lit(float(x)) for x in model.weights])
    idx = hashed_indices(F.col(text_col), n_features)
    z = F.aggregate(
        idx,
        F.lit(0.0),
        lambda acc, i: acc + F.element_at(weights, i.cast("int") + 1),
    ) + F.lit(float(model.bias))
    return df.withColumn("p_keep", F.lit(1.0) / (F.lit(1.0) + F.exp(-z)))
