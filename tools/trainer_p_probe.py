"""Exercise the P>1 (multi-partition) trainer path and track its number.

r15 VERDICT item 4/5: `train_logreg_hashed`'s fused single-partition
branch fires on exactly every local bench SF (one parquet file → one
partition), so the per-iteration distributed loop — the path that
matters on sharded 100 TB inputs — had no tracked number. This probe:

1. writes the distant-supervision training frame as a 4-file parquet
   copy (temp dir, removed afterwards),
2. times `train_logreg_hashed(n_iter=15)` over it — 4 scan partitions,
   so the per-iteration mapInPandas + driver-reduce loop runs, 15 Arrow
   dispatches of the persisted featurized frame,
3. times the canonical single-file fused path on the same rows for the
   side-by-side,
4. checks parity: P=4 partials reduce in partition order, so weights
   shift by ULP-scale association differences vs the P=1 trajectory —
   the histories must agree to float tolerance and the learned model
   must make the same keep decisions.

Usage::  python tools/trainer_p_probe.py [sf_dir] [repeats]

Prints one JSON line; record the numbers in PLANS.md /
OPTIMIZATION_r16.md. (bench.py carries the same probe as the
`trainer_p4_sec` side metric so the scale path is tracked
round-over-round.)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from good_enough_timecamp_data_pipeline_spark.operators.classifier import (
    train_logreg_hashed,
)
from good_enough_timecamp_data_pipeline_spark.operators.text import tokenize
from good_enough_timecamp_data_pipeline_spark.session import apply_tuned_conf, get_spark


def labeled_frame(spark, sf_dir: str):
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return docs.select(
        "text",
        F.array_contains(tokenize(F.col("text")), "customer").cast("int").alias("label"),
    )


def probe(spark, sf_dir: str, n_files: int = 4, n_iter: int = 15) -> dict:
    """One timed (P=n_files per-iteration, P=1 fused) pair + parity."""
    labeled = labeled_frame(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="trainer_p_probe_")
    out: dict = {"n_files": n_files, "n_iter": n_iter}
    try:
        # deterministic split: hash-partition on text so the 4-file copy
        # is stable across runs (round-robin would depend on scan order)
        labeled.repartition(n_files, "text").write.mode("overwrite").parquet(tmp)
        sharded = spark.read.parquet(tmp)

        spark.sparkContext.setJobDescription("trainer_p_probe: P>1 per-iteration")
        t0 = time.time()
        m_p = train_logreg_hashed(sharded, n_iter=n_iter)
        out["p4_sec"] = round(time.time() - t0, 3)

        spark.sparkContext.setJobDescription("trainer_p_probe: P=1 fused")
        t0 = time.time()
        m_f = train_logreg_hashed(labeled, n_iter=n_iter)
        out["fused_sec"] = round(time.time() - t0, 3)
        spark.sparkContext.setJobDescription(None)

        # parity where both paths apply: same rows, different partition
        # split → partition-ordered reduce shifts float sums by ULPs.
        l_p = np.array([h[1] for h in m_p.history])
        l_f = np.array([h[1] for h in m_f.history])
        a_p = np.array([h[2] for h in m_p.history])
        a_f = np.array([h[2] for h in m_f.history])
        out["n_rows_match"] = m_p.n_rows == m_f.n_rows
        out["loss_max_reldiff"] = float(
            np.max(np.abs(l_p - l_f) / np.maximum(1e-12, np.abs(l_f)))
        )
        out["acc_max_absdiff"] = float(np.max(np.abs(a_p - a_f)))
        out["weights_max_absdiff"] = float(np.max(np.abs(m_p.weights - m_f.weights)))
        out["parity_ok"] = bool(
            out["n_rows_match"]
            and out["loss_max_reldiff"] < 1e-6
            and out["acc_max_absdiff"] < 5e-3
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("trainer_p_probe")
    apply_tuned_conf(spark, sf_dir)
    runs = [probe(spark, sf_dir) for _ in range(repeats)]
    summary = {
        "sf_dir": sf_dir,
        "p4_sec_min": min(r["p4_sec"] for r in runs),
        "fused_sec_min": min(r["fused_sec"] for r in runs),
        "parity_ok_all": all(r["parity_ok"] for r in runs),
        "runs": runs,
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
