"""Distributed linear-classifier training for corpus quality scoring.

The standard web-curation move (CCNet, GPT-3, LLaMA data pipelines) is a
cheap linear/fastText-style classifier trained on weak labels that scores
every document so the corpus can be filtered or importance-sampled. The
reference engine has no ML stage (it is a 313-line crawler,
/root/reference/src/main.rs); this module is a north-rule training-data
extension, built on the same iterative-ML dataflow as
``functions/similarity.kmeans_embeddings``:

* text is featurized ONCE (one linear ``map_batches`` pass) into numeric
  design blocks which are pinned (``materialize().to_arrow_refs()``) —
  every training pass re-scans the same small matrix, never the text;
* every pass is a task wave over the pinned refs
  (``stages/shuffle.apply_refs``) that emits MERGEABLE partials whose size
  is independent of block rows (d+1 floats per block); the driver folds
  only those;
* model state (weights, feature moments) is broadcast per pass and
  QUANTIZED to float32 so the float64 partial-sum reduction order — which
  varies with batching/parallelism — cannot leak into the result (the
  k-means/PCA determinism argument: ~1e-13 fold noise vs the 2^-24
  float32 grid).

Deterministic spec (restated by the independent pytest reference in
tests/test_independent_truths.py):

* features per document (from ``textstats.quality_scores`` kernels):
  ``log1p(n_chars), log1p(n_words), punct_ratio, stopword_ratio,
  mean_word_len``;
* weak label: the hard Gopher-style keep rule the classifier distills —
  ``n_words ≥ 56 AND stopword_ratio ≥ 0.06`` (the CCNet pattern: replace
  a brittle rule bundle with a smooth learned score);
* standardization: population mean/std from one moments pass, both
  float32-quantized; std floored at 1e-6 (an all-constant feature
  standardizes to exactly 0 and drops out);
* model: logistic regression with bias, weights initialized to zero;
  ``iters`` full-batch gradient steps ``w ← w − lr·∇/n`` (no regularizer,
  no early stop), weights float32-quantized after every step;
* score: ``sigmoid([1, z]·w)`` in float64 per row, rounded
  half-away-from-zero to 4 dp — per-row math, so batching-invariant.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .textstats import quality_scores

#: feature column order (fixed — part of the deterministic spec)
FEATURES = (
    "log_chars",
    "log_words",
    "punct_ratio",
    "stopword_ratio",
    "mean_word_len",
)

#: weak-label rule (Gopher-family word-count + stopword floor)
MIN_WORDS = 56
MIN_STOPWORD_RATIO = 0.06


def featurize(t: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """One vectorized pass: text block → ``(id, f0..f4, label)`` numeric
    design block. Runs through the quality_scores kernels — no new
    per-row Python."""
    q = quality_scores(t.select(["text"]))
    n_words = q["n_words"].to_numpy()
    stop = q["stopword_ratio"].to_numpy(zero_copy_only=False)
    cols: dict[str, pa.Array] = {id_col: t[id_col].cast(pa.int64())}
    feats = np.column_stack(
        [
            np.log1p(q["n_chars_txt"].to_numpy().astype(np.float64)),
            np.log1p(n_words.astype(np.float64)),
            q["punct_ratio"].to_numpy(zero_copy_only=False),
            stop,
            q["mean_word_len"].to_numpy(zero_copy_only=False),
        ]
    )
    for i in range(feats.shape[1]):
        cols[f"f{i}"] = pa.array(feats[:, i], pa.float64())
    cols["label"] = pa.array(
        ((n_words >= MIN_WORDS) & (stop >= MIN_STOPWORD_RATIO)).astype(
            np.int64
        )
    )
    return pa.table(cols)


def _design(t: pa.Table, mu: np.ndarray, sigma: np.ndarray):
    """Standardized design matrix with bias column + labels, from a
    featurized block."""
    d = len(FEATURES)
    x = np.column_stack(
        [t[f"f{i}"].to_numpy(zero_copy_only=False) for i in range(d)]
    )
    xs = (x - mu.astype(np.float64)) / sigma.astype(np.float64)
    y = t["label"].to_numpy().astype(np.float64)
    return np.column_stack([np.ones(len(xs)), xs]), y


def _sigmoid(z: np.ndarray) -> np.ndarray:
    # numerically stable split form: exp() only ever sees non-positive args
    out = np.empty_like(z)
    pos = z >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-z[pos]))
    ez = np.exp(z[~pos])
    out[~pos] = ez / (1.0 + ez)
    return out


def logreg_quality(
    ds,
    iters: int = 30,
    lr: float = 0.5,
    id_col: str = "doc_id",
):
    """Train the rule-distillation quality classifier and score every
    document. ``ds`` must carry ``(id_col, text)``.

    Returns ``(scores_df, weights)``: scores_df is
    ``(doc_id, label, prob)`` sorted by id (at the 10^10 design point the
    final pass would ``write_parquet`` instead); weights is the float32
    ``(bias, *FEATURES)`` vector for reuse by ``logreg_score``.
    """
    import ray

    from ..stages.shuffle import apply_refs

    d = len(FEATURES)
    # featurize once, pin the numeric design blocks — training never
    # re-touches the text
    refs = (
        ds.map_batches(
            lambda t: featurize(t, id_col), batch_format="pyarrow"
        )
        .materialize()
        .to_arrow_refs()
    )

    # ---- pass 1: global feature moments (mergeable, d-sized partials)
    def moments(t: pa.Table) -> pa.Table:
        x = np.column_stack(
            [t[f"f{i}"].to_numpy(zero_copy_only=False) for i in range(d)]
        )
        return pa.table(
            {
                "n": pa.array([len(x)], pa.int64()),
                "s": pa.array([x.sum(axis=0)], pa.list_(pa.float64())),
                "s2": pa.array([(x * x).sum(axis=0)], pa.list_(pa.float64())),
            }
        )

    parts = apply_refs(moments, refs)
    n = int(parts["n"].sum())
    if n == 0:
        raise ValueError("empty dataset")
    s = np.sum(np.stack(parts["s"].to_numpy()), axis=0)
    s2 = np.sum(np.stack(parts["s2"].to_numpy()), axis=0)
    mu = (s / n).astype(np.float32)
    var = np.maximum(s2 / n - (s / n) ** 2, 0.0)
    sigma = np.maximum(np.sqrt(var), 1e-6).astype(np.float32)

    # ---- gradient passes: broadcast w, fold (d+1)-sized partials
    w = np.zeros(d + 1, dtype=np.float32)
    for _ in range(iters):
        w_ref = ray.put((w, mu, sigma))

        def grad(t: pa.Table, _ref=w_ref) -> pa.Table:
            _w, _mu, _sd = ray.get(_ref)
            xb, y = _design(t, _mu, _sd)
            p = _sigmoid(xb @ _w.astype(np.float64))
            return pa.table(
                {"g": pa.array([xb.T @ (p - y)], pa.list_(pa.float64()))}
            )

        g_parts = apply_refs(grad, refs)
        g = np.sum(np.stack(g_parts["g"].to_numpy()), axis=0)
        w = (w.astype(np.float64) - lr * g / n).astype(np.float32)

    # ---- score pass (per-row float64 math ⇒ batching-invariant)
    ref = ray.put((w, mu, sigma))

    def score(t: pa.Table, _ref=ref) -> pa.Table:
        _w, _mu, _sd = ray.get(_ref)
        xb, y = _design(t, _mu, _sd)
        p = _sigmoid(xb @ _w.astype(np.float64))
        return pa.table(
            {
                id_col: t[id_col],
                "label": pa.array(y.astype(np.int64)),
                "prob": pa.array(np.floor(p * 1e4 + 0.5) / 1e4),
            }
        )

    out = apply_refs(score, refs)
    return (
        out.sort_values(id_col).reset_index(drop=True),
        (w, mu, sigma),
    )


def logreg_score(ds, model, id_col: str = "doc_id"):
    """Score an unlabeled corpus with a trained ``(w, mu, sigma)`` model:
    one broadcast + one linear ``map_batches`` pass, appending ``prob``."""
    import ray

    ref = ray.put(model)

    def score(t: pa.Table) -> pa.Table:
        w, mu, sd = ray.get(ref)
        ft = featurize(t, id_col)
        xb, _y = _design(ft, mu, sd)
        p = _sigmoid(xb @ w.astype(np.float64))
        return t.append_column(
            "prob", pa.array(np.floor(p * 1e4 + 0.5) / 1e4)
        )

    return ds.map_batches(score, batch_format="pyarrow")
