"""Deterministic linear-model training (driver-side numpy).

The model-based quality filter in large-scale pipelines (GPT-3/LLaMA
filtered CommonCrawl with a linear classifier over bag-of-words
features) splits naturally on Spark: FEATURIZE and SCORE are the
100 TB-sized passes and stay declarative in the executors, while
TRAINING sees only a small labeled sample and runs on the driver —
the same division of labor as `functions/clustering.py` (k-means).

Full-batch gradient descent, fixed iteration count, zero randomness:
given the same sample rows the learned weights are deterministic
WITHIN an environment — reruns, retries, and replans on the same
image reproduce them bit-for-bit, the retry/replan stability the
md5-keyed sampling ops need. Across DIFFERENT BLAS/LAPACK builds or
CPU architectures, np.linalg.solve may differ in the last ulp
(r14 review: the old "bit-identical on any machine" overclaimed);
pin the training environment — or ship the trained weights, which
score identically everywhere — when exact cross-machine parity
matters.
"""

from __future__ import annotations

import numpy as np


def train_logreg(
    X: np.ndarray,
    y: np.ndarray,
    iters: int = 25,
    l2: float = 1e-5,
) -> tuple[np.ndarray, float]:
    """L2-regularized logistic regression via Newton-IRLS.

    Deterministic by construction: zero init (no random seed to pin),
    fixed iteration count, one float64 path. IRLS reaches the ridge
    optimum in a handful of steps where plain gradient descent needs
    thousands on near-separable data (the ridge keeps the Hessian
    well-conditioned when classes separate). The feature width is the
    small dimension by design (hashed buckets), so the d x d solve is
    driver-trivial. Returns ``(weights, bias)``.
    """
    X = np.asarray(X, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n, d = X.shape
    # fold the bias in as an unpenalized-ish last column (its l2 cost
    # is the same epsilon ridge — negligible, keeps the solve uniform)
    Xb = np.hstack([X, np.ones((n, 1))])
    w = np.zeros(d + 1)
    ridge = l2 * n * np.eye(d + 1)
    for _ in range(iters):
        # clip |z| at 35 (sigmoid saturates at ~1e-16 beyond): keeps
        # exp() overflow-free without changing any decision
        z = np.clip(Xb @ w, -35.0, 35.0)
        p = 1.0 / (1.0 + np.exp(-z))
        r = np.maximum(p * (1.0 - p), 1e-9)
        g = Xb.T @ (p - y) + l2 * n * w
        h = (Xb.T * r) @ Xb + ridge
        w = w - np.linalg.solve(h, g)
    return w[:-1], float(w[-1])


def logreg_loss(
    X: np.ndarray, y: np.ndarray, w: np.ndarray, b: float
) -> float:
    """Mean log loss (diagnostic; clipped away from exact 0/1)."""
    z = np.clip(np.asarray(X, dtype=np.float64) @ w + b, -35.0, 35.0)
    p = np.clip(1.0 / (1.0 + np.exp(-z)), 1e-12, 1 - 1e-12)
    y = np.asarray(y, dtype=np.float64)
    return float(-(y * np.log(p) + (1 - y) * np.log(1 - p)).mean())
