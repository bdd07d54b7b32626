"""Generative-model evaluation metrics: FID, KID, and basic sample
statistics.

The reference keeps metrics out of the library (its
diffsci/metrics/__init__.py is an empty placeholder; FID comes from
torchmetrics inside eval scripts, SURVEY.md §5). This build provides the
metric math natively with a pluggable feature extractor: pass any
``features_fn(x) -> [N, D]`` (an InceptionV3 port, a trained classifier's
penultimate layer via diffsci_tpu.models.nets.MinimalResNet, or identity
features for toy data). Frechet/kernel distances follow the standard
definitions (Heusel et al. 2017; Binkowski et al. 2018).
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import jax.numpy as jnp
import scipy.linalg


def feature_statistics(features) -> tuple[np.ndarray, np.ndarray]:
    """Mean and covariance of a feature matrix [N, D]."""
    f = np.asarray(features, np.float64)
    mu = f.mean(axis=0)
    sigma = np.cov(f, rowvar=False)
    return mu, np.atleast_2d(sigma)


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """FID core: ||mu1-mu2||^2 + Tr(S1 + S2 - 2 sqrt(S1 S2))."""
    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2
    covmean, _ = scipy.linalg.sqrtm(sigma1 @ sigma2, disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean, _ = scipy.linalg.sqrtm(
            (sigma1 + offset) @ (sigma2 + offset), disp=False)
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))


def fid(real_features, fake_features) -> float:
    """Frechet distance between two feature sets [N, D]."""
    mu1, s1 = feature_statistics(real_features)
    mu2, s2 = feature_statistics(fake_features)
    return frechet_distance(mu1, s1, mu2, s2)


def kid(real_features, fake_features, degree: int = 3,
        gamma: Optional[float] = None, coef: float = 1.0) -> float:
    """Kernel Inception Distance: unbiased MMD^2 with a polynomial kernel
    k(x, y) = (gamma x.y + coef)^degree, gamma = 1/D by default."""
    x = np.asarray(real_features, np.float64)
    y = np.asarray(fake_features, np.float64)
    d = x.shape[1]
    g = gamma if gamma is not None else 1.0 / d

    def k(a, b):
        return (g * (a @ b.T) + coef) ** degree

    m, n = x.shape[0], y.shape[0]
    kxx = k(x, x)
    kyy = k(y, y)
    kxy = k(x, y)
    sum_xx = (kxx.sum() - np.trace(kxx)) / (m * (m - 1))
    sum_yy = (kyy.sum() - np.trace(kyy)) / (n * (n - 1))
    sum_xy = kxy.mean()
    return float(sum_xx + sum_yy - 2 * sum_xy)


def fid_from_samples(real, fake, features_fn: Callable,
                     batch_size: int = 256) -> float:
    """FID over raw samples with a batched feature extractor."""
    def extract(x):
        out = []
        for i in range(0, x.shape[0], batch_size):
            out.append(np.asarray(features_fn(x[i:i + batch_size])))
        return np.concatenate(out, axis=0)

    return fid(extract(real), extract(fake))


def classifier_features_fn(classifier, variables) -> Callable:
    """Penultimate-layer feature extractor from a trained MinimalResNet
    (diffsci_tpu.models.nets.classifiers): the global-pooled trunk
    activations before the linear head."""
    from diffsci_tpu.models.nets.classifiers import MinimalResNet

    def features(x):
        return classifier.apply(variables, x,
                                method=MinimalResNet.features)
    return features


# ---------------------------------------------------------------------------
# FLD (Feature Likelihood Divergence)
# ---------------------------------------------------------------------------
def _pairwise_sq_dists(a, b, chunk: int = 2048):
    """||a_i - b_j||^2 as [M, N], chunked over rows to bound memory."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    b_sq = jnp.sum(b * b, axis=1)
    out = []
    for i in range(0, a.shape[0], chunk):
        ai = a[i:i + chunk]
        d2 = (jnp.sum(ai * ai, axis=1)[:, None] + b_sq[None, :]
              - 2.0 * ai @ b.T)
        out.append(jnp.maximum(d2, 0.0))
    return jnp.concatenate(out, axis=0)


def _mog_log_likelihood(dist2, log_sigma2, d):
    """log p(x_i) under (1/N) sum_j Normal(g_j, sigma_j^2 I_d), given the
    precomputed squared distances dist2 [M, N]."""
    import jax

    inv = jnp.exp(-log_sigma2)
    ll = (-0.5 * d * (jnp.log(2.0 * jnp.pi) + log_sigma2)[None, :]
          - 0.5 * dist2 * inv[None, :])
    return jax.scipy.special.logsumexp(ll, axis=1) - jnp.log(dist2.shape[1])


def fit_mog_bandwidths(centers, fit_features, n_iters: int = 200,
                       lr: float = 0.1):
    """Per-center isotropic log-variances of a Gaussian mixture centered at
    ``centers``, fit by maximizing the mean log-likelihood of
    ``fit_features`` (Adam on log sigma^2). Returns (log_sigma2 [N],
    mean_fit_nll)."""
    import jax
    import optax

    d = centers.shape[1]
    dist2 = _pairwise_sq_dists(fit_features, centers)
    # init: per-center mean squared distance to the fit set, per dim
    init = jnp.log(jnp.mean(dist2, axis=0) / d + 1e-6)

    opt = optax.adam(lr)

    def loss(log_sigma2):
        return -jnp.mean(_mog_log_likelihood(dist2, log_sigma2, d))

    @jax.jit
    def run(log_sigma2):
        state = opt.init(log_sigma2)

        def body(carry, _):
            ls, st = carry
            val, grad = jax.value_and_grad(loss)(ls)
            updates, st = opt.update(grad, st)
            ls = optax.apply_updates(ls, updates)
            return (ls, st), val

        (ls, _), _ = jax.lax.scan(body, (log_sigma2, state), None,
                                  length=n_iters)
        return ls, loss(ls)

    return run(init)


def fld(train_features, test_features, gen_features,
        n_iters: int = 200, lr: float = 0.1,
        max_fit_points: int = 10000, seed: int = 0) -> float:
    """Feature Likelihood Divergence (Jiralerspong et al., NeurIPS 2023).

    Structure follows the paper: a Gaussian mixture centered at the
    generated features with per-sample isotropic bandwidths is fit to
    maximize the likelihood of the TRAIN features, then scored by its
    negative log-likelihood on the held-out TEST features. Copying
    training points collapses those bandwidths during the train fit and
    is then punished by the test NLL — the memorization sensitivity FID
    lacks. The reference consumes this metric from an un-vendored
    external repo (scripts/testing/test-diffusion-mnist-fld-fid.py:18-19,
    404-426); this is a native re-implementation of the published
    algorithm, self-calibrated rather than scale-pinned to that package
    (unverifiable without egress):

        FLD = 100/d * (NLL_test[MoG(gen)] - NLL_test[MoG(train subset)])

    where the baseline mixture is centered on a disjoint train subset and
    fit/scored identically, so a perfect model scores ~0 and higher is
    worse. Features are standardized by train statistics first. Within
    this implementation, values are comparable across models/checkpoints.
    """
    rng = np.random.RandomState(seed)
    train = np.asarray(train_features, np.float32)
    test = np.asarray(test_features, np.float32)
    gen = np.asarray(gen_features, np.float32)
    d = train.shape[1]

    mu, std = train.mean(0), train.std(0) + 1e-8
    train = (train - mu) / std
    test = (test - mu) / std
    gen = (gen - mu) / std

    perm = rng.permutation(train.shape[0])
    n_base = min(gen.shape[0], train.shape[0] // 2)
    base_centers = train[perm[:n_base]]
    fit_idx = perm[n_base:][:max_fit_points]
    fit_set = train[fit_idx]

    def test_nll(centers):
        ls, _ = fit_mog_bandwidths(centers, fit_set, n_iters, lr)
        d2 = _pairwise_sq_dists(test, centers)
        return -float(jnp.mean(_mog_log_likelihood(d2, ls, d)))

    return 100.0 / d * (test_nll(gen) - test_nll(base_centers))


def fld_generalization_gap(train_features, gen_features,
                           n_iters: int = 200, lr: float = 0.1,
                           max_fit_points: int = 10000,
                           seed: int = 0) -> float:
    """Per-dim NLL gap (held-out train half minus fit half) of the
    generated-feature mixture — the paper's memorization diagnostic: a
    model that copies its training data fits that half far better than
    the disjoint half, driving the gap up."""
    rng = np.random.RandomState(seed)
    train = np.asarray(train_features, np.float32)
    gen = np.asarray(gen_features, np.float32)
    d = train.shape[1]
    mu, std = train.mean(0), train.std(0) + 1e-8
    train = (train - mu) / std
    gen = (gen - mu) / std

    perm = rng.permutation(train.shape[0])
    half = train.shape[0] // 2
    fit_set = train[perm[:half]][:max_fit_points]
    held = train[perm[half:]][:max_fit_points]

    ls, fit_nll = fit_mog_bandwidths(gen, fit_set, n_iters, lr)
    d2 = _pairwise_sq_dists(held, gen)
    held_nll = -float(jnp.mean(_mog_log_likelihood(d2, ls, d)))
    return 100.0 / d * (held_nll - float(fit_nll))


def sample_statistics(samples) -> dict[str, float]:
    """Cheap distributional statistics for parity checks."""
    s = np.asarray(samples, np.float64)
    return {
        "mean": float(s.mean()),
        "std": float(s.std()),
        "min": float(s.min()),
        "max": float(s.max()),
        "skew": float(((s - s.mean()) ** 3).mean() / (s.std() ** 3 + 1e-12)),
        "kurtosis": float(((s - s.mean()) ** 4).mean()
                          / (s.std() ** 4 + 1e-12) - 3.0),
    }
