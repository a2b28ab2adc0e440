"""Pose priors for SMPL fitting (JAX).

Rebuild of /root/reference/src/ladiff/transforms/joints2rots/prior.py:
``MaxMixturePrior`` (GMM max-mixture negative log-likelihood over the 69-dim
body pose, loaded from the standard SMPLify ``gmm_%02d.pkl``),
``SMPLifyAnglePrior`` (knee/elbow bending direction, prior.py:51-89, data
free) and ``L2Prior`` (prior.py:92-97).  All priors are pure functions of
the pose, usable inside a jitted fitting loss.
"""
from __future__ import annotations

import os
import pickle
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["MaxMixturePrior", "angle_prior", "l2_prior", "create_prior",
           "gmof"]

# knee/elbow axis-angle components and bend signs; indices are into the
# full 72-dim pose INCLUDING global orientation (reference prior.py:60-67),
# shifted by -3 for the 69-dim body pose (prior.py:85).
_ANGLE_IDXS = np.array([55, 58, 12, 15], dtype=np.int64) - 3
_ANGLE_SIGNS = np.array([1.0, -1.0, -1.0, -1.0], dtype=np.float32)


def angle_prior(body_pose: jax.Array) -> jax.Array:
    """exp(pose[knee/elbow] * sign)^2 per joint (reference prior.py:71-89).

    body_pose: [..., 69] axis-angle without global orientation.
    Returns [..., 4].
    """
    return jnp.exp(body_pose[..., _ANGLE_IDXS] * _ANGLE_SIGNS) ** 2


def l2_prior(body_pose: jax.Array, *_args) -> jax.Array:
    """sum-of-squares fallback prior (reference prior.py:92-97)."""
    return jnp.sum(body_pose ** 2, axis=-1)


def gmof(x: jax.Array, sigma: float) -> jax.Array:
    """Geman-McClure robust error (reference customloss.py:8-13)."""
    x_sq = x ** 2
    s_sq = sigma ** 2
    return (s_sq * x_sq) / (s_sq + x_sq)


@dataclass(frozen=True)
class MaxMixturePrior:
    """Max-mixture GMM NLL (reference prior.py:100-229, merged path).

    nll(pose) = min_m [ 0.5 * (pose-mu_m)^T P_m (pose-mu_m) - log w'_m ]
    with w'_m = weights_m / (const * sqrtdet_m / min(sqrtdet)) exactly as the
    reference's ``merged_log_likelihood`` (prior.py:180-196).
    """

    means: jax.Array        # [M, 69]
    precisions: jax.Array   # [M, 69, 69]
    log_nll_weights: jax.Array  # [M]

    @staticmethod
    def load(path: str, num_gaussians: int = 6,
             epsilon: float = 1e-16) -> Optional["MaxMixturePrior"]:
        """Load ``gmm_{num_gaussians:02d}.pkl`` from a folder or a direct
        file path; returns None if the asset is absent."""
        if os.path.isdir(path):
            path = os.path.join(path, f"gmm_{num_gaussians:02d}.pkl")
        if not os.path.exists(path):
            return None
        with open(path, "rb") as f:
            gmm = pickle.load(f, encoding="latin1")
        if isinstance(gmm, dict):
            means = np.asarray(gmm["means"], np.float64)
            covs = np.asarray(gmm["covars"], np.float64)
            weights = np.asarray(gmm["weights"], np.float64)
        else:  # sklearn GMM object
            means = np.asarray(gmm.means_, np.float64)
            covs = np.asarray(gmm.covars_, np.float64)
            weights = np.asarray(gmm.weights_, np.float64)
        return MaxMixturePrior.from_arrays(means, covs, weights)

    @staticmethod
    def from_arrays(means: np.ndarray, covs: np.ndarray,
                    weights: np.ndarray) -> "MaxMixturePrior":
        precisions = np.stack([np.linalg.inv(c) for c in covs])
        sqrdets = np.array([np.sqrt(np.linalg.det(c)) for c in covs])
        const = (2 * np.pi) ** (means.shape[1] / 2.0)
        nll_weights = weights / (const * (sqrdets / sqrdets.min()))
        return MaxMixturePrior(
            means=jnp.asarray(means, jnp.float32),
            precisions=jnp.asarray(precisions, jnp.float32),
            log_nll_weights=jnp.asarray(np.log(nll_weights), jnp.float32))

    def __call__(self, body_pose: jax.Array, *_args) -> jax.Array:
        """body_pose [B, 69] -> per-sample min-mixture NLL [B]."""
        diff = body_pose[:, None, :] - self.means            # [B, M, 69]
        prod = jnp.einsum("mij,bmj->bmi", self.precisions, diff)
        quad = jnp.sum(prod * diff, axis=-1)                  # [B, M]
        nll = 0.5 * quad - self.log_nll_weights
        return jnp.min(nll, axis=-1)


def create_prior(prior_type: str = "gmm", prior_folder: str = "deps/gmm",
                 num_gaussians: int = 6):
    """Factory mirroring the reference (prior.py:35-49) with a graceful L2
    fallback when the GMM asset is missing."""
    if prior_type == "gmm":
        prior = MaxMixturePrior.load(prior_folder, num_gaussians)
        if prior is not None:
            return prior
        return l2_prior
    if prior_type == "l2":
        return l2_prior
    if prior_type == "angle":
        return angle_prior
    if prior_type in (None, "none"):
        return lambda *a: 0.0
    raise ValueError(f"Prior {prior_type} is not implemented")
