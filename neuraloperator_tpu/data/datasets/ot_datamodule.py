"""Optimal-transport data preprocessing for OTNO.

Equivalent of reference ``neuralop/data/datasets/ot_datamodule.py`` (which
uses POT's ``empirical_sinkhorn2_geomloss``): computes an entropic OT plan
between a uniform latent sphere/grid and the target mesh, and derives
encoder/decoder index maps. The Sinkhorn solve is an in-package log-domain
implementation (numpy; offline preprocessing, so host compute is fine).
"""

from typing import Dict, Optional, Tuple

import numpy as np


def sinkhorn_log(
    a: np.ndarray,
    b: np.ndarray,
    C: np.ndarray,
    reg: float = 1e-2,
    n_iters: int = 500,
    tol: float = 1e-7,
) -> np.ndarray:
    """Entropic OT plan via log-domain Sinkhorn iterations.

    a: (n,) source weights; b: (m,) target weights; C: (n, m) cost matrix.
    Returns the transport plan P with marginals ~ (a, b).
    """
    f = np.zeros_like(a)
    g = np.zeros_like(b)
    log_a = np.log(a + 1e-300)
    log_b = np.log(b + 1e-300)
    M = -C / reg
    for _ in range(n_iters):
        f_prev = f
        # f update: logsumexp over columns
        f = reg * (
            log_a
            - np.logaddexp.reduce((M + g[None, :] / reg), axis=1)
        )
        g = reg * (
            log_b
            - np.logaddexp.reduce((M + f[:, None] / reg), axis=0)
        )
        if np.abs(f - f_prev).max() < tol:
            break
    P = np.exp(M + f[:, None] / reg + g[None, :] / reg)
    return P


class OTDataModule:
    """Compute OT transport maps between a latent grid and mesh vertices.

    Mirrors the role of the reference OTDataModule (ot_datamodule.py): for
    each mesh, produce ``encode`` indices (latent -> mesh points used to
    build transported features) and ``ind_dec`` (mesh vertex -> latent cell)
    used by OTNO's decode gather.
    """

    def __init__(
        self,
        vertices: np.ndarray,
        latent_size: int,
        reg: float = 1e-2,
        expand_factor: float = 1.0,
        n_iters: int = 300,
    ):
        self.latent_size = latent_size
        n_latent = latent_size * latent_size
        # latent points: uniform grid on the unit sphere (spherical OTNO)
        theta = np.arccos(
            1 - 2 * (np.arange(latent_size) + 0.5) / latent_size
        )
        phi = 2 * np.pi * (np.arange(latent_size) + 0.5) / latent_size
        T, P = np.meshgrid(theta, phi, indexing="ij")
        sphere = np.stack(
            [np.sin(T) * np.cos(P), np.sin(T) * np.sin(P), np.cos(T)],
            axis=-1,
        ).reshape(-1, 3)

        # scale sphere to wrap the mesh
        center = vertices.mean(0)
        radius = np.linalg.norm(vertices - center, axis=1).max()
        self.source = center + expand_factor * radius * sphere

        C = ((self.source[:, None] - vertices[None]) ** 2).sum(-1)
        a = np.full(n_latent, 1.0 / n_latent)
        b = np.full(len(vertices), 1.0 / len(vertices))
        self.plan = sinkhorn_log(a, b, C, reg=reg, n_iters=n_iters)

        # encoder: most likely mesh point per latent cell
        self.ind_enc = np.argmax(self.plan, axis=1)
        # decoder: most likely latent cell per mesh vertex
        self.ind_dec = np.argmax(self.plan, axis=0)

    def transported_features(
        self, vertices: np.ndarray, extras: Optional[np.ndarray] = None
    ) -> np.ndarray:
        """Build OTNO input features (1, C, s, s): source coords +
        transported coords (+ extras gathered at transported points)."""
        s = self.latent_size
        transported = vertices[self.ind_enc]
        feats = [self.source, transported]
        if extras is not None:
            feats.append(extras[self.ind_enc])
        out = np.concatenate(feats, axis=-1)  # (s*s, C)
        return out.T.reshape(1, -1, s, s).astype(np.float32)
