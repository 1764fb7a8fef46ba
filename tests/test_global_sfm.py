"""Global SfM component tests: rotation averaging and position averaging."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpu_splat.sfm.geometry import exp_so3, umeyama_alignment
from tpu_splat.sfm.global_mapper import (
    _project_so3,
    position_averaging,
    rotation_averaging,
)


def ring(n=16):
    return np.stack([[np.cos(2 * np.pi * i / n), 0, np.sin(2 * np.pi * i / n)]
                     for i in range(n)])


def chain_pairs(n, spans=(1, 2)):
    return [(i, i + d) for i in range(n) for d in spans if i + d < n]


class TestRotationAveraging:
    def test_exact_recovery_clean(self):
        n = 12
        Rgt = [np.asarray(exp_so3(jnp.asarray([0.1 * i, 0.3 * i, -0.05 * i],
                                              jnp.float32))) for i in range(n)]
        pairs = chain_pairs(n)
        rels = [Rgt[b] @ Rgt[a].T for a, b in pairs]
        R = rotation_averaging(n, pairs, rels, [1.0] * len(pairs))
        for i in range(n):
            E = R[i] @ (Rgt[i] @ Rgt[0].T).T
            ang = np.degrees(np.arccos(np.clip((np.trace(E) - 1) / 2, -1, 1)))
            assert ang < 0.05, f"cam {i}: {ang} deg"

    def test_noisy_recovery(self, rng):
        n = 16
        Rgt = [np.asarray(exp_so3(jnp.asarray([0.0, 2 * np.pi * i / n, 0.0],
                                              jnp.float32))) for i in range(n)]
        pairs = chain_pairs(n)
        rels, ws = [], []
        for a, b in pairs:
            noise = np.asarray(exp_so3(jnp.asarray(rng.normal(0, 0.01, 3),
                                                   jnp.float32)))
            rels.append(noise @ Rgt[b] @ Rgt[a].T)
            ws.append(50.0)
        R = rotation_averaging(n, pairs, rels, ws)
        errs = []
        for i in range(n):
            E = R[i] @ (Rgt[i] @ Rgt[0].T).T
            errs.append(np.degrees(np.arccos(np.clip((np.trace(E) - 1) / 2, -1, 1))))
        assert max(errs) < 3.0, errs

    def test_project_so3(self, rng):
        M = rng.normal(size=(5, 3, 3))
        R = _project_so3(M)
        for r in R:
            np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-10)
            assert np.linalg.det(r) > 0.99


class TestPositionAveraging:
    def test_exact_recovery_clean(self):
        n = 16
        cgt = ring(n)
        pairs = chain_pairs(n)
        dirs = []
        for a, b in pairs:
            u = cgt[b] - cgt[a]
            dirs.append(u / np.linalg.norm(u))
        c = position_averaging(n, pairs, dirs, [1.0] * len(pairs))
        s, R, t = umeyama_alignment(jnp.asarray(c, jnp.float32),
                                    jnp.asarray(cgt, jnp.float32))
        al = float(s) * c @ np.asarray(R).T + np.asarray(t)
        rmse = float(np.sqrt(np.mean(np.sum((al - cgt) ** 2, 1))))
        assert rmse < 1e-4, rmse

    def test_noise_conditioning_documented(self, rng):
        """Direction-only chains amplify noise (low-frequency bending modes are
        near-null); this ratchets the known behavior — BA downstream is the
        production remedy."""
        n = 16
        cgt = ring(n)
        pairs = chain_pairs(n)
        dirs = []
        for a, b in pairs:
            u = cgt[b] - cgt[a]
            u = u / np.linalg.norm(u) + rng.normal(0, 0.005, 3)
            dirs.append(u / np.linalg.norm(u))
        c = position_averaging(n, pairs, dirs, [50.0] * len(pairs))
        s, R, t = umeyama_alignment(jnp.asarray(c, jnp.float32),
                                    jnp.asarray(cgt, jnp.float32))
        al = float(s) * c @ np.asarray(R).T + np.asarray(t)
        rmse = float(np.sqrt(np.mean(np.sum((al - cgt) ** 2, 1))))
        assert rmse < 0.35, rmse
