"""Global SfM component tests: rotation averaging, position averaging, and the
track-braced global positioning solve (the GLOMAP positioning analog)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpu_splat.sfm.geometry import exp_so3, umeyama_alignment
from tpu_splat.sfm.global_mapper import (
    _project_so3,
    global_positioning,
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


def _aligned_rmse(c, cgt):
    s, R, t = umeyama_alignment(jnp.asarray(c, jnp.float32),
                                jnp.asarray(cgt, jnp.float32))
    al = float(s) * np.asarray(c) @ np.asarray(R).T + np.asarray(t)
    return float(np.sqrt(np.mean(np.sum((al - cgt) ** 2, 1))))


class TestGlobalPositioning:
    """Track-braced joint camera+point solve (the GLOMAP positioning analog)."""

    def _ring_scene(self, rng, n=20, n_pts=60, dir_noise=0.0, ray_noise=0.0):
        cgt = ring(n)
        pts = rng.normal(0, 0.25, (n_pts, 3))
        # adjacent-only CLOSED ring of cam-cam pairs (the weak chain topology)
        pairs = [(i, (i + 1) % n) for i in range(n)]
        pairs = [(min(a, b), max(a, b)) for a, b in pairs]
        dirs = []
        for a, b in pairs:
            u = cgt[b] - cgt[a]
            u = u / np.linalg.norm(u)
            if dir_noise:
                u = u + rng.normal(0, dir_noise, 3)
            dirs.append(u / np.linalg.norm(u))
        obs_cam, obs_tid, obs_dir = [], [], []
        for k in range(n_pts):
            for i in range(n):
                v = pts[k] - cgt[i]
                v = v / np.linalg.norm(v)
                if ray_noise:
                    v = v + rng.normal(0, ray_noise, 3)
                obs_cam.append(i)
                obs_tid.append(k)
                obs_dir.append(v / np.linalg.norm(v))
        return (cgt, pts, pairs, np.stack(dirs),
                np.asarray(obs_cam), np.asarray(obs_tid), np.stack(obs_dir))

    def test_exact_recovery_clean(self, rng):
        n = 20
        cgt, pts, pairs, dirs, oc, ot, od = self._ring_scene(rng, n)
        init = position_averaging(n, pairs, list(dirs), [1.0] * len(pairs))
        c, p = global_positioning(
            n, init, pairs, dirs, np.ones(len(pairs)),
            oc, ot, od, np.ones(len(oc)), pts.shape[0])
        assert _aligned_rmse(c, cgt) < 1e-3

    def test_closed_ring_noise_braced(self, rng):
        """The r3-measured failure mode: chain-only averaging collapses a
        closed ring under noise; track constraints must brace it."""
        n = 20
        cgt, pts, pairs, dirs, oc, ot, od = self._ring_scene(
            rng, n, dir_noise=0.01, ray_noise=0.005)
        chain_only = position_averaging(n, pairs, list(dirs),
                                        [50.0] * len(pairs))
        rmse_chain = _aligned_rmse(chain_only, cgt)
        c, p = global_positioning(
            n, chain_only, pairs, dirs, 50.0 * np.ones(len(pairs)),
            oc, ot, od, np.ones(len(oc)), pts.shape[0])
        rmse = _aligned_rmse(c, cgt)
        # braced solve must be far tighter than the chain and tight in absolute
        # terms (ring radius is 1.0)
        assert rmse < 0.02, (rmse, rmse_chain)
        assert rmse < 0.5 * rmse_chain + 1e-6, (rmse, rmse_chain)
        # eliminated points come back out near ground truth too
        perr = float(np.sqrt(np.mean(np.sum((p - pts) ** 2, 1))))
        # same gauge as cgt only up to similarity; align with the cameras' fit
        s, R, t = umeyama_alignment(jnp.asarray(c, jnp.float32),
                                    jnp.asarray(cgt, jnp.float32))
        pal = float(s) * p @ np.asarray(R).T + np.asarray(t)
        perr = float(np.sqrt(np.mean(np.sum((pal - pts) ** 2, 1))))
        assert perr < 0.05, perr

    def test_partial_visibility(self, rng):
        """Each track seen by only a 5-camera window still braces the loop."""
        n = 20
        cgt = ring(n)
        pts = np.stack([0.6 * ring(n)[k] + rng.normal(0, 0.05, 3)
                        for k in range(n)])
        pairs = [(min(i, (i + 1) % n), max(i, (i + 1) % n)) for i in range(n)]
        dirs = []
        for a, b in pairs:
            u = cgt[b] - cgt[a]
            u = u / np.linalg.norm(u) + rng.normal(0, 0.01, 3)
            dirs.append(u / np.linalg.norm(u))
        obs_cam, obs_tid, obs_dir = [], [], []
        for k in range(n):
            for w in range(-2, 3):
                i = (k + w) % n
                v = pts[k] - cgt[i]
                v = v / np.linalg.norm(v) + rng.normal(0, 0.005, 3)
                obs_cam.append(i)
                obs_tid.append(k)
                obs_dir.append(v / np.linalg.norm(v))
        init = position_averaging(n, pairs, dirs, [50.0] * len(pairs))
        c, _ = global_positioning(
            n, init, pairs, np.stack(dirs), 50.0 * np.ones(len(pairs)),
            np.asarray(obs_cam), np.asarray(obs_tid), np.stack(obs_dir),
            np.ones(len(obs_cam)), n)
        rmse = _aligned_rmse(c, cgt)
        rmse_chain = _aligned_rmse(init, cgt)
        assert rmse < 0.06, (rmse, rmse_chain)
