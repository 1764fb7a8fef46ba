"""Bundle adjustment tests: recover perturbed poses/points on synthetic scenes."""

import jax.numpy as jnp
import numpy as np

from tpu_splat.sfm.ba import BAProblem, bundle_adjust, reprojection_errors
from tpu_splat.sfm.geometry import exp_so3, log_so3


def build_problem(rng, n_cams=6, n_pts=300, noise=0.001, pose_jitter=0.03,
                  point_jitter=0.05, outlier_frac=0.0):
    X = rng.uniform(-1, 1, (n_pts, 3)) + np.array([0, 0, 5.0])
    Rs, ts = [], []
    for i in range(n_cams):
        w = np.array([0.05 * i, -0.04 * i, 0.02 * i])
        Rs.append(np.asarray(exp_so3(jnp.asarray(w, jnp.float32))))
        ts.append(np.array([0.4 * i - 1.0, 0.1 * i, 0.05 * i]))
    Rs, ts = np.stack(Rs), np.stack(ts)

    obs_cam, obs_pt, obs_uv = [], [], []
    for c in range(n_cams):
        pc = X @ Rs[c].T + ts[c]
        uv = pc[:, :2] / pc[:, 2:3] + rng.normal(0, noise, (n_pts, 2))
        obs_cam.append(np.full(n_pts, c))
        obs_pt.append(np.arange(n_pts))
        obs_uv.append(uv)
    obs_cam = np.concatenate(obs_cam)
    obs_pt = np.concatenate(obs_pt)
    obs_uv = np.concatenate(obs_uv)
    if outlier_frac > 0:
        n_out = int(len(obs_uv) * outlier_frac)
        idx = rng.choice(len(obs_uv), n_out, replace=False)
        obs_uv[idx] += rng.uniform(0.05, 0.3, (n_out, 2))

    # perturb everything except camera 0 (the gauge anchor)
    Rp = Rs.copy()
    tp = ts.copy()
    for c in range(1, n_cams):
        Rp[c] = np.asarray(
            exp_so3(jnp.asarray(rng.normal(0, pose_jitter, 3), jnp.float32))
        ) @ Rp[c]
        tp[c] = tp[c] + rng.normal(0, pose_jitter, 3)
    Xp = X + rng.normal(0, point_jitter, X.shape)

    problem = BAProblem(
        cam_rotmats=jnp.asarray(Rp, jnp.float32),
        cam_trans=jnp.asarray(tp, jnp.float32),
        points=jnp.asarray(Xp, jnp.float32),
        obs_cam=jnp.asarray(obs_cam, jnp.int32),
        obs_pt=jnp.asarray(obs_pt, jnp.int32),
        obs_uv=jnp.asarray(obs_uv, jnp.float32),
        obs_valid=jnp.ones(len(obs_uv), bool),
    )
    return problem, Rs, ts, X


class TestBundleAdjust:
    def test_recovers_poses(self, rng):
        problem, Rs, ts, X = build_problem(rng)
        rms0 = float(
            jnp.sqrt(jnp.mean(reprojection_errors(problem) ** 2))
        )
        R, t, Xout, rms, _, _ = bundle_adjust(problem, outer_iters=15, cg_iters=40)
        rms = float(rms)
        assert rms < rms0 / 5, f"rms {rms0:.4f} -> {rms:.4f}"
        assert rms < 0.003  # close to the 0.001 noise floor
        # rotation errors small
        for c in range(6):
            dr = np.degrees(
                np.linalg.norm(np.asarray(log_so3(R[c] @ jnp.asarray(Rs[c].T))))
            )
            assert dr < 0.5, f"cam {c} rot err {dr:.3f} deg"

    def test_robust_to_outliers(self, rng):
        problem, Rs, ts, X = build_problem(rng, outlier_frac=0.1)
        R, t, Xout, rms, _, _ = bundle_adjust(problem, outer_iters=10, cg_iters=30)
        # median reprojection error should still reach the noise floor
        prob2 = problem._replace(cam_rotmats=R, cam_trans=t, points=Xout)
        errs = np.asarray(reprojection_errors(prob2))
        med = np.median(errs[np.isfinite(errs)])
        assert med < 0.005, f"median err {med:.4f}"

    def test_recovers_shared_focal(self, rng):
        """Self-calibration: observations generated with a 15%-wrong assumed
        focal are explained by the shared log-focal parameter. Cameras orbit
        the scene — with forward-facing rigs focal trades off against depth
        (near-unobservable), with an orbit it is strongly constrained."""
        n_cams, n_pts = 8, 300
        X = rng.uniform(-1, 1, (n_pts, 3))
        Rs, ts = [], []
        for ang in np.linspace(0, 2 * np.pi, n_cams, endpoint=False):
            eye = np.array([4.0 * np.cos(ang), 0.5, 4.0 * np.sin(ang)])
            z = -eye / np.linalg.norm(eye)
            up = np.array([0.0, -1.0, 0.0])
            x = np.cross(up, z); x /= np.linalg.norm(x)
            y = np.cross(z, x)
            R = np.stack([x, y, z])
            Rs.append(R)
            ts.append(-R @ eye)
        Rs, ts = np.stack(Rs), np.stack(ts)
        obs_cam = np.repeat(np.arange(n_cams), n_pts)
        obs_pt = np.tile(np.arange(n_pts), n_cams)
        pc = np.einsum("cij,pj->cpi", Rs, X) + ts[:, None]
        uv = pc[..., :2] / pc[..., 2:3] + rng.normal(0, 0.0005, (n_cams, n_pts, 2))
        s_true = 1.15  # f_true / f_assumed
        problem = BAProblem(
            cam_rotmats=jnp.asarray(Rs, jnp.float32),
            cam_trans=jnp.asarray(ts, jnp.float32),
            points=jnp.asarray(X + rng.normal(0, 0.02, X.shape), jnp.float32),
            obs_cam=jnp.asarray(obs_cam, jnp.int32),
            obs_pt=jnp.asarray(obs_pt, jnp.int32),
            obs_uv=jnp.asarray(uv.reshape(-1, 2) * s_true, jnp.float32),
            obs_valid=jnp.ones(n_cams * n_pts, bool),
        )
        R, t, Xout, rms, fscale, _ = bundle_adjust(
            problem, outer_iters=15, cg_iters=40, optimize_focal=True
        )
        assert abs(float(fscale) - s_true) < 0.03, float(fscale)
        assert float(rms) < 0.005

    def test_recovers_radial_k1(self, rng):
        """Radial self-calibration: observations carrying SIMPLE_RADIAL
        distortion (x_d = x (1 + k1 r^2)) plus a focal error are explained by
        the joint (df, dk1) parameters. Same orbit rig as the focal test —
        k1 is constrained by the border observations where r^2 is large."""
        n_cams, n_pts = 8, 300
        X = rng.uniform(-1, 1, (n_pts, 3))
        Rs, ts = [], []
        for ang in np.linspace(0, 2 * np.pi, n_cams, endpoint=False):
            eye = np.array([4.0 * np.cos(ang), 0.5, 4.0 * np.sin(ang)])
            z = -eye / np.linalg.norm(eye)
            up = np.array([0.0, -1.0, 0.0])
            x = np.cross(up, z); x /= np.linalg.norm(x)
            y = np.cross(z, x)
            R = np.stack([x, y, z])
            Rs.append(R)
            ts.append(-R @ eye)
        Rs, ts = np.stack(Rs), np.stack(ts)
        obs_cam = np.repeat(np.arange(n_cams), n_pts)
        obs_pt = np.tile(np.arange(n_pts), n_cams)
        pc = np.einsum("cij,pj->cpi", Rs, X) + ts[:, None]
        uv = pc[..., :2] / pc[..., 2:3]
        k1_true, s_true = -0.12, 1.08
        r2 = np.sum(uv**2, axis=-1, keepdims=True)
        uv_d = uv * (1.0 + k1_true * r2) * s_true
        uv_d = uv_d + rng.normal(0, 0.0005, uv_d.shape)
        problem = BAProblem(
            cam_rotmats=jnp.asarray(Rs, jnp.float32),
            cam_trans=jnp.asarray(ts, jnp.float32),
            points=jnp.asarray(X + rng.normal(0, 0.02, X.shape), jnp.float32),
            obs_cam=jnp.asarray(obs_cam, jnp.int32),
            obs_pt=jnp.asarray(obs_pt, jnp.int32),
            obs_uv=jnp.asarray(uv_d.reshape(-1, 2), jnp.float32),
            obs_valid=jnp.ones(n_cams * n_pts, bool),
        )
        R, t, Xout, rms, fscale, k1 = bundle_adjust(
            problem, outer_iters=20, cg_iters=40,
            optimize_focal=True, optimize_k1=True,
        )
        assert abs(float(k1) - k1_true) < 0.02, float(k1)
        assert abs(float(fscale) - s_true) < 0.03, float(fscale)
        assert float(rms) < 0.005

    def test_k1_stays_zero_on_pinhole(self, rng):
        """No distortion in the data -> the k1 estimate must not wander."""
        problem, *_ = build_problem(rng, noise=0.0005)
        *_, k1 = bundle_adjust(problem, outer_iters=10, cg_iters=30,
                               optimize_k1=True)
        assert abs(float(k1)) < 0.01, float(k1)

    def test_invalid_observations_ignored(self, rng):
        problem, *_ = build_problem(rng, n_cams=3, n_pts=50)
        # corrupt half the observations but mark them invalid
        n = problem.obs_uv.shape[0]
        bad = np.zeros(n, bool)
        bad[: n // 2] = True
        uv = np.asarray(problem.obs_uv).copy()
        uv[bad] += 100.0
        problem = problem._replace(
            obs_uv=jnp.asarray(uv), obs_valid=jnp.asarray(~bad)
        )
        R, t, Xout, rms, _, _ = bundle_adjust(problem, outer_iters=6, cg_iters=20)
        assert float(rms) < 0.01


class TestPerCameraIntrinsics:
    """refine_intrinsics_per_camera (sfm/intrinsics.py): fixed-geometry
    closed-form per-camera focal/principal-point polish — the COLMAP
    refine_intrinsics analog (reference main.py:1090-1113)."""

    def test_recovers_per_camera_focal_and_pp(self, rng):
        from tpu_splat.sfm.intrinsics import refine_intrinsics_per_camera

        problem, Rs, ts, X = build_problem(
            rng, n_cams=5, noise=0.0005, pose_jitter=0.0, point_jitter=0.0)
        # inject per-camera intrinsics errors INTO the observations:
        # obs' = s_true * proj + d_true (what a camera with focal f*s_true
        # and shifted principal point would have measured)
        s_true = np.array([1.0, 1.04, 0.97, 1.02, 0.95], np.float32)
        d_true = np.array(
            [[0, 0], [0.004, -0.003], [-0.002, 0.005], [0.003, 0.001],
             [-0.004, -0.002]], np.float32)
        cam = np.asarray(problem.obs_cam)
        obs = np.asarray(problem.obs_uv)
        obs = obs * s_true[cam][:, None] + d_true[cam]
        problem = problem._replace(obs_uv=jnp.asarray(obs))

        s, d, rms = refine_intrinsics_per_camera(problem)
        assert np.allclose(np.asarray(s), s_true, atol=0.005), np.asarray(s)
        assert np.allclose(np.asarray(d), d_true, atol=0.002), np.asarray(d)
        assert float(rms) < 0.002

    def test_few_observation_cameras_keep_identity(self, rng):
        from tpu_splat.sfm.intrinsics import refine_intrinsics_per_camera

        problem, *_ = build_problem(rng, n_cams=4, noise=0.0005)
        # starve camera 3 of observations (below the 12-obs floor)
        cam = np.asarray(problem.obs_cam)
        valid = np.asarray(problem.obs_valid).copy()
        idx3 = np.nonzero(cam == 3)[0]
        valid[idx3[8:]] = False
        problem = problem._replace(obs_valid=jnp.asarray(valid))
        s, d, _ = refine_intrinsics_per_camera(problem)
        assert float(s[3]) == 1.0
        assert np.all(np.asarray(d[3]) == 0.0)

    def test_robust_to_outliers(self, rng):
        from tpu_splat.sfm.intrinsics import refine_intrinsics_per_camera

        problem, *_ = build_problem(rng, n_cams=4, noise=0.0005,
                                    pose_jitter=0.0, point_jitter=0.0,
                                    outlier_frac=0.1)
        s_true = np.array([1.0, 1.05, 0.96, 1.02], np.float32)
        cam = np.asarray(problem.obs_cam)
        obs = np.asarray(problem.obs_uv) * s_true[cam][:, None]
        problem = problem._replace(obs_uv=jnp.asarray(obs))
        s, d, _ = refine_intrinsics_per_camera(problem)
        assert np.allclose(np.asarray(s), s_true, atol=0.01), np.asarray(s)
