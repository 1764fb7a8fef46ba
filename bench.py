"""Benchmark: the BASELINE.json metric set on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.

Headline metric: 3DGS training iterations/second/chip on a production-shaped
workload (512K-capacity splat state, 400K alive, 1280x720, SH degree 3, full
forward + backward + Adam). `extra` carries the rest of the BASELINE.json
metric: SfM throughput (images/sec through TPU feature extraction + MXU
matching), a fixed-seed mini ingest-to-splat wall-clock, and its held-out PSNR
— tracked round over round.

Baseline derivation (vs_baseline divisor): the reference stack is nerfstudio
splatfacto / gsplat on the A10G of ml.g5.4xlarge. Two anchors bracket it:
(a) the reference's own published wall-clock envelopes (BASELINE.md: fast
preset 5k steps inside 20-30 min incl. SfM; medium 15k inside 45-90 min)
imply ~5-6 effective it/s at its default loads; (b) gsplat's published
throughput under ideal conditions on comparable silicon is ~25-30 it/s at
~0.5M gaussians / 1MP. We take 15 it/s — the midpoint — as the A10G baseline
for this synthetic workload. The ">= 2x A10G wall-clock" target therefore
means >= 30 it/s here.

Timing: steps are chained inside one jit via lax.scan and materialized once —
`block_until_ready` does not reliably block on the axon tunnel (CLAUDE.md).
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_A10G_ITS = 15.0


def ring_views(n_views, width, height, rng, radius=4.5, fov_scale=0.85):
    import jax.numpy as jnp

    viewmats, intrins, images = [], [], []
    for ang in np.linspace(0, 2 * np.pi, n_views, endpoint=False):
        eye = np.array([radius * np.cos(ang), 0.8, radius * np.sin(ang)])
        z = -eye / np.linalg.norm(eye)
        up = np.array([0.0, -1.0, 0.0])
        x = np.cross(up, z); x /= np.linalg.norm(x)
        y = np.cross(z, x)
        w2c = np.eye(4, dtype=np.float32)
        w2c[:3, :3] = np.stack([x, y, z])
        w2c[:3, 3] = -w2c[:3, :3] @ eye
        viewmats.append(w2c)
        intrins.append([width * fov_scale, width * fov_scale,
                        width / 2, height / 2])
        images.append(rng.uniform(0, 1, (height, width, 3)).astype(np.float32))
    return (jnp.asarray(np.stack(viewmats)),
            jnp.asarray(np.array(intrins, np.float32)),
            jnp.asarray(np.stack(images)))


def bench_train_throughput() -> float:
    """it/s on the 512K/720p/SH3 workload."""
    import jax
    import jax.numpy as jnp

    from tpu_splat.gs.optim import adam_init
    from tpu_splat.gs.strategy import densify_state_init
    from tpu_splat.gs.trainer import TrainConfig, train_step

    rng = np.random.default_rng(0)
    capacity = 1 << 19
    n_alive = 400_000
    width, height = 1280, 720

    alive = np.zeros(capacity, bool)
    alive[:n_alive] = True
    params = {
        "means": jnp.asarray(rng.uniform(-2, 2, (capacity, 3)), jnp.float32),
        "scales": jnp.asarray(
            np.log(rng.uniform(0.005, 0.03, (capacity, 3))), jnp.float32
        ),
        "quats": jnp.asarray(
            np.concatenate([np.ones((capacity, 1)),
                            0.1 * rng.normal(size=(capacity, 3))], 1),
            jnp.float32,
        ),
        "opacities": jnp.asarray(rng.normal(0.0, 1.0, (capacity,)), jnp.float32),
        "sh0": jnp.asarray(rng.normal(0, 0.5, (capacity, 3)), jnp.float32),
        "shN": jnp.asarray(rng.normal(0, 0.05, (capacity, 15, 3)), jnp.float32),
        "alive": jnp.asarray(alive),
    }
    n_views = 8
    viewmats, intrins, images = ring_views(n_views, width, height, rng)

    cfg = TrainConfig(max_steps=30000, sh_degree=3, random_background=False)
    if os.environ.get("BENCH_K"):  # per-tile capacity sweep knob
        from dataclasses import replace as _dc_replace

        cfg = _dc_replace(cfg, max_per_tile=int(os.environ["BENCH_K"]))
    adam = adam_init(params)
    dstate = densify_state_init(capacity)
    key = jax.random.PRNGKey(0)
    n_steps = int(os.environ.get("BENCH_STEPS", "30"))

    @jax.jit
    def run_n(params, adam, dstate):
        def body(carry, i):
            p, a, d = carry
            v = i % n_views
            p, a, d, m = train_step(
                p, a, d, images[v], viewmats[v], intrins[v], i,
                jax.random.fold_in(key, i), 2.0, cfg, width, height, 3,
            )
            return (p, a, d), m["loss"]
        carry, losses = jax.lax.scan(
            body, (params, adam, dstate), jnp.arange(n_steps)
        )
        return losses[-1]

    _ = float(run_n(params, adam, dstate))  # compile + warm run
    t0 = time.time()
    final_loss = float(run_n(params, adam, dstate))
    dt = time.time() - t0
    assert np.isfinite(final_loss)
    return n_steps / dt


def bench_sfm_throughput() -> float:
    """images/sec through TPU feature extraction + pairwise MXU matching —
    the SfM hot path (the colmap feature_extractor + matcher capability)."""
    import jax

    from tpu_splat.sfm.features import FeatureConfig


    rng = np.random.default_rng(1)
    n_imgs = 24
    size = 640
    # structured noise so the detector finds real extrema
    base = rng.uniform(0, 1, (size // 8, size // 8)).astype(np.float32)
    import cv2
    import jax.numpy as jnp

    images = np.stack([
        np.clip(
            cv2.resize(np.roll(base, i, axis=1), (size, size),
                       interpolation=cv2.INTER_CUBIC)
            + 0.05 * rng.standard_normal((size, size)), 0, 1,
        ).astype(np.float32)
        for i in range(n_imgs)
    ])

    from tpu_splat.sfm.features import extract_features_batch
    from tpu_splat.sfm.matching import match_descriptors_pairs

    fcfg = FeatureConfig(max_features=2048)
    pairs = np.array([(i, j) for i in range(n_imgs - 1)
                      for j in range(i + 1, min(i + 4, n_imgs))])
    # warm the jit caches (compile ~60s on TPU) before timing throughput;
    # the matcher takes the full (n_imgs, K, 128) table as an operand, so the
    # warm-up must run at the real image count to hit the same compiled shape
    fbw = extract_features_batch(jnp.asarray(images), fcfg, size, size)
    match_descriptors_pairs(fbw.descriptor, fbw.valid, pairs[:4])
    t0 = time.time()
    fb = extract_features_batch(jnp.asarray(images), fcfg, size, size)
    # matching runs as the mapper does it: chunked vmapped pair dispatches
    mb = match_descriptors_pairs(fb.descriptor, fb.valid, pairs)
    total = float(jnp.sum(mb.valid))  # host sync
    dt = time.time() - t0
    assert total > 0, "matcher produced zero matches on the synthetic set"
    return n_imgs / dt


def bench_mini_pipeline() -> dict:
    """Fixed-seed mini ingest-to-splat: 18 views of the textured-MESH capture
    (core/meshrender.py — an EXTERNAL oracle sharing zero code with the
    gaussian rasterizer, so a systematic rasterizer bias shows up as a PSNR
    hit instead of hiding in self-rendered GT; VERDICT r4 weak #3), SfM +
    800-step training (past refine_start so densification is exercised),
    genuinely held-out PSNR (eval_split holds out every 8th view). Small by
    design — a stable round-over-round quality/latency tracker, not a preset
    replica. GT protocol changed r5 (rasterizer-rendered -> mesh oracle):
    PSNR numbers are not comparable to r2-r4 ratchet values."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tpu_splat.core.meshrender import (
        make_capture_scene, orbit_w2c, render_mesh)
    from tpu_splat.gs.pipeline import train_splat
    from tpu_splat.sfm.features import FeatureConfig
    from tpu_splat.sfm.mapper import MapperConfig, run_sfm

    # 18 views around the full fast-preset orbit, rendered at 1/4 of 720p by
    # the mesh oracle (deterministic; ~1 s/frame on CPU).
    W, H = 320, 180
    FX = 1050.0 / 4.0
    n = 18
    mesh = make_capture_scene(seed=7)
    images = np.stack([
        render_mesh(mesh, orbit_w2c(a), FX, FX, W / 2, H / 2, W, H)
        for a in np.linspace(0, 2 * np.pi, n, endpoint=False)
    ]).astype(np.float32)
    t0 = time.time()
    cfg = MapperConfig(
        feature=FeatureConfig(max_features=1024, num_octaves=3,
                              contrast_threshold=0.006, upsample_first=True),
        matching_method="exhaustive", ratio=0.9, min_pair_inliers=20,
        ba_every=3,
    )
    scene = run_sfm(images, cfg, fx=FX, fy=FX, cx=W / 2, cy=H / 2)
    reg = np.asarray(scene.registered)
    splat, metrics = train_splat(scene, images[reg], max_steps=800,
                                 downscale_factor=1)
    wall = time.time() - t0
    assert metrics.get("eval_views", 0) > 0, "tracker PSNR must be held-out"
    return {"ingest_to_splat_s": round(wall, 1),
            "psnr_heldout": round(metrics["psnr"], 2),
            "eval_views": int(metrics["eval_views"]),
            "registered": int(reg.sum())}


def bench_fast_preset() -> dict:
    """North-star benchmark at fast-preset scale: a 150-frame 720p orbit
    capture rendered by the CPU textured-MESH renderer (an oracle independent
    of the repo's gaussian rasterizer — core/meshrender.py), through the REAL
    run_job path (SfM + 5K-step training + exports). Reports wall-clock and
    held-out PSNR next to the reference's fast-preset envelope (A10G:
    20-30 min incl. SfM, GETTING_STARTED.md:168 / BASELINE.md). Run manually:
        python bench.py --preset fast
    The result is persisted to FAST_PRESET.json and surfaced in the default
    bench output so the driver's BENCH_r{N} picks it up without re-running the
    ~full-scale job every round."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from scripts.render_fast_preset_capture import N_FRAMES, render_capture
    from tpu_splat.cli.generate_splat import build_job_json
    from tpu_splat.core.config import job_config_from_json
    from tpu_splat.pipeline.runner import run_job

    n = N_FRAMES
    # The GT capture is deterministic (fixed seed/cameras), so it is rendered
    # once into a cache dir and reused (~4 min of CPU when cold).
    img_dir = os.environ.get("FAST_PRESET_CAPTURE",
                             "/tmp/tpu_splat_fast_capture/images")
    if len(os.listdir(img_dir) if os.path.isdir(img_dir) else []) != n:
        render_capture(img_dir,
                       log=lambda s: print(s, file=sys.stderr, flush=True))

    # Persistent work dir (NOT deleted): the colmap sparse model and orbax
    # checkpoints it leaves behind seed follow-up experiments (e.g. the
    # 30K-iter quality run) without re-running SfM.
    work = os.environ.get("FAST_PRESET_WORKDIR", "/tmp/tpu_splat_fast_run")
    if os.path.isdir(work):  # a stale checkpoint must not leak into the bench
        import shutil

        shutil.rmtree(work)
    os.makedirs(work, exist_ok=True)
    job = build_job_json(img_dir, output_path=os.path.join(work, "out"),
                         preset="fast")
    cfg = job_config_from_json(job)
    t0 = time.time()
    result = run_job(cfg, log_fn=lambda s: print(s, file=sys.stderr, flush=True))
    wall = time.time() - t0
    timings = result.timings
    sfm_s = timings.get("SfM", 0.0)
    train_s = timings.get("Train-Stage1", 0.0)
    metrics = result.metrics
    out = {
        "wall_s": round(wall, 1),
        "sfm_s": round(sfm_s, 1),
        "train_s": round(train_s, 1),
        "sfm_img_s": round(n / sfm_s, 2) if sfm_s else None,
        "it_s": round(5000.0 / train_s, 2) if train_s else None,
        "psnr_heldout": round(metrics.get("psnr", 0.0), 2),
        "eval_views": int(metrics.get("eval_views", 0)),
        "n_frames": n,
        "steps": 5000,
        "ref_envelope_s": "1200-1800 (A10G fast preset incl. SfM)",
    }
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "FAST_PRESET.json"), "w") as f:
        json.dump(out, f, indent=2)
    return out


def _tpu_reachable(timeout_s: float = 0.0) -> bool:
    # Fresh-process device init through the tunnel measures ~55 s healthy but
    # has been seen past 7 MINUTES under tunnel flap (r5: a probe succeeded
    # at ~240 s, the very next one timed out at 420 s) — the cap only needs
    # to beat "hangs forever", so keep it generous and give it two attempts
    # (a slow probe on a dead tunnel is cheaper than a falsely-skipped bench).
    """Probe the accelerator in a SUBPROCESS with a hard timeout: the axon
    tunnel, when down, hangs jax device init forever — without this guard a
    dead tunnel turns the whole bench (and the driver that runs it) into a
    hang instead of a recorded failure. Timeout tunable via
    TPU_PROBE_TIMEOUT_S."""
    import subprocess
    timeout_s = timeout_s or float(os.environ.get("TPU_PROBE_TIMEOUT_S", 600))
    for _ in range(2):
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp;"
                 "print(float(jnp.ones((64, 64)).sum()))"],
                timeout=timeout_s, capture_output=True)
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
    return False


def _init_device_or_die(timeout_s: float = 300.0):
    """Initialize THIS process's device client up front, with a hard-exit
    watchdog. Through the axon tunnel each fresh device init is a coin flip
    (55 s healthy, minutes under load, or WEDGED FOREVER — r5 observed a
    probe succeed and the very next init in another process hang with zero
    CPU for 15+ min). The wedge cannot be cancelled from inside the process,
    so the only robust shape is: init FIRST (before any ingest work), and if
    it doesn't complete in time, os._exit so a supervisor can retry a fresh
    process. Once the client is established, subsequent device use has been
    stable for full-run lengths."""
    import threading

    done = threading.Event()

    def watchdog():
        if not done.wait(timeout_s):
            print(f"device init wedged (> {timeout_s:.0f}s); exiting for "
                  "supervisor retry", file=sys.stderr, flush=True)
            os._exit(3)

    t = threading.Thread(target=watchdog, daemon=True)
    t.start()
    import jax

    jax.devices()  # triggers backend init; hangs forever on a wedged tunnel
    done.set()


def main():
    # persistent compile cache: tunnel compiles cost minutes; repeat bench
    # runs (and the driver's end-of-round run) should hit the cache
    from tpu_splat.pipeline.runner import _enable_compile_cache

    _enable_compile_cache()
    if "--preset" in sys.argv:
        # Full-scale north-star run: the main process IS the TPU client for
        # the next ~25 min — establish (or fail) the device connection now,
        # before the ~5 min CPU ingest phase, instead of probing in a
        # subprocess and then wedging at the SfM boundary.
        _init_device_or_die(float(os.environ.get("TPU_INIT_TIMEOUT_S", 300)))
        out = bench_fast_preset()
        print(json.dumps({
            "metric": "fast_preset_ingest_to_splat_wall_s",
            "value": out["wall_s"], "unit": "s (150 frames, 720p, 5K steps)",
            "vs_baseline": round(1500.0 / out["wall_s"], 3),
            "extra": out,
        }))
        return
    if not _tpu_reachable():
        # Honest failure record: the driver stores this line as the round's
        # bench; value 0 + the marker beats a silent hang. The last number
        # measured on real hardware this round is noted for context only.
        print(json.dumps({
            "metric": "3dgs_train_iters_per_sec_per_chip",
            "value": 0.0,
            "unit": "it/s (512K splats, 1280x720, SH3, fwd+bwd+adam)",
            "vs_baseline": 0.0,
            "extra": {
                "error": "TPU tunnel unreachable (device init probe timed "
                         "out); bench could not run",
                "last_measured_on_tpu": {
                    "it_s": 17.2,
                    "note": "r3 interim, before the exact tile cull and the "
                            "tier-1 binning split landed (both unmeasured "
                            "on hardware; see docs/TPU_RUNBOOK_r3.md)",
                },
            },
        }))
        return
    its = bench_train_throughput()
    extra = {}
    if os.environ.get("BENCH_TRAIN_ONLY", "0") != "1":
        try:
            extra["sfm_images_per_sec"] = round(bench_sfm_throughput(), 2)
        except Exception as e:  # never let a sub-bench kill the headline
            extra["sfm_images_per_sec"] = f"error: {e}"
        try:
            extra.update(bench_mini_pipeline())
        except Exception as e:
            extra["mini_pipeline"] = f"error: {e}"
        try:
            sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
            from tests.test_matting_quality import matting_iou

            extra["matting_iou"] = {m: round(matting_iou(m), 3)
                                    for m in ("saliency", "sam2")}
        except Exception as e:
            extra["matting_iou"] = f"error: {e}"
        fp = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "FAST_PRESET.json")
        if os.path.exists(fp):  # recorded `--preset fast` run (see above)
            with open(fp) as f:
                extra["fast_preset"] = json.load(f)

    print(json.dumps({
        "metric": "3dgs_train_iters_per_sec_per_chip",
        "value": round(its, 2),
        "unit": "it/s (512K splats, 1280x720, SH3, fwd+bwd+adam)",
        "vs_baseline": round(its / BASELINE_A10G_ITS, 3),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
