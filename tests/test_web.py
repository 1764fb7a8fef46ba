"""Web console + viewer tests: the packed splat format roundtrip and the
HTTP API surface (job listing, status, validation, artifact + splat-buffer
serving) — the console/viewer capability of reference rows 28-29
(Gradio/app.py:237-331, generate_splat_gradio.py:883-1017)."""

import json
import os
import urllib.request

import numpy as np
import pytest

from tpu_splat.core.types import GaussianCloud
from tpu_splat.web.splat_format import (
    BYTES_PER_SPLAT,
    cloud_to_splat_bytes,
    splat_bytes_to_arrays,
)


def _random_cloud(n=64, seed=0):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    quats = rng.normal(size=(n, 4))
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    return GaussianCloud(
        means=jnp.asarray(rng.normal(size=(n, 3)), jnp.float32),
        scales=jnp.asarray(np.log(rng.uniform(0.01, 0.1, (n, 3))), jnp.float32),
        quats=jnp.asarray(quats, jnp.float32),
        opacities=jnp.asarray(rng.normal(size=(n,)), jnp.float32),
        sh0=jnp.asarray(rng.normal(0, 0.5, (n, 3)), jnp.float32),
        shN=jnp.zeros((n, 0, 3), jnp.float32),
    )


class TestSplatFormat:
    def test_roundtrip_shapes_and_values(self):
        cloud = _random_cloud(64)
        data = cloud_to_splat_bytes(cloud)
        assert len(data) == 64 * BYTES_PER_SPLAT
        means, scales, rgba, quats = splat_bytes_to_arrays(data)

        # positions/scales are exact f32; order is by descending visual mass,
        # so compare as sets via lexicographic sort
        want = np.sort(np.asarray(cloud.means, np.float32), axis=0)
        got = np.sort(means, axis=0)
        np.testing.assert_array_equal(want, got)
        np.testing.assert_allclose(
            np.sort(scales, axis=0),
            np.sort(np.exp(np.asarray(cloud.scales)), axis=0), rtol=1e-6,
        )
        # u8 quantization within 1/255
        assert rgba.min() >= 0.0 and rgba.max() <= 1.0
        assert np.abs(np.linalg.norm(quats, axis=1) - 1.0).max() < 0.02

    def test_dominant_first_ordering(self):
        cloud = _random_cloud(128)
        data = cloud_to_splat_bytes(cloud, max_splats=16)
        means, scales, rgba, _ = splat_bytes_to_arrays(data)
        assert means.shape[0] == 16
        # the kept prefix must be the highest-mass splats
        opac = 1 / (1 + np.exp(-np.asarray(cloud.opacities)))
        mass = opac * np.exp(np.asarray(cloud.scales)).mean(1)
        kept_mass = rgba[:, 3] * scales.mean(1)
        assert kept_mass.min() >= np.sort(mass)[-16] - 1e-2


@pytest.fixture()
def server(tmp_path):
    from tpu_splat.web.server import start_background

    httpd = start_background(str(tmp_path), port=0)
    yield httpd, str(tmp_path)
    httpd.shutdown()
    httpd.server_close()


def _get(httpd, path, expect=200):
    port = httpd.server_address[1]
    try:
        r = urllib.request.urlopen(f"http://127.0.0.1:{port}{path}")
        return r.status, r.read()
    except urllib.error.HTTPError as e:
        assert e.code == expect, f"{path}: {e.code}"
        return e.code, e.read()


def _post(httpd, path, payload, expect=200):
    port = httpd.server_address[1]
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=json.dumps(payload).encode()
    )
    try:
        r = urllib.request.urlopen(req)
        return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        assert e.code == expect, f"{path}: {e.code}"
        return e.code, json.loads(e.read())


class TestServer:
    def test_console_and_viewer_pages(self, server):
        httpd, _ = server
        status, body = _get(httpd, "/")
        assert status == 200 and b"tpu-splat" in body
        status, body = _get(httpd, "/viewer?uuid=x")
        assert status == 200 and b"WebGL2" in body or b"webgl2" in body

    def test_job_listing_and_status(self, server):
        httpd, root = server
        status, body = _get(httpd, "/api/jobs")
        assert status == 200 and json.loads(body) == []
        # drop a record into the store the way the runner does
        rec = {"status": "Complete", "start": 1.0,
               "metrics": {"psnr": 30.0, "num_gaussians": 1000.0}}
        with open(os.path.join(root, "jobs", "abc.json"), "w") as f:
            json.dump(rec, f)
        status, body = _get(httpd, "/api/jobs")
        jobs = json.loads(body)
        assert len(jobs) == 1 and jobs[0]["uuid"] == "abc"
        status, body = _get(httpd, "/api/jobs/abc")
        assert json.loads(body)["status"] == "Complete"
        _get(httpd, "/api/jobs/nope", expect=404)

    def test_submit_validate_only(self, server):
        httpd, root = server
        job = {"uuid": "v1", "inputPath": "/nonexistent.mp4",
               "validateOnly": True,
               "training": {"maxSteps": 100}}
        status, body = _post(httpd, "/api/jobs", job)
        assert status == 200 and body["valid"] and body["uuid"] == "v1"
        # bad config rejected
        status, body = _post(
            httpd, "/api/jobs",
            {"uuid": "v2", "inputPath": "", "validateOnly": True}, expect=400,
        )
        assert "error" in body

    def test_splat_buffer_endpoint(self, server):
        from tpu_splat.core.ply import save_ply

        httpd, root = server
        _get(httpd, "/api/splat/job1.splat", expect=404)
        art_dir = os.path.join(root, "workflow-output", "job1")
        os.makedirs(art_dir)
        ply = os.path.join(art_dir, "splat.ply")
        save_ply(_random_cloud(32), ply)
        with open(os.path.join(root, "jobs", "job1.json"), "w") as f:
            json.dump({"status": "Complete", "artifacts": {"ply": ply}}, f)
        status, body = _get(httpd, "/api/splat/job1.splat")
        assert status == 200 and len(body) == 32 * BYTES_PER_SPLAT
        means, _, _, _ = splat_bytes_to_arrays(body)
        assert np.isfinite(means).all()
        # raw artifact download
        status, body = _get(httpd, "/artifacts/job1/splat.ply")
        assert status == 200 and body[:3] == b"ply"
