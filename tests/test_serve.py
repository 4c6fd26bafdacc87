"""serve.py: the HTTP serving endpoint (fixed-bucket compiled sampler)."""

import base64
import io
import json
import threading
import urllib.request

import numpy as np
import pytest

import serve as serve_cli

TINY_YAML = """model_params:
  img_size: 16
  patch_size: 2
  in_chans: 3
  embed_dim: 32
  depth: 3
  num_heads: 4
  mlp_ratio: 4
  qkv_bias: False
  mlp_time_embed: False
  num_classes: -1
  normalize_timesteps: True
"""


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    cfg = tmp_path_factory.mktemp("serve") / "tiny.yaml"
    cfg.write_text(TINY_YAML)
    ready = threading.Event()
    box = []
    th = threading.Thread(
        target=serve_cli.main,
        args=([
            "--config_path", str(cfg),
            "--random_init",
            "--port", "0",           # ephemeral port
            "--method", "dpm",
            "--steps", "4",
            "--num_timesteps", "32",
            "--bucket", "2",
        ],),
        kwargs={"ready_event": ready, "server_box": box},
        daemon=True,
    )
    th.start()
    assert ready.wait(timeout=300), "server did not come up"
    httpd, service = box[0]
    yield f"http://127.0.0.1:{httpd.server_address[1]}", service
    httpd.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=120) as r:
        return json.loads(r.read())


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(), method="POST"
    )
    try:
        with urllib.request.urlopen(req, timeout=300) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_healthz(server):
    base, service = server
    info = _get(base + "/healthz")
    assert info["status"] == "ok"
    assert info["method"] == "dpm" and info["steps"] == 4
    assert info["bucket"] == 2 and info["img_size"] == 16


def test_sample_roundtrip(server):
    from PIL import Image

    base, _ = server
    code, resp = _post(base + "/sample", {"n": 3, "seed": 7})
    assert code == 200, resp
    assert len(resp["images"]) == 3
    for b64 in resp["images"]:
        img = Image.open(io.BytesIO(base64.b64decode(b64)))
        assert img.size == (16, 16)
        arr = np.asarray(img)
        assert np.isfinite(arr).all()
    assert resp["elapsed_ms"] > 0


def test_sample_deterministic_per_seed(server):
    base, _ = server
    _, r1 = _post(base + "/sample", {"n": 1, "seed": 11})
    _, r2 = _post(base + "/sample", {"n": 1, "seed": 11})
    _, r3 = _post(base + "/sample", {"n": 1, "seed": 12})
    assert r1["images"] == r2["images"]
    assert r1["images"] != r3["images"]


def test_sample_validation(server):
    base, _ = server
    code, resp = _post(base + "/sample", {"n": 0})
    assert code == 400 and "error" in resp
    # unconditional model rejects class_id
    code, resp = _post(base + "/sample", {"n": 1, "class_id": 3})
    assert code == 400 and "error" in resp
    # malformed bodies get a 400, not a dropped connection
    code, resp = _post(base + "/sample", [1, 2])
    assert code == 400 and "JSON object" in resp["error"]
    code, resp = _post(base + "/sample", {"n": 1, "seed": "not-an-int"})
    assert code == 400 and "error" in resp
    # string numbers are coerced
    code, resp = _post(base + "/sample", {"n": "1", "seed": "7"})
    assert code == 200


def test_ddpm_steps_contract(tmp_path):
    """--method ddpm rejects a --steps override (the full reverse process
    always runs; shortening the schedule changes the beta range)."""
    cfg = tmp_path / "t.yaml"
    cfg.write_text(TINY_YAML)
    with pytest.raises(SystemExit, match="full reverse process"):
        serve_cli.main([
            "--config_path", str(cfg), "--random_init",
            "--method", "ddpm", "--steps", "4", "--num_timesteps", "16",
        ])


@pytest.mark.slow
def test_conditional_unguided_server(tmp_path):
    """Conditional model without guidance: class_id optional; omitted ->
    random real labels (y stays an array either way — a None<->array flip
    would change the jit signature and force a mid-request compile)."""
    cfg = tmp_path / "cond_ug.yaml"
    cfg.write_text(TINY_YAML.replace("num_classes: -1", "num_classes: 10"))
    ready = threading.Event()
    box = []
    th = threading.Thread(
        target=serve_cli.main,
        args=([
            "--config_path", str(cfg),
            "--random_init",
            "--port", "0",
            "--method", "dpm",
            "--steps", "3",
            "--num_timesteps", "32",
        ],),
        kwargs={"ready_event": ready, "server_box": box},
        daemon=True,
    )
    th.start()
    assert ready.wait(timeout=300)
    httpd, service = box[0]
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        code, r1 = _post(base + "/sample", {"n": 1, "seed": 3})
        assert code == 200, r1
        code, r2 = _post(base + "/sample", {"n": 1, "seed": 3,
                                            "class_id": 7})
        assert code == 200, r2
        assert r1["images"] != r2["images"]  # different labels, same seed
    finally:
        httpd.shutdown()


@pytest.mark.slow
def test_guided_server(tmp_path):
    """--guidance_scale serving: class-conditional model, CFG-doubled
    forward; class_id is required and must be a real (non-null) class."""
    cfg = tmp_path / "cond.yaml"
    cfg.write_text(TINY_YAML.replace("num_classes: -1", "num_classes: 10"))
    ready = threading.Event()
    box = []
    th = threading.Thread(
        target=serve_cli.main,
        args=([
            "--config_path", str(cfg),
            "--random_init",
            "--port", "0",
            "--method", "dpm",
            "--steps", "3",
            "--num_timesteps", "32",
            "--guidance_scale", "2.5",
        ],),
        kwargs={"ready_event": ready, "server_box": box},
        daemon=True,
    )
    th.start()
    assert ready.wait(timeout=300), "guided server did not come up"
    httpd, _ = box[0]
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        info = _get(base + "/healthz")
        assert info["guidance_scale"] == 2.5
        code, resp = _post(base + "/sample", {"n": 1, "seed": 3,
                                              "class_id": 4})
        assert code == 200, resp
        assert len(resp["images"]) == 1
        # guided requests must carry a class_id, and never the null slot
        code, resp = _post(base + "/sample", {"n": 1})
        assert code == 400
        code, resp = _post(base + "/sample", {"n": 1, "class_id": 9})
        assert code == 400
    finally:
        httpd.shutdown()


# ---------------------------------------------------------------------------
# static-exit serving (--static_schedule): per-bucket truncated executables
# ---------------------------------------------------------------------------


def test_static_schedule_serving_matches_library(tmp_path):
    """serve.py --static_schedule: the bucket server runs the timestep-
    bucketed truncated backbones (the best measured CelebA-64 operating
    family) and must reproduce the library static sampler bit for bit
    with the server's request-key path."""
    import jax

    from duodiff_tpu.diffusion import NoiseSchedule
    from duodiff_tpu.diffusion.static_exit import (
        make_static_exit_sampler,
        parse_exit_schedule,
    )
    from duodiff_tpu.utils.model_loading import load_model_from_config

    cfg = tmp_path / "tiny.yaml"
    cfg.write_text(TINY_YAML)
    spec = "11-6:1,5-0:3"
    svc = serve_cli.SamplerService(serve_cli.get_args([
        "--config_path", str(cfg), "--random_init", "--port", "0",
        "--method", "ddpm", "--num_timesteps", "12", "--bucket", "2",
        "--static_schedule", spec,
    ]))
    imgs = svc.sample(n=2, seed=3)
    assert len(imgs) == 2 and np.isfinite(np.stack(imgs)).all()

    model, params, mcfg, _ = load_model_from_config(
        str(cfg), None, early_exit=True
    )
    sampler = make_static_exit_sampler(
        mcfg, params, schedule=NoiseSchedule.create(steps=12),
        buckets=parse_exit_schedule(spec), dtype=model.dtype,
        attn_impl=model.attn_impl,
    )
    key = jax.random.fold_in(jax.random.PRNGKey(3), 0)
    want = np.asarray((sampler(key, (2, 16, 16, 3)) + 1.0) / 2.0)
    np.testing.assert_array_equal(np.stack(imgs), want)


@pytest.mark.slow
def test_static_schedule_serving_with_cache(tmp_path):
    # slow set: two static servers; the library-equality static serving
    # test + eesampler's static+cache tests cover the composition default
    """--static_schedule composes with --cache_every (block caching inside
    each bucket's truncated backbone) — and the cache is not a no-op."""
    cfg = tmp_path / "tiny.yaml"
    cfg.write_text(TINY_YAML)
    base_args = [
        "--config_path", str(cfg), "--random_init", "--port", "0",
        "--method", "ddpm", "--num_timesteps", "13", "--bucket", "1",
        "--static_schedule", "12-0:3",
    ]
    plain = serve_cli.SamplerService(serve_cli.get_args(base_args))
    cached = serve_cli.SamplerService(serve_cli.get_args(
        base_args + ["--cache_every", "3"]
    ))
    a = np.stack(plain.sample(n=1, seed=5))
    b = np.stack(cached.sample(n=1, seed=5))
    assert np.isfinite(a).all() and np.isfinite(b).all()
    assert np.any(a != b)


def test_static_schedule_validation(tmp_path):
    cfg = tmp_path / "tiny.yaml"
    cfg.write_text(TINY_YAML)
    with pytest.raises(SystemExit, match="fixed-bucket only"):
        serve_cli.ContinuousSamplerService(serve_cli.get_args([
            "--config_path", str(cfg), "--random_init", "--port", "0",
            "--method", "ddpm", "--num_timesteps", "12", "--slots", "2",
            "--static_schedule", "11-0:3",
        ]))
    with pytest.raises(SystemExit, match="static-exit family"):
        serve_cli.SamplerService(serve_cli.get_args([
            "--config_path", str(cfg), "--random_init", "--port", "0",
            "--method", "dpm", "--steps", "4", "--num_timesteps", "12",
            "--static_schedule", "11-0:3",
        ]))
