"""Multi-chip serving (VERDICT r4 #6) on the virtual 8-device CPU mesh.

serve.py now carries sampler.py's sampling parallelism behind the server:
``--model_parallel N`` shards heads/hidden over the mesh "model" axis and
the bucket over "data"; without TP a divisible bucket/slot batch shards
over all devices. The equality contract mirrors the sampler CLI tests
(tests/test_cli.py): DP sharding is BIT-identical to single-chip (noise
drawn first, then placed), TP matches within the uint8-pixel tolerance
(psum reduction order). The reference has no serving at all (its samplers
are batch CLIs, reference sampler.py:192-252)."""

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
def tiny_cfg(tmp_path_factory):
    p = tmp_path_factory.mktemp("serve_mc") / "tiny.yaml"
    p.write_text(TINY_YAML)
    return p


def _args(cfg, extra):
    return serve_cli.get_args(
        ["--config_path", str(cfg), "--random_init"] + extra
    )


def _unsharded(monkeypatch):
    """Force the single-chip layout regardless of divisibility — the
    reference leg every sharded server is compared against."""
    import duodiff_tpu.parallel as par

    monkeypatch.setattr(
        par, "setup_sampling_sharding",
        lambda mp, b, trees, mesh=None: (None, list(trees)),
    )


def test_bucket_dp_sharded_bit_identical(tiny_cfg, monkeypatch):
    """bucket=8 on 8 devices auto-shards over "data"; images are
    bit-identical to the forced single-chip layout (ddpm path — the
    ChunkedDDPMSampler sharding= plumbing)."""
    extra = ["--method", "ddpm", "--num_timesteps", "12", "--bucket", "8"]
    svc = serve_cli.SamplerService(_args(tiny_cfg, extra))
    assert svc.batch_shard is not None
    assert svc.info()["mesh"] == {"data": 8, "model": 1}
    got = svc.sample(n=8, seed=7)

    _unsharded(monkeypatch)
    ref_svc = serve_cli.SamplerService(_args(tiny_cfg, extra))
    assert ref_svc.batch_shard is None
    want = ref_svc.sample(n=8, seed=7)
    np.testing.assert_array_equal(np.stack(got), np.stack(want))


def test_bucket_dp_sharded_dpm_bit_identical(tiny_cfg, monkeypatch):
    """Same contract through the dpm path, which pre-draws x_init with the
    solver's own first key split before placing it on the mesh."""
    extra = ["--method", "dpm", "--steps", "4", "--num_timesteps", "32",
             "--bucket", "8"]
    svc = serve_cli.SamplerService(_args(tiny_cfg, extra))
    assert svc.batch_shard is not None
    got = svc.sample(n=8, seed=3)

    _unsharded(monkeypatch)
    ref_svc = serve_cli.SamplerService(_args(tiny_cfg, extra))
    want = ref_svc.sample(n=8, seed=3)
    np.testing.assert_array_equal(np.stack(got), np.stack(want))


def test_bucket_tensor_parallel_matches_single_chip(tiny_cfg, monkeypatch):
    """--model_parallel 2: a 4x2 (data, model) serving mesh with the heads
    qkv layout matches the single-chip server within the sampler CLI's
    uint8-pixel tolerance (TP psum order drifts a few ulp)."""
    base = ["--method", "ddpm", "--num_timesteps", "12", "--bucket", "8"]
    svc = serve_cli.SamplerService(
        _args(tiny_cfg, base + ["--model_parallel", "2"])
    )
    info = svc.info()
    assert info["model_parallel"] == 2
    assert info["mesh"] == {"data": 4, "model": 2}
    got = np.stack(svc.sample(n=8, seed=5))

    _unsharded(monkeypatch)
    ref_svc = serve_cli.SamplerService(_args(tiny_cfg, base))
    want = np.stack(ref_svc.sample(n=8, seed=5))
    # the /sample endpoint quantizes to uint8 PNG; pin that tolerance
    assert np.max(np.abs(
        np.round(got * 255.0) - np.round(want * 255.0)
    )) <= 2


def test_continuous_sharded_slots_match_bucket1(tiny_cfg, monkeypatch):
    """--slots 8 on 8 devices shards the slot axis over "data"; per-request
    images stay bit-identical to the single-chip bucket-1 server (the
    continuous-batching equality contract is sharding-independent)."""
    svc = serve_cli.ContinuousSamplerService(_args(tiny_cfg, [
        "--method", "ddpm", "--num_timesteps", "12", "--slots", "8",
        "--steps_per_poll", "3",
    ]))
    try:
        assert svc.serve_mesh is not None
        got1 = np.stack(svc.sample(n=3, seed=7))
        got2 = np.stack(svc.sample(n=1, seed=11))
    finally:
        svc.close()

    _unsharded(monkeypatch)
    ref_svc = serve_cli.SamplerService(_args(tiny_cfg, [
        "--method", "ddpm", "--num_timesteps", "12", "--bucket", "1",
    ]))
    want1 = np.stack(ref_svc.sample(n=3, seed=7))
    want2 = np.stack(ref_svc.sample(n=1, seed=11))
    np.testing.assert_array_equal(got1, want1)
    np.testing.assert_array_equal(got2, want2)


def test_model_parallel_rejects_static_schedule(tiny_cfg):
    with pytest.raises(SystemExit, match="model_parallel"):
        serve_cli.SamplerService(_args(tiny_cfg, [
            "--method", "ddpm", "--num_timesteps", "12", "--bucket", "8",
            "--model_parallel", "2", "--static_schedule", "11-0:3",
        ]))
