"""End-to-end smoke of the DuoDiff t_switch sweep tool on tiny shapes
(random-init models + random-init inception; the numbers are meaningless,
the plumbing — dual-backbone handoff, timing, FID against cached stats,
recommendation — is what's under test)."""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

TINY = """model_params:
  img_size: 16
  patch_size: 2
  in_chans: 3
  embed_dim: 32
  depth: {depth}
  num_heads: 4
  mlp_ratio: 4
  qkv_bias: False
  mlp_time_embed: False
  num_classes: -1
  normalize_timesteps: True
"""


@pytest.mark.slow
def test_t_switch_sweep_smoke(tmp_path):
    import t_switch_sweep

    shallow = tmp_path / "shallow.yaml"
    shallow.write_text(TINY.format(depth=3))
    full = tmp_path / "full.yaml"
    full.write_text(TINY.format(depth=5))

    rng = np.random.RandomState(0)
    feats = rng.randn(64, 2048)
    mu = feats.mean(axis=0)
    sigma = np.cov(feats, rowvar=False)
    stats = tmp_path / "stats.npz"
    np.savez(stats, mu=mu, sigma=sigma)

    out = tmp_path / "sweep.json"
    payload = t_switch_sweep.main([
        "--config_path", str(shallow),
        "--config_path_late", str(full),
        "--random_init",
        "--real_stats", str(stats),
        "--inception_weights", "random-init",
        "--t_switch", "4",
        "--n_samples", "4",
        "--batch_size", "4",
        "--num_timesteps", "8",
        "--fid_slack", "1e9",
        "--output", str(out),
    ])
    assert {r["t_switch"] for r in payload["results"]} == {0, 4}
    assert all(np.isfinite(r["fid"]) for r in payload["results"])
    assert payload["recommended"]["t_switch"] == 4  # slack is huge
    assert json.loads(out.read_text())["recommended"]["t_switch"] == 4


def test_switch_sampler_matches_duodiff_sample():
    """The sweep's chunked handoff must be bit-identical to duodiff_sample
    (the t_switch convention the sampler CLI deploys)."""
    import jax
    import jax.numpy as jnp
    import t_switch_sweep

    from duodiff_tpu.config import UViTConfig
    from duodiff_tpu.diffusion import ChunkedDDPMSampler, NoiseSchedule
    from duodiff_tpu.diffusion.sampling import duodiff_sample
    from duodiff_tpu.models.uvit import init_uvit

    cfg3 = UViTConfig(img_size=16, patch_size=2, in_chans=3, embed_dim=32,
                      depth=3, num_heads=4, num_classes=-1,
                      normalize_timesteps=True)
    cfg5 = UViTConfig(img_size=16, patch_size=2, in_chans=3, embed_dim=32,
                      depth=5, num_heads=4, num_classes=-1,
                      normalize_timesteps=True)
    m3, p3 = init_uvit(cfg3, jax.random.PRNGKey(0))
    m5, p5 = init_uvit(cfg5, jax.random.PRNGKey(1))
    early = lambda x, t, y: m3.apply({"params": p3}, x, t, y)
    late = lambda x, t, y: m5.apply({"params": p5}, x, t, y)

    schedule = NoiseSchedule.create(steps=10)
    shape = (2, 16, 16, 3)
    sampler = t_switch_sweep.make_switch_sampler(
        ChunkedDDPMSampler(early, schedule, parametrization="predict_noise",
                           chunk=4),
        ChunkedDDPMSampler(late, schedule, parametrization="predict_noise",
                           chunk=4),
        schedule, shape,
    )
    key = jax.random.PRNGKey(42)
    t_switch = 4
    got = sampler(key, t_switch)
    want = duodiff_sample(early, late, key, schedule=schedule, shape=shape,
                          t_switch=t_switch)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)
