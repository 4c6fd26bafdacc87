"""Latent-space (imagenet256-style) end-to-end test with a tiny synthesized
KL autoencoder: train a few steps encoding through the frozen AE, then
sample + decode through the sampler CLI (reference trainer.py:266-269,
sampler.py:141-143). Requires the reference checkout only to synthesize a
torch-format AE checkpoint."""

import sys
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

REFERENCE = Path("/root/reference")
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not REFERENCE.exists(),
        reason="reference checkout (torch AE) unavailable",
    ),
]
if REFERENCE.exists():
    sys.path.insert(0, str(REFERENCE))

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

LATENT_YAML = """model_params:
  img_size: 16
  patch_size: 2
  in_chans: 4
  embed_dim: 32
  depth: 3
  num_heads: 4
  mlp_ratio: 4
  qkv_bias: False
  mlp_time_embed: False
  num_classes: 3
  normalize_timesteps: False

autoencoder:
  autoencoder_checkpoint_path: {ae_path}
  ch: 32
  ch_mult: [1, 2]
  num_res_blocks: 1
  z_channels: 4
  embed_dim: 4
  resolution: 32
"""


@pytest.fixture
def tiny_ae_ckpt(tmp_path):
    import torch
    from models.utils.autoencoder import Decoder as RefDecoder
    from models.utils.autoencoder import Encoder as RefEncoder

    ddconfig = dict(
        double_z=True, z_channels=4, resolution=32, in_channels=3, out_ch=3,
        ch=32, ch_mult=[1, 2], num_res_blocks=1, attn_resolutions=[],
        dropout=0.0,
    )
    torch.manual_seed(0)
    sd = {}
    sd.update({f"encoder.{k}": v for k, v in RefEncoder(**ddconfig).state_dict().items()})
    sd.update({f"decoder.{k}": v for k, v in RefDecoder(**ddconfig).state_dict().items()})
    sd.update({f"quant_conv.{k}": v for k, v in torch.nn.Conv2d(8, 8, 1).state_dict().items()})
    sd.update({f"post_quant_conv.{k}": v for k, v in torch.nn.Conv2d(4, 4, 1).state_dict().items()})
    path = tmp_path / "ae_tiny.pth"
    torch.save(sd, path)
    return path


@pytest.fixture
def imagenet_dir(tmp_path):
    rng = np.random.RandomState(0)
    root = tmp_path / "data" / "imagenet"
    for cls in ["n01", "n02"]:
        (root / cls).mkdir(parents=True)
        for i in range(6):
            Image.fromarray(
                rng.randint(0, 256, (32, 32, 3), dtype=np.uint8)
            ).save(root / cls / f"{i}.png")
    return tmp_path / "data"


def test_latent_train_and_sample(tmp_path, tiny_ae_ckpt, imagenet_dir):
    import main as main_cli
    import sampler as sampler_cli

    cfg_path = tmp_path / "latent.yaml"
    cfg_path.write_text(LATENT_YAML.format(ae_path=tiny_ae_ckpt))

    logs = main_cli.main([
        "--config_path", str(cfg_path),
        "--dataset", "imagenet256",
        "--data_path", str(imagenet_dir),
        "--n_steps", "2",
        "--batch_size", "4",
        "--num_timesteps", "20",
        "--log_path", str(tmp_path / "logs"),
        "--exp_name", "lat",
        "--num_warmup_steps", "1",
    ])
    assert logs and np.isfinite(logs[-1]["train_loss"])

    out = tmp_path / "samples"
    sampler_cli.main([
        "--config_path", str(cfg_path),
        "--batch_size", "2",
        "--parametrization", "predict_noise",
        "--output_folder", str(out),
        "--random_init",
        "--num_timesteps", "8",
        "--class_id", "1",
    ])
    img = np.asarray(Image.open(out / "0.png"))
    assert img.shape == (32, 32, 3)  # decoded from 16x16x4 latents
