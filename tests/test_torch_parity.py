"""Forward-pass parity vs the reference PyTorch implementation.

Builds the reference models (imported from /root/reference, torch CPU) with
random init, converts the state dict with duodiff_tpu.utils.torch_convert,
and asserts our forward matches to fp32 tolerance. Skipped when the
reference checkout is absent. This is the converter + model-topology golden
test SURVEY.md §7 stage 10 calls for.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

REFERENCE = Path("/root/reference")
pytestmark = pytest.mark.skipif(
    not REFERENCE.exists(), reason="reference checkout not available"
)

if REFERENCE.exists():
    sys.path.insert(0, str(REFERENCE))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from duodiff_tpu.config import UViTConfig  # noqa: E402
from duodiff_tpu.models.early_exit import init_early_exit_uvit  # noqa: E402
from duodiff_tpu.models.uvit import init_uvit  # noqa: E402
from duodiff_tpu.utils.torch_convert import convert_torch_checkpoint  # noqa: E402

CFG = dict(
    img_size=16,
    patch_size=2,
    in_chans=3,
    embed_dim=32,
    depth=5,
    num_heads=4,
    mlp_ratio=4,
    qkv_bias=False,
    mlp_time_embed=True,
    num_classes=-1,
    normalize_timesteps=True,
)


def _save_ref_uvit(tmp_path, **overrides):
    import torch
    from models.uvit import UViT as RefUViT

    kwargs = {**CFG, **overrides}
    torch.manual_seed(0)
    ref = RefUViT(**kwargs)
    ref.eval()
    path = tmp_path / "ref.pth"
    torch.save(ref.state_dict(), path)
    return ref, path, kwargs


def test_uvit_forward_parity(tmp_path):
    import torch

    ref, path, kwargs = _save_ref_uvit(tmp_path)
    cfg = UViTConfig(**{k: v for k, v in kwargs.items()})
    model, params0 = init_uvit(cfg, jax.random.PRNGKey(0))
    params = convert_torch_checkpoint(path, params0)

    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 16, 16).astype(np.float32)
    t = np.array([17.0, 941.0], dtype=np.float32)

    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x), torch.from_numpy(t)).numpy()

    out = model.apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t)
    )
    out = np.asarray(out).transpose(0, 3, 1, 2)

    err = np.abs(out - ref_out).max()
    assert err < 2e-4, f"max abs err {err}"


def test_uvit_class_conditional_parity(tmp_path):
    import torch

    ref, path, kwargs = _save_ref_uvit(
        tmp_path, num_classes=11, normalize_timesteps=False, mlp_time_embed=False
    )
    cfg = UViTConfig(**{k: v for k, v in kwargs.items()})
    model, params0 = init_uvit(cfg, jax.random.PRNGKey(0))
    params = convert_torch_checkpoint(path, params0)

    rng = np.random.RandomState(1)
    x = rng.randn(2, 3, 16, 16).astype(np.float32)
    t = np.array([3.0, 500.0], dtype=np.float32)
    y = np.array([1, 9])

    with torch.no_grad():
        ref_out = ref(
            torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(y)
        ).numpy()
    out = model.apply(
        {"params": params},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(t),
        jnp.asarray(y),
    )
    out = np.asarray(out).transpose(0, 3, 1, 2)
    assert np.abs(out - ref_out).max() < 2e-4


@pytest.mark.parametrize(
    "classifier_type",
    ["mlp_probe_per_layer", "attention_probe", "mlp_probe_per_timestep"],
)
def test_early_exit_forward_parity(tmp_path, classifier_type):
    import torch
    from models.early_exit import EarlyExitUViT as RefEE
    from models.uvit import UViT as RefUViT

    kwargs = {**CFG, "mlp_time_embed": False}
    torch.manual_seed(0)
    ref = RefEE(RefUViT(**kwargs), classifier_type=classifier_type)
    ref.eval()
    path = tmp_path / "ref_ee.pth"
    torch.save(ref.state_dict(), path)

    cfg = UViTConfig(**kwargs, classifier_type=classifier_type)
    model, params0 = init_early_exit_uvit(cfg, jax.random.PRNGKey(0))
    params = convert_torch_checkpoint(path, params0)

    rng = np.random.RandomState(2)
    x = rng.randn(2, 3, 16, 16).astype(np.float32)
    # reference probes index by int(timesteps[0]) -> use a uniform batch t
    t = np.array([123.0, 123.0], dtype=np.float32)

    with torch.no_grad():
        ref_bb, ref_u, ref_g = ref(torch.from_numpy(x), torch.from_numpy(t))
        ref_u = torch.stack(ref_u).numpy()
        ref_g = torch.stack(ref_g).numpy()
        ref_bb = ref_bb.numpy()

    bb, u, g = model.apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t)
    )
    bb = np.asarray(bb).transpose(0, 3, 1, 2)
    g = np.asarray(g).transpose(0, 1, 4, 2, 3)

    assert np.abs(bb - ref_bb).max() < 2e-4
    assert np.abs(np.asarray(u) - ref_u).max() < 2e-4
    assert np.abs(g - ref_g).max() < 2e-4


def test_old_early_exit_checkpoint_converts(tmp_path):
    """Legacy OldEarlyExitUViT checkpoints (reference models/early_exit.py:83-190)
    load through the converter onto the stacked layout."""
    import torch
    from models.early_exit import OldEarlyExitUViT as RefOld
    from models.uvit import UViT as RefUViT

    kwargs = {**CFG, "mlp_time_embed": False}
    torch.manual_seed(0)
    ref = RefOld(RefUViT(**kwargs), classifier_type="mlp_probe")
    path = tmp_path / "old_ee.pth"
    torch.save(ref.state_dict(), path)

    cfg = UViTConfig(**kwargs, classifier_type="mlp_probe_per_layer")
    model, params0 = init_early_exit_uvit(cfg, jax.random.PRNGKey(0))
    params = convert_torch_checkpoint(path, params0)
    # probe stack order: in..., mid, out... -> row 0 must equal the torch
    # in_blocks_classifiers.0 weights
    w0 = ref.in_blocks_classifiers[0].classifier[0].weight.detach().numpy().T
    np.testing.assert_allclose(
        np.asarray(params["probes"]["classifier"]["kernel"][0]), w0, rtol=1e-6
    )
    # bug-for-bug: the reference's legacy forward runs the LAST in-block
    # classifier at the mid position (loop-variable leak, reference
    # models/early_exit.py:171) — the converter maps those live params, not
    # the dead mid_block_classifier ones
    n_in = kwargs["depth"] // 2
    wm = ref.in_blocks_classifiers[n_in - 1].classifier[0].weight
    np.testing.assert_allclose(
        np.asarray(params["probes"]["classifier"]["kernel"][n_in]),
        wm.detach().numpy().T, rtol=1e-6,
    )


def test_old_early_exit_forward_parity(tmp_path):
    """Full forward parity against the reference's OldEarlyExitUViT
    EXECUTION (including its mid-probe loop-variable bug, reference
    models/early_exit.py:171): converted legacy checkpoints must produce
    identical backbone, probe, and per-layer head outputs.

    One reference defect must be patched to run it at all: the legacy
    forward calls ``output_head(x)`` (models/early_exit.py:165,169,176)
    but OutputHead.forward requires ``extras`` — a TypeError as written.
    We bind extras=1 (the evidently-intended time-token drop) and keep
    every other quirk, notably the mid position running the LAST in-block
    classifier instead of mid_block_classifier. The legacy forward also
    ignores normalize_timesteps (it re-implements the trunk without the
    t/1000 branch of models/uvit.py:352-353), so the comparison runs with
    normalize_timesteps=False; converted old checkpoints should set the
    flag to whatever their training config used."""
    import torch
    from models.early_exit import OldEarlyExitUViT as RefOld
    from models.early_exit import OutputHead as RefOutputHead
    from models.uvit import UViT as RefUViT

    kwargs = {**CFG, "mlp_time_embed": False, "normalize_timesteps": False}
    torch.manual_seed(0)
    ref = RefOld(RefUViT(**kwargs), classifier_type="mlp_probe")
    ref.eval()
    for m in ref.modules():
        if isinstance(m, RefOutputHead):
            m.forward = (
                lambda x, _m=m: RefOutputHead.forward(_m, x, extras=1)
            )
    path = tmp_path / "old_ee_fwd.pth"
    torch.save(ref.state_dict(), path)

    cfg = UViTConfig(**kwargs, classifier_type="mlp_probe_per_layer")
    model, params0 = init_early_exit_uvit(cfg, jax.random.PRNGKey(0))
    params = convert_torch_checkpoint(path, params0)

    rng = np.random.RandomState(3)
    x = rng.randn(2, kwargs["in_chans"], kwargs["img_size"],
                  kwargs["img_size"]).astype(np.float32)
    t = np.array([13.0, 777.0], np.float32)
    with torch.no_grad():
        ref_bb, ref_u, ref_g = ref(torch.from_numpy(x), torch.from_numpy(t))

    bb, u, g = model.apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(t),
    )
    np.testing.assert_allclose(
        np.asarray(bb).transpose(0, 3, 1, 2), ref_bb.numpy(),
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(u), torch.stack(ref_u).numpy(), rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(g).transpose(0, 1, 4, 2, 3), torch.stack(ref_g).numpy(),
        rtol=1e-4, atol=1e-4,
    )


def _load_ref_sampler_module():
    """Load /root/reference/sampler.py under a non-clashing name (our repo
    root has its own sampler.py). Its module-level schedule tensors
    (reference sampler.py:40-44) and the three postprocessing closures
    (sampler.py:47-79) are the objects under test."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_sampler", REFERENCE / "sampler.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize(
    "parametrization",
    ["predict_noise", "predict_original", "predict_previous"],
)
def test_ddpm_trajectory_parity_vs_reference(tmp_path, parametrization):
    """END-TO-END sampling parity: run the reference's own DDPM reverse
    loop (its postprocessing fns + its schedule, torch CPU) and our
    schedule.step chain on the SAME converted weights and the SAME
    per-step gaussian draws, and compare the full trajectory. This is the
    strongest FID-parity proxy available without trained weights — it
    covers the model forward, the converter, AND the reverse-process math
    jointly over hundreds of composed steps (reference sampler.py:129-139).

    Noise injection: the reference draws z inside the postprocessing via
    torch.randn_like (sampler.py:52); seeding torch identically before
    each side's step makes both draws bit-equal.
    """
    import torch

    ref_sampler = _load_ref_sampler_module()
    post_fn = getattr(ref_sampler, f"{parametrization}_postprocessing")

    ref, path, kwargs = _save_ref_uvit(tmp_path)
    cfg = UViTConfig(**kwargs)
    model, params0 = init_uvit(cfg, jax.random.PRNGKey(0))
    params = convert_torch_checkpoint(path, params0)

    from duodiff_tpu.diffusion import NoiseSchedule

    schedule = NoiseSchedule.create(steps=1000)

    @jax.jit
    def our_step(x, t, z):
        out = model.apply(
            {"params": params}, x, jnp.full((x.shape[0],), t, jnp.float32)
        )
        return schedule.step(
            parametrization, out, x, jnp.asarray(t), z,
            variance_mode="beta_tilde",
        )

    rng = np.random.RandomState(0)
    x0 = rng.randn(2, 3, 16, 16).astype(np.float32)
    x_ref = torch.from_numpy(x0)
    x_ours = jnp.asarray(x0.transpose(0, 2, 3, 1))

    # a contiguous high-t slice plus the final steps (t=0 zeroes z on both
    # sides); stepwise parity composes, so the slice stands in for the full
    # 1000-step run at a fraction of the CPU cost
    ts = list(range(999, 899, -1)) + [1, 0]
    max_err = 0.0
    for t in ts:
        with torch.no_grad():
            eps = ref(x_ref, torch.full((2,), float(t)))
            torch.manual_seed(t)
            x_ref = post_fn(eps, x_ref, t)
        torch.manual_seed(t)
        z = (
            torch.randn(x_ref.shape).numpy()
            if t > 0
            else np.zeros(x_ref.shape, np.float32)
        )
        x_ours = our_step(
            x_ours, t, jnp.asarray(z.transpose(0, 2, 3, 1))
        )
        step_err = float(
            np.abs(
                np.asarray(x_ours).transpose(0, 3, 1, 2) - x_ref.numpy()
            ).max()
        )
        max_err = max(max_err, step_err)

    assert max_err < 5e-4, f"trajectory max abs err {max_err}"


def _replay_reference_noise(seed, shape, steps=1000):
    """Regenerate the reference samplers' gaussian stream: after
    seed_everything(seed) they draw x0 = randn(shape), then one
    randn_like(x) per step t = 999..1 from the same global torch generator
    (z short-circuits to 0 at t = 0). Returns (x0, table) with table[t]
    = z_t (row 0 zeros), NCHW numpy."""
    import torch

    sys.path.insert(0, str(REFERENCE))
    from utils.train_utils import seed_everything

    seed_everything(seed)
    x0 = torch.randn(*shape).numpy()
    table = np.zeros((steps,) + tuple(shape), np.float32)
    for t in range(steps - 1, 0, -1):
        table[t] = torch.randn(*shape).numpy()
    return x0, table


def _nchw_to_nhwc_table(table):
    """(steps, B, C, H, W) noise table -> (steps, B, H, W, C)."""
    return jnp.asarray(table.transpose(0, 1, 3, 4, 2))


def test_duodiff_full_sampler_parity_vs_reference(tmp_path):
    """PRODUCTION-PATH end-to-end parity: the reference's own
    sampler.get_samples DDPM loop WITH the DuoDiff t_switch handoff
    (sampler.py:129-139) vs our duodiff_sample two-segment scan, same
    converted weights for both backbones and the reference's exact noise
    stream injected via noise_table. Covers the full 1000 composed steps
    including the handoff boundary semantics."""
    import torch

    ref_sampler = _load_ref_sampler_module()

    ref_early, path_early, kwargs = _save_ref_uvit(tmp_path)
    torch.manual_seed(7)
    from models.uvit import UViT as RefUViT

    shallow_kwargs = {**kwargs, "depth": 3}
    ref_shallow = RefUViT(**shallow_kwargs)
    ref_shallow.eval()
    path_shallow = tmp_path / "ref_shallow.pth"
    torch.save(ref_shallow.state_dict(), path_shallow)

    # reference run: DuoDiff = shallow model first, full model after
    # t_switch steps
    t_switch = 300
    ref_samples, _ = ref_sampler.get_samples(
        model=ref_shallow,
        batch_size=2,
        postprocessing=ref_sampler.predict_noise_postprocessing,
        seed=0,
        num_channels=3,
        sample_height=16,
        sample_width=16,
        use_ddim=False,
        ddim_steps=0,
        ddim_eta=0.0,
        timesteps_save=[],
        late_model=ref_early,
        t_switch=t_switch,
    )

    # ours: same weights (converted), same noise stream
    from duodiff_tpu.diffusion import NoiseSchedule
    from duodiff_tpu.diffusion.sampling import duodiff_sample

    cfg_full = UViTConfig(**kwargs)
    cfg_shallow = UViTConfig(**shallow_kwargs)
    model_f, p0 = init_uvit(cfg_full, jax.random.PRNGKey(0))
    params_f = convert_torch_checkpoint(path_early, p0)
    model_s, p0s = init_uvit(cfg_shallow, jax.random.PRNGKey(1))
    params_s = convert_torch_checkpoint(path_shallow, p0s)

    x0, table = _replay_reference_noise(0, (2, 3, 16, 16))
    schedule = NoiseSchedule.create(steps=1000)
    x = duodiff_sample(
        lambda x, t, y: model_s.apply({"params": params_s}, x, t),
        lambda x, t, y: model_f.apply({"params": params_f}, x, t),
        jax.random.PRNGKey(0),
        schedule=schedule,
        shape=(2, 16, 16, 3),
        t_switch=t_switch,
        parametrization="predict_noise",
        x_init=jnp.asarray(x0.transpose(0, 2, 3, 1)),
        noise_table=_nchw_to_nhwc_table(table),
    )
    ours = (np.asarray(x) + 1.0) / 2.0  # reference returns (x+1)/2 BHWC
    err = np.abs(ours - ref_samples).max()
    assert err < 5e-3, f"terminal sample max abs err {err}"


def test_ddim_sampler_parity_vs_reference(tmp_path):
    """Reference DDIM loop (sampler.py:103-126) vs our ddim_sample on the
    same weights and x0 at eta=0 (noise-free: the z term vanishes, so no
    stream injection is needed and the documented eta-noise deviation is
    moot)."""
    ref_sampler = _load_ref_sampler_module()
    ref, path, kwargs = _save_ref_uvit(tmp_path)

    ref_samples, _ = ref_sampler.get_samples(
        model=ref,
        batch_size=2,
        postprocessing=ref_sampler.predict_noise_postprocessing,
        seed=3,
        num_channels=3,
        sample_height=16,
        sample_width=16,
        use_ddim=True,
        ddim_steps=25,
        ddim_eta=0.0,
        timesteps_save=[],
    )

    import torch

    sys.path.insert(0, str(REFERENCE))
    from utils.train_utils import seed_everything

    seed_everything(3)
    x0 = torch.randn(2, 3, 16, 16).numpy()

    from duodiff_tpu.diffusion import NoiseSchedule
    from duodiff_tpu.diffusion.sampling import ddim_sample

    cfg = UViTConfig(**kwargs)
    model, p0 = init_uvit(cfg, jax.random.PRNGKey(0))
    params = convert_torch_checkpoint(path, p0)
    schedule = NoiseSchedule.create(steps=1000)
    x, _ = ddim_sample(
        lambda x, t, y: model.apply({"params": params}, x, t),
        jax.random.PRNGKey(0),
        schedule=schedule,
        shape=(2, 16, 16, 3),
        ddim_steps=25,
        eta=0.0,
        x_init=jnp.asarray(x0.transpose(0, 2, 3, 1)),
    )
    ours = (np.asarray(x) + 1.0) / 2.0
    err = np.abs(ours - ref_samples).max()
    assert err < 5e-3, f"terminal sample max abs err {err}"


def test_eesampler_full_parity_vs_reference(tmp_path):
    """Reference eesampler.get_samples (threshold argmax selection + DDPM
    update, eesampler.py:40-89) vs our ChunkedEarlyExitSampler with the
    same converted weights and injected noise stream: terminal samples,
    per-timestep probe means AND per-sample exit indices must all agree."""
    import importlib.util

    import torch
    from models.early_exit import EarlyExitUViT as RefEE
    from models.uvit import UViT as RefUViT

    spec = importlib.util.spec_from_file_location(
        "ref_eesampler", REFERENCE / "eesampler.py"
    )
    ref_ee_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_ee_mod)

    kwargs = {**CFG, "mlp_time_embed": False}
    torch.manual_seed(0)
    ref = RefEE(RefUViT(**kwargs), classifier_type="mlp_probe_per_layer")
    ref.eval()
    path = tmp_path / "ref_ee.pth"
    torch.save(ref.state_dict(), path)

    threshold = 0.5  # random-init probes sit near sigmoid(0)=0.5: both
    # branches of the exit rule get exercised across steps
    ref_samples, ref_err, ref_idx = ref_ee_mod.get_samples(
        model=ref,
        batch_size=2,
        seed=11,
        num_channels=3,
        sample_height=16,
        sample_width=16,
        threshold=threshold,
        depth=kwargs["depth"],
    )

    from duodiff_tpu.diffusion import NoiseSchedule
    from duodiff_tpu.diffusion.sampling import ChunkedEarlyExitSampler

    cfg = UViTConfig(**kwargs, classifier_type="mlp_probe_per_layer")
    model, p0 = init_early_exit_uvit(cfg, jax.random.PRNGKey(0))
    params = convert_torch_checkpoint(path, p0)

    x0, table = _replay_reference_noise(11, (2, 3, 16, 16))
    schedule = NoiseSchedule.create(steps=1000)
    sampler = ChunkedEarlyExitSampler(
        lambda x, t, y: model.apply({"params": params}, x, t),
        schedule,
        threshold=threshold,
        chunk=250,
    )
    x, err_by_t, idx_by_t = sampler.sample(
        jax.random.PRNGKey(0),
        (2, 16, 16, 3),
        x_init=jnp.asarray(x0.transpose(0, 2, 3, 1)),
        noise_table=_nchw_to_nhwc_table(table),
    )
    ours = (np.asarray(x) + 1.0) / 2.0
    err = np.abs(ours - ref_samples).max()
    assert err < 5e-3, f"terminal sample max abs err {err}"
    np.testing.assert_array_equal(idx_by_t, np.asarray(ref_idx, np.int64))
    assert np.abs(err_by_t - ref_err.numpy()).max() < 2e-3


def test_autoencoder_feature_parity(tmp_path):
    """FrozenAutoencoderKL parity vs the reference implementation
    (reference models/utils/autoencoder.py:452-490): encode_moments and
    decode agree to fp32 tolerance on a synthesized tiny checkpoint —
    feature-level validation of the Flax pyramid + quant convs +
    scale-factor handling."""
    import torch
    from models.utils.autoencoder import FrozenAutoencoderKL as RefAE

    ddconfig = dict(
        double_z=True, z_channels=4, resolution=32, in_channels=3, out_ch=3,
        ch=32, ch_mult=[1, 2], num_res_blocks=1, attn_resolutions=[],
        dropout=0.0,
    )
    from models.utils.autoencoder import Decoder as RefDecoder
    from models.utils.autoencoder import Encoder as RefEncoder

    torch.manual_seed(0)
    sd = {}
    sd.update({f"encoder.{k}": v
               for k, v in RefEncoder(**ddconfig).state_dict().items()})
    sd.update({f"decoder.{k}": v
               for k, v in RefDecoder(**ddconfig).state_dict().items()})
    sd.update({f"quant_conv.{k}": v
               for k, v in torch.nn.Conv2d(8, 8, 1).state_dict().items()})
    sd.update({f"post_quant_conv.{k}": v
               for k, v in torch.nn.Conv2d(4, 4, 1).state_dict().items()})
    path = tmp_path / "ae_tiny.pth"
    torch.save(sd, path)

    ref = RefAE(ddconfig, embed_dim=4, pretrained_path=str(path))

    from duodiff_tpu.config import AutoencoderConfig
    from duodiff_tpu.models.autoencoder import load_autoencoder

    cfg = AutoencoderConfig(
        autoencoder_checkpoint_path=str(path), ch=32, ch_mult=[1, 2],
        num_res_blocks=1, z_channels=4, embed_dim=4, resolution=32,
    )
    # fp32 compute for the tolerance check (the production default is bf16,
    # whose ~1e-2 rounding would drown the parity signal)
    model, params = load_autoencoder(str(path), config=cfg, dtype=jnp.float32)

    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 32, 32).astype(np.float32)
    z = (rng.randn(2, 4, 16, 16).astype(np.float32) * 0.18215)

    with torch.no_grad():
        ref_moments = ref.encode_moments(torch.from_numpy(x)).numpy()
        ref_dec = ref.decode(torch.from_numpy(z)).numpy()

    moments = model.apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)),
        method=model.encode_moments,
    )
    dec = model.apply(
        {"params": params}, jnp.asarray(z.transpose(0, 2, 3, 1)),
        method=model.decode,
    )
    moments = np.asarray(moments).transpose(0, 3, 1, 2)
    dec = np.asarray(dec).transpose(0, 3, 1, 2)

    assert np.abs(moments - ref_moments).max() < 2e-4
    assert np.abs(dec - ref_dec).max() < 2e-4
