"""Training-stack tests: losses (golden formulas), LR schedule, train step
on an 8-device data-parallel mesh (coverage the single-device reference
cannot have, SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np

from duodiff_tpu.config import UViTConfig
from duodiff_tpu.diffusion import NoiseSchedule
from duodiff_tpu.models.early_exit import init_early_exit_uvit
from duodiff_tpu.models.uvit import init_uvit
from duodiff_tpu.parallel import batch_sharding, create_mesh, shard_params
from duodiff_tpu.training import (
    cosine_schedule_with_warmup,
    create_train_state,
)
from duodiff_tpu.training.losses import deediff_loss, total_deediff_loss, uvit_loss
from duodiff_tpu.training.train_state import make_optimizer, make_train_step

TINY = UViTConfig(
    img_size=8, patch_size=2, in_chans=3, embed_dim=32, depth=3, num_heads=4,
    mlp_ratio=4, num_classes=-1, normalize_timesteps=True,
)


def test_cosine_schedule_with_warmup():
    sched = cosine_schedule_with_warmup(2e-4, 100, 1000)
    assert float(sched(0)) == 0.0
    np.testing.assert_allclose(float(sched(50)), 1e-4, rtol=1e-6)
    np.testing.assert_allclose(float(sched(100)), 2e-4, rtol=1e-6)
    # midpoint of cosine: progress=0.5 -> 0.5 * base
    np.testing.assert_allclose(float(sched(550)), 1e-4, rtol=1e-5)
    np.testing.assert_allclose(float(sched(1000)), 0.0, atol=1e-12)
    # monotone decay after warmup
    vals = [float(sched(s)) for s in range(100, 1001, 100)]
    assert all(a >= b for a, b in zip(vals, vals[1:]))


def test_uvit_loss_parametrizations():
    sched = NoiseSchedule.create()
    rng = np.random.RandomState(0)
    clean = jnp.asarray(rng.randn(2, 4, 4, 3), jnp.float32)
    noisy = jnp.asarray(rng.randn(2, 4, 4, 3), jnp.float32)
    noise = jnp.asarray(rng.randn(2, 4, 4, 3), jnp.float32)
    pred = jnp.asarray(rng.randn(2, 4, 4, 3), jnp.float32)
    ts = jnp.array([5, 700])

    l_noise = uvit_loss(pred, parametrization="predict_noise", noise=noise,
                        clean=clean, noisy=noisy, timesteps=ts, schedule=sched)
    np.testing.assert_allclose(
        float(l_noise), float(jnp.mean((pred - noise) ** 2)), rtol=1e-6
    )
    l_orig = uvit_loss(pred, parametrization="predict_original", noise=noise,
                       clean=clean, noisy=noisy, timesteps=ts, schedule=sched)
    np.testing.assert_allclose(
        float(l_orig), float(jnp.mean((pred - clean) ** 2)), rtol=1e-6
    )
    target = sched.predict_previous_target(clean, noisy, ts)
    l_prev = uvit_loss(pred, parametrization="predict_previous", noise=noise,
                       clean=clean, noisy=noisy, timesteps=ts, schedule=sched)
    np.testing.assert_allclose(
        float(l_prev), float(jnp.mean((pred - target) ** 2)), rtol=1e-6
    )


def test_deediff_loss_golden():
    """4-term DeeDiff loss against a straight numpy transcription of
    reference trainer.py:358-405."""
    rng = np.random.RandomState(1)
    L, B, H, W, C = 3, 2, 4, 4, 3
    backbone = rng.randn(B, H, W, C).astype(np.float32)
    u = rng.rand(L, B).astype(np.float32)
    g = rng.randn(L, B, H, W, C).astype(np.float32)
    noise = rng.randn(B, H, W, C).astype(np.float32)

    # numpy golden
    l_simple = np.mean((backbone - noise) ** 2)
    u_hat = np.tanh(np.abs(g - noise[None])).mean(axis=(-1, -2, -3))
    l_u_t = np.sum((u - u_hat) ** 2)
    l_n_t = ((g - noise[None]) ** 2).mean(axis=(-1, -2, -3))
    l_ual = ((1 - u_hat) * l_n_t).mean(axis=1).sum()
    unweighted = l_n_t.mean(axis=1).sum()

    parts = deediff_loss(
        jnp.asarray(backbone), jnp.asarray(u), jnp.asarray(g),
        parametrization="predict_noise", noise=jnp.asarray(noise),
        clean=jnp.zeros_like(jnp.asarray(noise)),
    )
    np.testing.assert_allclose(float(parts[0]), l_simple, rtol=1e-5)
    np.testing.assert_allclose(float(parts[1]), l_u_t, rtol=1e-5)
    np.testing.assert_allclose(float(parts[2]), l_ual, rtol=1e-5)
    np.testing.assert_allclose(float(parts[3]), unweighted, rtol=1e-5)
    total = total_deediff_loss(parts, use_unweighted_loss=True)
    np.testing.assert_allclose(
        float(total), l_simple + l_u_t + l_ual + unweighted, rtol=1e-5
    )


def _toy_batch(rng, b=8):
    return {
        "image": jnp.asarray(rng.randn(b, 8, 8, 3), jnp.float32),
        "label": jnp.zeros((b,), jnp.int32),
    }


def test_train_step_reduces_loss():
    model, params = init_uvit(TINY, jax.random.PRNGKey(0))
    sched = NoiseSchedule.create(steps=100)
    tx = make_optimizer(lr=1e-3, weight_decay=0.0, beta1=0.9, beta2=0.999,
                        max_grad_norm=1.0, num_warmup_steps=0,
                        num_training_steps=1000)
    state = create_train_state(params, tx)
    step = jax.jit(make_train_step(
        lambda p, x, t, y: model.apply({"params": p}, x, t, y),
        sched, model_kind="uvit", parametrization="predict_noise",
    ))
    rng = np.random.RandomState(0)
    batch = _toy_batch(rng)
    losses = []
    for i in range(30):
        state, metrics = step(state, batch, jax.random.PRNGKey(42))  # fixed key
        losses.append(float(metrics["train_loss"]))
    assert losses[-1] < losses[0] * 0.9, losses[:3] + losses[-3:]
    assert int(state.step) == 30


def test_train_step_ema_tracks_params():
    """Opt-in EMA: ema = decay*ema + (1-decay)*params after each step, and
    stays a distinct pytree from the live params."""
    model, params = init_uvit(TINY, jax.random.PRNGKey(0))
    sched = NoiseSchedule.create(steps=100)
    tx = make_optimizer(lr=1e-3, weight_decay=0.0, beta1=0.9, beta2=0.999,
                        max_grad_norm=1.0, num_warmup_steps=0,
                        num_training_steps=1000)
    decay = 0.5
    state = create_train_state(params, tx, ema_decay=decay)
    assert state.ema_params is not None
    step = jax.jit(make_train_step(
        lambda p, x, t, y: model.apply({"params": p}, x, t, y),
        sched, model_kind="uvit", parametrization="predict_noise",
    ))
    batch = _toy_batch(np.random.RandomState(0))

    expected_ema = jax.tree_util.tree_map(jnp.copy, params)
    for i in range(3):
        prev = state
        state, _ = step(state, batch, jax.random.PRNGKey(i))
        expected_ema = jax.tree_util.tree_map(
            lambda e, p: decay * e + (1 - decay) * p, expected_ema, state.params
        )
    for got, want in zip(
        jax.tree_util.tree_leaves(state.ema_params),
        jax.tree_util.tree_leaves(expected_ema),
    ):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)
    # EMA lags the live params
    diffs = [
        float(jnp.max(jnp.abs(a - b)))
        for a, b in zip(
            jax.tree_util.tree_leaves(state.ema_params),
            jax.tree_util.tree_leaves(state.params),
        )
    ]
    assert max(diffs) > 0

    # disabled by default
    state0 = create_train_state(params, tx)
    assert state0.ema_params is None


def test_train_step_deediff_runs_and_freezing_works():
    import optax

    cfg = UViTConfig(
        img_size=8, patch_size=2, in_chans=3, embed_dim=32, depth=3, num_heads=4,
        num_classes=-1, normalize_timesteps=True,
        classifier_type="mlp_probe_per_layer",
    )
    model, params = init_early_exit_uvit(cfg, jax.random.PRNGKey(0))
    sched = NoiseSchedule.create(steps=100)
    inner = make_optimizer(lr=1e-3, weight_decay=0.0, beta1=0.9, beta2=0.999,
                           max_grad_norm=1.0, num_warmup_steps=0,
                           num_training_steps=100)

    def label_fn(p):
        return {
            k: jax.tree_util.tree_map(
                lambda _: "frozen" if k == "uvit" else "trainable", v
            )
            for k, v in p.items()
        }

    tx = optax.multi_transform(
        {"trainable": inner, "frozen": optax.set_to_zero()}, label_fn
    )
    state = create_train_state(params, tx)
    step = jax.jit(make_train_step(
        lambda p, x, t, y: model.apply({"params": p}, x, t, y),
        sched, model_kind="deediff_uvit", parametrization="predict_noise",
    ))
    rng = np.random.RandomState(0)
    before_backbone = jax.tree_util.tree_leaves(state.params["uvit"])[0].copy()
    before_probe = state.params["probes"]["classifier"]["kernel"].copy()
    state, metrics = step(state, _toy_batch(rng), jax.random.PRNGKey(0))
    for k in ["train_loss", "regular_train_loss", "classifier_train_loss",
              "weighted_train_loss", "unweighted_loss"]:
        assert np.isfinite(float(metrics[k])), k
    after_backbone = jax.tree_util.tree_leaves(state.params["uvit"])[0]
    np.testing.assert_array_equal(np.asarray(before_backbone), np.asarray(after_backbone))
    assert not np.allclose(np.asarray(before_probe),
                           np.asarray(state.params["probes"]["classifier"]["kernel"]))


def test_train_step_sharded_over_mesh():
    """Data-parallel train step over the virtual 8-device mesh."""
    assert jax.device_count() == 8
    mesh = create_mesh()
    model, params = init_uvit(TINY, jax.random.PRNGKey(0))
    params = jax.device_put(params, shard_params(params, mesh))
    sched = NoiseSchedule.create(steps=100)
    tx = make_optimizer(lr=1e-4, weight_decay=0.0, beta1=0.9, beta2=0.999,
                        max_grad_norm=1.0, num_warmup_steps=0,
                        num_training_steps=100)
    state = create_train_state(params, tx)
    step = jax.jit(make_train_step(
        lambda p, x, t, y: model.apply({"params": p}, x, t, y),
        sched, model_kind="uvit", parametrization="predict_noise",
    ), donate_argnums=(0,))
    rng = np.random.RandomState(0)
    batch = {
        "image": jax.device_put(
            rng.randn(16, 8, 8, 3).astype(np.float32), batch_sharding(mesh)
        ),
        "label": jax.device_put(
            np.zeros((16,), np.int32), batch_sharding(mesh, ndim=1)
        ),
    }
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["train_loss"]))
    # params stay replicated/sharded per the rules; step counter advanced
    assert int(state.step) == 1


def test_tp_mesh_train_step():
    """2x4 data x model mesh: tensor-parallel kernels shard over 'model'."""
    mesh = create_mesh(shape=(4, 2))
    model, params = init_uvit(TINY, jax.random.PRNGKey(0))
    shardings = shard_params(params, mesh)
    # qkv kernel should actually shard over the model axis
    qkv_spec = shardings["in_blocks_0"]["attn"]["qkv"]["kernel"].spec
    assert qkv_spec == jax.sharding.PartitionSpec(None, "model")
    params = jax.device_put(params, shardings)
    sched = NoiseSchedule.create(steps=100)
    tx = make_optimizer(lr=1e-4, weight_decay=0.0, beta1=0.9, beta2=0.999,
                        max_grad_norm=1.0, num_warmup_steps=0,
                        num_training_steps=100)
    state = create_train_state(params, tx)
    step = jax.jit(make_train_step(
        lambda p, x, t, y: model.apply({"params": p}, x, t, y),
        sched, model_kind="uvit", parametrization="predict_noise",
    ))
    rng = np.random.RandomState(0)
    batch = {
        "image": jax.device_put(
            rng.randn(8, 8, 8, 3).astype(np.float32), batch_sharding(mesh)
        ),
        "label": jax.device_put(np.zeros((8,), np.int32), batch_sharding(mesh, 1)),
    }
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["train_loss"]))


def test_train_step_distillation():
    """Distillation: alpha=1 trains the student purely against
    stop_grad(teacher); distill_loss must fall, and t_min restricts the
    sampled timesteps (checked via a teacher that poisons t < t_min)."""
    student_model, student_params = init_uvit(TINY, jax.random.PRNGKey(0))
    teacher_model, teacher_params = init_uvit(TINY, jax.random.PRNGKey(9))
    sched = NoiseSchedule.create(steps=100)
    tx = make_optimizer(lr=3e-3, weight_decay=0.0, beta1=0.9, beta2=0.999,
                        max_grad_norm=1.0, num_warmup_steps=0,
                        num_training_steps=1000)

    t_min = 50

    def teacher_apply(p, x, t, y):
        out = teacher_model.apply({"params": p}, x, t, y)
        # poison the region distillation must never sample
        bad = jnp.full_like(out, jnp.nan)
        mask = (t >= t_min)[:, None, None, None]
        return jnp.where(mask, out, bad)

    step = jax.jit(make_train_step(
        lambda p, x, t, y: student_model.apply({"params": p}, x, t, y),
        sched, model_kind="uvit", parametrization="predict_noise",
        teacher_apply=teacher_apply, distill_alpha=1.0, t_min=t_min,
    ))
    state = create_train_state(student_params, tx)
    batch = _toy_batch(np.random.RandomState(0))
    losses = []
    for i in range(25):
        state, metrics = step(state, batch, jax.random.PRNGKey(5), teacher_params)
        losses.append(float(metrics["distill_loss"]))
    assert np.isfinite(losses).all(), "sampled t < t_min (poison reached loss)"
    assert losses[-1] < losses[0] * 0.7, (losses[0], losses[-1])
    assert "task_loss" in metrics


def test_train_step_label_dropout():
    """label_dropout=1.0 must equal training on explicit all-null labels
    (same key), and 0.0 must equal the plain conditional step."""
    import jax
    import jax.numpy as jnp

    from duodiff_tpu.config import UViTConfig
    from duodiff_tpu.diffusion import NoiseSchedule
    from duodiff_tpu.models.uvit import init_uvit
    from duodiff_tpu.training.train_state import make_train_step

    # label dropout is loss-level semantics, so evaluate the exposed
    # .loss_fn EAGERLY (no jit): a full train-step compile here cost ~35s
    # for zero extra coverage — the grad/optimizer plumbing is exercised
    # by the CLI train tests
    cfg = UViTConfig(
        img_size=8, patch_size=4, in_chans=3, embed_dim=16, depth=1,
        num_heads=1, mlp_ratio=1, num_classes=5, normalize_timesteps=True,
    )
    model, params = init_uvit(cfg, jax.random.PRNGKey(0))
    sched = NoiseSchedule.create(steps=20)

    def make(label_dropout):
        return make_train_step(
            lambda p, x, t, y: model.apply({"params": p}, x, t, y),
            sched, model_kind="uvit", parametrization="predict_noise",
            has_labels=True, label_dropout=label_dropout, null_label=4,
        ).loss_fn

    loss_drop, loss_keep = make(1.0), make(0.0)

    def loss(loss_fn, labels):
        batch = {
            "image": jnp.ones((4, 8, 8, 3)) * 0.1,
            "label": labels,
        }
        value, _ = loss_fn(params, batch, jax.random.PRNGKey(3))
        return float(value)

    y = jnp.array([0, 1, 2, 3])
    nulls = jnp.full((4,), 4)
    assert loss(loss_drop, y) == loss(loss_keep, nulls)
    assert loss(loss_keep, y) != loss(loss_keep, nulls)


def _opt_kwargs(**over):
    kw = dict(lr=1e-2, weight_decay=0.0, beta1=0.9, beta2=0.999,
              max_grad_norm=10.0, num_warmup_steps=0,
              num_training_steps=1000)
    kw.update(over)
    return kw


def test_grad_accum_matches_mean_gradient():
    """optax.MultiSteps wiring: k micro-grads produce ONE update equal to
    the update a plain optimizer takes on their mean."""
    params = {"w": jnp.asarray([1.0, -2.0, 3.0])}
    g1 = {"w": jnp.asarray([0.5, 0.1, -0.3])}
    g2 = {"w": jnp.asarray([-0.1, 0.3, 0.7])}
    gmean = jax.tree_util.tree_map(lambda a, b: (a + b) / 2, g1, g2)

    acc = make_optimizer(**_opt_kwargs(grad_accum=2))
    s = acc.init(params)
    u1, s = acc.update(g1, s, params)
    p_mid = optax_apply(params, u1)
    # first micro-step: accumulate only, zero update
    np.testing.assert_array_equal(np.asarray(p_mid["w"]),
                                  np.asarray(params["w"]))
    u2, s = acc.update(g2, s, params)
    p_acc = optax_apply(params, u2)

    ref = make_optimizer(**_opt_kwargs())
    rs = ref.init(params)
    ur, rs = ref.update(gmean, rs, params)
    p_ref = optax_apply(params, ur)
    np.testing.assert_allclose(np.asarray(p_acc["w"]),
                               np.asarray(p_ref["w"]), rtol=1e-6)


def test_skip_nonfinite_guards_updates():
    """apply_if_finite: a NaN gradient leaves params and Adam moments
    untouched; the next finite gradient applies normally."""
    params = {"w": jnp.asarray([1.0, 2.0])}
    bad = {"w": jnp.asarray([jnp.nan, 1.0])}
    good = {"w": jnp.asarray([0.2, -0.1])}

    tx = make_optimizer(**_opt_kwargs(skip_nonfinite=3))
    s = tx.init(params)
    u, s = tx.update(bad, s, params)
    p1 = optax_apply(params, u)
    np.testing.assert_array_equal(np.asarray(p1["w"]),
                                  np.asarray(params["w"]))

    u, s = tx.update(good, s, params)
    p2 = optax_apply(p1, u)
    assert not np.allclose(np.asarray(p2["w"]), np.asarray(p1["w"]))
    assert np.isfinite(np.asarray(p2["w"])).all()

    # matches the unguarded optimizer applying only the finite grad
    ref = make_optimizer(**_opt_kwargs())
    rs = ref.init(params)
    ur, rs = ref.update(good, rs, params)
    p_ref = optax_apply(params, ur)
    np.testing.assert_allclose(np.asarray(p2["w"]),
                               np.asarray(p_ref["w"]), rtol=1e-6)


def optax_apply(params, updates):
    import optax

    return optax.apply_updates(params, updates)
