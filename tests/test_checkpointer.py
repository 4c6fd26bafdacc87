"""Checkpoint/resume tests: full-state round-trip, rolling vs archived saves,
corruption-tolerant discovery (reference checkpointer.py semantics on Orbax)."""

import shutil

import jax
import jax.numpy as jnp
import numpy as np

from duodiff_tpu.config import UViTConfig
from duodiff_tpu.data.sampler import ResumableSeedableSampler
from duodiff_tpu.models.uvit import init_uvit
from duodiff_tpu.training.checkpointer import Checkpointer
from duodiff_tpu.training.train_state import create_train_state, make_optimizer

TINY = UViTConfig(img_size=8, patch_size=2, in_chans=3, embed_dim=16, depth=3,
                  num_heads=2, num_classes=-1, normalize_timesteps=True)


def _make_state():
    _, params = init_uvit(TINY, jax.random.PRNGKey(0))
    tx = make_optimizer(lr=1e-3, weight_decay=0.01, beta1=0.9, beta2=0.999,
                        max_grad_norm=1.0, num_warmup_steps=10,
                        num_training_steps=100)
    return create_train_state(params, tx)


def test_save_restore_roundtrip(tmp_path):
    state = _make_state()
    sampler = ResumableSeedableSampler(50, seed=4)
    sampler.next_indices(13)

    ck = Checkpointer(tmp_path, "exp", dataset="cifar10", model="uvit")
    path = ck.save(
        step=13,
        params=state.params,
        opt_state=state.opt_state,
        sampler_state=sampler.get_state(),
        args={"lr": 1e-3, "model": "uvit"},
        new_checkpoint=False,
    )
    assert path.name == "cifar10_uvit_last"

    fresh = _make_state()
    template = {
        "step": np.asarray(0),
        "params": fresh.params,
        "opt_state": fresh.opt_state,
        "sampler_state": sampler.get_state(),
    }
    restored = ck.restore(path, template)
    assert int(restored["step"]) == 13
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(restored["params"])
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # sampler resume continues identically
    s2 = ResumableSeedableSampler(50, seed=99)
    s2.set_state(restored["sampler_state"])
    np.testing.assert_array_equal(sampler.next_indices(10), s2.next_indices(10))


def test_rolling_vs_archived_and_last_checkpoint(tmp_path):
    state = _make_state()
    ck = Checkpointer(tmp_path, "exp", dataset="cifar10", model="uvit")
    ck.save(step=1, params=state.params, new_checkpoint=False)
    ck.save(step=2, params=state.params, new_checkpoint=True)
    ck.save(step=5, params=state.params, new_checkpoint=True)
    ck.save(step=5, params=state.params, new_checkpoint=False)

    tracked = ck.tracked_checkpoints()
    assert [p.name for p in tracked] == ["cifar10_uvit_step-2", "cifar10_uvit_step-5"]
    last = ck.last_checkpoint()
    assert last.name == "cifar10_uvit_last"


def test_last_checkpoint_skips_corrupted(tmp_path):
    state = _make_state()
    ck = Checkpointer(tmp_path, "exp", dataset="cifar10", model="uvit")
    ck.save(step=2, params=state.params, new_checkpoint=True)
    p5 = ck.save(step=5, params=state.params, new_checkpoint=True)
    # corrupt the newest archived checkpoint
    shutil.rmtree(p5)
    p5.mkdir()
    (p5 / "garbage").write_text("not a checkpoint")
    last = ck.last_checkpoint()
    assert last is not None and last.name == "cifar10_uvit_step-2"


def test_params_only_restore(tmp_path):
    state = _make_state()
    ck = Checkpointer(tmp_path, "exp", dataset="celeba", model="uvit")
    path = ck.save(step=7, params=state.params, new_checkpoint=False)
    fresh = _make_state()
    params = ck.restore_params(path, fresh.params)
    for x, y in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_async_checkpointer_roundtrip(tmp_path):
    """AsyncCheckpointer mode: save returns immediately, wait commits (incl.
    the deferred run_args.json), and the restored state matches."""
    import json

    import jax.numpy as jnp

    from duodiff_tpu.training.checkpointer import Checkpointer

    ck = Checkpointer(tmp_path, "exp", dataset="d", model="m", use_async=True)
    params = {"w": jnp.arange(6.0).reshape(2, 3)}
    p1 = ck.save(step=1, params=params, args={"lr": 0.1})
    # a second rolling save to the SAME path must serialize behind the first
    p2 = ck.save(step=2, params={"w": params["w"] * 2}, args={"lr": 0.2})
    assert p1 == p2
    ck.wait_until_finished()
    assert (p2 / "run_args.json").exists()
    assert json.load(open(p2 / "run_args.json"))["lr"] == 0.2

    restored = ck.restore(p2, {"step": np.asarray(0), "params": params})
    assert int(restored["step"]) == 2
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["w"]), np.asarray(params["w"]) * 2
    )
    # discovery waits for in-flight saves
    ck.save(step=3, params=params, new_checkpoint=True)
    assert ck.last_checkpoint() is not None
