"""Continuous batching (mixed-timestep slot sampler) — equality vs the
sequential samplers, scheduling behavior, and the serving integration.

The central claim: every request's trajectory through the slot batcher is
identical to a dedicated bucket-1 run of the corresponding sequential
sampler with the same request key, regardless of when it was admitted or
what the other slots are doing.
"""

import base64
import io
import json
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from duodiff_tpu.diffusion import NoiseSchedule
from duodiff_tpu.diffusion.continuous import ContinuousDiffusionBatcher
from duodiff_tpu.diffusion.sampling import (
    ChunkedDDPMSampler,
    ddim_sample,
    dpm_solver_sample,
)

IMG = (8, 8, 3)


def stub_apply(params, x, t, y):
    """Batch-row-independent stub with real params and label sensitivity."""
    out = params["scale"] * x + 0.01 * t[:, None, None, None]
    if y is not None:
        out = out + 0.001 * y[:, None, None, None].astype(jnp.float32)
    return out


PARAMS = {"scale": jnp.float32(0.1)}


def seq_reference(method, key, *, sched, class_id=None, steps=6):
    """Dedicated bucket-1 sequential run — what serve.py's fixed-bucket
    path executes per image."""
    y = None if class_id is None else jnp.full((1,), class_id, jnp.int32)
    shape = (1,) + IMG
    if method == "ddpm":
        sampler = ChunkedDDPMSampler(
            stub_apply, sched, parametrization="predict_noise", params=PARAMS
        )
        return np.asarray(sampler.sample(key, shape, y=y))[0]
    apply_fn = lambda x, t, yy: stub_apply(PARAMS, x, t, yy)  # noqa: E731
    if method == "ddim":
        x, _ = ddim_sample(
            apply_fn, key, schedule=sched, shape=shape, ddim_steps=steps,
            eta=0.0, y=y,
        )
        return np.asarray(x)[0]
    assert method == "dpm"
    x = dpm_solver_sample(
        apply_fn, key, schedule=sched, shape=shape, dpm_steps=steps, y=y,
    )
    return np.asarray(x)[0]


@pytest.mark.parametrize("method", ["ddpm", "ddim", "dpm"])
def test_staggered_jobs_match_sequential(method):
    """5 jobs through 2 slots (forced staggered admission) == 5 dedicated
    sequential bucket-1 runs, bit-for-bit."""
    sched = NoiseSchedule.create(steps=12)
    batcher = ContinuousDiffusionBatcher(
        stub_apply, sched, img_shape=IMG, slots=2, params=PARAMS,
        method=method, ddim_steps=6, dpm_steps=6, steps_per_poll=3,
    )
    keys = [jax.random.PRNGKey(100 + j) for j in range(5)]
    got = batcher.run_jobs([(k, None) for k in keys])
    for j, k in enumerate(keys):
        want = seq_reference(method, k, sched=sched)
        np.testing.assert_array_equal(
            got[j], want, err_msg=f"{method} job {j} diverged"
        )


def test_admission_mid_flight_is_isolated():
    """A job admitted while another is mid-trajectory gets the identical
    result as when it runs alone — slots don't interact."""
    sched = NoiseSchedule.create(steps=12)

    def fresh():
        return ContinuousDiffusionBatcher(
            stub_apply, sched, img_shape=IMG, slots=3, params=PARAMS,
            method="ddpm", steps_per_poll=2,
        )

    k_a, k_b = jax.random.PRNGKey(1), jax.random.PRNGKey(2)

    b = fresh()
    b.admit(0, k_a)
    b.advance()  # slot 0 is now 2 steps in
    b.admit(1, k_b)  # staggered join
    for _ in range(8):
        b.advance()
    ii, active = b.poll()
    assert active[0] and active[1] and not active[2]
    assert ii[0] == 12 and ii[1] == 12
    got_a, got_b = b.finish(0), b.finish(1)
    _, active = b.poll()
    assert not active.any()

    solo = fresh()
    np.testing.assert_array_equal(solo.run_jobs([(k_b, None)])[0], got_b)
    np.testing.assert_array_equal(
        got_a, seq_reference("ddpm", k_a, sched=sched)
    )


def test_conditional_and_guided_jobs():
    """Per-slot labels flow through; CFG wrappers compose on the slot batch
    (mixed-t doubled forward) and match the guided sequential path."""
    from duodiff_tpu.diffusion.sampling import make_guided_apply

    sched = NoiseSchedule.create(steps=10)
    guided = make_guided_apply(stub_apply, 2.0, null_label=9)
    batcher = ContinuousDiffusionBatcher(
        guided, sched, img_shape=IMG, slots=2, params=PARAMS,
        method="dpm", dpm_steps=5, steps_per_poll=2, conditional=True,
    )
    keys = [jax.random.PRNGKey(7), jax.random.PRNGKey(8)]
    got = batcher.run_jobs([(keys[0], 3), (keys[1], 5)])

    for img, key, cid in zip(got, keys, (3, 5)):
        y = jnp.full((1,), cid, jnp.int32)
        want = dpm_solver_sample(
            lambda x, t, yy: guided(PARAMS, x, t, yy), key,
            schedule=sched, shape=(1,) + IMG, dpm_steps=5, y=y,
        )
        np.testing.assert_array_equal(img, np.asarray(want)[0])
    assert not np.array_equal(got[0], got[1])


def test_host_mirror_agrees_with_device():
    """The serving loop never polls the device — slot progress is mirrored
    host-side. The mirror must agree with the device state exactly."""
    sched = NoiseSchedule.create(steps=12)
    b = ContinuousDiffusionBatcher(
        stub_apply, sched, img_shape=IMG, slots=3, params=PARAMS,
        method="ddpm", steps_per_poll=5,
    )
    b.admit(1, jax.random.PRNGKey(0))
    b.advance()
    b.admit(0, jax.random.PRNGKey(1))
    b.advance()
    ii, active = b.poll()
    assert b.steps_done == {1: 10, 0: 5}
    assert ii[1] == 10 and ii[0] == 5 and not active[2]
    assert b.finished() == [] and b.free_slots() == [2]
    b.advance()  # slot 1 clips at n_trans=12
    ii, _ = b.poll()
    assert b.steps_done == {1: 12, 0: 10}
    assert ii[1] == 12 and ii[0] == 10
    assert b.finished() == [1]
    b.finish(1)
    assert sorted(b.free_slots()) == [1, 2]


def test_sharded_slots_match_unsharded():
    """Slot axis sharded over the 8-device CPU mesh — values identical to
    the single-device batcher (multi-chip serving scale-out)."""
    from duodiff_tpu.parallel.mesh import create_mesh

    if jax.device_count() < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    sched = NoiseSchedule.create(steps=10)
    jobs = [(jax.random.PRNGKey(40 + j), None) for j in range(10)]

    plain = ContinuousDiffusionBatcher(
        stub_apply, sched, img_shape=IMG, slots=8, params=PARAMS,
        method="ddpm", steps_per_poll=4,
    ).run_jobs(jobs)
    sharded = ContinuousDiffusionBatcher(
        stub_apply, sched, img_shape=IMG, slots=8, params=PARAMS,
        method="ddpm", steps_per_poll=4, mesh=create_mesh(),
    ).run_jobs(jobs)
    for a, b in zip(plain, sharded):
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-6)

    with pytest.raises(ValueError, match="divisible"):
        ContinuousDiffusionBatcher(
            stub_apply, sched, img_shape=IMG, slots=3, params=PARAMS,
            mesh=create_mesh(),
        )


def test_admit_many_finish_many_match_per_slot():
    """Batched admission/fetch (one dispatch per wave) is bit-identical to
    per-slot admit()/finish() calls — including partially-filled waves over
    slots whose neighbors are mid-trajectory."""
    sched = NoiseSchedule.create(steps=12)

    def fresh():
        return ContinuousDiffusionBatcher(
            stub_apply, sched, img_shape=IMG, slots=4, params=PARAMS,
            method="ddpm", steps_per_poll=4, conditional=True,
        )

    keys = [jax.random.PRNGKey(70 + j) for j in range(4)]

    a = fresh()
    a.admit(2, keys[0], 1)
    a.advance()
    a.admit(0, keys[1], 2)
    a.admit(3, keys[2], 3)
    for _ in range(2):
        a.advance()
    out_a = {2: a.finish(2)}
    a.admit(1, keys[3], 4)
    for _ in range(3):
        a.advance()
    for s in (0, 3, 1):
        out_a[s] = a.finish(s)

    b = fresh()
    b.admit_many({2: (keys[0], 1)})
    b.advance()
    b.admit_many({0: (keys[1], 2), 3: (keys[2], 3)})
    for _ in range(2):
        b.advance()
    assert b.finished() == [2]
    (img2,) = b.finish_many([2])
    out_b = {2: img2}
    b.admit_many({1: (keys[3], 4)})
    for _ in range(3):
        b.advance()
    assert sorted(b.finished()) == [0, 1, 3]
    for s, img in zip((0, 3, 1), b.finish_many([0, 3, 1])):
        out_b[s] = img
    assert sorted(b.free_slots()) == [0, 1, 2, 3]

    for s in out_a:
        np.testing.assert_array_equal(out_a[s], out_b[s])

    b.admit_many({})  # empty wave is a no-op
    assert b.finish_many([]) == []
    _, active = b.poll()
    assert not active.any()


def test_begin_finish_snapshot_survives_reuse():
    """begin_finish frees the slots immediately but snapshots the image
    buffer: re-admitting and advancing the SAME slots before materialize()
    must not corrupt the deferred images (the serving loop overlaps the
    fetch with the next round's dispatches)."""
    sched = NoiseSchedule.create(steps=8)

    def fresh():
        return ContinuousDiffusionBatcher(
            stub_apply, sched, img_shape=IMG, slots=2, params=PARAMS,
            method="ddpm", steps_per_poll=8, conditional=True,
        )

    keys = [jax.random.PRNGKey(200 + j) for j in range(4)]

    ref = fresh()
    ref.admit_many({0: (keys[0], 1), 1: (keys[1], 2)})
    ref.advance()
    imgs_ref = ref.finish_many([0, 1])

    b = fresh()
    b.admit_many({0: (keys[0], 1), 1: (keys[1], 2)})
    b.advance()
    materialize = b.begin_finish([0, 1])
    assert sorted(b.free_slots()) == [0, 1]  # freed before materialize
    # reuse both slots while the first wave's fetch is still deferred
    b.admit_many({0: (keys[2], 3), 1: (keys[3], 4)})
    b.advance()
    imgs_deferred = materialize()
    for a, r in zip(imgs_deferred, imgs_ref):
        np.testing.assert_array_equal(a, r)
    # the second wave is untouched by the deferred fetch
    imgs2 = b.finish_many([0, 1])
    ref2 = fresh()
    ref2.admit_many({0: (keys[2], 3), 1: (keys[3], 4)})
    ref2.advance()
    for a, r in zip(imgs2, ref2.finish_many([0, 1])):
        np.testing.assert_array_equal(a, r)


def test_validation_errors():
    sched = NoiseSchedule.create(steps=10)
    with pytest.raises(ValueError, match="slots"):
        ContinuousDiffusionBatcher(
            stub_apply, sched, img_shape=IMG, slots=0, params=PARAMS
        )
    with pytest.raises(ValueError, match="steps_per_poll"):
        ContinuousDiffusionBatcher(
            stub_apply, sched, img_shape=IMG, slots=1, params=PARAMS,
            steps_per_poll=0,
        )
    with pytest.raises(ValueError, match="unknown method"):
        ContinuousDiffusionBatcher(
            stub_apply, sched, img_shape=IMG, slots=1, params=PARAMS,
            method="euler",
        )
    with pytest.raises(ValueError, match="predict_noise"):
        ContinuousDiffusionBatcher(
            stub_apply, sched, img_shape=IMG, slots=1, params=PARAMS,
            method="dpm", parametrization="predict_previous",
        )
    # ddim consumes epsilon-form output only — must raise, not silently
    # misread x0 predictions as noise
    with pytest.raises(ValueError, match="predict_noise"):
        ContinuousDiffusionBatcher(
            stub_apply, sched, img_shape=IMG, slots=1, params=PARAMS,
            method="ddim", parametrization="predict_original",
        )


# ---------------------------------------------------------------------------
# block caching composed into the batcher (phase-aligned admissions)
# ---------------------------------------------------------------------------


def stub_anchor(params, x, t, y):
    """Stub anchor/cached pair with real stale-delta semantics: the delta
    depends on x, so consuming a stale one changes the output — any
    phase-misalignment bug shows up as a bit-mismatch vs sequential."""
    out = stub_apply(params, x, t, y)
    delta = jnp.mean(x, axis=(1, 2, 3))[:, None] * jnp.ones((1, 4))
    return out + 0.05 * jnp.mean(delta, axis=1)[:, None, None, None], delta


def stub_cached(params, x, t, y, d):
    out = stub_apply(params, x, t, y)
    return out + 0.05 * jnp.mean(d, axis=1)[:, None, None, None]


def _cache_tuple(every):
    return (stub_anchor, stub_cached, every,
            lambda x: jnp.zeros((x.shape[0], 4)))


def _seq_cached(method, key, *, sched, every, steps=6):
    """Dedicated bucket-1 sequential CACHED run (what sampler.py's
    --cache_every executes): t-anchored ChunkedDDPMSampler for ddpm,
    index-anchored dpm_solver_sample for dpm."""
    from duodiff_tpu.diffusion import make_block_cached_apply

    shape = (1,) + IMG
    if method == "ddpm":
        def apply_fn(params, state, x, t, y):
            inner = make_block_cached_apply(
                lambda xx, tt, yy: stub_anchor(params, xx, tt, yy),
                lambda xx, tt, yy, d: stub_cached(params, xx, tt, yy, d),
                every, sched.steps - 1,
            )
            return inner(state, x, t, y)

        sampler = ChunkedDDPMSampler(
            apply_fn, sched, parametrization="predict_noise", params=PARAMS,
            init_state_fn=lambda x: jnp.zeros((x.shape[0], 4)),
        )
        return np.asarray(sampler.sample(key, shape))[0]
    assert method == "dpm"
    x = dpm_solver_sample(
        lambda *a: None, key, schedule=sched, shape=shape, dpm_steps=steps,
        cache=(
            lambda xx, tt, yy: stub_anchor(PARAMS, xx, tt, yy),
            lambda xx, tt, yy, d: stub_cached(PARAMS, xx, tt, yy, d),
            every,
            lambda xx: jnp.zeros((xx.shape[0], 4)),
        ),
    )
    return np.asarray(x)[0]


@pytest.mark.parametrize("method,steps,every", [
    ("ddpm", 13, 3),   # (steps-1) % every == 0: t-anchor covers i == 0
    ("dpm", 12, 2),    # index-anchored: any every
])
def test_cached_staggered_jobs_match_sequential(method, steps, every):
    """5 jobs through 2 slots of a CACHED batcher (admissions held to
    phase-aligned waves) == 5 dedicated sequential cached runs, bit-exact —
    the continuous-serving form of the --cache_every contract."""
    sched = NoiseSchedule.create(steps=steps)
    batcher = ContinuousDiffusionBatcher(
        stub_apply, sched, img_shape=IMG, slots=2, params=PARAMS,
        method=method, dpm_steps=6, steps_per_poll=2,
        cache=_cache_tuple(every),
    )
    keys = [jax.random.PRNGKey(300 + j) for j in range(5)]
    got = batcher.run_jobs([(k, None) for k in keys])
    for j, k in enumerate(keys):
        want = _seq_cached(method, k, sched=sched, every=every)
        np.testing.assert_array_equal(np.asarray(got[j]), want)
    # and caching is not a no-op: the cached result differs from dense
    dense = seq_reference(method, keys[0], sched=sched)
    assert np.any(np.asarray(got[0]) != dense)


def test_cached_admission_gating():
    """Admitting off-phase must raise (a silent accept would consume a
    zero/stale delta on the new slot's first step); run_jobs defers and
    still completes."""
    sched = NoiseSchedule.create(steps=13)
    batcher = ContinuousDiffusionBatcher(
        stub_apply, sched, img_shape=IMG, slots=1, params=PARAMS,
        method="ddpm", steps_per_poll=1, cache=_cache_tuple(3),
    )
    assert batcher.can_admit_cached()
    batcher.admit(0, jax.random.PRNGKey(0))
    batcher.advance()  # w=1: off-phase
    assert not batcher.can_admit_cached()
    with pytest.raises(RuntimeError, match="phase-aligned"):
        batcher.admit_many({0: (jax.random.PRNGKey(1), None)})


def test_cached_validation():
    sched = NoiseSchedule.create(steps=10)
    with pytest.raises(ValueError, match="ddpm/dpm"):
        ContinuousDiffusionBatcher(
            stub_apply, sched, img_shape=IMG, slots=1, params=PARAMS,
            method="ddim", cache=_cache_tuple(3),
        )
    # 10-step schedule: (steps-1)=9, every=2 leaves fresh slots' first
    # step un-anchored -> must refuse
    with pytest.raises(ValueError, match="anchor"):
        ContinuousDiffusionBatcher(
            stub_apply, sched, img_shape=IMG, slots=1, params=PARAMS,
            method="ddpm", cache=_cache_tuple(2),
        )
    # bool is an int subclass: True must not silently mean every=1
    with pytest.raises(ValueError, match="int or a pattern"):
        ContinuousDiffusionBatcher(
            stub_apply, sched, img_shape=IMG, slots=1, params=PARAMS,
            method="ddpm", cache=_cache_tuple(True),
        )


# ---------------------------------------------------------------------------
# serving integration (--slots)
# ---------------------------------------------------------------------------

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


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(), method="POST"
    )
    try:
        with urllib.request.urlopen(req, timeout=300) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _start_server(cfg_path, extra):
    import serve as serve_cli

    ready = threading.Event()
    box = []
    th = threading.Thread(
        target=serve_cli.main,
        args=([
            "--config_path", str(cfg_path), "--random_init", "--port", "0",
            "--method", "dpm", "--steps", "4", "--num_timesteps", "32",
        ] + extra,),
        kwargs={"ready_event": ready, "server_box": box},
        daemon=True,
    )
    th.start()
    assert ready.wait(timeout=300), "server did not come up"
    httpd, service = box[0]
    return httpd, service, f"http://127.0.0.1:{httpd.server_address[1]}"


@pytest.mark.slow
def test_continuous_server_matches_bucket_server(tmp_path):
    """--slots serving returns the same images as the fixed-bucket-1 server
    for the same (seed, n) requests — and handles concurrent requests."""
    cfg = tmp_path / "tiny.yaml"
    cfg.write_text(TINY_YAML)

    httpd, _, base = _start_server(cfg, ["--bucket", "1"])
    try:
        _, want1 = _post(base + "/sample", {"n": 2, "seed": 7})
        _, want2 = _post(base + "/sample", {"n": 1, "seed": 11})
    finally:
        httpd.shutdown()

    httpd, service, base = _start_server(
        cfg, ["--slots", "3", "--steps_per_poll", "2"]
    )
    try:
        info = json.loads(
            urllib.request.urlopen(base + "/healthz", timeout=60).read()
        )
        assert info["mode"] == "continuous" and info["slots"] == 3

        results = {}

        def hit(name, payload):
            results[name] = _post(base + "/sample", payload)

        threads = [
            threading.Thread(target=hit, args=("a", {"n": 2, "seed": 7})),
            threading.Thread(target=hit, args=("b", {"n": 1, "seed": 11})),
            threading.Thread(target=hit, args=("c", {"n": 1, "seed": 11})),
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        code_a, got1 = results["a"]
        code_b, got2 = results["b"]
        code_c, got3 = results["c"]
        assert code_a == code_b == code_c == 200
        assert got1["images"] == want1["images"]
        assert got2["images"] == want2["images"]
        assert got3["images"] == got2["images"]

        for b64 in got1["images"]:
            from PIL import Image

            img = Image.open(io.BytesIO(base64.b64decode(b64)))
            assert img.size == (16, 16)
            assert np.isfinite(np.asarray(img)).all()

        # validation parity with the bucket server
        code, resp = _post(base + "/sample", {"n": 0})
        assert code == 400 and "error" in resp
        code, resp = _post(base + "/sample", {"n": 1, "class_id": 3})
        assert code == 400 and "error" in resp
    finally:
        httpd.shutdown()


def test_cached_serving_matches_bucket(tmp_path):
    """--cache_every serving: the continuous (--slots) server returns the
    SAME images as the fixed-bucket-1 cached server for the same seeds
    (phase-aligned admissions preserve the sequential cached trajectory),
    and caching actually changes the computation vs the dense server."""
    cfg = tmp_path / "tiny.yaml"
    cfg.write_text(TINY_YAML)

    httpd, _, base = _start_server(cfg, ["--bucket", "1"])
    try:
        _, dense = _post(base + "/sample", {"n": 1, "seed": 5})
    finally:
        httpd.shutdown()

    httpd, _, base = _start_server(
        cfg, ["--bucket", "1", "--cache_every", "2"]
    )
    try:
        _, want = _post(base + "/sample", {"n": 2, "seed": 5})
    finally:
        httpd.shutdown()

    httpd, _, base = _start_server(
        cfg, ["--slots", "2", "--steps_per_poll", "2", "--cache_every", "2"]
    )
    try:
        _, got = _post(base + "/sample", {"n": 2, "seed": 5})
        assert got["images"] == want["images"]
        assert got["images"][0] != dense["images"][0]
    finally:
        httpd.shutdown()


def test_cache_schedule_serving_matches_uniform(tmp_path):
    """serve.py --cache_schedule (ddpm fixed-bucket): a table equal to the
    uniform anchors reproduces --cache_every bit for bit, and the
    unsupported modes (continuous slots, dpm) are rejected up front."""
    import serve as serve_cli

    from duodiff_tpu.diffusion.cache_schedule import (
        save_cache_schedule,
        uniform_table,
    )

    cfg = tmp_path / "tiny.yaml"
    cfg.write_text(TINY_YAML)
    sched = tmp_path / "sched.json"
    save_cache_schedule(sched, uniform_table(2, 32))
    ddpm = ["--method", "ddpm", "--steps", "32", "--bucket", "1"]

    httpd, _, base = _start_server(cfg, ddpm + ["--cache_every", "2"])
    try:
        _, want = _post(base + "/sample", {"n": 1, "seed": 9})
    finally:
        httpd.shutdown()

    httpd, _, base = _start_server(
        cfg, ddpm + ["--cache_schedule", str(sched)]
    )
    try:
        _, got = _post(base + "/sample", {"n": 1, "seed": 9})
        assert got["images"] == want["images"]
    finally:
        httpd.shutdown()

    # this uniform table anchors t%2==0 but t=31 (the first reverse step)
    # is NOT an anchor — it cannot ride mixed-timestep slots and the fold
    # must reject it with the structural pointer to fixed-bucket serving
    with pytest.raises(SystemExit, match="fixed-bucket"):
        serve_cli.ContinuousSamplerService(serve_cli.get_args([
            "--config_path", str(cfg), "--random_init", "--port", "0",
            "--method", "ddpm", "--steps", "32", "--num_timesteps", "32",
            "--slots", "2", "--cache_schedule", str(sched),
        ]))
    with pytest.raises(SystemExit, match="grid indices"):
        serve_cli.SamplerService(serve_cli.get_args([
            "--config_path", str(cfg), "--random_init", "--port", "0",
            "--method", "dpm", "--steps", "4", "--num_timesteps", "32",
            "--bucket", "1", "--cache_schedule", str(sched),
        ]))


def test_pattern_table_helpers():
    """periodic_pattern_table <-> fold_table_to_pattern round trip, the
    uniform special case, and the two rejection classes (aperiodic table;
    t=T-1 not an anchor)."""
    from duodiff_tpu.diffusion.cache_schedule import uniform_table
    from duodiff_tpu.diffusion.continuous import (
        fold_table_to_pattern,
        periodic_pattern_table,
    )

    pat = np.array([1, 0, 1, 0, 0], bool)
    table = periodic_pattern_table(pat, 11)
    assert table[10]  # a fresh trajectory's first reverse step anchors
    np.testing.assert_array_equal(fold_table_to_pattern(table), pat)
    # uniform every=3 at 13 steps ((steps-1) % 3 == 0) == pattern [1,0,0]
    np.testing.assert_array_equal(
        fold_table_to_pattern(uniform_table(3, 13)),
        np.array([1, 0, 0], bool),
    )
    # derived-style irregular anchors: aperiodic -> None
    t = np.zeros(12, bool)
    t[[11, 8, 3]] = True
    assert fold_table_to_pattern(t) is None
    # uniform every=2 at 32 steps: t=31 is not an anchor -> None
    assert fold_table_to_pattern(uniform_table(2, 32)) is None


def test_pattern_cached_staggered_jobs_match_sequential():
    """A wave-index anchor PATTERN (non-uniform periodic schedule) through
    2 slots == the sequential cached sampler running the equivalent
    absolute-t table, bit-exact — the slots-mode form of a derived
    schedule (serve.py --cache_pattern)."""
    from duodiff_tpu.diffusion import make_block_cached_apply
    from duodiff_tpu.diffusion.continuous import periodic_pattern_table

    pat = np.array([1, 0, 1, 0, 0], bool)
    steps = 11
    sched = NoiseSchedule.create(steps=steps)
    batcher = ContinuousDiffusionBatcher(
        stub_apply, sched, img_shape=IMG, slots=2, params=PARAMS,
        method="ddpm", steps_per_poll=2, cache=_cache_tuple(pat),
    )
    keys = [jax.random.PRNGKey(600 + j) for j in range(5)]
    got = batcher.run_jobs([(k, None) for k in keys])

    table = jnp.asarray(periodic_pattern_table(pat, steps))

    def apply_fn(params, state, x, t, y):
        inner = make_block_cached_apply(
            lambda xx, tt, yy: stub_anchor(params, xx, tt, yy),
            lambda xx, tt, yy, d: stub_cached(params, xx, tt, yy, d),
            table, sched.steps - 1,
        )
        return inner(state, x, t, y)

    sampler = ChunkedDDPMSampler(
        apply_fn, sched, parametrization="predict_noise", params=PARAMS,
        init_state_fn=lambda x: jnp.zeros((x.shape[0], 4)),
    )
    for j, k in enumerate(keys):
        want = np.asarray(sampler.sample(k, (1,) + IMG))[0]
        np.testing.assert_array_equal(np.asarray(got[j]), want)
    # the pattern is not a no-op vs dense
    dense = seq_reference("ddpm", keys[0], sched=sched)
    assert np.any(np.asarray(got[0]) != dense)


def test_pattern_cached_validation():
    sched = NoiseSchedule.create(steps=11)
    with pytest.raises(ValueError, match=r"pattern\[0\]"):
        ContinuousDiffusionBatcher(
            stub_apply, sched, img_shape=IMG, slots=1, params=PARAMS,
            method="ddpm", cache=_cache_tuple(np.array([0, 1], bool)),
        )
    with pytest.raises(ValueError, match="ddpm"):
        ContinuousDiffusionBatcher(
            stub_apply, sched, img_shape=IMG, slots=1, params=PARAMS,
            method="dpm", dpm_steps=6,
            cache=_cache_tuple(np.array([1, 0], bool)),
        )


@pytest.mark.slow
def test_cache_pattern_serving_matches_bucket(tmp_path):
    # slow set: three full HTTP servers; the batcher-level pattern
    # bit-equality (test_pattern_cached_staggered_jobs_match_sequential)
    # pins the core contract in the default run
    """serve.py --cache_pattern: the continuous (--slots) server and the
    fixed-bucket server (pattern expanded to its absolute-t table) return
    identical images — a non-uniform anchor schedule riding mixed-timestep
    slots — and the pattern actually changes the computation."""
    cfg = tmp_path / "tiny.yaml"
    cfg.write_text(TINY_YAML)
    ddpm = ["--method", "ddpm", "--steps", "32"]

    httpd, _, base = _start_server(cfg, ddpm + ["--bucket", "1"])
    try:
        _, dense = _post(base + "/sample", {"n": 1, "seed": 21})
    finally:
        httpd.shutdown()

    httpd, _, base = _start_server(
        cfg, ddpm + ["--bucket", "1", "--cache_pattern", "1,0,1,0"]
    )
    try:
        _, want = _post(base + "/sample", {"n": 2, "seed": 21})
    finally:
        httpd.shutdown()

    httpd, _, base = _start_server(
        cfg, ddpm + ["--slots", "2", "--steps_per_poll", "2",
                     "--cache_pattern", "1,0,1,0"]
    )
    try:
        _, got = _post(base + "/sample", {"n": 2, "seed": 21})
        assert got["images"] == want["images"]
        assert got["images"][0] != dense["images"][0]
    finally:
        httpd.shutdown()


@pytest.mark.slow
def test_periodic_cache_schedule_rides_slots(tmp_path):
    # slow set: two HTTP servers; fold_table_to_pattern's unit test covers
    # the folding logic in the default run
    """A --cache_schedule table that IS wave-periodic folds automatically
    and serves in slots mode, matching the equivalent --cache_pattern."""
    from duodiff_tpu.diffusion.cache_schedule import save_cache_schedule
    from duodiff_tpu.diffusion.continuous import periodic_pattern_table

    cfg = tmp_path / "tiny.yaml"
    cfg.write_text(TINY_YAML)
    sched_path = tmp_path / "periodic.json"
    save_cache_schedule(
        sched_path, periodic_pattern_table(np.array([1, 0], bool), 32)
    )
    ddpm = ["--method", "ddpm", "--steps", "32", "--slots", "2",
            "--steps_per_poll", "2"]

    httpd, _, base = _start_server(
        cfg, ddpm + ["--cache_schedule", str(sched_path)]
    )
    try:
        _, got = _post(base + "/sample", {"n": 1, "seed": 4})
    finally:
        httpd.shutdown()

    httpd, _, base = _start_server(cfg, ddpm + ["--cache_pattern", "1,0"])
    try:
        _, want = _post(base + "/sample", {"n": 1, "seed": 4})
        assert got["images"] == want["images"]
    finally:
        httpd.shutdown()


@pytest.mark.slow
def test_continuous_service_failure_propagation(tmp_path):
    """A crash in the sole device thread must FAIL every waiting request
    (RuntimeError through the future), not leave them blocked for the
    fut.result timeout; close() likewise resolves queued waiters."""
    import serve as serve_cli

    cfg = tmp_path / "tiny.yaml"
    cfg.write_text(TINY_YAML)
    svc = serve_cli.ContinuousSamplerService(serve_cli.get_args([
        "--config_path", str(cfg), "--random_init", "--port", "0",
        "--method", "dpm", "--steps", "4", "--num_timesteps", "32",
        "--slots", "2", "--steps_per_poll", "2",
    ]))
    try:
        # sanity: one request completes normally
        imgs = svc.sample(n=1, seed=3)
        assert len(imgs) == 1 and np.isfinite(imgs[0]).all()

        # break the device loop: the next advance() raises
        def boom():
            raise RuntimeError("injected device failure")

        svc.batcher.advance = boom
        with pytest.raises(RuntimeError, match="injected device failure"):
            svc.sample(n=1, seed=4)
        # the loop crashed and marked itself stopped: new requests are
        # rejected up front instead of queueing forever
        with pytest.raises(ValueError, match="shutting down"):
            svc.sample(n=1, seed=5)
    finally:
        svc.close()
