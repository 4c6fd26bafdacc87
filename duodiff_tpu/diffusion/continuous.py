"""Mixed-timestep continuous batching for diffusion serving.

The fixed-bucket server (serve.py) runs one request's ENTIRE reverse
trajectory per device dispatch sequence: concurrent requests serialize, and
a bucket sized for throughput makes single-image requests pay the whole
bucket's latency. This module implements the diffusion analogue of LLM
continuous batching ("in-flight batching"): ONE compiled step executable
over a fixed slot batch where **every slot carries its own timestep**, so
requests at different points of their trajectories share every device step,
new requests join free slots between dispatches, and finished slots free up
immediately.

TPU-native by construction:

- One static-shape executable — (slots, H, W, C) never changes, so nothing
  ever recompiles mid-request (XLA static shapes; same principle as the
  bucket server).
- Per-slot timesteps are just data: the U-ViT forward already consumes a
  per-sample timestep vector (training draws random per-sample t), so a
  mixed-t batch is the SAME compiled forward the samplers use.
- Per-slot step math is the existing :class:`NoiseSchedule` posterior
  update vmapped over the slot axis — coefficient gathers batch cleanly.
- The host polls every ``steps_per_poll`` device steps (a ``fori_loop``
  inside the executable), amortizing the host<->device round-trip that a
  per-step poll would cost on remote-dispatch backends.

Each slot's trajectory is bit-identical to a dedicated bucket-1 run of the
corresponding sequential sampler with the same request key (ChunkedDDPMSampler
/ ddim_sample / dpm_solver_sample — the per-slot RNG reproduces their exact
split/draw sequence; tested in tests/test_continuous.py).

The reference has no serving story at all (its samplers are batch CLIs,
reference sampler.py:192-252); this is a beyond-parity component extending
serve.py.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from duodiff_tpu.diffusion.schedule import NoiseSchedule
from duodiff_tpu.diffusion.sampling import (
    ddim_timestep_grid,
    dpm_solver_tables,
)


def periodic_pattern_table(pattern, steps: int) -> np.ndarray:
    """The absolute-t anchor table equivalent to a wave-index ``pattern``.

    A slot admitted on a phase-aligned wave sees step j at timestep
    ``t = steps-1-j``, so ``table[t] = pattern[(steps-1-t) % p]``. Feeding
    this table to the sequential samplers (``--cache_schedule``) reproduces
    the pattern-cached batcher's per-slot trajectories bit-exactly (the
    contract tests/test_continuous.py pins)."""
    pattern = np.asarray(pattern).astype(bool).ravel()
    if pattern.size < 1 or not pattern[0]:
        raise ValueError("pattern must be non-empty with pattern[0] True")
    t = np.arange(steps)
    return pattern[(steps - 1 - t) % pattern.size]


def fold_table_to_pattern(table) -> Optional[np.ndarray]:
    """Smallest wave-index pattern whose :func:`periodic_pattern_table`
    reproduces ``table`` exactly, or None if the table is aperiodic (the
    structural limit of mixed-timestep caching — see the class docstring).
    """
    table = np.asarray(table).astype(bool).ravel()
    steps = table.size
    idx = table[::-1]  # wave-index view: idx[j] = table[steps-1-j]
    if not idx[0]:
        return None
    for p in range(1, steps):
        if np.array_equal(idx, np.resize(idx[:p], steps)):
            return idx[:p].copy()
    return None  # only "period" = full length: aperiodic


def _dpm_tables(schedule: NoiseSchedule, dpm_steps: int, order: int):
    """sampling.dpm_solver_tables rows (one source of truth for the
    DPM-Solver++ 2M constants), with the model-call timestep under the
    batcher's canonical "t_model" key."""
    assert order in (1, 2), order
    tab = dict(dpm_solver_tables(schedule, dpm_steps))
    tab["t_model"] = tab.pop("t_prev")
    return tab


class ContinuousDiffusionBatcher:
    """Slot-batched mixed-timestep sampler state machine.

    Host API (all methods are cheap dispatches; the heavy work is the
    compiled ``advance``):

    - ``admit(slot, key, class_id)`` — seed a free slot with a request key
      (draws x_T and the per-slot RNG carry exactly like the sequential
      sampler's init split).
    - ``advance()`` — run ``steps_per_poll`` mixed-timestep device steps.
    - ``poll()`` — host view of (steps_done, active) per slot.
    - ``finish(slot)`` — fetch the finished image, free the slot.

    ``apply_fn(params, x, t_batch, y) -> model_output`` is the same
    params-first closure the chunked samplers take; guidance wrappers
    (make_guided_apply) compose unchanged. ``y=None`` is passed for
    unconditional models (``conditional=False``).

    ``cache=(apply_anchor, apply_cached, every, init_state)`` composes
    training-free block caching (the sampler CLIs' ``--cache_every``) into
    the mixed-timestep loop. SPMD needs the anchor/cached branch to be
    slot-UNIFORM, so admissions are restricted to **phase-aligned waves**:
    a request may only be admitted when ``can_admit_cached()`` is true
    (global step counter ≡ 0 mod the anchor period); every in-flight slot
    then shares the same step-phase and the whole batch anchors together.
    Per-slot trajectories are bit-identical to the corresponding
    sequential cached sampler: index-anchored ``dpm_solver_sample(cache=
    ...)`` for method="dpm"; for method="ddpm" the t-anchored
    ``--cache_every`` convention requires ``(schedule.steps - 1) % every
    == 0`` (e.g. every=3 at 1000 steps) so that a fresh slot's first step
    is itself an anchor — enforced at construction.

    ``every`` may instead be a 1-D boolean **wave-index anchor pattern**
    (ddpm only): step j of every slot anchors iff ``pattern[j % len
    (pattern)]`` (``pattern[0]`` must be True — a fresh slot's first step
    needs a real delta). This is the slots-mode form of a non-uniform
    anchor schedule: richer than a uniform period while keeping the
    anchor decision slot-uniform (the global wave counter indexes the
    pattern; admissions gate on ``w % len(pattern) == 0``). An ARBITRARY
    t-keyed drift-derived table (tools/derive_cache_schedule.py) cannot
    ride mixed-timestep slots: slots at different t would disagree on
    anchoring, and a per-slot branch under SPMD computes both paths —
    zero savings. Serving folds a derived table into this periodic form
    when it is exactly periodic and rejects it otherwise
    (serve.py --cache_schedule / --cache_pattern);
    :func:`periodic_pattern_table` gives the equivalent absolute-t table
    for the sequential samplers (the bit-equality contract).
    apply_anchor/apply_cached are params-first like ``apply_fn``:
    ``apply_anchor(params, x, t, y) -> (out, delta)``,
    ``apply_cached(params, x, t, y, delta) -> out``;
    ``init_state(x_slots) -> delta0`` builds the zero cache.
    """

    def __init__(
        self,
        apply_fn: Callable,
        schedule: NoiseSchedule,
        *,
        img_shape,
        slots: int,
        params,
        method: str = "dpm",
        parametrization: str = "predict_noise",
        variance_mode: str = "beta_tilde",
        ddim_steps: int = 50,
        dpm_steps: int = 20,
        eta: float = 0.0,
        order: int = 2,
        steps_per_poll: int = 5,
        conditional: bool = False,
        mesh=None,
        cache: Optional[tuple] = None,
    ):
        if slots < 1:
            raise ValueError(f"slots must be >= 1, got {slots}")
        if steps_per_poll < 1:
            raise ValueError(f"steps_per_poll must be >= 1, got {steps_per_poll}")
        if method not in ("ddpm", "ddim", "dpm"):
            raise ValueError(f"unknown method {method!r}")
        self.method = method
        self.slots = slots
        self.img_shape = tuple(img_shape)
        self.params = params
        self.conditional = conditional
        self.steps_per_poll = steps_per_poll
        self._cache_pattern = None
        if cache is not None:
            if method not in ("ddpm", "dpm"):
                raise ValueError(
                    f"cache composes with ddpm/dpm methods, not {method!r}"
                )
            rule = cache[2]
            if isinstance(rule, bool):
                raise ValueError(
                    f"cache every must be an int or a pattern, got {rule!r}"
                )
            if isinstance(rule, (int, np.integer)):
                if rule < 1:
                    raise ValueError(f"cache every must be >= 1, got {rule}")
                if method == "ddpm" and (schedule.steps - 1) % rule != 0:
                    raise ValueError(
                        "ddpm block caching in the continuous batcher needs "
                        f"(steps - 1) % every == 0 so a fresh slot's first "
                        f"step is an anchor (steps={schedule.steps}, "
                        f"every={rule}); use e.g. every=3 at 1000 steps"
                    )
                period = rule
            else:
                pattern = np.asarray(rule).astype(bool).ravel()
                if method != "ddpm":
                    raise ValueError(
                        "wave-index anchor patterns compose with method="
                        f"'ddpm' only, not {method!r} (dpm anchors on its "
                        "own solver-grid indices)"
                    )
                if pattern.size < 1 or not pattern[0]:
                    raise ValueError(
                        "anchor pattern must be non-empty with pattern[0] "
                        "True (a fresh slot's first step needs a real "
                        "delta)"
                    )
                self._cache_pattern = jnp.asarray(pattern)
                period = int(pattern.size)
        self.cache = cache
        self.cache_every = period if cache is not None else 1
        # host mirror of the device-side global step counter state["w"]
        # (advance() adds steps_per_poll); admissions must be phase-aligned
        # when caching — see can_admit_cached()
        self._w_host = 0

        if method == "ddpm":
            t_int = jnp.arange(schedule.steps - 1, -1, -1, dtype=jnp.int32)
            tab = {"t_model": t_int.astype(jnp.float32), "t": t_int}
            self.n_trans = schedule.steps

            def one_slot(mo, x, x0p, key, ii):
                t = tab["t"][ii]
                key, zkey = jax.random.split(key)
                z = jax.random.normal(zkey, self.img_shape, dtype=jnp.float32)
                z = jnp.where(t > 0, z, jnp.zeros_like(z))
                xn = schedule.step(parametrization, mo, x, t, z, variance_mode)
                return xn, x0p, key

        elif method == "ddim":
            if parametrization != "predict_noise":
                # schedule.ddim_step consumes epsilon-form model output;
                # mirror the dpm branch's validation instead of silently
                # misreading x0/mean predictions as noise
                raise ValueError(
                    "ddim continuous batching supports predict_noise only, "
                    f"got {parametrization!r}"
                )
            grid = ddim_timestep_grid(schedule.steps, ddim_steps)
            tab = {
                "t": jnp.asarray(grid[:-1], jnp.int32),
                "s": jnp.asarray(grid[1:], jnp.int32),
            }
            tab["t_model"] = tab["t"].astype(jnp.float32)
            self.n_trans = len(grid) - 1

            def one_slot(mo, x, x0p, key, ii):
                t, s = tab["t"][ii], tab["s"][ii]
                key, zkey = jax.random.split(key)
                # same draw-then-zero contract as sampling._step_noise
                z = jax.random.normal(zkey, self.img_shape, dtype=jnp.float32)
                z = jnp.where(s > 0, z, jnp.zeros_like(z))
                xn = schedule.ddim_step(mo, x, t, s, z, eta=eta)
                return xn, x0p, key

        else:  # dpm
            if parametrization not in ("predict_noise", "predict_original"):
                raise ValueError("dpm supports predict_noise/predict_original")
            tab = _dpm_tables(schedule, dpm_steps, order)
            self.n_trans = int(tab["phi"].shape[0])

            def one_slot(mo, x, x0p, key, ii):
                c = {k: v[ii] for k, v in tab.items()}
                if parametrization == "predict_original":
                    x0 = mo
                else:
                    x0 = (x - c["sigma_prev"] * mo) / c["alpha_prev"]
                if order == 1:
                    d = x0
                else:
                    d2 = c["c_cur"] * x0 - c["c_prev"] * x0p
                    d = jnp.where(c["is_first"] > 0, x0, d2)
                xn = c["sigma_ratio"] * x - c["alpha_t"] * c["phi"] * d
                return xn, x0, key  # the dpm loop never consumes the key

        n_trans = self.n_trans
        t_model_tab = tab["t_model"]

        cache_every = self.cache_every

        def _step(params, state):
            ic = jnp.clip(state["i"], 0, n_trans - 1)
            y = state["y"] if conditional else None
            t_model = t_model_tab[ic]
            extra = {}
            if cache is None:
                mo = apply_fn(params, state["x"], t_model, y)
            else:
                # phase-aligned admissions make every in-flight slot share
                # the same step-phase, so the anchor/cached decision is one
                # scalar: the global step counter's phase. See the class
                # docstring for why this reproduces the sequential cached
                # samplers' per-slot trajectories exactly.
                apply_anchor, apply_cached = cache[0], cache[1]
                if self._cache_pattern is not None:
                    use_anchor = self._cache_pattern[state["w"] % cache_every]
                else:
                    use_anchor = (state["w"] % cache_every) == 0

                def anchor(_d):
                    return apply_anchor(params, state["x"], t_model, y)

                def cached(d):
                    return apply_cached(params, state["x"], t_model, y, d), d

                mo, new_delta = jax.lax.cond(
                    use_anchor, anchor, cached, state["delta"]
                )
                extra = {"delta": new_delta, "w": state["w"] + 1}
            new_x, new_x0p, new_key = jax.vmap(one_slot)(
                mo, state["x"], state["x0_prev"], state["key"], ic
            )
            live = state["active"] & (state["i"] < n_trans)

            def sel(a, b):
                return jnp.where(
                    live.reshape((-1,) + (1,) * (a.ndim - 1)), a, b
                )

            return {
                "x": sel(new_x, state["x"]),
                "x0_prev": sel(new_x0p, state["x0_prev"]),
                "key": sel(new_key, state["key"]),
                "i": jnp.where(live, state["i"] + 1, state["i"]),
                "active": state["active"],
                "y": state["y"],
                **extra,
            }

        k = steps_per_poll

        def _advance(params, state):
            return jax.lax.fori_loop(0, k, lambda _, s: _step(params, s), state)

        def _admit(state, slot, req_key, y):
            # exact init sequence of the sequential samplers: split the
            # request key, draw x_T from the second half, carry the first
            # (ChunkedDDPMSampler.init / ddim_sample / dpm_solver_sample)
            k1, init_key = jax.random.split(req_key)
            x0 = jax.random.normal(init_key, self.img_shape, dtype=jnp.float32)
            return {
                **state,  # passthrough extras (cache delta, step counter)
                "x": state["x"].at[slot].set(x0),
                "x0_prev": state["x0_prev"].at[slot].set(0.0),
                "key": state["key"].at[slot].set(k1),
                "i": state["i"].at[slot].set(0),
                "active": state["active"].at[slot].set(True),
                "y": state["y"].at[slot].set(y),
            }

        def _admit_many(state, mask, req_keys, ys):
            # batched form: ONE dispatch admits any subset of slots (the
            # serving loop admits a whole wave per round; per-slot dispatches
            # cost a host round-trip each on remote-dispatch backends). The
            # per-slot split/draw is the vmap of _admit's — bit-identical.
            k1s, init_keys = jnp.moveaxis(
                jax.vmap(jax.random.split)(req_keys), 1, 0
            )
            x0s = jax.vmap(
                lambda kk: jax.random.normal(kk, self.img_shape, jnp.float32)
            )(init_keys)

            def sel(new, old):
                return jnp.where(
                    mask.reshape((-1,) + (1,) * (new.ndim - 1)), new, old
                )

            return {
                **state,  # passthrough extras (cache delta, step counter)
                "x": sel(x0s, state["x"]),
                "x0_prev": sel(jnp.zeros_like(x0s), state["x0_prev"]),
                "key": sel(k1s, state["key"]),
                "i": jnp.where(mask, 0, state["i"]),
                "active": state["active"] | mask,
                "y": jnp.where(mask, ys, state["y"]),
            }

        def _release_many(state, mask):
            return {**state, "active": state["active"] & ~mask}

        def _release(state, slot):
            return {**state, "active": state["active"].at[slot].set(False)}

        def _fetch(state, slot):
            # slot stays a traced scalar -> ONE dynamic-slice executable for
            # every slot (a Python-int index would compile a fresh
            # executable per distinct slot — measured as multi-second
            # remote-compile stalls mid-request on the axon backend)
            return jax.lax.dynamic_index_in_dim(
                state["x"], slot, axis=0, keepdims=False
            )

        self._advance_fn = jax.jit(_advance)
        self._admit_fn = jax.jit(_admit)
        self._admit_many_fn = jax.jit(_admit_many)
        self._release_fn = jax.jit(_release)
        self._release_many_fn = jax.jit(_release_many)
        self._fetch_fn = jax.jit(_fetch)
        s = slots
        self.state = {
            "x": jnp.zeros((s,) + self.img_shape, jnp.float32),
            "x0_prev": jnp.zeros((s,) + self.img_shape, jnp.float32),
            "key": jnp.zeros((s,) + jax.random.PRNGKey(0).shape,
                             jax.random.PRNGKey(0).dtype),
            "i": jnp.full((s,), n_trans, jnp.int32),
            "active": jnp.zeros((s,), bool),
            "y": jnp.zeros((s,), jnp.int32),
        }
        if cache is not None:
            self.state["delta"] = cache[3](self.state["x"])
            self.state["w"] = jnp.zeros((), jnp.int32)
        if mesh is not None:
            # multi-chip serving: shard the slot axis over the mesh's data
            # axes — every device step then advances slots/n_data in-flight
            # requests per chip with zero per-step collectives (the same
            # embarrassing parallelism as batch sampling, SURVEY.md §2b).
            # Values are sharding-independent (tested on the CPU mesh).
            from duodiff_tpu.parallel.mesh import batch_sharding

            n_data = int(
                np.prod([mesh.shape[a] for a in mesh.axis_names
                         if a != "model"])
            )
            if slots % n_data:
                raise ValueError(
                    f"slots ({slots}) must be divisible by the mesh's "
                    f"{n_data} data shards"
                )
            self.state = {
                k: (jax.device_put(v, batch_sharding(mesh, v.ndim))
                    if v.ndim > 0 else v)  # "w" is a replicated scalar
                for k, v in self.state.items()
            }
        # host mirror of per-slot progress: slot -> steps completed
        # (occupied slots only; see the host-API comment below)
        self.steps_done: dict[int, int] = {}

    # -- host API ----------------------------------------------------------
    #
    # Slot progress is DETERMINISTIC: an occupied slot gains exactly
    # steps_per_poll steps per advance() (clipped at n_trans), so the host
    # mirrors it in ``steps_done`` and never needs a device round-trip to
    # learn who finished — advance() dispatches stay fully async and
    # pipeline on the device; the only blocking transfers are finish()'s
    # image fetches. (The first implementation polled (i, active) after
    # every advance; on the remote-dispatch axon backend that serialized a
    # host round-trip per ~12ms of device work and capped the measured
    # speedup at 1.12x.)

    def admit(self, slot: int, key: jax.Array, class_id: Optional[int] = None):
        self._assert_admissible()
        y = jnp.asarray(0 if class_id is None else int(class_id), jnp.int32)
        self.state = self._admit_fn(self.state, slot, key, y)
        self.steps_done[slot] = 0

    def admit_many(self, assignments: dict):
        """Admit ``{slot: (key, class_id)}`` in ONE device dispatch.
        Bit-identical to per-slot admit() calls."""
        if not assignments:
            return
        self._assert_admissible()
        mask = np.zeros((self.slots,), bool)
        keys = np.zeros(self.state["key"].shape, self.state["key"].dtype)
        ys = np.zeros((self.slots,), np.int32)
        for slot, (key, class_id) in assignments.items():
            mask[slot] = True
            keys[slot] = np.asarray(key)
            ys[slot] = 0 if class_id is None else int(class_id)
            self.steps_done[slot] = 0
        self.state = self._admit_many_fn(
            self.state, jnp.asarray(mask), jnp.asarray(keys), jnp.asarray(ys)
        )

    def begin_finish(self, slots):
        """Free ``slots`` and START their image transfer; return a zero-arg
        ``materialize() -> [img, ...]`` (in ``slots`` order) that blocks on
        the transfer when called.

        The snapshot is the post-advance ``x`` buffer — immutable, so the
        freed slots can be re-admitted and advanced while the transfer is
        still in flight. This lets the serving loop overlap the ONLY
        blocking host<->device interaction it has left (the finished-image
        fetch — measured ~25-45 ms per synchronous device_get on the axon
        tunnel, several advance()s worth of device work) with the next
        round's dispatches: defer materialize() until after the next
        advance() is queued and the transfer rides under device compute."""
        slots = list(slots)
        if not slots:
            return lambda: []
        x_ref = self.state["x"]
        try:
            x_ref.copy_to_host_async()
        except Exception:  # backends without async host copies
            pass
        mask = np.zeros((self.slots,), bool)
        mask[slots] = True
        self.state = self._release_many_fn(self.state, jnp.asarray(mask))
        for slot in slots:
            del self.steps_done[slot]

        def materialize():
            x_all = np.asarray(jax.device_get(x_ref))
            return [x_all[slot] for slot in slots]

        return materialize

    def finish_many(self, slots) -> list:
        """Fetch several finished slots' images with ONE device transfer
        (per-slot fetches pay a host round-trip each on remote-dispatch
        backends) and free them in one dispatch. Returns images in
        ``slots`` order."""
        return self.begin_finish(slots)()

    def can_admit_cached(self) -> bool:
        """True when admissions are allowed right now. Always true without
        caching; with caching, only on phase-aligned waves (global step
        counter ≡ 0 mod every) so the new slot's first step is an anchor
        and the whole batch stays phase-uniform. The serving loop holds
        pending requests for at most every-1 waves."""
        return self.cache is None or self._w_host % self.cache_every == 0

    def _assert_admissible(self):
        if not self.can_admit_cached():
            raise RuntimeError(
                "cached batcher: admissions only on phase-aligned waves "
                f"(w={self._w_host}, every={self.cache_every}); check "
                "can_admit_cached() before admitting"
            )

    def advance(self):
        self.state = self._advance_fn(self.params, self.state)
        self._w_host += self.steps_per_poll
        for slot, done in self.steps_done.items():
            self.steps_done[slot] = min(done + self.steps_per_poll,
                                        self.n_trans)

    def finished(self):
        """Slots whose trajectories are complete (host bookkeeping only)."""
        return [s for s, d in self.steps_done.items() if d >= self.n_trans]

    def free_slots(self):
        return [s for s in range(self.slots) if s not in self.steps_done]

    def poll(self):
        """(steps_done (S,), active (S,)) fetched FROM DEVICE — one blocking
        round-trip. The serving loop uses the host-side ``steps_done`` /
        ``finished()`` instead; this exists for tests and debugging (it must
        always agree with the host mirror)."""
        i, active = jax.device_get((self.state["i"], self.state["active"]))
        return np.asarray(i), np.asarray(active)

    def finish(self, slot: int) -> np.ndarray:
        """Fetch a finished slot's image (H, W, C) and free the slot."""
        img = np.asarray(jax.device_get(self._fetch_fn(self.state, slot)))
        self.state = self._release_fn(self.state, slot)
        del self.steps_done[slot]
        return img

    # -- convenience driver (tests, batch use) ------------------------------

    def run_jobs(self, jobs):
        """Drive a FIFO list of ``(key, class_id)`` jobs to completion and
        return their images in submission order. Admits greedily into free
        slots between advances — the same scheduling the serving loop runs."""
        pending = list(enumerate(jobs))
        results: dict[int, np.ndarray] = {}
        slot_owner: dict[int, int] = {}
        while pending or slot_owner:
            wave = {}
            if self.can_admit_cached():
                for slot in self.free_slots():
                    if not pending:
                        break
                    job_id, (key, class_id) = pending.pop(0)
                    wave[slot] = (key, class_id)
                    slot_owner[slot] = job_id
            self.admit_many(wave)
            self.advance()
            done = self.finished()
            for slot, img in zip(done, self.finish_many(done)):
                results[slot_owner.pop(slot)] = img
        return [results[j] for j in range(len(jobs))]
