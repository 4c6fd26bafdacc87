"""Training orchestration (TPU re-design of reference trainer.py:25-407).

Differences from the reference driven by the TPU execution model:
  - one jitted, buffer-donated ``train_step`` (forward+loss+grad+AdamW) per
    step instead of eager per-op dispatch,
  - batch sharded over the mesh "data" axis; optional tensor parallelism over
    "model" (the reference is single-device, SURVEY.md §2b),
  - native bf16 compute under ``--use_amp`` — no GradScaler (bf16 needs no
    loss scaling; the reference's scaler state has no TPU equivalent),
  - determinism via explicit PRNG threading: step key = fold_in(seed, step)
    (replaces reference's per-step global reseed, trainer.py:262),
  - in-training sampling runs the on-device lax.scan sampler (the reference
    nests a 1000-step host loop inside training, trainer.py:225).
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from duodiff_tpu.config import UViTConfig
from duodiff_tpu.data import get_dataloader
from duodiff_tpu.diffusion import NoiseSchedule, ddpm_sample
from duodiff_tpu.models.early_exit import init_early_exit_uvit
from duodiff_tpu.models.uvit import init_uvit
from duodiff_tpu.parallel import (
    batch_sharding,
    create_hybrid_mesh,
    create_mesh,
    fsdp_shard_params,
    opt_state_shardings,
    replicate,
    shard_params,
)
from duodiff_tpu.training.checkpointer import Checkpointer
from duodiff_tpu.training.train_state import (
    TrainState,
    create_train_state,
    make_optimizer,
    make_train_step,
)
from duodiff_tpu.utils.image import make_grid
from duodiff_tpu.utils.runtime import setup_compilation_cache
from duodiff_tpu.utils.train_utils import MetricsLogger


class Trainer:
    """``Trainer(args).train()`` with the reference flag surface
    (reference main.py:10-194)."""

    def __init__(self, args):
        setup_compilation_cache()
        self.args = args
        self.log_path = Path(args.log_path) / args.exp_name
        self.log_path.mkdir(parents=True, exist_ok=True)

        n_devices = jax.device_count()
        mp = max(1, getattr(args, "model_parallel", 1) or 1)
        if jax.process_count() > 1:
            # multi-host (jax.distributed initialized before Trainer): DCN
            # axis outermost, TP inside each host over ICI
            self.mesh = create_hybrid_mesh(model_parallel=mp)
            batch_shards = (
                self.mesh.shape["dcn"] * self.mesh.shape["data"]
            )
            if args.batch_size % batch_shards:
                raise ValueError(
                    f"batch_size {args.batch_size} must be divisible by the "
                    f"{batch_shards} data shards of mesh "
                    f"{dict(self.mesh.shape)}"
                )
        else:
            if n_devices % mp:
                raise ValueError(
                    f"--model_parallel {mp} does not divide "
                    f"{n_devices} devices"
                )
            # data axis must divide the global batch; drop to the largest
            # divisor
            data_size = n_devices // mp
            while args.batch_size % data_size != 0:
                data_size -= 1
            if data_size != n_devices // mp:
                print(
                    f"batch_size {args.batch_size} not divisible by "
                    f"{n_devices // mp} data shards; using {data_size}-way "
                    "data parallelism"
                )
            self.mesh = create_mesh(
                shape=(data_size, mp),
                devices=jax.devices()[:data_size * mp],
            )
        print(f"Training on mesh {dict(self.mesh.shape)} ({n_devices} devices)")

        self.compute_dtype = (
            jnp.bfloat16
            if getattr(args, "use_amp", False)
            and getattr(args, "amp_dtype", "bfloat16") == "bfloat16"
            else jnp.float32
        )

        self.model_config = UViTConfig.from_dict(vars(args))
        self.schedule = NoiseSchedule.create(steps=args.num_timesteps)

        self._init_model()
        self._init_teacher()
        self._init_data()
        self._init_optimizer()
        self._init_autoencoder()

        self.checkpointer = Checkpointer(
            args.log_path,
            args.exp_name,
            save_name=getattr(args, "save_checkpoint_path", None),
            dataset=args.dataset,
            model=args.model,
            use_async=bool(getattr(args, "async_checkpoint", False)),
        )
        # multi-host: every process shares the same log_path (common
        # filesystem — required: Checkpointer.save is an orbax collective
        # keyed by the directory), but only process 0 writes metrics files
        self.logger = MetricsLogger(
            self.log_path, enabled=jax.process_index() == 0
        )
        self.logger.log_hparams(vars(args))

        self.start_step = 0
        self._maybe_resume()

        self._train_step = self._build_train_step()
        self._sample_fn = None  # compiled lazily on first log

    # ------------------------------------------------------------------
    # init pieces
    # ------------------------------------------------------------------

    @staticmethod
    def _check_attn_impl_for_training(attn_impl: str) -> None:
        if attn_impl == "fused_int8":
            raise ValueError(
                "attn_impl 'fused_int8' is a sampling-only path (no "
                "backward); train with 'fused'/'pallas'/'xla' and pass "
                "--attn_impl fused_int8 to the sampling CLIs instead"
            )

    def _init_model(self):
        args = self.args
        key = jax.random.PRNGKey(args.seed)
        # Training default: the fully fused Pallas sublayer kernels with
        # hand-written backwards (recompute-softmax attention bwd + the
        # row/hidden-chunked MLP bwd with VMEM-resident fp32 dW accumulators)
        # — measured 111.9 ms/step vs 117.8 (flash-attn custom VJP, unfused
        # MLP) and 172.1 (pure XLA) at CelebA-64 batch 128
        # (tools/microbench.py train, 2026-08-16).
        tp = self.mesh.shape.get("model", 1) > 1
        attn_impl = getattr(args, "attn_impl", None) or (
            "fused" if jax.default_backend() == "tpu" and not tp else "auto"
        )
        self._check_attn_impl_for_training(attn_impl)
        # TP x fused: the heads-layout weight shards feed the fused kernels
        # directly inside shard_map (parallel/tp_fused.py) — zero per-step
        # weight collectives, only the two Megatron row-parallel psums
        # (asserted on compiled HLO in tests/test_tp_fused.py)
        tp_mesh = self.mesh if (tp and attn_impl == "fused") else None
        gelu_approx = getattr(args, "gelu", "exact") == "tanh"
        # Tensor parallelism: store attention params in the "heads" layout
        # (explicit head axis) so the mesh rules shard whole heads —
        # Megatron-style column/row parallelism with only the proj/fc2 psums
        # as collectives. The packed layout's column shards cross q/k/v
        # boundaries and force GSPMD weight all-gathers (parallel/mesh.py).
        self.qkv_layout = (
            "heads" if self.mesh.shape.get("model", 1) > 1 else "packed"
        )
        use_checkpoint = bool(getattr(args, "use_checkpoint", False))
        if args.model == "uvit":
            self.model, params = init_uvit(
                self.model_config, key, dtype=self.compute_dtype,
                attn_impl=attn_impl, gelu_approx=gelu_approx,
                qkv_layout=self.qkv_layout, use_checkpoint=use_checkpoint,
                tp_mesh=tp_mesh,
            )
        elif args.model == "deediff_uvit":
            self.model, params = init_early_exit_uvit(
                self.model_config, key, dtype=self.compute_dtype,
                attn_impl=attn_impl, gelu_approx=gelu_approx,
                qkv_layout=self.qkv_layout, use_checkpoint=use_checkpoint,
                tp_mesh=tp_mesh,
            )
            if getattr(args, "load_backbone", None):
                print(f"Loading backbone from {args.load_backbone}")
                from duodiff_tpu.utils.param_layout import qkv_heads_to_packed

                ref_tree = params["uvit"]
                if self.qkv_layout == "heads":
                    # checkpoints store the packed layout; load against a
                    # packed template, then un-flatten
                    ref_tree = qkv_heads_to_packed(
                        ref_tree, self.model_config.num_heads
                    )
                backbone = load_params_flexible(args.load_backbone, ref_tree)
                if self.qkv_layout == "heads":
                    from duodiff_tpu.utils.param_layout import (
                        qkv_packed_to_heads,
                    )

                    backbone = qkv_packed_to_heads(
                        backbone, self.model_config.num_heads
                    )
                params = dict(params)
                params["uvit"] = backbone
        else:
            raise ValueError(f"Unknown model {args.model}")

        # place params according to the mesh partition rules; --fsdp
        # additionally shards every large leaf over the "data" axis
        # (ZeRO-3 via GSPMD: all-gather on use, reduce-scatter grads) —
        # opt_state_shardings/_place_state then spread Adam mu/nu and the
        # EMA shadow the same way, so the whole train-state memory scales
        # down with the data-parallel degree
        if getattr(args, "fsdp", False):
            self.param_shardings = fsdp_shard_params(
                params, self.mesh,
                min_size=getattr(args, "fsdp_min_size", 16384),
            )
        else:
            self.param_shardings = shard_params(params, self.mesh)
        self.params = jax.device_put(params, self.param_shardings)

    def _init_teacher(self):
        """Optional distillation teacher (a frozen full-depth UViT); see
        make_train_step's distillation docs."""
        args = self.args
        self.teacher = None
        self.teacher_params = None
        cfg_path = getattr(args, "distill_config", None)
        if not cfg_path:
            return
        assert args.model == "uvit", "distillation targets a plain UViT student"
        from duodiff_tpu.utils.model_loading import load_model_from_config

        self.teacher, self.teacher_params, _, _ = load_model_from_config(
            cfg_path,
            getattr(args, "distill_from", None),
            seed=args.seed + 1,
            dtype=self.compute_dtype,
        )
        if not getattr(args, "distill_from", None):
            print("WARNING: random-init teacher (--distill_from not given)")
        self.teacher_params = jax.device_put(
            self.teacher_params, replicate(self.mesh)
        )
        print(f"Distilling from {cfg_path} "
              f"(alpha={args.distill_alpha}, t_min={args.distill_t_min})")

    def _init_data(self):
        args = self.args
        self.dataloader = get_dataloader(
            args.dataset, args.batch_size, args.seed, args.data_path,
            cache_data=getattr(args, "cache_data", False),
        )
        # the reference only consumes labels for imagenet (trainer.py:311
        # there: `batch[1] if "imagenet" in dataset else None`) — keep that,
        # but ALSO feed labels whenever the model is class-conditional: all
        # loaders return label batches, and a num_classes>0 model on e.g.
        # CIFAR-10 would otherwise silently train unconditioned (no
        # reference config hits this case, so parity is unaffected)
        self.has_labels = (
            "imagenet" in args.dataset or self.model_config.num_classes > 0
        )

    def _init_optimizer(self):
        args = self.args
        grad_accum = getattr(args, "grad_accum", 1) or 1
        if grad_accum > 1 and args.n_steps % grad_accum:
            raise ValueError(
                f"--n_steps {args.n_steps} must be a multiple of "
                f"--grad_accum {grad_accum}"
            )
        tx = make_optimizer(
            lr=args.lr,
            weight_decay=args.weight_decay,
            beta1=args.beta1,
            beta2=args.beta2,
            max_grad_norm=args.max_grad_norm,
            # schedule positions count optimizer updates (data steps
            # divided by the accumulation factor)
            num_warmup_steps=args.num_warmup_steps,
            num_training_steps=max(args.n_steps // grad_accum, 1),
            skip_nonfinite=getattr(args, "skip_nonfinite", 0) or 0,
            grad_accum=grad_accum,
        )
        if args.model == "deediff_uvit" and getattr(args, "freeze_backbone", False):
            print("Freezing the backbone...")

            def label_fn(params):
                return {
                    k: jax.tree_util.tree_map(
                        lambda _: "frozen" if k == "uvit" else "trainable", v
                    )
                    for k, v in params.items()
                }

            tx = optax.multi_transform(
                {"trainable": tx, "frozen": optax.set_to_zero()}, label_fn
            )
        self.tx = tx
        self.state = self._place_state(
            create_train_state(
                self.params, tx, ema_decay=getattr(args, "ema_decay", 0.0) or 0.0
            )
        )

    def _place_batch(self, batch, bshard, lshard):
        """Commit a host batch to the mesh. Single-process: plain
        device_put. Multi-process: every process loaded the SAME global
        batch (the data sampler is seeded identically), so each contributes
        its local row range of the ("dcn", "data")-sharded batch via
        make_array_from_process_local_data — the assembled global array is
        what the jitted step consumes."""
        if jax.process_count() == 1:
            return {
                "image": jax.device_put(batch["image"], bshard),
                "label": jax.device_put(batch["label"], lshard),
            }
        n = jax.process_count()
        p = jax.process_index()
        b = batch["image"].shape[0]
        local = b // n
        sl = slice(p * local, (p + 1) * local)
        return {
            "image": jax.make_array_from_process_local_data(
                bshard, np.ascontiguousarray(batch["image"][sl])
            ),
            "label": jax.make_array_from_process_local_data(
                lshard, np.ascontiguousarray(batch["label"][sl])
            ),
        }

    def _place_state(self, state):
        """Commit every train-state leaf to the mesh: params per the partition
        rules, Adam mu/nu sharded like their params (so TP shards its
        optimizer memory too), scalars/step replicated."""
        rep = replicate(self.mesh)
        opt_shardings = opt_state_shardings(
            state.opt_state, state.params, self.param_shardings, self.mesh
        )
        return state.replace(
            step=jax.device_put(state.step, rep),
            params=jax.device_put(state.params, self.param_shardings),
            opt_state=jax.device_put(state.opt_state, opt_shardings),
            ema_params=jax.device_put(state.ema_params, self.param_shardings)
            if state.ema_params is not None
            else None,
        )

    def _init_autoencoder(self):
        """Frozen KL autoencoder for latent-space imagenet256
        (reference trainer.py:46-51,266-269)."""
        self.encode_fn = None
        ae_path = getattr(self.args, "autoencoder_checkpoint_path", None)
        if ae_path:
            from duodiff_tpu.config import AutoencoderConfig
            from duodiff_tpu.models.autoencoder import load_autoencoder

            # YAML autoencoder-block overrides (ch, ch_mult, ...) arrive on
            # args via merge_args_with_config (reference main.py:207-208)
            ae_cfg = AutoencoderConfig.from_dict(vars(self.args))
            ae_model, ae_params = load_autoencoder(
                ae_path, dtype=self.compute_dtype, config=ae_cfg
            )
            ae_params = jax.device_put(ae_params, replicate(self.mesh))

            def encode(key, images):
                return ae_model.apply(
                    {"params": ae_params}, images, key, method=ae_model.encode
                )

            self.encode_fn = jax.jit(encode)

    def _maybe_resume(self):
        args = self.args
        ckpt_path = getattr(args, "load_checkpoint_path", None)
        if ckpt_path is None and getattr(args, "resume", False):
            ckpt_path = self.checkpointer.last_checkpoint()
        if ckpt_path is None:
            return
        print(f"Loading training state from {ckpt_path}")
        template = {
            "step": np.asarray(0),
            "params": self.state.params,
            "opt_state": self.state.opt_state,
            "sampler_state": self.dataloader.get_state(),
        }
        if self.state.ema_params is not None:
            template["ema_params"] = self.state.ema_params
        try:
            restored = self.checkpointer.restore(ckpt_path, template)
        except Exception:
            if "ema_params" not in template:
                raise
            # checkpoint predates --ema_decay: restore without EMA and seed
            # the EMA from the restored params below
            del template["ema_params"]
            restored = self.checkpointer.restore(ckpt_path, template)
            print("Checkpoint has no EMA params; starting EMA from the "
                  "restored params")
            restored["ema_params"] = jax.tree_util.tree_map(
                jnp.copy, restored["params"]
            )
        self.state = self._place_state(
            self.state.replace(
                step=jnp.asarray(int(restored["step"]), jnp.int32),
                params=restored["params"],
                opt_state=restored["opt_state"],
                ema_params=restored.get("ema_params", self.state.ema_params),
            )
        )
        self.dataloader.set_state(restored["sampler_state"])
        self.start_step = int(restored["step"])

    def _build_train_step(self):
        args = self.args
        model = self.model

        def apply_fn(params, x, t, y):
            return model.apply({"params": params}, x, t, y)

        teacher_apply = None
        if self.teacher is not None:
            teacher = self.teacher

            def teacher_apply(p, x, t, y):
                return teacher.apply({"params": p}, x, t, y)

        label_dropout = getattr(args, "label_dropout", 0.0) or 0.0
        if label_dropout > 0.0:
            if not self.has_labels or self.model_config.num_classes <= 0:
                raise ValueError(
                    "--label_dropout needs a class-conditional model "
                    "(num_classes > 0); it would silently be a no-op here"
                )
            # upstream U-ViT convention: the LAST embedding slot is the
            # null/unconditional token. Only configs that RESERVE it (e.g.
            # num_classes: 1001 for 1000 real classes, as the reference's
            # imagenet256 configs do) can train CFG — with num_classes ==
            # the real class count, the 'null' would alias the last class
            # and corrupt that class's conditioning for the whole run.
            real_classes = getattr(
                getattr(self.dataloader, "dataset", None), "class_to_idx", None
            )
            if (real_classes is not None
                    and self.model_config.num_classes <= len(real_classes)):
                raise ValueError(
                    f"--label_dropout needs num_classes > the dataset's real "
                    f"class count ({len(real_classes)}) so the null token "
                    f"gets its own embedding slot; this config has "
                    f"num_classes={self.model_config.num_classes}, which "
                    f"would alias the null token onto real class "
                    f"{self.model_config.num_classes - 1} (use e.g. "
                    f"num_classes: {len(real_classes) + 1})"
                )
            print(
                f"label_dropout={label_dropout}: using null label "
                f"{self.model_config.num_classes - 1}. Make sure the config "
                "reserves this embedding slot beyond the real classes "
                "(e.g. num_classes: 1001 for ImageNet's 1000)."
            )
        step_fn = make_train_step(
            apply_fn,
            self.schedule,
            model_kind=args.model,
            parametrization=args.parametrization,
            use_unweighted_loss=getattr(args, "use_unweighted_loss", False),
            has_labels=self.has_labels,
            teacher_apply=teacher_apply,
            distill_alpha=getattr(args, "distill_alpha", 1.0),
            t_min=getattr(args, "distill_t_min", 0) or 0,
            label_dropout=label_dropout,
            null_label=self.model_config.num_classes - 1,
        )
        return jax.jit(step_fn, donate_argnums=(0,))

    # ------------------------------------------------------------------
    # the loop
    # ------------------------------------------------------------------

    def train(self):
        args = self.args
        base_key = jax.random.PRNGKey(args.seed)
        bshard = batch_sharding(self.mesh)
        lshard = batch_sharding(self.mesh, ndim=1)

        # preemption safety: SIGTERM requests a checkpoint-and-exit at the
        # next step boundary instead of killing the process mid-save
        # (managed TPU slices are evicted with SIGTERM + a grace window)
        self._preempted = False
        prev_handler = None
        import signal
        import threading

        def _on_sigterm(signum, frame):
            self._preempted = True

        in_main_thread = threading.current_thread() is threading.main_thread()
        if in_main_thread:
            prev_handler = signal.signal(signal.SIGTERM, _on_sigterm)
        try:
            return self._train_loop(base_key, bshard, lshard)
        finally:
            # restore even when the loop raises — a leaked handler would
            # make later SIGTERMs set a dead trainer's flag instead of
            # terminating the process
            if in_main_thread:
                signal.signal(signal.SIGTERM, prev_handler)
            # release run-scoped resources (TB writer threads, jsonl fd,
            # async-checkpoint threads). Without this, every in-process
            # train (supervisor restarts, notebooks, test suites) leaks
            # ~4 threads + open files until a native abort — the round-4
            # slow-suite SIGABRT.
            self.close()

    def close(self) -> None:
        """Release everything the Trainer owns that outlives a train step:
        the metrics logger (TB event-writer threads + jsonl fd) and the
        checkpointer (in-flight async saves + orbax worker threads).
        Idempotent; called automatically when ``train()`` exits."""
        self.logger.close()
        self.checkpointer.close()

    def _train_loop(self, base_key, bshard, lshard):
        logs = []
        # background prefetch overlaps host decode with the device step;
        # get_state() stays checkpoint-exact (last *consumed* batch).
        # Closed in the finally below — the generator's own finally stops
        # and joins the producer thread (data/loader.py) — so every train
        # run, including raising ones, is producer-thread-clean.
        batch_iterator = self.dataloader.prefetching_iterator()
        try:
            self._run_steps(batch_iterator, base_key, bshard, lshard, logs)
        finally:
            batch_iterator.close()
        # commit any in-flight async save before returning
        self.checkpointer.wait_until_finished()
        return logs

    def _run_steps(self, batch_iterator, base_key, bshard, lshard, logs):
        args = self.args
        t_last = time.time()
        profiler_active = False
        for step in range(self.start_step + 1, args.n_steps + 1):
            if getattr(args, "profile", False):
                if step == self.start_step + 3 and not profiler_active:
                    jax.profiler.start_trace(str(self.log_path / "profile"))
                    profiler_active = True
                elif step == self.start_step + 9 and profiler_active:
                    jax.block_until_ready(self.state.params)
                    jax.profiler.stop_trace()
                    profiler_active = False
                    print(f"profile trace written to {self.log_path / 'profile'}")
            batch = next(batch_iterator)
            device_batch = self._place_batch(batch, bshard, lshard)
            if self.encode_fn is not None:
                enc_key = jax.random.fold_in(
                    jax.random.fold_in(base_key, step), 7
                )
                device_batch["image"] = self.encode_fn(
                    enc_key, device_batch["image"]
                )

            step_key = jax.random.fold_in(base_key, step)
            self.state, metrics = self._train_step(
                self.state, device_batch, step_key, self.teacher_params
            )

            if step % 50 == 0 or step == args.n_steps or step == self.start_step + 1:
                metrics = {k: float(v) for k, v in metrics.items()}
                dt = time.time() - t_last
                t_last = time.time()
                metrics["steps_per_sec"] = (
                    50 / dt if step % 50 == 0 else 1 / max(dt, 1e-9)
                )
                self.logger.log_scalars(step, metrics)
                logs.append({"step": step, **metrics})
                print(f"step {step:>7} | {metrics}")

            if args.log_every_n_steps is not None and (
                step % args.log_every_n_steps == 0 or step == args.n_steps
            ):
                self._log_samples(step)

            if (
                getattr(args, "save_every_n_steps", None)
                and step % args.save_every_n_steps == 0
            ) or step == args.n_steps:
                self._save(step, new_checkpoint=False)
            if (
                getattr(args, "save_new_every_n_steps", None) is not None
                and step % args.save_new_every_n_steps == 0
            ):
                self._save(step, new_checkpoint=True)

            if self._preempted:
                # graceful preemption (SIGTERM, e.g. a TPU-pod eviction):
                # finish the in-flight step, persist the FULL resumable
                # state, and return cleanly — `--resume` continues from
                # exactly this step (mid-epoch data position included)
                if step % (getattr(args, "save_every_n_steps", None)
                           or step + 1) != 0 and step != args.n_steps:
                    self._save(step, new_checkpoint=False)
                print(f"preempted: saved checkpoint at step {step}, "
                      "exiting cleanly (resume with --resume)")
                break

    def _log_samples(self, step: int):
        """Periodic qualitative sampling to an image grid
        (reference trainer.py:221-245; variance mode 'beta' like
        ddpm_core.py default)."""
        args = self.args
        if self._sample_fn is None:
            from duodiff_tpu.diffusion import ChunkedDDPMSampler

            model = self.model
            is_ee = args.model == "deediff_uvit"

            # The sampler threads ``y`` opaquely to apply_fn, so we bundle
            # (labels, params) through it — params must be a traced argument
            # of the jitted chunk, NOT a closure capture (a capture would be
            # baked in at first trace and later log steps would sample from
            # stale weights).
            def apply_fn(x, t, bundle):
                labels, params = bundle
                out = model.apply({"params": params}, x, t, labels)
                return out[0] if is_ee else out

            # DeeDiff in-training sampling also logs the per-step probe
            # outputs — the reference sampler's logging_dict
            # "classifier_outputs" (ddpm_core.py:158-160) — as stacked scan
            # outputs instead of host-loop appends.
            def ee_apply_fn(x, t, bundle):
                labels, params = bundle
                out = model.apply({"params": params}, x, t, labels)
                return out

            # per-step model-output mean/std rows = the reference in-
            # training sampler's logging-dict statistics fields
            # (ddpm_core.py:106-214), stacked as scan outputs instead of
            # host-loop appends
            def _stats(o):
                return jnp.stack([
                    jnp.mean(o.astype(jnp.float32)),
                    jnp.std(o.astype(jnp.float32)),
                ])

            self._sample_fn = ChunkedDDPMSampler(
                ee_apply_fn if is_ee else apply_fn,
                self.schedule,
                parametrization="predict_noise",
                variance_mode="beta",
                aux_fn=(
                    (lambda out: (out[0],
                                  (jnp.asarray(out[1]), _stats(out[0]))))
                    if is_ee
                    else (lambda out: (out, _stats(out)))
                ),
            )

        shape = (
            args.n_samples,
            args.sample_height,
            args.sample_width,
            self.model_config.in_chans,
        )
        key = jax.random.PRNGKey(args.sample_seed)
        y = None
        if self.has_labels and self.model_config.num_classes > 0:
            y = jax.random.randint(
                key, (args.n_samples,), 0, self.model_config.num_classes
            )
        sample_params = (
            self.state.ema_params
            if self.state.ema_params is not None
            else self.state.params
        )
        out = self._sample_fn.sample(key, shape, y=(y, sample_params))
        x, aux = out
        if args.model == "deediff_uvit":
            probe_rows, stat_rows = aux  # (T, depth, B), (T, 2)
            if self.logger.enabled:
                np.save(
                    self.log_path
                    / f"sample_classifier_outputs_step{step}.npy",
                    np.asarray(probe_rows, np.float32),
                )
            self.logger.log_scalars(step, {
                "sample_mean_probe_error":
                    float(np.asarray(probe_rows).mean()),
            })
        else:
            stat_rows = aux  # (T, 2) per-step model-output mean/std
        stat_rows = np.asarray(stat_rows, np.float32)
        if self.logger.enabled:
            np.save(
                self.log_path / f"sample_stats_step{step}.npy", stat_rows
            )
        self.logger.log_scalars(step, {
            "sample_model_output_mean": float(stat_rows[:, 0].mean()),
            "sample_model_output_std": float(stat_rows[:, 1].mean()),
        })
        samples = np.asarray((x + 1.0) / 2.0)
        self.logger.log_image(step, "Samples", make_grid(samples))

    def _save(self, step: int, new_checkpoint: bool):
        self.checkpointer.save(
            step=step,
            params=self.state.params,
            opt_state=self.state.opt_state,
            ema_params=self.state.ema_params,
            sampler_state=self.dataloader.get_state(),
            args=vars(self.args),
            new_checkpoint=new_checkpoint,
        )


def load_params_flexible(path: str, template: Any, use_ema: bool = False):
    """Load a params pytree from either an Orbax checkpoint directory (raw
    params or a full train-state dict) or a reference torch ``.pth``
    checkpoint via the converter. The result is validated against
    ``template``'s tree structure and leaf shapes. ``use_ema`` loads the
    checkpoint's EMA shadow params (tracked with --ema_decay) instead of
    the live ones."""
    p = Path(path)
    if p.is_dir():
        import orbax.checkpoint as ocp

        raw = ocp.Checkpointer(ocp.PyTreeCheckpointHandler()).restore(p.resolve())
        if use_ema:
            ema = raw.get("ema_params") if isinstance(raw, dict) else None
            if not isinstance(ema, dict):
                raise ValueError(
                    f"{path} has no EMA params — the checkpoint was saved "
                    "without --ema_decay"
                )
            params = ema
        else:
            params = raw.get("params", raw) if isinstance(raw, dict) else raw
        if "uvit" in params and "uvit" not in template:
            # early-exit checkpoint providing the backbone subtree
            params = params["uvit"]
        chex_assert_same_structure(params, template)
        # --model_parallel training saves the heads attention layout;
        # single-chip checkpoints save packed. Accept either.
        from duodiff_tpu.utils.param_layout import match_attention_layout

        params = match_attention_layout(params, template)
        mismatched = [
            (jax.tree_util.keystr(kp), a.shape, t.shape)
            for (kp, a), t in zip(
                jax.tree_util.tree_flatten_with_path(params)[0],
                jax.tree_util.tree_leaves(template),
            )
            if tuple(a.shape) != tuple(t.shape)
        ]
        if mismatched:
            raise ValueError(
                "checkpoint param shapes do not match the model "
                f"(first 5): {mismatched[:5]}"
            )
        return jax.tree_util.tree_map(
            lambda a, t: jnp.asarray(a, dtype=t.dtype), params, template
        )
    if p.suffix in (".pth", ".pt", ".ckpt", ".bin"):
        if use_ema:
            raise ValueError(
                "--use_ema applies to this framework's Orbax checkpoints; "
                f"reference torch checkpoints have no EMA shadow ({path})"
            )
        from duodiff_tpu.utils.torch_convert import convert_torch_checkpoint

        return convert_torch_checkpoint(path, template)
    raise ValueError(f"Unrecognized checkpoint format: {path}")


def chex_assert_same_structure(a, b):
    ta = jax.tree_util.tree_structure(a)
    tb = jax.tree_util.tree_structure(b)
    if ta != tb:
        raise ValueError(
            f"checkpoint params structure does not match model:\n{ta}\nvs\n{tb}"
        )
