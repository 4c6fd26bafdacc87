"""Device mesh + sharding layer.

The reference has no distributed layer at all (SURVEY.md §2b: no DDP, no
torch.distributed, single device). This module is the framework's
communication backend, built the TPU way: a ``jax.sharding.Mesh`` over ICI
with named axes, parameter partition rules (Megatron-style tensor
parallelism over attention heads / MLP hidden), and batch sharding for data
parallelism. XLA GSPMD inserts the psum/all-gather collectives.

Axes:
  - "data": batch dimension (gradient psum rides this axis)
  - "model": tensor-parallel dimension (attention qkv/proj, MLP fc1/fc2)

Multi-host extension: call ``jax.distributed.initialize()`` before
``create_mesh`` and pass the global device list; the DCN axis goes outermost
by passing ``shape=(num_hosts, local, ...)``.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    shape: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = ("data", "model"),
    devices=None,
) -> Mesh:
    """Create a mesh over the available devices.

    Default: all devices on the "data" axis, "model" axis of size 1 — pure
    data parallelism, the right default for U-ViT-sized models.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} does not match {n} devices")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def create_hybrid_mesh(
    axis_names: Sequence[str] = ("dcn", "data", "model"),
    model_parallel: int = 1,
    devices=None,
) -> Mesh:
    """Multi-host mesh: the slowest axis ("dcn") spans processes/slices, the
    inner axes span each host's local devices over ICI — so data-parallel
    gradient psums decompose into a fast ICI reduce + a small DCN
    all-reduce, and tensor-parallel collectives never leave a host.

    Call ``jax.distributed.initialize()`` first; with one process this
    degenerates to a (1, local, model_parallel) mesh.
    """
    devices = devices if devices is not None else jax.devices()
    n_proc = jax.process_count()
    n = len(devices)
    assert n % n_proc == 0, (n, n_proc)
    local = n // n_proc
    assert local % model_parallel == 0, (local, model_parallel)
    # jax.devices() orders by process index, so a simple reshape puts each
    # process's devices contiguous on the inner axes (DCN outermost).
    dev_array = np.asarray(devices).reshape(
        n_proc, local // model_parallel, model_parallel
    )
    return Mesh(dev_array, axis_names)


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard the leading (batch) dimension over every non-"model" mesh axis
    (("dcn", "data") on a hybrid mesh, "data" on a single-host mesh)."""
    axes = tuple(a for a in mesh.axis_names if a != "model")
    batch_axes = axes if len(axes) > 1 else axes[0]
    return NamedSharding(mesh, P(batch_axes, *([None] * (ndim - 1))))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Partition rules: (regex on the param path, PartitionSpec).
# Column-parallel: qkv + mlp fc1 (shard output features over "model").
# Row-parallel: attention proj + mlp fc2 (shard input features; XLA inserts
# the psum on the "model" axis after the matmul).
#
# The attention specs are rank-dispatched (see param_sharding_rules) because
# the attention projections have two storage layouts
# (models/layers._QKVProj): "packed" qkv (D, 3D) / proj (D, D), and "heads"
# qkv (D, 3, H, Dh) / proj (H, Dh, D). The heads layout shards the explicit
# head axis, so every device holds whole heads with their q, k AND v columns
# — true Megatron-style TP. A column shard of the packed (D, 3D) kernel
# crosses the q/k/v boundaries, forcing GSPMD to all-gather; it is kept only
# as the correct-but-slower fallback for packed-layout params on a TP mesh.
_TP_RULES = (
    (r".*attn/qkv/kernel$", {2: P(None, "model"),
                             4: P(None, None, "model", None)}),
    (r".*attn/qkv/bias$", {1: P("model"), 3: P(None, "model", None)}),
    (r".*attn/proj/kernel$", {2: P("model", None),
                              3: P("model", None, None)}),
    (r".*mlp/fc1/kernel$", P(None, "model")),
    (r".*mlp/fc1/bias$", P("model")),
    (r".*mlp/fc2/kernel$", P("model", None)),
    # time-embed MLP (4x hidden) when present
    (r".*time_embed/fc1/kernel$", P(None, "model")),
    (r".*time_embed/fc2/kernel$", P("model", None)),
)

# Stacked early-exit heads/probes carry a leading depth axis (nn.vmap
# stacking, models/early_exit.py); same column/row split shifted by one dim.
# decoder_pred contracts D -> row-parallel on dim 1 (psum after); the
# attention-probe kv/fc1 are column-parallel, cls_fc2 row-parallel.
_TP_RULES_STACKED = (
    (r".*heads/decoder_pred/kernel$", P(None, "model", None)),
    (r".*probes/weight_kv/kernel$", P(None, None, "model")),
    (r".*probes/weight_kv/bias$", P(None, "model")),
    (r".*probes/cls_fc1/kernel$", P(None, None, "model")),
    (r".*probes/cls_fc1/bias$", P(None, "model")),
    (r".*probes/cls_fc2/kernel$", P(None, "model", None)),
)


def param_sharding_rules(path: str, ndim: Optional[int] = None) -> P:
    """PartitionSpec for one parameter path (joined with '/').

    Rank-dispatched rules (dict spec) pick by ``ndim`` — the attention
    projections exist in two layouts with different ranks; with ndim=None
    the lowest-rank (packed-layout) spec is returned."""
    for pattern, spec in _TP_RULES_STACKED:
        if re.match(pattern, path):
            return spec
    for pattern, spec in _TP_RULES:
        if re.match(pattern, path):
            if isinstance(spec, dict):
                if ndim is not None:
                    return spec.get(ndim, P())
                return spec[min(spec)]
            return spec
    return P()  # replicated


def shard_params(params, mesh: Mesh):
    """Compute a NamedSharding pytree for a parameter pytree."""

    def path_str(path) -> str:
        return "/".join(
            p.key if hasattr(p, "key") else str(p) for p in path
        )

    def spec_for(path, leaf):
        spec = param_sharding_rules(path_str(path), ndim=leaf.ndim)
        # guard: rank/divisibility mismatch -> replicate
        if len(spec) > leaf.ndim:
            return NamedSharding(mesh, P())
        for dim, axis in enumerate(spec):
            if axis is not None:
                axis_size = mesh.shape[axis]
                if leaf.shape[dim] % axis_size != 0:
                    return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(spec_for, params)


def fsdp_shard_params(params, mesh: Mesh, min_size: int = 16384):
    """ZeRO-3-style (FSDP) parameter sharding over the "data" axis.

    The reference trains single-device and replicates nothing
    (SURVEY.md §2b); on a TPU mesh the standard JAX recipe for sharding
    parameter + optimizer memory is to annotate the weights themselves over
    the data axis and let GSPMD insert the collectives: weight shards are
    all-gathered just before use and gradients reduce-scattered instead of
    all-reduced, so per-device param/Adam-state bytes shrink ~linearly in
    the data-axis size while the math is unchanged.

    Composes with the Megatron TP rules: each leaf starts from its
    ``param_sharding_rules`` spec, then its largest still-unsharded
    dimension divisible by the data-axis size additionally gets "data".
    Leaves smaller than ``min_size`` elements keep their TP-only spec —
    gathering tiny LN/bias tensors costs collective latency and saves
    nothing. On a hybrid multi-host mesh only the intra-host "data" axis is
    used (weight all-gathers ride ICI, never DCN).
    """
    data_size = mesh.shape.get("data", 1)
    model_size = mesh.shape.get("model", 1)

    def path_str(path) -> str:
        return "/".join(
            p.key if hasattr(p, "key") else str(p) for p in path
        )

    def spec_for(path, leaf):
        spec = param_sharding_rules(path_str(path), ndim=leaf.ndim)
        entries = list(spec) + [None] * (leaf.ndim - len(spec))
        if len(entries) > leaf.ndim:
            entries = [None] * leaf.ndim
        for dim, axis in enumerate(entries):
            if axis is None:
                continue
            # a size-1 "model" axis shards nothing: free the dim for fsdp
            if axis == "model" and model_size == 1:
                entries[dim] = None
            elif leaf.shape[dim] % mesh.shape[axis] != 0:
                entries = [None] * leaf.ndim
                break
        if data_size > 1 and leaf.size >= min_size:
            best = None
            for dim in range(leaf.ndim):
                if entries[dim] is None and leaf.shape[dim] % data_size == 0:
                    if best is None or leaf.shape[dim] > leaf.shape[best]:
                        best = dim
            if best is not None:
                entries[best] = "data"
        return NamedSharding(mesh, P(*entries))

    return jax.tree_util.tree_map_with_path(spec_for, params)


def opt_state_shardings(opt_state, params, param_shardings, mesh: Mesh):
    """Shardings for an optax state: any subtree structured like ``params``
    (Adam's mu/nu, EMA copies) gets the parameter shardings; everything else
    (step counts, schedule state) is replicated.

    Walks optax's namedtuple/tuple/dict containers structurally — masked or
    otherwise reshaped inner states that no longer match the param treedef
    simply fall back to replication (the pre-TP behavior)."""
    params_treedef = jax.tree_util.tree_structure(params)
    rep = NamedSharding(mesh, P())

    def params_like(node) -> bool:
        try:
            return jax.tree_util.tree_structure(node) == params_treedef
        except Exception:
            return False

    def go(node):
        if params_like(node):
            return param_shardings
        if isinstance(node, tuple):  # incl. optax namedtuple states
            mapped = [go(c) for c in node]
            return type(node)(*mapped) if hasattr(node, "_fields") else \
                type(node)(mapped)
        if isinstance(node, dict):
            return {k: go(v) for k, v in node.items()}
        return rep

    return go(opt_state)


def sampling_mesh(model_parallel: int, batch_size: int) -> Mesh:
    """The (data, model) sampling mesh for --model_parallel, with the CLI
    divisibility validation (shared so the model build can receive the
    mesh BEFORE setup_sampling_sharding places the params — the TP x fused
    shard_map path needs it at module construction, parallel/tp_fused.py).
    """
    n = jax.device_count()
    if n % model_parallel:
        raise SystemExit(
            f"--model_parallel {model_parallel} does not divide "
            f"{n} devices"
        )
    data_size = n // model_parallel
    if batch_size % data_size:
        raise SystemExit(
            f"batch_size {batch_size} must be divisible by the "
            f"{data_size} data shards"
        )
    return create_mesh(shape=(data_size, model_parallel))


def setup_sampling_sharding(model_parallel: int, batch_size: int, param_trees,
                            mesh: Optional[Mesh] = None):
    """Shared CLI setup for sharded sampling (sampler.py / eesampler.py).

    With ``model_parallel > 1`` builds the (data, model) mesh (or reuses a
    prebuilt ``mesh``), validates divisibility, and re-places every tree in
    ``param_trees`` under the Megatron partition specs; otherwise falls
    back to pure data-parallel batch sharding when the batch divides the
    device count. Returns ``(batch_sharding_or_None, [re-placed param
    trees])``.
    """
    n = jax.device_count()
    if model_parallel > 1:
        mesh = mesh or sampling_mesh(model_parallel, batch_size)
        trees = [
            jax.device_put(p, shard_params(p, mesh)) for p in param_trees
        ]
        print(f"Sampling on mesh {dict(mesh.shape)}")
        return batch_sharding(mesh), trees
    if n > 1 and batch_size % n == 0:
        print(f"Sharding batch {batch_size} over {n} devices")
        return batch_sharding(create_mesh()), list(param_trees)
    return None, list(param_trees)
