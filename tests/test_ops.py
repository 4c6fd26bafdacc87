"""Attention op tests: XLA path golden vs numpy, Pallas kernel (interpret
mode on CPU) vs the XLA path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from duodiff_tpu.ops.attention import multi_head_attention, xla_attention


def _np_sdpa(q, k, v):
    scale = q.shape[-1] ** -0.5
    s = np.einsum("bhqd,bhkd->bhqk", q, k) * scale
    s = s - s.max(axis=-1, keepdims=True)
    p = np.exp(s)
    p = p / p.sum(axis=-1, keepdims=True)
    return np.einsum("bhqk,bhkd->bhqd", p, v)


@pytest.fixture
def qkv():
    rng = np.random.RandomState(0)
    shape = (2, 3, 17, 8)
    return tuple(rng.randn(*shape).astype(np.float32) for _ in range(3))


def test_xla_attention_matches_numpy(qkv):
    q, k, v = qkv
    got = np.asarray(xla_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    want = _np_sdpa(q, k, v)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_pallas_attention_matches_xla_interpret(qkv):
    from duodiff_tpu.ops.pallas_attention import flash_attention

    q, k, v = (jnp.asarray(a) for a in qkv)
    got = np.asarray(flash_attention(q, k, v, interpret=True))
    want = np.asarray(xla_attention(q, k, v))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_pallas_attention_bf16_inputs(qkv):
    from duodiff_tpu.ops.pallas_attention import flash_attention

    q, k, v = (jnp.asarray(a, jnp.bfloat16) for a in qkv)
    out = flash_attention(q, k, v, interpret=True)
    assert out.dtype == jnp.bfloat16  # writes in activation dtype
    got = np.asarray(out, dtype=np.float32)
    want = _np_sdpa(*(np.asarray(a, np.float32) for a in qkv))
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-2)


@pytest.mark.parametrize("h,d,l,b", [
    (2, 64, 9, 2),     # dh=32, tiny L
    # odd batch (grp=1 fallback): the largest interpret-mode geometry — CI
    # (-m slow) keeps it; the default set keeps the four cheaper edges
    pytest.param(16, 256, 33, 5, marks=pytest.mark.slow),
    (4, 128, 128, 4),  # lane-aligned L
    (2, 64, 257, 2),   # flagship L: bulk-256 + 1-token-tail sdpa split
    (2, 64, 258, 2),   # class-cond L: 2-token tail
])
def test_fused_sublayer_geometries(h, d, l, b):
    """The batch-grid kernel must be correct for any (heads, dim, L, B) —
    the lane slices and group-size selection are geometry-sensitive."""
    from duodiff_tpu.models.layers import Block

    x = jax.random.normal(jax.random.PRNGKey(1), (b, l, d), jnp.float32)

    def run(impl):
        blk = Block(num_heads=h, dtype=jnp.float32, attn_impl=impl)
        params = blk.init(jax.random.PRNGKey(0), x)["params"]
        return blk.apply({"params": params}, x)

    np.testing.assert_allclose(
        np.asarray(run("fused")), np.asarray(run("xla")),
        rtol=1e-5, atol=1e-5,
    )


@pytest.mark.parametrize("variant", ["v1", "v2"])
@pytest.mark.parametrize("qkv_bias", [False, True])
def test_fused_sublayer_variants_match(variant, qkv_bias):
    """Both fused-kernel grid layouts ((b,h) accumulate vs batch-only with
    an unrolled head loop) must match the XLA math."""
    from duodiff_tpu.models.layers import Attention
    from duodiff_tpu.ops.pallas_block import fused_attn_sublayer

    d, h, l, b = 128, 4, 17, 3
    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    x = jax.random.normal(keys[0], (b, l, d), jnp.float32)
    ln_s = 1.0 + 0.1 * jax.random.normal(keys[1], (d,))
    ln_b = 0.1 * jax.random.normal(keys[2], (d,))
    wqkv = 0.05 * jax.random.normal(keys[3], (d, 3 * d))
    bqkv = 0.05 * jax.random.normal(keys[4], (3 * d,)) if qkv_bias else None
    wp = 0.05 * jax.random.normal(keys[5], (d, d))
    bp = 0.05 * jax.random.normal(keys[6], (d,))

    got = fused_attn_sublayer(
        x, ln_s, ln_b, wqkv, bqkv, wp, bp,
        num_heads=h, interpret=True, variant=variant,
    )

    # reference: LN (fp32) -> Attention(xla) -> residual
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    xn = (x - mean) * jax.lax.rsqrt(var + 1e-5) * ln_s + ln_b
    attn = Attention(num_heads=h, qkv_bias=qkv_bias, dtype=jnp.float32,
                     attn_impl="xla")
    params = {"qkv": {"kernel": wqkv}, "proj": {"kernel": wp, "bias": bp}}
    if qkv_bias:
        params["qkv"]["bias"] = bqkv
    want = x + attn.apply({"params": params}, xn)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("qkv_bias", [False, True])
@pytest.mark.parametrize("skip", [False, True])
def test_fused_block_matches_xla_block(qkv_bias, skip):
    """attn_impl='fused' (LN+QKV+SDPA+proj+residual in one Pallas kernel,
    interpret mode on CPU) must match the unfused path with an identical
    parameter tree."""
    from duodiff_tpu.models.layers import Block

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 17, 128), jnp.float32)
    sk = jax.random.normal(jax.random.PRNGKey(2), (2, 17, 128), jnp.float32)
    args = (x, sk) if skip else (x,)

    def run(impl):
        blk = Block(
            num_heads=4, mlp_ratio=4, qkv_bias=qkv_bias, skip=skip,
            dtype=jnp.float32, attn_impl=impl,
        )
        params = blk.init(jax.random.PRNGKey(0), *args)["params"]
        return params, blk.apply({"params": params}, *args)

    p_ref, y_ref = run("xla")
    p_fused, y_fused = run("fused")
    assert jax.tree_util.tree_structure(p_ref) == jax.tree_util.tree_structure(
        p_fused
    )
    assert all(
        a.shape == b.shape
        for a, b in zip(
            jax.tree_util.tree_leaves(p_ref), jax.tree_util.tree_leaves(p_fused)
        )
    )
    np.testing.assert_allclose(
        np.asarray(y_fused), np.asarray(y_ref), rtol=1e-5, atol=1e-5
    )


def test_fused_block_bf16():
    from duodiff_tpu.models.layers import Block

    x32 = jax.random.normal(jax.random.PRNGKey(1), (2, 17, 128), jnp.float32)

    def run(impl, dtype):
        blk = Block(num_heads=4, dtype=dtype, attn_impl=impl)
        params = blk.init(jax.random.PRNGKey(0), x32)["params"]
        return blk.apply({"params": params}, x32.astype(dtype))

    y_ref = np.asarray(run("xla", jnp.float32))
    y_fused = np.asarray(run("fused", jnp.bfloat16), dtype=np.float32)
    np.testing.assert_allclose(y_fused, y_ref, rtol=5e-2, atol=5e-2)


def test_pallas_attention_custom_vjp_matches_xla_grads(qkv):
    """The recompute-softmax Pallas backward must match XLA's gradients."""
    from duodiff_tpu.ops.pallas_attention import flash_attention_trainable

    q, k, v = (jnp.asarray(a) for a in qkv)
    cot = jax.random.normal(jax.random.PRNGKey(3), q.shape, jnp.float32)

    def loss_ref(q, k, v):
        return jnp.sum(xla_attention(q, k, v) * cot)

    def loss_pallas(q, k, v):
        return jnp.sum(
            flash_attention_trainable(q, k, v, True).astype(jnp.float32) * cot
        )

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_pal = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_pal, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
        )


@pytest.mark.parametrize("qkv_bias", [False, True])
def test_fused_block_grads_match_xla(qkv_bias):
    """attn_impl='fused' under jax.grad: the hand-written Pallas attention
    backward + the recompute MLP backward must match XLA's gradients for
    params AND inputs."""
    from duodiff_tpu.models.layers import Block

    x = jax.random.normal(jax.random.PRNGKey(1), (3, 17, 128), jnp.float32)
    cot = jax.random.normal(jax.random.PRNGKey(2), (3, 17, 128), jnp.float32)

    def run(impl):
        blk = Block(num_heads=4, qkv_bias=qkv_bias, dtype=jnp.float32,
                    attn_impl=impl)
        params = blk.init(jax.random.PRNGKey(0), x)["params"]

        def loss(p, xx):
            return jnp.sum(blk.apply({"params": p}, xx) * cot)

        return jax.grad(loss, argnums=(0, 1))(params, x)

    gp_ref, gx_ref = run("xla")
    gp_f, gx_f = run("fused")
    for a, b in zip(
        jax.tree_util.tree_leaves(gp_f), jax.tree_util.tree_leaves(gp_ref)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_ref),
                               rtol=1e-4, atol=1e-5)


def test_block_pallas_grad_runs():
    """attn_impl='pallas' is grad-safe end to end through a Block."""
    from duodiff_tpu.models.layers import Block

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 17, 128), jnp.float32)

    def run(impl):
        blk = Block(num_heads=4, dtype=jnp.float32, attn_impl=impl)
        params = blk.init(jax.random.PRNGKey(0), x)["params"]

        def loss(p):
            return jnp.sum(blk.apply({"params": p}, x) ** 2)

        return loss(params), jax.grad(loss)(params)

    l_ref, g_ref = run("xla")
    l_pal, g_pal = run("pallas")
    np.testing.assert_allclose(float(l_pal), float(l_ref), rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_pal), jax.tree_util.tree_leaves(g_ref)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4
        )


def test_dispatch_xla_default(qkv):
    q, k, v = (jnp.asarray(a) for a in qkv)
    out_auto = multi_head_attention(q, k, v, impl="auto")
    out_xla = multi_head_attention(q, k, v, impl="xla")
    np.testing.assert_array_equal(np.asarray(out_auto), np.asarray(out_xla))


@pytest.mark.parametrize("gelu_approx", [False, True])
@pytest.mark.parametrize("l,hidden", [
    (17, 512),    # one row chunk, two hidden chunks
    (257, 512),   # flagship L: 128+129 row chunks
    # 128/128/64 row chunks, single hidden chunk: slow set (CI) — the
    # remainder-row-chunk edge; the two cheaper geometries stay default
    pytest.param(320, 128, marks=pytest.mark.slow),
])
def test_pallas_mlp_bwd_matches_xla_grads(gelu_approx, l, hidden):
    """The hand-written Pallas MLP-sublayer backward (row/hidden-chunked,
    fp32 VMEM weight-grad accumulators) must match XLA's gradients of the
    identical math for params AND inputs."""
    from duodiff_tpu.ops.pallas_block import (
        _mlp_reference,
        fused_mlp_sublayer_trainable,
        mlp_bwd_fits,
    )

    d, b = 128, 3
    assert mlp_bwd_fits(b, l, d, hidden, 4)
    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    x = jax.random.normal(keys[0], (b, l, d), jnp.float32)
    ln_s = 1.0 + 0.1 * jax.random.normal(keys[1], (d,))
    ln_b = 0.1 * jax.random.normal(keys[2], (d,))
    w1 = 0.05 * jax.random.normal(keys[3], (d, hidden))
    b1 = 0.05 * jax.random.normal(keys[4], (hidden,))
    w2 = 0.05 * jax.random.normal(keys[5], (hidden, d))
    b2 = 0.05 * jax.random.normal(keys[6], (d,))
    cot = jax.random.normal(keys[7], (b, l, d), jnp.float32)

    def loss_ref(*args):
        return jnp.sum(
            _mlp_reference(*args, eps=1e-5, gelu_approx=gelu_approx) * cot
        )

    def loss_pallas(*args):
        return jnp.sum(
            fused_mlp_sublayer_trainable(
                *args, 1e-5, gelu_approx, True
            ) * cot
        )

    argnums = tuple(range(7))
    g_ref = jax.grad(loss_ref, argnums=argnums)(x, ln_s, ln_b, w1, b1, w2, b2)
    g_pal = jax.grad(loss_pallas, argnums=argnums)(
        x, ln_s, ln_b, w1, b1, w2, b2
    )
    for name, a, bb in zip(
        ["dx", "dln_s", "dln_b", "dw1", "db1", "dw2", "db2"], g_pal, g_ref
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), rtol=2e-4, atol=2e-5,
            err_msg=name,
        )


@pytest.mark.parametrize("gelu_approx", [False, True])
@pytest.mark.parametrize("splits", [
    # splits=2 moves to the slow set (CI): the opt-in D>=768 path's split
    # arithmetic is fully exercised by splits=4 (more boundaries)
    pytest.param(2, marks=pytest.mark.slow),
    4,
])
def test_mlp_bwd_split_matches_mono(gelu_approx, splits):
    """The hidden-split MLP backward (D>=768 path: per-slice pallas calls +
    XLA LayerNorm recombination) must match the monolithic kernel to fp32
    rounding."""
    from duodiff_tpu.ops.pallas_block import (
        _mlp_sublayer_bwd_impl,
        _mlp_sublayer_bwd_split,
    )

    b, l, d, hidden = 3, 33, 64, 256
    keys = jax.random.split(jax.random.PRNGKey(1), 8)
    x = jax.random.normal(keys[0], (b, l, d))
    dy = jax.random.normal(keys[1], (b, l, d))
    ln_s = 1.0 + 0.1 * jax.random.normal(keys[2], (d,))
    ln_b = 0.1 * jax.random.normal(keys[3], (d,))
    w1 = 0.05 * jax.random.normal(keys[4], (d, hidden))
    b1 = 0.05 * jax.random.normal(keys[5], (hidden,))
    w2 = 0.05 * jax.random.normal(keys[6], (hidden, d))

    mono = _mlp_sublayer_bwd_impl(
        x, dy, ln_s, ln_b, w1, b1, w2,
        eps=1e-5, gelu_approx=gelu_approx, interpret=True, config=(1, 16, 64),
    )
    split = _mlp_sublayer_bwd_split(
        x, dy, ln_s, ln_b, w1, b1, w2,
        eps=1e-5, gelu_approx=gelu_approx, interpret=True,
        config=(splits, 16, 64),
    )
    names = ["dx", "dln_s", "dln_b", "dw1", "db1", "dw2", "db2"]
    for name, a, m in zip(names, split, mono):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(m), rtol=1e-5, atol=1e-5, err_msg=name,
        )


def test_attn_bwd_xla_fallback_matches_pallas(monkeypatch):
    """When attn_bwd_fits says the VMEM residents don't fit (D>=768 models),
    _attn_sublayer_bwd must fall back to the XLA recompute backward through
    _attn_sublayer_reference with gradients matching the Pallas kernel."""
    from duodiff_tpu.ops import pallas_block as pb

    b, l, d, h = 3, 33, 64, 4
    keys = jax.random.split(jax.random.PRNGKey(2), 8)
    x = jax.random.normal(keys[0], (b, l, d))
    dy = jax.random.normal(keys[1], (b, l, d))
    ln_s = 1.0 + 0.1 * jax.random.normal(keys[2], (d,))
    ln_b = 0.1 * jax.random.normal(keys[3], (d,))
    wqkv = 0.05 * jax.random.normal(keys[4], (d, 3 * d))
    bqkv = 0.05 * jax.random.normal(keys[5], (3 * d,))
    wp = 0.05 * jax.random.normal(keys[6], (d, d))

    pallas = pb._attn_sublayer_bwd_impl(
        x, dy, ln_s, ln_b, wqkv, bqkv, wp,
        num_heads=h, eps=1e-5, interpret=True,
    )
    monkeypatch.setattr(pb, "attn_bwd_fits", lambda *a, **k: False)
    xla = pb._attn_sublayer_bwd(
        x, dy, ln_s, ln_b, wqkv, bqkv, wp,
        num_heads=h, eps=1e-5, interpret=True,
    )
    names = ["dx", "dln_s", "dln_b", "dwqkv", "dbqkv", "dwp", "dbp"]
    for name, a, p in zip(names, xla, pallas):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(p), rtol=2e-4, atol=2e-5, err_msg=name,
        )


def test_attn_bwd_fits_thresholds():
    """Static fit decisions: flagship D=512 runs the Pallas backward; the
    D=1024 imagenet256 config's 25.2MB residents exceed the ~24MB Mosaic
    ceiling and must fall back."""
    from duodiff_tpu.ops.pallas_block import attn_bwd_fits

    assert attn_bwd_fits(128, 257, 512, 2)
    assert not attn_bwd_fits(128, 258, 1024, 2)


def test_fwd_fits_thresholds():
    """Forward-kernel VMEM guard: fp32 at D >= 768 must fall back to XLA
    (Mosaic measured 21.83M > 16M for the fp32 D=768 MLP forward — hit by
    fp32 model init / --use_amp-less training), while every shipping bf16
    shape (up to D=1024 imagenet256) and fp32 at D <= 512 stay on the
    fused kernels."""
    from duodiff_tpu.ops.pallas_block import attn_fwd_fits, mlp_fwd_fits

    assert mlp_fwd_fits(258, 512, 2048, 4)       # fp32 cifar/celeba-class
    assert mlp_fwd_fits(258, 1024, 4096, 2)      # bf16 imagenet256
    assert not mlp_fwd_fits(258, 768, 3072, 4)   # fp32 imagenet64: OOMs
    assert attn_fwd_fits(257, 512, 4)
    assert attn_fwd_fits(258, 1024, 2)
    assert not attn_fwd_fits(258, 768, 4)


def test_mlp_bwd_dispatch_cascade():
    """mono -> split -> XLA cascade per model scale (bf16 training shapes)."""
    from duodiff_tpu.ops.pallas_block import (
        _mlp_bwd_split_config,
        mlp_bwd_fits,
    )

    # flagship: mono kernel
    assert mlp_bwd_fits(128, 257, 512, 2048, 2)
    # imagenet64/256: mono doesn't fit, split does
    assert not mlp_bwd_fits(128, 258, 768, 3072, 2)
    assert _mlp_bwd_split_config(128, 258, 768, 3072, 2) is not None
    assert not mlp_bwd_fits(128, 258, 1024, 4096, 2)
    assert _mlp_bwd_split_config(128, 258, 1024, 4096, 2) is not None


def test_attn_flash_core_reference_matches_xla_reference():
    """The flash-core attention-sublayer reference (D>=768 backward on TPU:
    flash-attention custom VJP inside the XLA LN/projection chain) must
    match the pure-XLA reference in forward AND gradients."""
    import functools

    from duodiff_tpu.ops import pallas_block as pb

    b, l, d, h = 3, 33, 64, 4
    keys = jax.random.split(jax.random.PRNGKey(5), 8)
    x = jax.random.normal(keys[0], (b, l, d))
    dy = jax.random.normal(keys[1], (b, l, d))
    ln_s = 1.0 + 0.1 * jax.random.normal(keys[2], (d,))
    ln_b = 0.1 * jax.random.normal(keys[3], (d,))
    wqkv = 0.05 * jax.random.normal(keys[4], (d, 3 * d))
    bqkv = 0.05 * jax.random.normal(keys[5], (3 * d,))
    wp = 0.05 * jax.random.normal(keys[6], (d, d))
    bp = 0.05 * jax.random.normal(keys[7], (d,))

    args = (x, ln_s, ln_b, wqkv, bqkv, wp, bp)
    y_ref = pb._attn_sublayer_reference(*args, num_heads=h, eps=1e-5)
    y_flash, vjp_flash = jax.vjp(
        functools.partial(
            pb._attn_sublayer_reference, num_heads=h, eps=1e-5,
            sdpa="flash", interpret=True,
        ),
        *args,
    )
    np.testing.assert_allclose(
        np.asarray(y_flash), np.asarray(y_ref), rtol=1e-5, atol=1e-5,
    )
    _, vjp_ref = jax.vjp(
        functools.partial(pb._attn_sublayer_reference, num_heads=h, eps=1e-5),
        *args,
    )
    names = ["dx", "dln_s", "dln_b", "dwqkv", "dbqkv", "dwp", "dbp"]
    for name, a, r in zip(names, vjp_flash(dy), vjp_ref(dy)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(r), rtol=2e-4, atol=2e-5, err_msg=name,
        )


# ---------------------------------------------------------------------------
# Int8 (W8A8) sampling kernels — ops/pallas_block_int8.py
# ---------------------------------------------------------------------------


def _int8_weights(rng, d, hidden):
    return {
        "ln_s": jnp.asarray(rng.rand(d) + 0.5, jnp.float32),
        "ln_b": jnp.asarray(rng.randn(d) * 0.1, jnp.float32),
        "wqkv": jnp.asarray(rng.randn(d, 3 * d) * 0.05, jnp.float32),
        "bqkv": jnp.asarray(rng.randn(3 * d) * 0.02, jnp.float32),
        "wp": jnp.asarray(rng.randn(d, d) * 0.05, jnp.float32),
        "bp": jnp.asarray(rng.randn(d) * 0.02, jnp.float32),
        "w1": jnp.asarray(rng.randn(d, hidden) * 0.05, jnp.float32),
        "b1": jnp.asarray(rng.randn(hidden) * 0.02, jnp.float32),
        "w2": jnp.asarray(rng.randn(hidden, d) * 0.05, jnp.float32),
        "b2": jnp.asarray(rng.randn(d) * 0.02, jnp.float32),
    }


def test_quantize_weight_int8_roundtrip():
    from duodiff_tpu.ops.pallas_block_int8 import quantize_weight_int8

    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(64, 96), jnp.float32)
    w8, s = quantize_weight_int8(w)
    assert w8.dtype == jnp.int8 and s.shape == (1, 96)
    # dequantized error bounded by half a quantization step per column
    err = np.abs(np.asarray(w8, np.float32) * np.asarray(s) - np.asarray(w))
    assert (err <= 0.5 * np.asarray(s) + 1e-7).all()
    # weights on an exact int8 grid (column absmax pinned to 127 so the
    # scale is exactly 1) quantize losslessly
    wi_np = rng.randint(-127, 128, (16, 8)).astype(np.float32)
    wi_np[0, :] = 127.0
    wi = jnp.asarray(wi_np)
    w8i, si = quantize_weight_int8(wi)
    np.testing.assert_allclose(
        np.asarray(w8i, np.float32) * np.asarray(si), np.asarray(wi),
        atol=1e-5,
    )
    # extra_col_scale folds into the scale, not the int8 values
    w8x, sx = quantize_weight_int8(w, extra_col_scale=2.0)
    np.testing.assert_array_equal(np.asarray(w8x), np.asarray(w8))
    np.testing.assert_allclose(np.asarray(sx), 2.0 * np.asarray(s))


@pytest.mark.parametrize("qkv_bias", [False, True])
@pytest.mark.parametrize("l", [257, 65])
def test_int8_attn_kernel_matches_reference(qkv_bias, l):
    from duodiff_tpu.ops import pallas_block_int8 as pbi

    rng = np.random.RandomState(1)
    b, d, h = 2, 128, 4
    w = _int8_weights(rng, d, 4 * d)
    x = jnp.asarray(rng.randn(b, l, d), jnp.bfloat16)
    bqkv = w["bqkv"] if qkv_bias else None
    got = pbi.fused_attn_sublayer_int8(
        x, w["ln_s"], w["ln_b"], w["wqkv"], bqkv, w["wp"], w["bp"],
        num_heads=h, interpret=True,
    )
    scale = (d // h) ** -0.5
    col = jnp.concatenate(
        [jnp.full((1, d), scale), jnp.ones((1, 2 * d))], axis=1
    ).astype(jnp.float32)
    wqkv8, sqkv = pbi.quantize_weight_int8(w["wqkv"], extra_col_scale=col)
    wp8, sp = pbi.quantize_weight_int8(w["wp"])
    bq = (
        jnp.concatenate([w["bqkv"][:d] * scale, w["bqkv"][d:]])
        .reshape(1, 1, 3 * d)
        if qkv_bias
        else None
    )
    want = pbi._attn_sublayer_int8_reference(
        x, w["ln_s"], w["ln_b"], wqkv8, sqkv, bq, wp8, sp, w["bp"],
        num_heads=h, eps=1e-5,
    )
    # same math modulo contraction order: bf16-rounding-level agreement
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=2e-2, rtol=2e-2,
    )


@pytest.mark.parametrize("gelu_approx", [False, True])
def test_int8_mlp_kernel_matches_reference(gelu_approx):
    from duodiff_tpu.ops import pallas_block_int8 as pbi

    rng = np.random.RandomState(2)
    b, l, d = 2, 257, 128
    w = _int8_weights(rng, d, 4 * d)
    x = jnp.asarray(rng.randn(b, l, d), jnp.bfloat16)
    got = pbi.fused_mlp_sublayer_int8(
        x, w["ln_s"], w["ln_b"], w["w1"], w["b1"], w["w2"], w["b2"],
        gelu_approx=gelu_approx, interpret=True,
    )
    w1_8, s1 = pbi.quantize_weight_int8(w["w1"])
    w2_8, s2 = pbi.quantize_weight_int8(w["w2"])
    want = pbi._mlp_int8_reference(
        x, w["ln_s"], w["ln_b"], w1_8, s1, w["b1"].reshape(1, 1, -1),
        w2_8, s2, w["b2"].reshape(1, 1, -1), eps=1e-5,
        gelu_approx=gelu_approx,
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=2e-2, rtol=2e-2,
    )


def test_int8_sublayers_close_to_bf16():
    """The quantization error vs the bf16 fused path stays small (the knob
    is value-changing but must remain a faithful approximation)."""
    from duodiff_tpu.ops import pallas_block as pb
    from duodiff_tpu.ops import pallas_block_int8 as pbi

    rng = np.random.RandomState(3)
    b, l, d, h = 2, 257, 128, 4
    w = _int8_weights(rng, d, 4 * d)
    x = jnp.asarray(rng.randn(b, l, d), jnp.bfloat16)
    a8 = pbi.fused_attn_sublayer_int8(
        x, w["ln_s"], w["ln_b"], w["wqkv"], None, w["wp"], w["bp"],
        num_heads=h, interpret=True,
    )
    abf = pb.fused_attn_sublayer(
        x, w["ln_s"], w["ln_b"], w["wqkv"], None, w["wp"], w["bp"],
        num_heads=h, interpret=True,
    )
    rel = np.linalg.norm(np.asarray(a8 - abf, np.float32)) / np.linalg.norm(
        np.asarray(abf, np.float32)
    )
    assert rel < 0.02, rel
    m8 = pbi.fused_mlp_sublayer_int8(
        x, w["ln_s"], w["ln_b"], w["w1"], w["b1"], w["w2"], w["b2"],
        interpret=True,
    )
    mbf = pb.fused_mlp_sublayer(
        x, w["ln_s"], w["ln_b"], w["w1"], w["b1"], w["w2"], w["b2"],
        interpret=True,
    )
    rel = np.linalg.norm(np.asarray(m8 - mbf, np.float32)) / np.linalg.norm(
        np.asarray(mbf, np.float32)
    )
    assert rel < 0.03, rel


def test_int8_uvit_forward_param_tree_and_error():
    """attn_impl='fused_int8' declares the identical param tree (checkpoints
    interchangeable) and its full-model forward stays close to bf16."""
    import jax.tree_util as jtu

    from duodiff_tpu.config import UViTConfig
    from duodiff_tpu.models.uvit import init_uvit

    cfg = UViTConfig(
        img_size=16, patch_size=2, in_chans=3, embed_dim=64, depth=3,
        num_heads=4, mlp_ratio=4, qkv_bias=False, mlp_time_embed=False,
        num_classes=-1, normalize_timesteps=True,
    )
    m8, p8 = init_uvit(
        cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16,
        attn_impl="fused_int8",
    )
    mf, pf = init_uvit(
        cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16, attn_impl="fused"
    )
    assert jtu.tree_structure(p8) == jtu.tree_structure(pf)
    assert jtu.tree_all(jtu.tree_map(lambda a, b: bool(jnp.all(a == b)), p8, pf))
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 16, 16, 3), jnp.float32)
    t = jnp.full((2,), 500.0, jnp.float32)
    o8 = m8.apply({"params": p8}, x, t)
    of = mf.apply({"params": pf}, x, t)
    assert bool(jnp.all(jnp.isfinite(o8)))
    rel = float(jnp.linalg.norm(o8 - of) / jnp.linalg.norm(of))
    assert rel < 0.05, rel


def test_int8_training_rejected():
    """fused_int8 has no backward — the Trainer refuses it up front."""
    import types

    from duodiff_tpu.training.trainer import Trainer

    args = types.SimpleNamespace(attn_impl="fused_int8")
    with pytest.raises(ValueError, match="sampling-only"):
        # _init_model is where the guard lives; reaching it requires a full
        # Trainer, so call the guard logic directly
        Trainer._check_attn_impl_for_training("fused_int8")


def test_int8_early_exit_forward():
    """The EE wrapper's backbone blocks run through the int8 path too
    (eesampler --attn_impl fused_int8)."""
    from duodiff_tpu.config import UViTConfig
    from duodiff_tpu.models.early_exit import init_early_exit_uvit

    cfg = UViTConfig(
        img_size=16, patch_size=2, in_chans=3, embed_dim=64, depth=3,
        num_heads=4, mlp_ratio=4, qkv_bias=False, mlp_time_embed=False,
        num_classes=-1, normalize_timesteps=True,
        classifier_type="mlp_probe_per_layer",
    )
    model, params = init_early_exit_uvit(
        cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16,
        attn_impl="fused_int8",
    )
    x = jnp.zeros((2, 16, 16, 3), jnp.float32)
    t = jnp.full((2,), 500.0, jnp.float32)
    out, probes, heads = model.apply({"params": params}, x, t, None)
    assert out.shape == (2, 16, 16, 3)
    assert probes.shape[0] == cfg.depth and heads.shape[0] == cfg.depth
    assert bool(jnp.all(jnp.isfinite(out)))


def test_int8_fallback_matches_kernel():
    """When the kernel doesn't fit VMEM (fp32 at D>=768) the wrappers fall
    back to the XLA int8 reference — same quantization semantics as the
    kernel (checked here at a small D where both paths run)."""
    from duodiff_tpu.ops import pallas_block_int8 as pbi

    rng = np.random.RandomState(5)
    b, l, d, h = 1, 33, 768, 4
    x = jnp.asarray(rng.randn(b, l, d), jnp.float32)  # fp32 -> fallback
    w = _int8_weights(rng, d, 2 * d)
    # interpret=False + fp32 at D=768: attn_fwd_fits is False, so this is
    # the XLA reference path even off-TPU (no pallas_call is built)
    fb = pbi.fused_attn_sublayer_int8(
        x, w["ln_s"], w["ln_b"], w["wqkv"], None, w["wp"], w["bp"],
        num_heads=h, interpret=False,
    )
    kern = pbi.fused_attn_sublayer_int8(
        x, w["ln_s"], w["ln_b"], w["wqkv"], None, w["wp"], w["bp"],
        num_heads=h, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(fb, np.float32), np.asarray(kern, np.float32),
        rtol=2e-2, atol=2e-2,
    )
    mfb = pbi.fused_mlp_sublayer_int8(
        x, w["ln_s"], w["ln_b"], w["w1"], w["b1"], w["w2"], w["b2"],
        interpret=False,
    )
    mk = pbi.fused_mlp_sublayer_int8(
        x, w["ln_s"], w["ln_b"], w["w1"], w["b1"], w["w2"], w["b2"],
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(mfb, np.float32), np.asarray(mk, np.float32),
        rtol=2e-2, atol=2e-2,
    )
