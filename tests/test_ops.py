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


def test_dispatch_xla_default(qkv):
    q, k, v = (jnp.asarray(a) for a in qkv)
    out_auto = multi_head_attention(q, k, v, impl="auto")
    out_xla = multi_head_attention(q, k, v, impl="xla")
    np.testing.assert_array_equal(np.asarray(out_auto), np.asarray(out_xla))
