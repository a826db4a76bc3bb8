"""Mosaic 1x1-conv (+ fused BN-apply loader) kernels: exactness."""
import numpy as np

import jax
import jax.numpy as jnp

from simhand_tpu.ops.conv1x1 import conv1x1_bn_relu_stats, conv1x1_stats


def _setup(m=256, cin=128, cout=192, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(m, cin)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(cin, cout)) * 0.1, jnp.bfloat16)
    return rng, x, w


def test_conv1x1_stats_exact():
    _, x, w = _setup()
    y, s1, s2 = conv1x1_stats(x, w)
    # oracle: f32-accumulated matmul, stats of the ROUNDED bf16 output
    yw = (x.astype(jnp.float32) @ w.astype(jnp.float32)).astype(
        jnp.bfloat16
    ).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(y, np.float32), np.asarray(yw), atol=0.05)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(yw.sum(0)),
                               rtol=2e-4, atol=1e-2)
    np.testing.assert_allclose(np.asarray(s2), np.asarray((yw**2).sum(0)),
                               rtol=2e-4, atol=1e-2)


def test_conv1x1_fused_loader_exact():
    rng, x, w = _setup(seed=1)
    A = jnp.asarray(rng.normal(size=x.shape[1]) * 0.3 + 1, jnp.float32)
    B = jnp.asarray(rng.normal(size=x.shape[1]) * 0.1, jnp.float32)
    y, s1, s2 = conv1x1_bn_relu_stats(x, w, A, B)
    xa = jnp.maximum(x.astype(jnp.float32) * A + B, 0).astype(jnp.bfloat16)
    yw = (xa.astype(jnp.float32) @ w.astype(jnp.float32)).astype(
        jnp.bfloat16
    ).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(y, np.float32), np.asarray(yw), atol=0.05)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(yw.sum(0)),
                               rtol=2e-4, atol=1e-2)
    np.testing.assert_allclose(np.asarray(s2), np.asarray((yw**2).sum(0)),
                               rtol=2e-4, atol=1e-2)
