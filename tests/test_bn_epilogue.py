"""BN+ReLU epilogue custom-VJP: exactness vs autodiff, both impls.

(The perf story is in scripts/bench_epilogue.py + CLAUDE.md; these are
the semantics guards.)
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from simhand_tpu.models.bn_epilogue import bn_add_relu_train, bn_relu_train


def _oracle(x, scale, bias, residual=None, eps=1e-5):
    x32 = x.astype(jnp.float32)
    axes = tuple(range(x.ndim - 1))
    mu = x32.mean(axes)
    var = (x32**2).mean(axes) - mu**2
    y = (x32 - mu) * jax.lax.rsqrt(var + eps) * scale + bias
    if residual is not None:
        y = y + residual.astype(jnp.float32)
    return jnp.maximum(y, 0).astype(x.dtype)


@pytest.mark.parametrize("impl", ["xla", "pallas"])
@pytest.mark.parametrize("shape", [(64, 8, 8, 96), (256, 256), (4, 512)])
def test_bn_relu_matches_autodiff(impl, shape):
    rng = np.random.default_rng(0)
    c = shape[-1]
    x = jnp.asarray(rng.normal(size=shape), jnp.bfloat16)
    g = jnp.asarray(rng.normal(size=shape), jnp.bfloat16)
    scale = jnp.asarray(rng.normal(size=c) * 0.5 + 1, jnp.float32)
    bias = jnp.asarray(rng.normal(size=c) * 0.1, jnp.float32)

    y, vjp = jax.vjp(
        lambda x, s, b: bn_relu_train(x, s, b, 1e-5, impl), x, scale, bias
    )
    dx, ds, db = vjp(g)
    yo, vjpo = jax.vjp(_oracle, x, scale, bias)
    dxo, dso, dbo = vjpo(g)
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(yo, np.float32), atol=0.1)
    np.testing.assert_allclose(np.asarray(dx, np.float32),
                               np.asarray(dxo, np.float32), atol=0.07)
    np.testing.assert_allclose(np.asarray(ds), np.asarray(dso),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(db), np.asarray(dbo),
                               rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_bn_add_relu_matches_autodiff(impl):
    rng = np.random.default_rng(1)
    shape, c = (32, 4, 4, 128), 128
    x = jnp.asarray(rng.normal(size=shape), jnp.bfloat16)
    r = jnp.asarray(rng.normal(size=shape), jnp.bfloat16)
    g = jnp.asarray(rng.normal(size=shape), jnp.bfloat16)
    scale = jnp.asarray(rng.normal(size=c) * 0.5 + 1, jnp.float32)
    bias = jnp.asarray(rng.normal(size=c) * 0.1, jnp.float32)

    y, vjp = jax.vjp(
        lambda x, r, s, b: bn_add_relu_train(x, r, s, b, 1e-5, impl),
        x, r, scale, bias,
    )
    dx, dr, ds, db = vjp(g)
    yo, vjpo = jax.vjp(
        lambda x, r, s, b: _oracle(x, s, b, residual=r), x, r, scale, bias
    )
    dxo, dro, dso, dbo = vjpo(g)
    np.testing.assert_allclose(np.asarray(dx, np.float32),
                               np.asarray(dxo, np.float32), atol=0.07)
    np.testing.assert_allclose(np.asarray(dr, np.float32),
                               np.asarray(dro, np.float32), atol=0.02)
    np.testing.assert_allclose(np.asarray(ds), np.asarray(dso),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(db), np.asarray(dbo),
                               rtol=1e-3, atol=1e-3)


@pytest.mark.slow
def test_resnet_epilogue_variant_matches_exact_bn_f32():
    """rn18 with bn_fused='epilogue' == exact flax BN at f32 (the bf16
    paths differ only by rounding order — checked at module level above)."""
    from simhand_tpu.models.resnet import RESNETS

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 32, 32, 3)), jnp.float32)

    def run(bn_fused):
        m = RESNETS["18"](pool=True, dtype=jnp.float32, bn_fused=bn_fused)
        v = m.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
        def loss(p):
            out, mut = m.apply(
                {"params": p, "batch_stats": v["batch_stats"]},
                x, train=True, mutable=["batch_stats"],
            )
            return jnp.sum(out**2) * 1e-3, mut["batch_stats"]
        (l, stats), g = jax.value_and_grad(loss, has_aux=True)(v["params"])
        return float(l), g, stats

    l0, g0, s0 = run(False)
    l1, g1, s1 = run("epilogue")
    assert l0 == pytest.approx(l1, rel=1e-4)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-4)
    for a, b in zip(jax.tree.leaves(s0), jax.tree.leaves(s1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
