"""Masked-backward max-pool (models/pool.py) parity.

The opt-in ``maxpool="masked"`` path must be forward-identical to
``nn.max_pool`` and backward-equivalent to torch's first-match tie-break
(the reference backbone's semantics, torchvision resnet ``maxpool``).
Gradient values may differ from XLA's select_and_scatter only by
summation order inside overlapping windows (float rounding), never by
routing — asserted via exact support equality plus a tight allclose.
"""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simhand_tpu.models.pool import max_pool_firstmatch


def _ref(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])


@pytest.mark.parametrize("shape", [(2, 8, 8, 4), (2, 9, 10, 3), (1, 7, 7, 8)])
def test_forward_identical(shape):
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=shape).astype(np.float32)
    )
    assert jnp.array_equal(_ref(x), max_pool_firstmatch(x))


def test_grad_matches_xla_tie_free():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 9, 10, 3)).astype(np.float32))
    y, vjp0 = jax.vjp(_ref, x)
    _, vjp1 = jax.vjp(max_pool_firstmatch, x)
    g = jnp.asarray(rng.normal(size=y.shape).astype(np.float32))
    dx0, dx1 = vjp0(g)[0], vjp1(g)[0]
    # continuous input: ties have probability zero -> same routing; only
    # overlapping-window summation order differs
    np.testing.assert_allclose(dx0, dx1, rtol=0, atol=1e-6)
    assert jnp.array_equal(dx0 != 0, dx1 != 0)


def test_tied_grad_matches_torch_first_match():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(2)
    # ReLU'd input: exact-zero ties are common, exercising the tie-break
    x = np.maximum(rng.normal(size=(2, 8, 8, 4)).astype(np.float32) - 0.8, 0.0)
    g = rng.normal(size=(2, 4, 4, 4)).astype(np.float32)

    _, vjp1 = jax.vjp(max_pool_firstmatch, jnp.asarray(x))
    dx = np.asarray(vjp1(jnp.asarray(g))[0])

    xt = torch.tensor(x.transpose(0, 3, 1, 2), requires_grad=True)
    yt = torch.nn.functional.max_pool2d(xt, 3, stride=2, padding=1)
    yt.backward(torch.tensor(g.transpose(0, 3, 1, 2)))
    dx_t = xt.grad.numpy().transpose(0, 2, 3, 1)

    assert np.array_equal(dx != 0, dx_t != 0)  # identical routing
    np.testing.assert_allclose(dx, dx_t, rtol=0, atol=1e-6)
    # conservation: every window's cotangent lands exactly once
    np.testing.assert_allclose(dx.sum(), g.sum(), rtol=1e-5)


def test_resnet_maxpool_masked_parity():
    from simhand_tpu.models.resnet import resnet18

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    base = resnet18(dtype=jnp.float32)
    masked = resnet18(dtype=jnp.float32, maxpool="masked")
    variables = base.init(jax.random.key(0), x, train=False)

    y0 = base.apply(variables, x, train=False)
    y1 = masked.apply(variables, x, train=False)
    assert jnp.array_equal(y0, y1)  # forward is the same program

    def loss(m):
        def f(params):
            out, _ = m.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, train=True, mutable=["batch_stats"],
            )
            return (out * out).mean()
        return f

    g0 = jax.grad(loss(base))(variables["params"])
    g1 = jax.grad(loss(masked))(variables["params"])
    flat0 = jax.tree.leaves(g0)
    flat1 = jax.tree.leaves(g1)
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-6)
