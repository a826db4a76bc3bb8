"""Fused conv1x1+BN site (models/fused_conv.py): exact parity with the
plain nn.Conv + flax BatchNorm composition — values, gradients, running
statistics — single-device and over the 8-device mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simhand_tpu.models.fused_conv import conv1x1_bn_train
from simhand_tpu.models.resnet import ResNet, Bottleneck


def _ref_conv_bn(x2d, w, scale, bias, eps):
    """The unfused composition with flax BatchNorm numerics."""
    y = jnp.dot(x2d, w, preferred_element_type=jnp.float32).astype(x2d.dtype)
    mu = jnp.mean(y, axis=0, dtype=jnp.float32)
    m2 = jnp.mean(jnp.square(y.astype(jnp.float32)), axis=0)
    var = m2 - jnp.square(mu)
    inv = jax.lax.rsqrt(var + eps)
    a32 = inv * scale.astype(jnp.float32)
    b32 = bias.astype(jnp.float32) - mu * a32
    return y * a32.astype(y.dtype) + b32.astype(y.dtype), mu, var


def test_fused_op_forward_and_stats_match_reference():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(64, 16)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(16, 8)) * 0.1, jnp.float32)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, 8), jnp.float32)
    bias = jnp.asarray(rng.normal(size=8), jnp.float32)

    o, mu, var = conv1x1_bn_train(x, w, scale, bias, 1e-5)
    o_ref, mu_ref, var_ref = _ref_conv_bn(x, w, scale, bias, 1e-5)
    np.testing.assert_allclose(o, o_ref, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(mu, mu_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(var, var_ref, rtol=1e-5, atol=1e-6)


def test_fused_op_gradients_match_autodiff():
    """The analytic backward == autodiff of the unfused composition, for
    every input (x, w, scale, bias), through a relu like the bottleneck."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(48, 12)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(12, 8)) * 0.2, jnp.float32)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, 8), jnp.float32)
    bias = jnp.asarray(rng.normal(size=8) * 0.1, jnp.float32)
    r = jnp.asarray(rng.normal(size=(48, 8)), jnp.float32)

    def loss_fused(x, w, s, b):
        o, _, _ = conv1x1_bn_train(x, w, s, b, 1e-5)
        return jnp.sum(jax.nn.relu(o) * r)

    def loss_ref(x, w, s, b):
        o, _, _ = _ref_conv_bn(x, w, s, b, 1e-5)
        return jnp.sum(jax.nn.relu(o) * r)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, w, scale, bias)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, w, scale, bias)
    for gf, gr, name in zip(g_fused, g_ref, ("dx", "dw", "dscale", "dbias")):
        np.testing.assert_allclose(
            gf, gr, rtol=5e-4, atol=5e-5, err_msg=name
        )


def _tiny_resnet(fuse: int, dtype=jnp.float32):
    return ResNet(
        stage_sizes=(1, 1, 1, 1), block=Bottleneck, dtype=dtype,
        conv1x1_fuse_min_cin=fuse,
    )


def test_fused_op_bf16_site_within_one_ulp_of_flax():
    """One bf16 site vs the flax composition (bf16 dot + flax BatchNorm):
    outputs agree to <= 1 bf16 ulp — the f32-affine-single-rounding
    semantics match."""
    import flax.linen as nn

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(1024, 64)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(64, 32)) * 0.1, jnp.bfloat16)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, 32), jnp.float32)
    bias = jnp.asarray(rng.normal(size=32), jnp.float32)

    o, mu, var = conv1x1_bn_train(x, w, scale, bias, 1e-5)

    class M(nn.Module):
        @nn.compact
        def __call__(self, y):
            return nn.BatchNorm(use_running_average=False, momentum=0.9,
                                epsilon=1e-5, dtype=jnp.bfloat16,
                                param_dtype=jnp.float32)(y)

    y_ref = jnp.dot(x, w, preferred_element_type=jnp.float32).astype(
        jnp.bfloat16)
    m = M()
    v = m.init(jax.random.key(0), y_ref)
    v = {"params": {"BatchNorm_0": {"scale": scale, "bias": bias}},
         "batch_stats": v["batch_stats"]}
    o_ref, muts = m.apply(v, y_ref, mutable=["batch_stats"])
    d = np.abs(np.asarray(o, np.float32) - np.asarray(o_ref, np.float32))
    # 1 bf16 ulp at the output magnitude (values up to ~8: ulp 2^-7)
    assert d.max() <= 2 ** -7, d.max()
    np.testing.assert_allclose(
        0.1 * np.asarray(mu),
        np.asarray(muts["batch_stats"]["BatchNorm_0"]["mean"]),
        rtol=1e-5, atol=1e-6,
    )


def test_resnet_integration_parity_f32():
    """resnet with conv1x1_fuse_min_cin routes bottleneck conv1/conv3
    sites through the fused op: same param tree, same forward, same
    batch_stats update, same grads as the plain model (f32 — elementwise
    tight; bf16 whole-net comparison is chaotic by reassociation, covered
    by the site-level ulp test + the relative-norm test below)."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(4, 32, 32, 3)), jnp.float32)

    plain = _tiny_resnet(0)
    fused = _tiny_resnet(1)  # threshold 1: every 1x1 site fused
    variables = plain.init(jax.random.key(0), x)
    v2 = fused.init(jax.random.key(0), x)
    assert jax.tree.structure(variables) == jax.tree.structure(v2)

    tol = dict(rtol=2e-4, atol=2e-4)
    out_p, mut_p = plain.apply(variables, x, train=True,
                               mutable=["batch_stats"])
    out_f, mut_f = fused.apply(variables, x, train=True,
                               mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_p), **tol)
    for (kp, sp), (kf, sf) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(mut_p["batch_stats"]),
               key=str),
        sorted(jax.tree_util.tree_leaves_with_path(mut_f["batch_stats"]),
               key=str),
    ):
        np.testing.assert_allclose(sf, sp, err_msg=str(kp), **tol)

    def loss(model, params):
        out = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"],
        )[0]
        return jnp.mean(jnp.square(out.astype(jnp.float32)))

    gp = jax.grad(lambda p: loss(plain, p))(variables["params"])
    gf = jax.grad(lambda p: loss(fused, p))(variables["params"])
    for (kp, vp), (_, vf) in zip(
        jax.tree_util.tree_leaves_with_path(gp),
        jax.tree_util.tree_leaves_with_path(gf),
    ):
        np.testing.assert_allclose(
            np.asarray(vf), np.asarray(vp), err_msg=str(kp),
            rtol=5e-3, atol=1e-5,
        )


def test_resnet_integration_bf16_close_in_norm():
    """bf16 whole-net: fused vs plain outputs within 5% relative L2 (the
    elementwise comparison is chaotic — relu boundary flips from 1-ulp
    site differences — but the distributions must stay equal)."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(4, 32, 32, 3)), jnp.float32)
    plain = _tiny_resnet(0, jnp.bfloat16)
    fused = _tiny_resnet(1, jnp.bfloat16)
    variables = plain.init(jax.random.key(0), x)
    out_p = np.asarray(
        plain.apply(variables, x, train=True, mutable=["batch_stats"])[0],
        np.float32)
    out_f = np.asarray(
        fused.apply(variables, x, train=True, mutable=["batch_stats"])[0],
        np.float32)
    rel = np.linalg.norm(out_f - out_p) / np.linalg.norm(out_p)
    assert rel < 5e-2, rel


def test_resnet_fused_eval_equals_plain_eval():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
    plain = _tiny_resnet(0)
    fused = _tiny_resnet(1)
    variables = plain.init(jax.random.key(0), x)
    np.testing.assert_allclose(
        fused.apply(variables, x, train=False),
        plain.apply(variables, x, train=False),
        rtol=1e-6, atol=1e-6,
    )


def test_fused_site_mesh_matches_single_device():
    """Cross-replica path (axis_name): the fused model on an 8-device
    mesh with synced BN == the fused model single-device on the full
    batch (forward + pmean'd grads)."""
    from functools import partial

    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    devices = np.asarray(jax.devices()[:8])
    if devices.size < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = Mesh(devices, ("data",))

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(16, 32, 32, 3)), jnp.float32)

    single = ResNet(stage_sizes=(1, 1, 1, 1), block=Bottleneck,
                    conv1x1_fuse_min_cin=1)
    synced = ResNet(stage_sizes=(1, 1, 1, 1), block=Bottleneck,
                    conv1x1_fuse_min_cin=1, bn_axis_name="data")
    variables = single.init(jax.random.key(0), x)

    def loss_single(params, xb):
        out = single.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            xb, train=True, mutable=["batch_stats"],
        )[0]
        return jnp.mean(jnp.square(out))

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P("data")), out_specs=P(), check_vma=False,
    )
    def loss_mesh(params, xb):
        out, _ = synced.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            xb, train=True, mutable=["batch_stats"],
        )
        # global mean loss: psum of local sums / global count
        total = jax.lax.psum(jnp.sum(jnp.square(out)), "data")
        cnt = jax.lax.psum(out.size, "data")
        loss = total / cnt
        return loss

    l1, g1 = jax.value_and_grad(loss_single)(variables["params"], x)
    l8, g8 = jax.value_and_grad(
        lambda p, xb: loss_mesh(p, xb)
    )(variables["params"], x)
    np.testing.assert_allclose(l8, l1, rtol=1e-5, atol=1e-6)
    for (k, v1), (_, v8) in zip(
        jax.tree_util.tree_leaves_with_path(g1),
        jax.tree_util.tree_leaves_with_path(g8),
    ):
        np.testing.assert_allclose(v8, v1, rtol=2e-3, atol=1e-5,
                                   err_msg=str(k))
