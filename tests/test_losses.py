"""Golden-value tests for the contrastive loss library.

Oracles are independent float64 numpy transcriptions of the published
SiMHand/SimCLR equations (NT-Xent with self-sim-only masking; linear and
sigmoid adaptive weights with batch-global statistics).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simhand_tpu.losses import (
    apply_pca,
    linear_weights,
    nonlinear_weights,
    nt_xent,
    neg_weighted_nt_xent,
    pos_weighted_nt_xent,
    weighted_nt_xent,
)

T = 0.5


def normalize(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def oracle_nt_xent(z1, z2, t=T):
    z = np.concatenate([z1, z2], axis=0)
    n = len(z)
    sim = np.exp(z @ z.T / t)
    neg = (sim * (1 - np.eye(n))).sum(axis=-1)
    pos = np.exp(np.sum(z1 * z2, axis=-1) / t)
    pos = np.concatenate([pos, pos])
    return float(np.mean(-np.log(pos / neg)))


def oracle_weighted(z1, z2, pw, nw, t=T, use_pos=True, use_neg=True):
    z = np.concatenate([z1, z2], axis=0)
    n = len(z)
    cov = z @ z.T
    if use_neg:
        cov = cov * nw
    sim = np.exp(cov / t)
    neg = (sim * (1 - np.eye(n))).sum(axis=-1)
    pos = np.sum(z1 * z2, axis=-1)
    if use_pos:
        pos = pos * pw
    pos = np.exp(pos / t)
    pos = np.concatenate([pos, pos])
    return float(np.mean(-np.log(pos / neg)))


def oracle_pair_dist(j1, j2, diff_type):
    if diff_type == "w_o_abs":
        return np.linalg.norm((j1 - j2).mean(axis=1), axis=1)
    if diff_type == "w_abs":
        return np.linalg.norm(np.abs(j1 - j2).mean(axis=1), axis=1)
    return np.linalg.norm(j1 - j2, axis=-1).mean(axis=1)


def oracle_pairwise(bj, diff_type):
    d = bj[:, None] - bj[None, :]  # (2N, 2N, 21, 2)
    if diff_type == "w_o_abs":
        return np.linalg.norm(d.mean(axis=-1), axis=2)
    if diff_type == "w_abs":
        return np.linalg.norm(np.abs(d).mean(axis=-1), axis=2)
    return np.linalg.norm(d, axis=-1).mean(axis=2)


def oracle_linear_weights(j1, j2, diff_type):
    pd = oracle_pair_dist(j1, j2, diff_type)
    pw = (pd.max() - pd) / (pd.max() - pd.min())
    bj = np.concatenate([j1, j2], axis=0)
    nd = oracle_pairwise(bj, diff_type)
    nw = (nd.max() - nd) / (nd.max() - nd.min())
    return pw, nw


def oracle_nonlinear_weights(j1, j2, lp, ln, diff_type):
    pd = oracle_pair_dist(j1, j2, diff_type)
    pw = 1 / (1 + np.exp(lp * (pd - pd.mean())))
    bj = np.concatenate([j1, j2], axis=0)
    nd = oracle_pairwise(bj, diff_type)
    nw = 1 / (1 + np.exp(ln * (nd - nd.mean())))
    return pw, nw


@pytest.fixture
def proj():
    rng = np.random.default_rng(7)
    z1 = normalize(rng.normal(size=(6, 16)))
    z2 = normalize(rng.normal(size=(6, 16)))
    return z1, z2


@pytest.fixture
def joints():
    rng = np.random.default_rng(11)
    j1 = rng.uniform(0, 128, size=(6, 21, 2))
    j2 = rng.uniform(0, 128, size=(6, 21, 2))
    return j1, j2


def test_nt_xent_matches_oracle(proj):
    z1, z2 = proj
    ours = float(nt_xent(jnp.asarray(z1, jnp.float32), jnp.asarray(z2, jnp.float32)))
    assert ours == pytest.approx(oracle_nt_xent(z1, z2), rel=1e-5)


@pytest.mark.parametrize("diff_type", ["w_o_abs", "w_abs", "mpjpe"])
def test_linear_weights_match_oracle(joints, diff_type):
    j1, j2 = joints
    pw, nw = linear_weights(
        jnp.asarray(j1, jnp.float32), jnp.asarray(j2, jnp.float32), diff_type
    )
    opw, onw = oracle_linear_weights(j1, j2, diff_type)
    np.testing.assert_allclose(np.asarray(pw), opw, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(nw), onw, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("diff_type", ["w_o_abs", "mpjpe"])
def test_nonlinear_weights_match_oracle(joints, diff_type):
    j1, j2 = joints
    pw, nw = nonlinear_weights(
        jnp.asarray(j1, jnp.float32), jnp.asarray(j2, jnp.float32),
        5.0, 0.05, diff_type,
    )
    opw, onw = oracle_nonlinear_weights(j1, j2, 5.0, 0.05, diff_type)
    np.testing.assert_allclose(np.asarray(pw), opw, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(nw), onw, rtol=1e-4, atol=1e-5)


def test_weighted_nt_xent_matches_oracle(proj, joints):
    z1, z2 = proj
    j1, j2 = joints
    opw, onw = oracle_linear_weights(j1, j2, "mpjpe")
    ours = float(
        weighted_nt_xent(
            jnp.asarray(z1, jnp.float32),
            jnp.asarray(z2, jnp.float32),
            jnp.asarray(opw, jnp.float32),
            jnp.asarray(onw, jnp.float32),
        )
    )
    assert ours == pytest.approx(oracle_weighted(z1, z2, opw, onw), rel=1e-5)


def test_pos_and_neg_only_variants(proj, joints):
    z1, z2 = proj
    j1, j2 = joints
    opw, onw = oracle_linear_weights(j1, j2, "mpjpe")
    ours_pos = float(
        pos_weighted_nt_xent(
            jnp.asarray(z1, jnp.float32), jnp.asarray(z2, jnp.float32),
            jnp.asarray(opw, jnp.float32),
        )
    )
    assert ours_pos == pytest.approx(
        oracle_weighted(z1, z2, opw, onw, use_neg=False), rel=1e-5
    )
    ours_neg = float(
        neg_weighted_nt_xent(
            jnp.asarray(z1, jnp.float32), jnp.asarray(z2, jnp.float32),
            jnp.asarray(onw, jnp.float32),
        )
    )
    assert ours_neg == pytest.approx(
        oracle_weighted(z1, z2, opw, onw, use_pos=False), rel=1e-5
    )


# --------------------------------------------------------------------------
# sharded == single-device
# --------------------------------------------------------------------------

def _mesh():
    from jax.sharding import Mesh
    return Mesh(np.array(jax.devices()), ("data",))


def test_sharded_nt_xent_equals_full_batch():
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    rng = np.random.default_rng(21)
    B = 16  # 2 per device
    z1 = jnp.asarray(normalize(rng.normal(size=(B, 32))), jnp.float32)
    z2 = jnp.asarray(normalize(rng.normal(size=(B, 32))), jnp.float32)

    mesh = _mesh()
    sharded = shard_map(
        lambda a, b: nt_xent(a, b, axis_name="data"),
        mesh=mesh,
        in_specs=(P("data"), P("data")),
        out_specs=P(),
        check_vma=False,
    )
    got = float(jax.jit(sharded)(z1, z2))
    want = float(nt_xent(z1, z2))
    assert got == pytest.approx(want, rel=1e-5)


@pytest.mark.parametrize("diff_type", ["w_o_abs", "w_abs", "mpjpe"])
def test_sharded_weighted_pipeline_equals_full_batch(diff_type):
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    rng = np.random.default_rng(33)
    B = 16
    z1 = jnp.asarray(normalize(rng.normal(size=(B, 32))), jnp.float32)
    z2 = jnp.asarray(normalize(rng.normal(size=(B, 32))), jnp.float32)
    j1 = jnp.asarray(rng.uniform(0, 128, size=(B, 21, 2)), jnp.float32)
    j2 = jnp.asarray(rng.uniform(0, 128, size=(B, 21, 2)), jnp.float32)

    def local(a, b, ja, jb):
        pw, nw = linear_weights(ja, jb, diff_type)
        return weighted_nt_xent(a, b, pw, nw)

    def dist(a, b, ja, jb):
        pw, nw = linear_weights(ja, jb, diff_type, axis_name="data")
        return weighted_nt_xent(a, b, pw, nw, axis_name="data")

    mesh = _mesh()
    sharded = shard_map(
        dist,
        mesh=mesh,
        in_specs=(P("data"), P("data"), P("data"), P("data")),
        out_specs=P(),
        check_vma=False,
    )
    got = float(jax.jit(sharded)(z1, z2, j1, j2))
    want = float(local(z1, z2, j1, j2))
    assert got == pytest.approx(want, rel=1e-5)


# --------------------------------------------------------------------------
# PCA
# --------------------------------------------------------------------------

def test_apply_pca_shape_and_variance_ordering():
    rng = np.random.default_rng(5)
    joints = jnp.asarray(rng.normal(size=(32, 21, 2)), jnp.float32)
    out = np.asarray(apply_pca(joints, target_dim=14))
    assert out.shape == (32, 14)
    var = out.var(axis=0)
    assert np.all(np.diff(var) <= 1e-3)  # descending explained variance


def test_apply_pca_matches_numpy_pca():
    rng = np.random.default_rng(6)
    joints = rng.normal(size=(64, 21, 2)).astype(np.float32)
    x = joints.reshape(64, -1)
    xc = x - x.mean(axis=0)
    _, _, vt = np.linalg.svd(xc, full_matrices=False)
    v = vt[:14].T
    signs = np.sign(v[np.abs(v).argmax(axis=0), np.arange(14)])
    want = x @ (v * signs)
    got = np.asarray(apply_pca(jnp.asarray(joints), target_dim=14))
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-4)


def test_sharded_pca_equals_full_batch():
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    rng = np.random.default_rng(8)
    joints = jnp.asarray(rng.normal(size=(32, 21, 2)), jnp.float32)
    mesh = _mesh()
    sharded = shard_map(
        lambda j: apply_pca(j, target_dim=14, axis_name="data"),
        mesh=mesh,
        in_specs=(P("data"),),
        out_specs=P("data"),
        check_vma=False,
    )
    got = np.asarray(jax.jit(sharded)(joints))
    want = np.asarray(apply_pca(joints, target_dim=14))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-3)


def test_sharded_pairwise_minmax_covers_cross_device_pairs():
    """The sharded statistics pass must see cross-device pairs: local
    rows x all-gathered cols, pmin/pmax-reduced — block-diagonal-only
    extrema silently mis-normalize the streaming weighted loss."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    from simhand_tpu.losses.weights import pairwise_minmax

    rng = np.random.default_rng(11)
    joints = jnp.asarray(rng.normal(size=(32, 21, 2)), jnp.float32)
    mesh = _mesh()
    sharded = shard_map(
        lambda j: jnp.stack(
            pairwise_minmax(j, "mpjpe", chunk=8, axis_name="data")
        ),
        mesh=mesh,
        in_specs=(P("data"),),
        out_specs=P(),
        check_vma=False,
    )
    got_min, got_max = np.asarray(jax.jit(sharded)(joints))
    want_min, want_max = (
        float(x) for x in pairwise_minmax(joints, "mpjpe", chunk=8)
    )
    assert got_min == pytest.approx(want_min, rel=1e-6)
    assert got_max == pytest.approx(want_max, rel=1e-6)


def test_torch_median_semantics():
    """EPE/projection medians must use torch.median's lower-middle
    element for even counts, not jnp.median's interpolation."""
    import torch

    from simhand_tpu.losses.supervised import epe_metrics, torch_median

    rng = np.random.default_rng(5)
    x = rng.normal(size=(4, 16)).astype(np.float32)  # even counts
    want_flat = float(torch.median(torch.from_numpy(x)))
    assert float(torch_median(jnp.asarray(x))) == pytest.approx(want_flat)
    want_rows = torch.median(torch.from_numpy(x), dim=1).values.numpy()
    np.testing.assert_allclose(
        np.asarray(torch_median(jnp.asarray(x), axis=1)), want_rows
    )

    pred = rng.normal(size=(4, 21, 3)).astype(np.float32)
    true = rng.normal(size=(4, 21, 3)).astype(np.float32)
    d = torch.linalg.norm(torch.from_numpy(pred - true), dim=-1)
    m = epe_metrics(jnp.asarray(pred), jnp.asarray(true))
    assert float(m["EPE_median_train"]) == pytest.approx(
        float(torch.median(d)), rel=1e-6
    )


def test_l2_normalize_zero_vector_gradient_finite():
    """torch F.normalize subgradient at the exact zero vector is 0/eps —
    never NaN. Reachable in training: per-device BN over identical rows
    (B=1 shards + duplicated views) zeroes the projection head output,
    and one poisoned device NaNs every replica through the grad pmean
    (root-caused in round 4; fix: clamp inside the sqrt)."""
    import jax

    from simhand_tpu.models.equivariance import _l2_normalize

    # forward unchanged for normal inputs
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 16)).astype(np.float32))
    n = np.asarray(_l2_normalize(x))
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-6)
    # forward at zero: zero output (torch semantics: 0 / eps)
    z = jnp.zeros((2, 16))
    np.testing.assert_array_equal(np.asarray(_l2_normalize(z)), 0.0)
    # gradient at zero: finite (1/eps scale), not NaN
    g = jax.grad(lambda v: _l2_normalize(v).sum())(z)
    assert np.isfinite(np.asarray(g)).all()

    # end to end: nt_xent gradient through an exactly-zero projection row
    from simhand_tpu.losses.contrastive import nt_xent

    p = jnp.asarray(rng.standard_normal((3, 16)).astype(np.float32))
    p = p.at[1].set(0.0)

    def loss(p):
        return nt_xent(_l2_normalize(p), _l2_normalize(p + 0.1), 0.5, None)

    g = jax.grad(loss)(p)
    assert np.isfinite(np.asarray(g)).all()
