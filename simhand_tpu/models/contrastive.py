"""The contrastive model family: one encoder+head module, eight experiment
types realised as pure loss pipelines.

Experiment-type semantics (reference: src/models/unsupervised/*.py and
src/experiments/utils.py:633-700 ``get_model``):

  simclr        two augs of the same image, plain NT-Xent
  simclr_w      same pairs, adaptive weights, NO feature-space equivariance
  peclr         same pairs + inverse-transform equivariance
  peclr_w       peclr + adaptive weights
  simhand-base  similar-hand positive pairs + equivariance, plain NT-Xent
  simhand       same as simhand-base (kept as a distinct CLI name)
  simhand_w     similar-hand pairs + equivariance + adaptive weights
  simhand_vis   simhand_w pipeline, plain loss, extra visualization outputs

The positive-pair *source* (same image vs mined similar hand) is a data-
pipeline concern; on the model side simhand === peclr with different
batches. All pipelines run on the global batch when ``axis_name`` is set.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from simhand_tpu.losses.contrastive import (
    neg_weighted_nt_xent,
    nt_xent,
    pos_weighted_nt_xent,
    weighted_nt_xent,
)
from simhand_tpu.losses.weights import apply_pca, linear_weights, nonlinear_weights
from simhand_tpu.models.equivariance import (
    _l2_normalize,
    inverse_transform_projections,
)
from simhand_tpu.models.projection import ProjectionHead
from simhand_tpu.models.resnet import FEATURE_DIMS, RESNETS

Array = jax.Array

EXPERIMENT_TYPES = (
    "simclr",
    "simclr_w",
    "peclr",
    "peclr_w",
    "simhand-base",
    "simhand",
    "simhand_w",
    "simhand_vis",
)

_EQUIVARIANT = {"peclr", "peclr_w", "simhand-base", "simhand", "simhand_w", "simhand_vis"}
_WEIGHTED = {"simclr_w", "peclr_w", "simhand_w"}


@dataclasses.dataclass(frozen=True)
class ContrastiveConfig:
    """Static configuration of a contrastive experiment (hashable, jit-safe)."""

    experiment_type: str = "simclr"
    augmentation: tuple[str, ...] = ()        # e.g. ("crop", "rotate", ...)
    temperature: float = 0.5
    image_side: float = 128.0
    # _w variants:
    weight_type: str = "linear"               # "linear" | "non_linear"
    diff_type: str = "mpjpe"                  # "w_o_abs" | "w_abs" | "mpjpe"
    pos_neg: str = "pos_neg"                  # "pos" | "neg" | "pos_neg"
    joints_type: str = "aug"                  # "original" | "aug"
    use_pca: bool = False
    pca_dim: int = 14
    non_linear_lambda_pos: float = 5.0
    non_linear_lambda_neg: float = 0.05
    # Use the pallas fused custom-VJP kernels (losses/pallas_ntxent.py)
    # instead of the XLA path — both single-device (2B % 512 == 0) and the
    # sharded mesh step (2B_local % 256 == 0: local rows stream against
    # the all-gathered global column set). Covers plain NT-Xent and the
    # linear/mpjpe pos_neg weighted loss (the flagship simhand_w config);
    # other weighted configs fall through to XLA. Parity on the 8-device
    # mesh: tests/test_pallas_ntxent.py::test_sharded_use_pallas_*.
    use_pallas: bool = False

    def __post_init__(self):
        assert self.experiment_type in EXPERIMENT_TYPES, self.experiment_type


class ContrastiveModel(nn.Module):
    """ResNet encoder + projection head (the pre-training network)."""

    resnet_size: str = "50"
    proj_hidden_dim: int = 512
    proj_output_dim: int = 128
    dtype: Any = jnp.float32
    remat: bool = False   # rematerialize encoder activations (bigger batch)
    # sync BN stats over this mesh axis (cross-replica BN); None matches
    # the reference's per-replica DataParallel statistics.
    bn_axis_name: str | None = None
    # "conv7" (torch-compatible) or "space_to_depth" (MLPerf TPU stem)
    stem: str = "conv7"
    # >1: subsampled-stats BN (models/norm.py) — perf opt-in
    bn_subsample: int = 1
    bn_stop_gradient_stats: bool = False
    bn_fused: bool | str = False
    # >0: Mosaic fused conv1x1+BN at bottleneck sites with cin >= this
    # (models/fused_conv.py); 512 = the shapes where the kernel wins
    conv1x1_fuse_min_cin: int = 0
    # "xla" | "masked": stem max-pool backward impl (models/pool.py)
    maxpool: str = "xla"

    def setup(self):
        enc_cls = RESNETS[self.resnet_size]
        enc_kw = dict(
            dtype=self.dtype, bn_axis_name=self.bn_axis_name, stem=self.stem,
            bn_subsample=self.bn_subsample,
            bn_stop_gradient_stats=self.bn_stop_gradient_stats,
            bn_fused=self.bn_fused,
            conv1x1_fuse_min_cin=self.conv1x1_fuse_min_cin,
            maxpool=self.maxpool,
        )
        if self.remat:
            # static_argnums indexes (module, x, train) — `train` must be
            # static (BN mode) and passed positionally below.
            enc_cls = nn.remat(
                enc_cls.func if hasattr(enc_cls, "func") else enc_cls,
                static_argnums=(2,),
            )
            self.encoder = enc_cls(
                **{**RESNETS[self.resnet_size].keywords, **enc_kw},
                name="encoder",
            )
        else:
            self.encoder = enc_cls(**enc_kw, name="encoder")
        self.projection_head = ProjectionHead(
            hidden_dim=self.proj_hidden_dim,
            output_dim=self.proj_output_dim,
            dtype=self.dtype,
            name="projection_head",
        )

    def __call__(self, images: Array, train: bool = False):
        """images: (N, H, W, 3) float; returns (embedding, projection)."""
        emb = self.encoder(images, train)
        proj = self.projection_head(emb, train=train)
        return emb, proj

    @property
    def feature_dim(self) -> int:
        return FEATURE_DIMS[self.resnet_size]


def projection_stats(
    projections: Array, axis_name: str | None = None
) -> dict[str, Array]:
    """Per-axis statistics of the raw projections viewed as (B, D/2, 2)
    points — mean/median/min/max over points, batch-averaged — logged
    every step by the equivariant family
    (reference: src/models/unsupervised/peclr_model.py:43-46,98-112).

    Under sharding, stats are per-shard then pmean'd — matching the
    reference's DataParallel metric averaging.
    """
    two_b, d = projections.shape
    b = two_b // 2
    pts = jax.lax.stop_gradient(projections).reshape(two_b, d // 2, 2)
    out: dict[str, Array] = {}
    for name, half in (("proj1", pts[:b]), ("proj2", pts[b:])):
        from simhand_tpu.losses.supervised import torch_median

        stats = {
            "mean": jnp.mean(half, axis=1),
            # torch.median lower-middle semantics (D/2=64 points is even)
            "median": torch_median(half, axis=1),
            "min": jnp.min(half, axis=1),
            "max": jnp.max(half, axis=1),
        }
        for stat, v in stats.items():
            batch_avg = jnp.mean(v, axis=0)  # (2,)
            if axis_name is not None:
                batch_avg = jax.lax.pmean(batch_avg, axis_name)
            out[f"{name}x_{stat}"] = batch_avg[0]
            out[f"{name}y_{stat}"] = batch_avg[1]
    return out


def transformed_projections(
    projections: Array, batch: dict, cfg: ContrastiveConfig
):
    """Raw head outputs -> normalized (z1, z2) per the experiment type."""
    b = projections.shape[0] // 2
    if cfg.experiment_type in _EQUIVARIANT:
        jx = jy = ang = None
        if "crop" in cfg.augmentation:
            jx = jnp.concatenate([batch["jitter_x_1"], batch["jitter_x_2"]])
            jy = jnp.concatenate([batch["jitter_y_1"], batch["jitter_y_2"]])
        if "rotate" in cfg.augmentation:
            ang = jnp.concatenate([batch["angle_1"], batch["angle_2"]])
        return inverse_transform_projections(
            projections, jx, jy, ang, cfg.image_side
        )
    return _l2_normalize(projections[:b]), _l2_normalize(projections[b:])


def adaptive_weights(batch: dict, cfg: ContrastiveConfig, axis_name: str | None):
    """(pos_weights, neg_weights) from per-sample joints per the config."""
    key = "ori" if cfg.joints_type == "original" else "aug"
    j1 = batch[f"joints1_{key}"][..., :2]
    j2 = batch[f"joints2_{key}"][..., :2]
    flat = False
    if cfg.use_pca:
        j1 = apply_pca(j1, cfg.pca_dim, axis_name=axis_name)
        j2 = apply_pca(j2, cfg.pca_dim, axis_name=axis_name)
        flat = True
    if cfg.weight_type == "linear":
        return linear_weights(j1, j2, cfg.diff_type, axis_name=axis_name, flat=flat)
    return nonlinear_weights(
        j1,
        j2,
        cfg.non_linear_lambda_pos,
        cfg.non_linear_lambda_neg,
        cfg.diff_type,
        axis_name=axis_name,
        flat=flat,
    )


def contrastive_loss_from_projections(
    projections: Array,
    batch: dict,
    cfg: ContrastiveConfig,
    axis_name: str | None = None,
):
    """Full per-step contrastive loss for any experiment type.

    Args:
      projections: (2*B_local, D) raw projection-head outputs
        ([view1; view2] row layout).
      batch: the per-device batch dict (jitters / angles / joints as needed).
      cfg: experiment config.
      axis_name: mesh axis for the global negative set (None = local).

    Returns:
      (loss, (z1, z2)).
    """
    z1, z2 = transformed_projections(projections, batch, cfg)

    n_rows = 2 * z1.shape[0]
    _flagship_w = (
        cfg.experiment_type in _WEIGHTED
        and (cfg.weight_type, cfg.diff_type, cfg.pos_neg, cfg.use_pca)
        == ("linear", "mpjpe", "pos_neg", False)
    )
    if cfg.use_pallas and axis_name is not None and n_rows % 256 == 0:
        # global-batch pallas path: local rows stream against the
        # all-gathered column set, fwd+bwd (losses/pallas_ntxent.py).
        # Tile divisibility: local rows must fit ROW_TILE and the
        # all-gathered column count must fit COL_TILE (512 plain / 256
        # weighted) — axis_size is static under shard_map, so the
        # fallback decision stays trace-time.
        n_global = n_rows * jax.lax.axis_size(axis_name)
        interp = jax.default_backend() != "tpu"
        if cfg.experiment_type not in _WEIGHTED and n_global % 512 == 0:
            from simhand_tpu.losses.pallas_ntxent import (
                make_sharded_nt_xent_pallas,
            )

            loss_fn = make_sharded_nt_xent_pallas(
                axis_name, cfg.temperature, interpret=interp
            )
            return loss_fn(z1, z2), (z1, z2)
        if _flagship_w:
            from simhand_tpu.losses.pallas_ntxent import (
                make_sharded_weighted_nt_xent_pallas,
            )

            key = "ori" if cfg.joints_type == "original" else "aug"
            j1 = batch[f"joints1_{key}"][..., :2]
            j2 = batch[f"joints2_{key}"][..., :2]
            loss_fn = make_sharded_weighted_nt_xent_pallas(
                axis_name, cfg.temperature, interpret=interp
            )
            return loss_fn(z1, z2, j1, j2), (z1, z2)
        # other weighted configs fall through to the XLA path

    if cfg.use_pallas and axis_name is None and n_rows % 512 == 0:
        from simhand_tpu.losses.pallas_ntxent import (
            nt_xent_pallas,
            weighted_nt_xent_pallas,
        )

        # compiled kernels on TPU; interpreter elsewhere (tests/CPU)
        interp = jax.default_backend() != "tpu"

        if cfg.experiment_type not in _WEIGHTED:
            return nt_xent_pallas(z1, z2, cfg.temperature, interp), (z1, z2)
        if (cfg.weight_type, cfg.diff_type, cfg.pos_neg, cfg.use_pca) == (
            "linear", "mpjpe", "pos_neg", False,
        ):
            key = "ori" if cfg.joints_type == "original" else "aug"
            j1 = batch[f"joints1_{key}"][..., :2]
            j2 = batch[f"joints2_{key}"][..., :2]
            joints = jnp.concatenate([j1, j2])
            from simhand_tpu.losses.weights import (
                _pair_distance,
                pairwise_minmax,
            )

            pos_d = _pair_distance(j1, j2, "mpjpe")
            # streaming global min/max — no (2N, 2N) plane materialized
            d_min, d_max = pairwise_minmax(joints, "mpjpe")
            pw = (jnp.max(pos_d) - pos_d) / (jnp.max(pos_d) - jnp.min(pos_d))
            minmax = jnp.stack([d_max, d_min])
            loss = weighted_nt_xent_pallas(
                z1, z2, joints, pw, minmax, cfg.temperature, interp
            )
            return loss, (z1, z2)
        # other weighted configs fall through to the XLA path

    if cfg.experiment_type in _WEIGHTED:
        pw, nw = adaptive_weights(batch, cfg, axis_name)
        if cfg.pos_neg == "pos_neg":
            loss = weighted_nt_xent(z1, z2, pw, nw, cfg.temperature, axis_name)
        elif cfg.pos_neg == "pos":
            loss = pos_weighted_nt_xent(z1, z2, pw, cfg.temperature, axis_name)
        elif cfg.pos_neg == "neg":
            loss = neg_weighted_nt_xent(z1, z2, nw, cfg.temperature, axis_name)
        else:
            raise ValueError(f"unknown pos_neg {cfg.pos_neg!r}")
    else:
        loss = nt_xent(z1, z2, cfg.temperature, axis_name)
    return loss, (z1, z2)


