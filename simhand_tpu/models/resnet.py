"""TPU-native flax ResNet family (18/34/50/101/152).

Structurally equivalent to the torchvision ResNets the reference wraps
(reference: src/models/resnet_model.py:6-58, src/models/utils.py:728-746)
so released checkpoints port in both directions, but written NHWC-first
for TPU: convolutions lower onto the MXU with bf16 compute / f32 params,
BatchNorm statistics live in a mutable ``batch_stats`` collection, and all
shapes are static under jit.

Module names mirror torchvision state-dict keys (``conv1``, ``bn1``,
``layer1_0_conv2`` ...) so checkpoint interop is a pure name-mangling
exercise (see simhand_tpu/train/torch_port.py).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, Sequence

import flax.linen as nn
import jax.numpy as jnp

ModuleDef = Any


class BasicBlock(nn.Module):
    """ResNet-18/34 block: 3x3 -> 3x3, expansion 1."""

    filters: int
    strides: int
    conv: ModuleDef
    norm: ModuleDef
    expansion: int = 1
    # fused BN(+add)+ReLU module (models/bn_epilogue.BNRelu); when set,
    # every bn+relu site goes through its custom-VJP kernels
    act_norm: ModuleDef | None = None
    # accepted for uniformity with Bottleneck; basic blocks have no
    # stride-1 1x1 conv sites, so these are unused
    fuse_min_cin: int = 0
    fused_site: Any = None

    @nn.compact
    def __call__(self, x):
        residual = x
        y = self.conv(self.filters, (3, 3), (self.strides, self.strides), name="conv1")(x)
        if self.act_norm is not None:
            y = self.act_norm(name="bn1")(y)
        else:
            y = nn.relu(self.norm(name="bn1")(y))
        y = self.conv(self.filters, (3, 3), name="conv2")(y)
        if residual.shape != y.shape:
            residual = self.conv(
                self.filters, (1, 1), (self.strides, self.strides), name="downsample_conv"
            )(x)
            residual = self.norm(name="downsample_bn")(residual)
        if self.act_norm is not None:
            return self.act_norm(name="bn2")(y, residual)
        return nn.relu(self.norm(name="bn2")(y) + residual)


class Bottleneck(nn.Module):
    """ResNet-50/101/152 block: 1x1 -> 3x3 -> 1x1, expansion 4."""

    filters: int
    strides: int
    conv: ModuleDef
    norm: ModuleDef
    expansion: int = 4
    act_norm: ModuleDef | None = None
    # Mosaic fused conv1x1+BN (models/fused_conv.py), applied at stride-1
    # 1x1 sites whose cin >= this threshold (0 = off). The kernel-level
    # win only exists for cin >= 512 (scripts/bench_conv1x1.py).
    fuse_min_cin: int = 0
    fused_site: Any = None

    def _conv_bn_site(self, x, features, conv_name, bn_name):
        """conv1x1+BN (no activation): fused Mosaic path when enabled and
        profitable for this shape, else the plain conv+norm pair."""
        if self.fused_site is not None and x.shape[-1] >= self.fuse_min_cin:
            return self.fused_site(self, x, features, conv_name, bn_name)
        y = self.conv(features, (1, 1), name=conv_name)(x)
        return self.norm(name=bn_name)(y)

    @nn.compact
    def __call__(self, x):
        residual = x
        if self.act_norm is not None:
            y = self.conv(self.filters, (1, 1), name="conv1")(x)
            y = self.act_norm(name="bn1")(y)
        else:
            y = nn.relu(self._conv_bn_site(x, self.filters, "conv1", "bn1"))
        y = self.conv(self.filters, (3, 3), (self.strides, self.strides), name="conv2")(y)
        if self.act_norm is not None:
            y = self.act_norm(name="bn2")(y)
        else:
            y = nn.relu(self.norm(name="bn2")(y))
        if self.act_norm is not None:
            y = self.conv(self.filters * self.expansion, (1, 1), name="conv3")(y)
        else:
            y3 = self._conv_bn_site(
                y, self.filters * self.expansion, "conv3", "bn3"
            )
        if residual.shape[-1] != self.filters * self.expansion or self.strides != 1:
            residual = self.conv(
                self.filters * self.expansion,
                (1, 1),
                (self.strides, self.strides),
                name="downsample_conv",
            )(x)
            residual = self.norm(name="downsample_bn")(residual)
        if self.act_norm is not None:
            return self.act_norm(name="bn3")(y, residual)
        return nn.relu(y3 + residual)


class ResNet(nn.Module):
    """torchvision-layout ResNet, NHWC.

    Attributes:
      stage_sizes: blocks per stage, e.g. (3, 4, 6, 3) for ResNet-50.
      block: BasicBlock or Bottleneck.
      num_features: channels of the final stage (for reference only).
      dtype: compute dtype (bf16 on TPU; params stay f32).
      pool: if True, global-average-pool to a flat embedding
        ("pretraining" mode); if False return the (N, H/32, W/32, C)
        feature map (detnet backbone mode).
    """

    stage_sizes: Sequence[int]
    block: Callable[..., nn.Module]
    dtype: Any = jnp.float32
    pool: bool = True
    norm_momentum: float = 0.9
    norm_epsilon: float = 1e-5
    # Cross-replica BN: sync batch statistics over this mesh axis (inside
    # shard_map). None = per-replica stats, matching the reference's
    # DataParallel behavior (SURVEY.md hard part 4).
    bn_axis_name: str | None = None
    # "conv7": torchvision stem (7x7/2 conv — torch-checkpoint
    # compatible). "space_to_depth": the MLPerf TPU stem — mathematically
    # the same linear map expressed as a 4x4 stride-1 conv on the
    # space-to-depth(2) input, which tiles far better onto the MXU than a
    # 3-channel 7x7. Convert torch weights via s2d_stem_kernel().
    stem: str = "conv7"
    # >1: compute forward BN statistics from a leading batch subset
    # (simhand_tpu.models.norm). 1 = exact reference BN.
    bn_subsample: int = 1
    # stop gradients through BN statistics (with the custom norm)
    bn_stop_gradient_stats: bool = False
    # hand-written analytic BN VJP (models/fused_bn.py) — exact semantics,
    # minimal 2-reduce backward. True/"xla" = jnp reduces; "pallas" = the
    # one-pass dual-reduce kernel. "epilogue"/"epilogue_xla": fuse every
    # bn+relu / bn+add+relu site through models/bn_epilogue's custom-VJP
    # (Mosaic kernels / XLA-codegen reference) — exact flax-BN numerics.
    bn_fused: bool | str = False
    # >0: route stride-1 bottleneck 1x1 conv+BN sites with cin >= this
    # threshold through the Mosaic matmul-with-BN-stats-epilogue kernel
    # (models/fused_conv.py; exact flax-BN numerics, analytic backward).
    # 512 = only the shapes where the kernel beats XLA
    # (scripts/bench_conv1x1.py). Train-mode only; mutually exclusive
    # with the bn_fused/bn_subsample/stop-gradient variants.
    conv1x1_fuse_min_cin: int = 0
    # "xla": nn.max_pool (backward = XLA select_and_scatter). "masked":
    # identical forward, recompute-and-mask backward (models/pool.py) —
    # avoids the non-fused scatter kernel in the stem backward.
    maxpool: str = "xla"

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = partial(
            nn.Conv, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32
        )
        act_norm = None
        if self.bn_fused in ("epilogue", "epilogue_xla"):
            from simhand_tpu.models.bn_epilogue import BNRelu

            if self.bn_axis_name is not None:
                raise NotImplementedError(
                    "bn_fused='epilogue' has no cross-replica statistics "
                    "path: BNRelu sites would compute per-replica stats "
                    "while downsample BNs sync over "
                    f"{self.bn_axis_name!r} — mixed semantics. Use the "
                    "exact/fused variants with bn_axis_name."
                )

            act_norm = partial(
                BNRelu,
                impl="xla" if self.bn_fused == "epilogue_xla" else "pallas",
                use_running_average=not train,
                momentum=self.norm_momentum,
                epsilon=self.norm_epsilon,
                dtype=self.dtype,
                param_dtype=jnp.float32,
            )
            norm = partial(
                nn.BatchNorm,
                use_running_average=not train,
                momentum=self.norm_momentum,
                epsilon=self.norm_epsilon,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                axis_name=self.bn_axis_name if train else None,
            )
        elif self.bn_fused:
            from simhand_tpu.models.fused_bn import FusedBatchNorm

            norm = partial(
                FusedBatchNorm,
                reduce_impl="pallas" if self.bn_fused == "pallas" else "xla",
                stop_gradient_stats=self.bn_stop_gradient_stats,
                use_running_average=not train,
                momentum=self.norm_momentum,
                epsilon=self.norm_epsilon,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                axis_name=self.bn_axis_name if train else None,
            )
        elif self.bn_subsample > 1 or self.bn_stop_gradient_stats:
            from simhand_tpu.models.norm import SubsampledBatchNorm

            norm = partial(
                SubsampledBatchNorm,
                subsample=self.bn_subsample,
                stop_gradient_stats=self.bn_stop_gradient_stats,
                use_running_average=not train,
                momentum=self.norm_momentum,
                epsilon=self.norm_epsilon,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                axis_name=self.bn_axis_name if train else None,
            )
        else:
            norm = partial(
                nn.BatchNorm,
                use_running_average=not train,
                momentum=self.norm_momentum,
                epsilon=self.norm_epsilon,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                axis_name=self.bn_axis_name if train else None,
            )

        x = x.astype(self.dtype)
        if self.stem == "space_to_depth":
            x = space_to_depth(x, 2)
            x = conv(
                64, (4, 4), (1, 1), padding=[(2, 1), (2, 1)], name="conv1_s2d"
            )(x)
        else:
            x = conv(64, (7, 7), (2, 2), padding=[(3, 3), (3, 3)], name="conv1")(x)
        if act_norm is not None:
            x = act_norm(name="bn1")(x)
        else:
            x = nn.relu(norm(name="bn1")(x))
        if self.maxpool == "masked":
            from simhand_tpu.models.pool import max_pool_firstmatch

            x = max_pool_firstmatch(x, (3, 3), (2, 2), ((1, 1), (1, 1)))
        else:
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        fused_site = None
        if self.conv1x1_fuse_min_cin and train:
            if (self.bn_fused or self.bn_subsample > 1
                    or self.bn_stop_gradient_stats):
                raise NotImplementedError(
                    "conv1x1_fuse_min_cin composes only with exact flax "
                    "BN (it owns the whole conv+BN site); disable the "
                    "bn_fused/bn_subsample/stop-gradient variants"
                )
            from simhand_tpu.models.fused_conv import fused_conv_bn_site

            fused_site = partial(
                fused_conv_bn_site,
                train=True,
                momentum=self.norm_momentum,
                epsilon=self.norm_epsilon,
                dtype=self.dtype,
                axis_name=self.bn_axis_name,
            )

        for stage, num_blocks in enumerate(self.stage_sizes):
            for b in range(num_blocks):
                strides = 2 if stage > 0 and b == 0 else 1
                x = self.block(
                    filters=64 * 2**stage,
                    strides=strides,
                    conv=conv,
                    norm=norm,
                    act_norm=act_norm,
                    fuse_min_cin=self.conv1x1_fuse_min_cin,
                    fused_site=fused_site,
                    name=f"layer{stage + 1}_{b}",
                )(x)

        if self.pool:
            x = jnp.mean(x, axis=(1, 2))  # (N, C) global average pool
        return x.astype(jnp.float32)


def space_to_depth(x: jnp.ndarray, block: int = 2) -> jnp.ndarray:
    """(N, H, W, C) -> (N, H/b, W/b, b*b*C); channel order (py, px, c)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // block, block, w // block, block, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(
        n, h // block, w // block, block * block * c
    )


def s2d_stem_kernel(w7: jnp.ndarray) -> jnp.ndarray:
    """Rearranges a (7, 7, C, O) stride-2 stem kernel into the equivalent
    (4, 4, 4*C, O) kernel for the space-to-depth stem.

    Derivation: output(y,x) = sum_{dy,dx} W[dy,dx] I[2y+dy-3, 2x+dx-3].
    Writing dy-3 = 2a + py (py in {0,1}) maps each 7x7 tap onto a 4x4
    stride-1 conv over the s2d tensor with channel layout (py, px, c).
    The inverse direction is exact only while the padded taps stay zero.
    """
    c, o = w7.shape[2], w7.shape[3]
    w2 = jnp.zeros((4, 4, 2, 2, c, o), w7.dtype)
    for dy in range(7):
        a, py = divmod(dy - 3 + 4, 2)  # shift +4 so divmod stays positive
        a -= 2
        for dx in range(7):
            b, px = divmod(dx - 3 + 4, 2)
            b -= 2
            w2 = w2.at[a + 2, b + 2, py, px].set(w7[dy, dx])
    return w2.reshape(4, 4, 4 * c, o)


resnet18 = partial(ResNet, stage_sizes=(2, 2, 2, 2), block=BasicBlock)
resnet34 = partial(ResNet, stage_sizes=(3, 4, 6, 3), block=BasicBlock)
resnet50 = partial(ResNet, stage_sizes=(3, 4, 6, 3), block=Bottleneck)
resnet101 = partial(ResNet, stage_sizes=(3, 4, 23, 3), block=Bottleneck)
resnet152 = partial(ResNet, stage_sizes=(3, 8, 36, 3), block=Bottleneck)

RESNETS = {
    "18": resnet18,
    "34": resnet34,
    "50": resnet50,
    "101": resnet101,
    "152": resnet152,
}

FEATURE_DIMS = {"18": 512, "34": 512, "50": 2048, "101": 2048, "152": 2048}
