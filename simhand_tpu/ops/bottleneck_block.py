"""One whole frozen bottleneck block as a single Mosaic program.

The round-4 experiment VERDICT asked for: rounds 2-3 closed every
*attachable* kernel route (BN-epilogue custom-VJP −9%, conv1x1 sites
−16.5%, masked maxpool −14.3%) with the same root cause — a pallas_call
boundary inside XLA's fusion graph forfeits more than the kernel wins.
The one untested hypothesis was "own a whole conv+BN+ReLU chain end to
end". The cheapest honest test is the FROZEN serving forward (no BN
backward, no train-step layout coupling): one layer4 identity bottleneck
of the reference's torchvision resnet50 (resnet_model.py wraps
torchvision.models.resnet50; the block structure is
torchvision/models/resnet.py:Bottleneck) with BN folded into per-channel
scale/bias:

    h1 = relu(x @ W1 + b1)              # 1x1, Cin -> Cm
    h2 = relu(conv3x3(h1, W2) + b2)     # 3x3 'SAME', Cm -> Cm
    y  = relu(x + h2 @ W3 + b3)         # 1x1, Cm -> Cout == Cin

Layout: NHWC flattened to an (M, C) matrix, M = B*H*W image-major, so
every conv is an MXU matmul. The 3x3 runs as 9 tap matmuls on
row-shifted views of h1: for tap (dy, dx) the shift is dy*W + dx rows,
and a per-row validity mask zeroes rows whose (y+dy, x+dx) falls outside
the image — because the tile is image-aligned (T a multiple of H*W),
every unmasked shifted read stays inside the same image, so a plain
static roll is exact 'SAME' zero-padding.

Intermediates h1/h2 live only in VMEM: HBM traffic is read x + read
weights + write y — the minimum any implementation of the block can do.
At layer4 (H=W=4, Cin=2048, Cm=512, B=256) that is ~43 MB vs ~36.5
GFLOP, i.e. compute-bound on paper; the A/B (scripts/bench_block.py)
measures whether Mosaic reaches the MXU floor XLA already approaches.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TAPS = tuple((dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1))


def _block_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                  out_ref, *, h: int, w: int, tap_mode: str):
    x = x_ref[...]                                          # (T, Cin) bf16
    t = x.shape[0]
    hw = h * w

    # conv1 1x1 + bias + relu (f32 accumulate on the MXU)
    h1 = jnp.dot(x, w1_ref[...], preferred_element_type=jnp.float32)
    h1 = jnp.maximum(h1 + b1_ref[...], 0.0).astype(x.dtype)  # (T, Cm)

    # conv2 3x3 'SAME' on row-shifted h1. Row r sits at
    # (y, x) = divmod(r % hw, w) inside its image; tap (dy, dx) reads row
    # r + dy*w + dx, valid only inside the image — masked rows are the
    # zero padding.
    pos = jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0) % hw
    py, px = pos // w, pos % w

    def tap(ti):
        dy, dx = TAPS[ti]
        off = dy * w + dx
        shifted = h1 if off == 0 else jnp.roll(h1, -off, axis=0)
        valid = ((py + dy >= 0) & (py + dy < h)
                 & (px + dx >= 0) & (px + dx < w))
        return jnp.where(valid, shifted, jnp.zeros_like(shifted))

    cm = w2_ref.shape[-1]
    if tap_mode == "im2col":
        # one (T, 9*Cm) @ (9*Cm, Cm) matmul — a single long-K MXU pass
        # instead of 9 short-K ones (w2 is stored tap-major, so its
        # (9*Cm, Cm) view is exactly the concat's contraction order)
        cat = jnp.concatenate([tap(ti) for ti in range(9)], axis=1)
        acc = jnp.dot(cat, w2_ref[...].reshape(9 * cm, cm),
                      preferred_element_type=jnp.float32)
    else:
        acc = jnp.zeros((t, cm), jnp.float32)
        for ti in range(9):
            acc += jnp.dot(tap(ti), w2_ref[ti],
                           preferred_element_type=jnp.float32)
    h2 = jnp.maximum(acc + b2_ref[...], 0.0).astype(x.dtype)  # (T, Cm)

    # conv3 1x1 + bias + shortcut add + relu
    h3 = jnp.dot(h2, w3_ref[...], preferred_element_type=jnp.float32)
    y = jnp.maximum(h3 + b3_ref[...] + x.astype(jnp.float32), 0.0)
    out_ref[...] = y.astype(x.dtype)


def bottleneck_block(x2d, w1, b1, w2, b2, w3, b3, *, hw,
                     tile_rows: int | None = None, tap_mode: str = "loop",
                     interpret=None):
    """relu(x + conv1x1(relu(conv3x3(relu(conv1x1(x)·)+b2)·)+b3)) — one
    pallas program, identity shortcut (stride 1, Cin == Cout).

    x2d: (M, Cin) bf16, M = B*H*W image-major. w1 (Cin, Cm), w2
    (9, Cm, Cm) tap-major over TAPS, w3 (Cm, Cout) — bf16; biases f32.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    h, w = hw
    m, cin = x2d.shape
    cm = w1.shape[1]
    cout = w3.shape[1]
    if cout != cin:
        raise ValueError("identity-shortcut block needs Cin == Cout")
    img = h * w
    if m % img:
        raise ValueError(f"rows {m} not a multiple of H*W={img}")
    if tile_rows is None:
        # image-aligned tile, >=128 rows for MXU shape, capped so the
        # working set (x + out double-buffered + h1/acc + weights) stays
        # inside ~16 MB VMEM
        tile_rows = img
        while (tile_rows < 128 or tile_rows % 8) and tile_rows * 2 <= m:
            tile_rows *= 2
        while m % tile_rows:
            tile_rows -= img
    if tile_rows % img or m % tile_rows:
        raise ValueError(
            f"tile_rows={tile_rows} must be an image-aligned divisor of "
            f"{m} (H*W={img})")

    kernel = functools.partial(_block_kernel, h=h, w=w,
                               tap_mode=tap_mode)
    # weights/biases: whole-array VMEM operands — fetched once, resident
    # across the row-tile grid (constant index), never double-buffered
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(m // tile_rows,),
        in_specs=[
            pl.BlockSpec((tile_rows, cin), lambda i: (i, 0)),
            full, full, full, full, full, full,
        ],
        out_specs=pl.BlockSpec((tile_rows, cin), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, cin), x2d.dtype),
        interpret=interpret,
    )(x2d, w1, b1.reshape(1, cm).astype(jnp.float32),
      w2, b2.reshape(1, cm).astype(jnp.float32),
      w3, b3.reshape(1, cout).astype(jnp.float32))


# ---------------------------------------------------------------------------
# folding + in-context wiring (the serving-forward A/B arms)
# ---------------------------------------------------------------------------

def fold_block_weights(fw: dict, name: str, dtype=jnp.bfloat16):
    """Folded-(conv+BN) weights of one bottleneck block from the
    serving fold map (int8_infer._fold_resnet) -> pallas operands."""
    (k1, b1) = fw[f"{name}/conv1"]
    (k2, b2) = fw[f"{name}/conv2"]
    (k3, b3) = fw[f"{name}/conv3"]
    cin, cm = k1.shape[2], k1.shape[3]
    w1 = jnp.asarray(k1.reshape(cin, cm), dtype)
    # (3, 3, Cm, Cm) -> (9, Cm, Cm), tap-major matching TAPS (ky=dy+1,
    # kx=dx+1 — torchvision 3x3 'SAME' correlation, no kernel flip)
    w2 = jnp.asarray(k2.reshape(9, cm, cm), dtype)
    w3 = jnp.asarray(k3.reshape(cm, k3.shape[3]), dtype)
    return (w1, jnp.asarray(b1, jnp.float32),
            w2, jnp.asarray(b2, jnp.float32),
            w3, jnp.asarray(b3, jnp.float32))


class FoldedBf16Ops:
    """bf16 folded-BN serving walk ops (int8_infer._walk_resnet
    interpretation): conv in bf16 with f32 accumulate, f32 bias, relu,
    back to bf16 — the XLA arm of the block A/B, structurally identical
    to the pallas arm so the A/B isolates codegen, not math."""

    def __init__(self, fw: dict, block_pallas: dict | None = None,
                 tap_mode: str = "loop", tile_rows: int | None = None):
        self.tap_mode = tap_mode
        self.tile_rows = tile_rows
        self.fw = {k: (jnp.asarray(w, jnp.bfloat16),
                       jnp.asarray(b, jnp.float32)) for k, (w, b) in
                   fw.items()}
        #: name -> pallas operand tuple for blocks the kernel owns
        self.block_pallas = block_pallas or {}

    def input(self, key, x):
        return x.astype(jnp.bfloat16)

    def _conv_bias(self, key, x, stride, padding):
        w, b = self.fw[key]
        y = jax.lax.conv_general_dilated(
            x, w, (stride, stride), padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return y + b

    def conv_bn_relu(self, key, x, stride, padding, out_f32=False):
        y = jax.nn.relu(self._conv_bias(key, x, stride, padding))
        return y if out_f32 else y.astype(jnp.bfloat16)

    def conv_bn(self, key, x, stride, padding):
        return self._conv_bias(key, x, stride, padding).astype(jnp.bfloat16)

    def add_relu(self, key, y, shortcut):
        return jax.nn.relu(
            y.astype(jnp.float32) + shortcut.astype(jnp.float32)
        ).astype(jnp.bfloat16)

    def maxpool(self, x):
        import flax.linen as nn

        return nn.max_pool(x, (3, 3), strides=(2, 2),
                           padding=[(1, 1), (1, 1)])

    def to_f32(self, x):
        return x.astype(jnp.float32)

    def quantize(self, key, x):
        return x

    def block_override(self, name, x, stride, cin, cout):
        """Whole-block pallas takeover for registered identity blocks
        (int8_infer._walk_resnet consults this hook)."""
        ops = self.block_pallas.get(name)
        if ops is None or stride != 1 or cin != cout:
            return None
        b, h, w, c = x.shape
        y = bottleneck_block(x.reshape(b * h * w, c), *ops, hw=(h, w),
                             tap_mode=self.tap_mode,
                             tile_rows=self.tile_rows)
        return y.reshape(b, h, w, c)


def make_folded_encoder_bf16(variables: dict, backbone: str = "50",
                             pallas_blocks: tuple = (),
                             tap_mode: str = "loop",
                             tile_rows: int | None = None):
    """Frozen bf16 folded encoder forward (embedding only). With
    pallas_blocks=('layer4_1', 'layer4_2') the named identity blocks run
    as single Mosaic programs — the round-4 whole-block A/B arms."""
    from simhand_tpu.serving.int8_infer import _fold_resnet, _walk_resnet

    params = variables["params"]["encoder"]
    stats = variables["batch_stats"]["encoder"]
    fw = _fold_resnet(params, stats, backbone)
    block_ops = {name: fold_block_weights(fw, name)
                 for name in pallas_blocks}
    ops = FoldedBf16Ops(fw, block_ops, tap_mode=tap_mode,
                        tile_rows=tile_rows)

    def forward(images):
        return _walk_resnet(ops, backbone, images, pool=True)

    return forward
