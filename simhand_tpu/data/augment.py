"""On-device fused augmentation pipeline (the production input path).

The reference augments per-sample with OpenCV on 24 CPU workers — the
stated throughput limiter at global batch 8192 (SURVEY.md §3.1). Here the
host only decodes JPEGs into fixed 224x224 uint8 crops; everything else
runs batched on the TPU inside the train step's jit program:

  sobel -> cutout -> gaussian blur -> [rotate + crop + resize as ONE
  fused inverse affine warp] -> HSV color jitter -> gaussian noise ->
  color drop -> ImageNet normalization

Geometry is exact w.r.t. the reference chain (same crop-box math, same
OpenCV rotation convention, same recorded jitter params for the PeCLR
equivariance). Photometric ops follow the reference formulas in float
where the reference uses uint8 arithmetic; the resampling filter is
bilinear for the single fused warp vs the reference's
INTER_LINEAR-rotate + INTER_AREA-resize pair. See tests/test_augment.py
for the statistical parity checks against the cv2 pipeline.

Everything is (B, H, W, C)-batched, shape-static, and differentiable-free
(pure data transforms), so XLA fuses it with the input conversion and it
rides the VPU.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from simhand_tpu.core.geometry import (
    apply_affine_2d,
    crop_box_from_joints,
    opencv_rotation_matrix,
)
from simhand_tpu.data.augment_cv2 import AugmentFlags, AugmentParams

Array = jax.Array

IMAGENET_MEAN = jnp.array([0.485, 0.456, 0.406], jnp.float32)
IMAGENET_STD = jnp.array([0.229, 0.224, 0.225], jnp.float32)


class AugmentedBatch(NamedTuple):
    images: Array        # (B, out, out, 3) float32, ImageNet-normalized
    joints: Array        # (B, 21, 3) post-augmentation 2.5D joints
    angle: Array         # (B,)
    jitter_x: Array      # (B,)
    jitter_y: Array      # (B,)


# --------------------------------------------------------------------------
# geometry: fused inverse-affine bilinear warp
# --------------------------------------------------------------------------

def affine_warp(images: Array, mats: Array, out_hw: tuple[int, int]) -> Array:
    """Warps (B, H, W, C) images by forward affines (B, 2, 3) into
    (B, out_h, out_w, C), bilinear, zero-padded outside (cv2.warpAffine
    semantics: dst(x, y) = src(A_inv @ (x, y)))."""
    B, H, W, C = images.shape
    out_h, out_w = out_hw

    # invert the 2x3 affine
    a, b, tx = mats[:, 0, 0], mats[:, 0, 1], mats[:, 0, 2]
    c, d, ty = mats[:, 1, 0], mats[:, 1, 1], mats[:, 1, 2]
    det = a * d - b * c
    ia, ib = d / det, -b / det
    ic, id_ = -c / det, a / det
    itx = -(ia * tx + ib * ty)
    ity = -(ic * tx + id_ * ty)

    ys = jnp.arange(out_h, dtype=jnp.float32)
    xs = jnp.arange(out_w, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)                       # (out_h, out_w)

    sx = ia[:, None, None] * gx + ib[:, None, None] * gy + itx[:, None, None]
    sy = ic[:, None, None] * gx + id_[:, None, None] * gy + ity[:, None, None]

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx = sx - x0
    wy = sy - y0

    def sample(yi, xi):
        inside = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xi_c = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        flat = images.reshape(B, H * W, C)
        idx = yi_c * W + xi_c                            # (B, oh, ow)
        vals = jnp.take_along_axis(
            flat, idx.reshape(B, -1, 1), axis=1
        ).reshape(B, out_h, out_w, C)
        return vals * inside[..., None]

    v00 = sample(y0, x0)
    v01 = sample(y0, x0 + 1)
    v10 = sample(y0 + 1, x0)
    v11 = sample(y0 + 1, x0 + 1)
    wx = wx[..., None]
    wy = wy[..., None]
    return (
        v00 * (1 - wx) * (1 - wy)
        + v01 * wx * (1 - wy)
        + v10 * (1 - wx) * wy
        + v11 * wx * wy
    )


# --------------------------------------------------------------------------
# photometric ops (batched, float [0, 255])
# --------------------------------------------------------------------------

def rgb_to_hsv_cv2(img: Array) -> Array:
    """OpenCV 8-bit HSV ranges: H in [0,180), S,V in [0,255].

    NOTE: the reference calls COLOR_BGR2HSV on RGB crops, so channel 0 is
    treated as blue. We reproduce that by swapping channels first.
    """
    bgr_as_rgb = img[..., ::-1]
    r, g, b = bgr_as_rgb[..., 0], bgr_as_rgb[..., 1], bgr_as_rgb[..., 2]
    v = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    diff = v - mn
    s = jnp.where(v > 0, 255.0 * diff / jnp.maximum(v, 1e-6), 0.0)
    safe = jnp.maximum(diff, 1e-6)
    h = jnp.where(
        v == r, 30.0 * (g - b) / safe,
        jnp.where(v == g, 60.0 + 30.0 * (b - r) / safe,
                  120.0 + 30.0 * (r - g) / safe),
    )
    h = jnp.where(h < 0, h + 180.0, h)
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_rgb_cv2(hsv: Array) -> Array:
    """Inverse of rgb_to_hsv_cv2 (returns the same RGB-as-BGR layout)."""
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    h = (h % 180.0) / 30.0
    s = s / 255.0
    i = jnp.floor(h)
    f = h - i
    p = v * (1 - s)
    q = v * (1 - s * f)
    t = v * (1 - s * (1 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, v, q])
    bgr_as_rgb = jnp.stack([r, g, b], axis=-1)
    return bgr_as_rgb[..., ::-1]


def color_jitter(img: Array, h_f: Array, s_f: Array, a_f: Array, b_f: Array) -> Array:
    """hue*h, sat*s, val*a+b, each clipped to [0,255]
    (reference: sample_augmenter.py:273-300)."""
    hsv = rgb_to_hsv_cv2(img)
    h = jnp.clip(hsv[..., 0] * h_f[:, None, None], 0, 255)
    s = jnp.clip(hsv[..., 1] * s_f[:, None, None], 0, 255)
    v = jnp.clip(
        hsv[..., 2] * a_f[:, None, None] + b_f[:, None, None], 0, 255
    )
    return hsv_to_rgb_cv2(jnp.stack([h, s, v], axis=-1))


def grayscale_cv2_on_rgb(img: Array) -> Array:
    """cv2 BGR2GRAY applied to RGB data (the reference quirk):
    0.114*R + 0.587*G + 0.299*B."""
    gray = 0.114 * img[..., 0] + 0.587 * img[..., 1] + 0.299 * img[..., 2]
    return jnp.repeat(gray[..., None], 3, axis=-1)


def sobel_filter(img: Array, ksize: int = 3) -> Array:
    """Sobel_x + Sobel_y of the grayscale image, broadcast to 3 channels."""
    gray = grayscale_cv2_on_rgb(img)[..., :1]           # (B, H, W, 1)
    kx = jnp.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], jnp.float32)
    out = jax.lax.conv_general_dilated(
        gray.transpose(0, 3, 1, 2),
        (kx + kx.T)[None, None],
        (1, 1),
        "SAME",
    ).transpose(0, 2, 3, 1)
    return jnp.repeat(out, 3, axis=-1)


def gaussian_blur(img: Array, sigma: Array, ksize: int) -> Array:
    """Separable gaussian with per-sample sigma (reference: kernel =
    10% of image size rounded odd, sigma ~ U(0.1, 2))."""
    half = ksize // 2
    x = jnp.arange(-half, half + 1, dtype=jnp.float32)
    kern = jnp.exp(-(x[None, :] ** 2) / (2 * sigma[:, None] ** 2))
    kern = kern / jnp.sum(kern, axis=1, keepdims=True)  # (B, k)

    def blur_one(im, k1d):
        # horizontal then vertical, per channel
        imc = im.transpose(2, 0, 1)[:, None]            # (C, 1, H, W)
        kh = k1d[None, None, None, :]
        kv = k1d[None, None, :, None]
        out = jax.lax.conv_general_dilated(imc, kh, (1, 1), "SAME")
        out = jax.lax.conv_general_dilated(out, kv, (1, 1), "SAME")
        return out[:, 0].transpose(1, 2, 0)

    return jax.vmap(blur_one)(img, kern)


def cut_out(img: Array, joints_xy: Array, key: Array,
            frac_range: tuple[float, float]) -> Array:
    """Rectangle around a random joint filled with a random gray value."""
    B, H, W, _ = img.shape
    k1, k2, k3 = jax.random.split(key, 3)
    ratio = jax.random.uniform(
        k1, (B,), minval=frac_range[0], maxval=frac_range[1]
    )
    joint_idx = jax.random.randint(k2, (B,), 0, 20)
    fill = jax.random.randint(k3, (B,), 0, 255).astype(img.dtype)
    cx = jnp.take_along_axis(joints_xy[..., 0], joint_idx[:, None], axis=1)[:, 0]
    cy = jnp.take_along_axis(joints_xy[..., 1], joint_idx[:, None], axis=1)[:, 0]
    d0 = (H * ratio).astype(jnp.int32)
    d1 = (W * ratio).astype(jnp.int32)
    # reference quirk: box anchored at joint - d/2 along dim0=x, dim1=y
    top0 = (cx - d0 / 2).astype(jnp.int32)
    top1 = (cy - d1 / 2).astype(jnp.int32)
    rows = jnp.arange(H)[None, :, None]
    cols = jnp.arange(W)[None, None, :]
    mask = (
        (rows >= top0[:, None, None]) & (rows < (top0 + d0)[:, None, None])
        & (cols >= top1[:, None, None]) & (cols < (top1 + d1)[:, None, None])
    )
    return jnp.where(mask[..., None], fill[:, None, None, None], img)


def gaussian_noise(img: Array, key: Array, std: float) -> Array:
    """cv2.randn-into-uint8 semantics: noise saturates at [0,255], the
    add wraps modulo 256."""
    noise = jnp.clip(
        jax.random.normal(key, img.shape) * std, 0.0, 255.0
    )
    return jnp.mod(img + jnp.round(noise), 256.0)


# --------------------------------------------------------------------------
# the fused pipeline
# --------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("flags", "params", "out_size"))
def device_augment(
    images: Array,       # (B, H, W, 3) uint8 or float RGB
    joints: Array,       # (B, 21, 3) pixel-space 2.5D joints
    key: Array,
    flags: AugmentFlags,
    params: AugmentParams,
    out_size: int = 128,
) -> AugmentedBatch:
    """One view's full augmentation chain, batched on device."""
    B, H, W, _ = images.shape
    img = images.astype(jnp.float32)
    j = joints.astype(jnp.float32)

    keys = jax.random.split(key, 12)
    coin = lambda k: jax.random.bernoulli(k, 0.5, (B,))

    if flags.sobel_filter:
        img = jnp.where(
            coin(keys[0])[:, None, None, None], sobel_filter(img), img
        )
    if flags.cut_out:
        cut = cut_out(img, j[..., :2], keys[1], params.cut_out_fraction)
        img = jnp.where(coin(keys[2])[:, None, None, None], cut, img)
    if flags.gaussian_blur:
        ksize = int(H * 0.1)
        ksize = ksize + 1 if ksize % 2 == 0 else ksize
        sigma = jax.random.uniform(keys[3], (B,), minval=0.1, maxval=2.0)
        img = jnp.where(
            coin(keys[4])[:, None, None, None],
            gaussian_blur(img, sigma, ksize),
            img,
        )

    # ---- fused geometric transform: rotate about joint centroid, crop
    # around joints, resize to out_size — one warp.
    angle = jnp.zeros((B,), jnp.float32)
    if flags.rotate:
        angle = jnp.floor(
            jax.random.uniform(
                keys[5], (B,), minval=params.min_angle, maxval=params.max_angle
            )
        )
    center = jnp.trunc(jnp.mean(j[..., :2], axis=1))
    rot = opencv_rotation_matrix(center[:, 0], center[:, 1], angle)
    j_rot = jnp.concatenate(
        [apply_affine_2d(j[..., :2], rot), j[..., 2:]], axis=-1
    )

    if flags.crop:
        jitter = jnp.trunc(
            jax.random.uniform(
                keys[6], (B, 2), minval=0.0, maxval=params.crop_box_jitter[1]
            )
        )
    else:
        jitter = jnp.zeros((B, 2))
    if flags.random_crop:
        margin = jax.random.uniform(
            keys[7], (B,),
            minval=params.crop_margin_range[0],
            maxval=params.crop_margin_range[1],
        )
    else:
        margin = jnp.full((B,), params.crop_margin)
    origin, side, rec_jitter = crop_box_from_joints(j_rot[..., :2], margin, jitter)
    side = jnp.maximum(side, 1.0)

    # Reference crop is a numpy slice img[oy:oy+side, ox:ox+side] — it
    # TRUNCATES at the right/bottom image edge, and the resize then
    # stretches the truncated (possibly non-square) region with per-axis
    # factors (augment_cv2.py crop+resize). Use the same clipped extents
    # here or edge-overflowing boxes (common: side routinely exceeds the
    # distance to the 224-crop border) diverge from the host/cv2 path.
    H, W = img.shape[1], img.shape[2]
    w_c = jnp.maximum(jnp.minimum(origin[:, 0] + side, W) - origin[:, 0], 1.0)
    h_c = jnp.maximum(jnp.minimum(origin[:, 1] + side, H) - origin[:, 1], 1.0)
    scale_xy = jnp.stack([out_size / w_c, out_size / h_c], axis=1)  # (B, 2)
    # total forward affine: per-axis scale * (rot - origin_shift)
    mats = rot.at[:, 0, 2].add(-origin[:, 0]).at[:, 1, 2].add(-origin[:, 1])
    mats = mats * scale_xy[:, :, None]
    img = affine_warp(img, mats, (out_size, out_size))
    j_aug = jnp.concatenate(
        [apply_affine_2d(j[..., :2], mats), j[..., 2:]], axis=-1
    )

    if flags.color_jitter:
        ck = jax.random.split(keys[8], 4)
        h_f = jax.random.uniform(ck[0], (B,), minval=params.hue_factor_range[0],
                                 maxval=params.hue_factor_range[1])
        s_f = jax.random.uniform(ck[1], (B,), minval=params.sat_factor_range[0],
                                 maxval=params.sat_factor_range[1])
        a_f = jax.random.uniform(ck[2], (B,),
                                 minval=params.value_factor_alpha_range[0],
                                 maxval=params.value_factor_alpha_range[1])
        b_f = jax.random.uniform(ck[3], (B,),
                                 minval=params.value_factor_beta_range[0],
                                 maxval=params.value_factor_beta_range[1])
        img = color_jitter(img, h_f, s_f, a_f, b_f)

    if flags.gaussian_noise:
        nk, ck = jax.random.split(keys[10])
        noisy = gaussian_noise(img, nk, params.noise_std)
        img = jnp.where(coin(ck)[:, None, None, None], noisy, img)

    if flags.color_drop:
        img = jnp.where(
            coin(keys[11])[:, None, None, None], grayscale_cv2_on_rgb(img), img
        )

    img = jnp.clip(img, 0.0, 255.0) / 255.0
    img = (img - IMAGENET_MEAN) / IMAGENET_STD

    return AugmentedBatch(
        images=img,
        joints=j_aug,
        angle=angle,
        jitter_x=rec_jitter[:, 0],
        jitter_y=rec_jitter[:, 1],
    )


def prepare_views(
    raw: dict,
    key: Array,
    flags: AugmentFlags,
    params: AugmentParams,
    out_size: int = 128,
) -> dict:
    """Raw host batch -> full train-step batch, both views augmented
    on-device.

    ``raw`` carries per-view uint8 crops + pixel joints + normalized raw
    joints: image{1,2} (B, 224, 224, 3), joints{1,2} (B, 21, 3),
    joints_raw{1,2} (B, 21, 3). For same-image experiment types the host
    simply duplicates the crop into both slots.
    """
    k1, k2 = jax.random.split(key)
    v1 = device_augment(raw["image1"], raw["joints1"], k1, flags, params, out_size)
    v2 = device_augment(raw["image2"], raw["joints2"], k2, flags, params, out_size)

    def ori(jr):
        j = jnp.asarray(jr, jnp.float32)
        return j.at[..., 0].mul(float(out_size)).at[..., 1].mul(float(out_size))

    return {
        "transformed_image1": v1.images,
        "transformed_image2": v2.images,
        "joints1_aug": v1.joints,
        "joints2_aug": v2.joints,
        "joints1_ori": ori(raw["joints_raw1"]),
        "joints2_ori": ori(raw["joints_raw2"]),
        "angle_1": v1.angle,
        "angle_2": v2.angle,
        "jitter_x_1": v1.jitter_x,
        "jitter_x_2": v2.jitter_x,
        "jitter_y_1": v1.jitter_y,
        "jitter_y_2": v2.jitter_y,
    }
