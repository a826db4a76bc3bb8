"""PeCLR feature-space equivariance: undo crop-translation and rotation
directly on the 128-D projections viewed as 64 2-D points.

Replicates the reference semantics exactly (src/models/utils.py:636-701 and
the shared ``get_transformed_projections`` of the PeCLR/SiMHand families,
e.g. src/models/unsupervised/simhand_w_model.py:35-94):

  1. normalize each 128-D projection;
  2. view as (2B, 64, 2);
  3. translate by ``-jitter`` (normalized by image side), scaled per-sample
     by the (stop-gradient) max-min spread of each axis;
  4. rotate by ``-angle`` degrees about the (stop-gradient) centroid,
     OpenCV matrix convention;
  5. re-normalize the flattened halves.

All ops are functional; stop_gradient mirrors torch's ``.detach()`` on the
centroid / spread statistics.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from simhand_tpu.core.geometry import apply_affine_2d, opencv_rotation_matrix

Array = jax.Array


def _l2_normalize(x: Array, axis: int = -1, eps: float = 1e-12) -> Array:
    # torch F.normalize semantics: x / max(||x||, eps).
    # The clamp goes INSIDE the sqrt (max is monotonic, so the forward is
    # bit-identical) because jnp.linalg.norm's gradient at x == 0 is
    # 0/0 = NaN and `0 * NaN = NaN` leaks through jnp.maximum's chain
    # rule. An exactly-zero vector is reachable: per-device BN over a
    # batch of identical rows (B=1 shards, duplicated views) zeroes the
    # projection head's output, and torch defines the subgradient there
    # as 0 — one poisoned device otherwise NaNs every replica via the
    # gradient pmean.
    sq = jnp.sum(x * x, axis=axis, keepdims=True)
    return x / jnp.sqrt(jnp.maximum(sq, eps * eps))


def translate_encodings(enc: Array, translate_x: Array, translate_y: Array) -> Array:
    """Shift (B, P, 2) encodings along x/y by normalized jitter, scaled by
    each sample's (detached) per-axis spread.

    Reference: src/models/utils.py:661-684.
    """
    stats = jax.lax.stop_gradient(enc)
    spread = jnp.max(stats, axis=1) - jnp.min(stats, axis=1)  # (B, 2)
    dx = (translate_x * spread[:, 0])[:, None]
    dy = (translate_y * spread[:, 1])[:, None]
    return jnp.stack([enc[..., 0] + dx, enc[..., 1] + dy], axis=-1)


def translate_encodings_exact(
    enc: Array, translate_x: Array, translate_y: Array
) -> Array:
    """Exact-shift variant: adds the normalized jitter directly, without the
    per-sample spread scaling (the reference's "new strategy", imported by
    every model but never called — kept for API parity).

    Reference: src/models/utils.py:686-701 (``translate_encodings2``).
    """
    return jnp.stack(
        [enc[..., 0] + translate_x[:, None], enc[..., 1] + translate_y[:, None]],
        axis=-1,
    )


def rotate_encodings(enc: Array, angle_deg: Array) -> Array:
    """Rotate (B, P, 2) encodings by ``angle_deg`` about their (detached)
    centroid, OpenCV 2D-rotation convention.

    Reference: src/models/utils.py:606-658.
    """
    center = jnp.mean(jax.lax.stop_gradient(enc), axis=1)  # (B, 2)
    mat = opencv_rotation_matrix(center[:, 0], center[:, 1], angle_deg)
    return apply_affine_2d(enc, mat)


def inverse_transform_projections(
    projections: Array,
    jitter_x: Array | None,
    jitter_y: Array | None,
    angles: Array | None,
    image_side: float,
):
    """Applies the full PeCLR inverse transform to raw projections.

    Args:
      projections: (2B, D) raw (un-normalized) projection-head outputs,
        first B rows = view 1, last B rows = view 2.
      jitter_x, jitter_y: (2B,) crop jitters in pixels (concatenated views),
        or None if crop equivariance is off.
      angles: (2B,) rotation angles in degrees, or None if rotation
        equivariance is off.
      image_side: input image side length used to normalize the jitter.

    Returns:
      (z1, z2): (B, D) re-normalized projections of each view.
    """
    two_b, d = projections.shape
    b = two_b // 2
    z = jnp.concatenate(
        [
            _l2_normalize(projections[:b]),
            _l2_normalize(projections[b:]),
        ],
        axis=0,
    ).reshape(two_b, d // 2, 2)

    if jitter_x is not None:
        z = translate_encodings(z, -jitter_x / image_side, -jitter_y / image_side)
    if angles is not None:
        z = rotate_encodings(z, -angles)

    z = z.reshape(two_b, d)
    return _l2_normalize(z[:b]), _l2_normalize(z[b:])
