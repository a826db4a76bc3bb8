"""Differentiable MANO hand layer in JAX.

Replaces the external ``manopth`` dependency of the reference
(minimal-hand/model/shape_net.py:9, demo.py) with a self-contained
implementation of the MANO forward model (Romero et al., SIGGRAPH Asia
2017): shape blend -> pose blend -> kinematic chain -> linear blend
skinning. Pose input is 16 rotation matrices (root + 15 joints), which is
what the AIK solver produces, so no axis-angle round trip is needed.

Requires the MANO model pickle (MANO_RIGHT.pkl) from the official site —
not redistributable, so everything here is gated on the file path. The
pickle contains chumpy arrays; a stub unpickler converts them to numpy
without needing chumpy installed.
"""
from __future__ import annotations

import pickle

import numpy as np

import jax
import jax.numpy as jnp

# fingertip vertex ids: thumb, index, middle, ring, pinky
TIP_VERTEX_IDS = (744, 320, 443, 555, 672)


def _chumpy_tolerant_load(path: str) -> dict:
    class _Stub:
        def __setstate__(self, state):
            self.__dict__.update(state)

    class _Unpickler(pickle.Unpickler):
        def find_class(self, module, name):
            if module.startswith("chumpy"):
                return _Stub
            return super().find_class(module, name)

    with open(path, "rb") as f:
        data = _Unpickler(f, encoding="latin1").load()

    def to_np(x):
        if isinstance(x, _Stub):
            # chumpy Ch arrays store their value in 'x'
            return np.asarray(x.__dict__.get("x"))
        return x

    return {k: to_np(v) for k, v in data.items()}


class ManoModel:
    """Static MANO params + jitted forward.

    Construct from the official pickle (``ManoModel(path)``) or from a raw
    parameter dict (``ManoModel(params=d)`` — used by tests with synthetic
    parameters, since the MANO assets are not redistributable).
    """

    def __init__(self, pkl_path: str | None = None, params: dict | None = None):
        d = params if params is not None else _chumpy_tolerant_load(pkl_path)
        self.v_template = jnp.asarray(d["v_template"], jnp.float32)      # (778, 3)
        self.shapedirs = jnp.asarray(np.asarray(d["shapedirs"]), jnp.float32)  # (778, 3, 10)
        self.posedirs = jnp.asarray(d["posedirs"], jnp.float32)          # (778, 3, 135)
        self.J_regressor = jnp.asarray(
            np.asarray(
                d["J_regressor"].todense()
                if hasattr(d["J_regressor"], "todense")
                else d["J_regressor"]
            ),
            jnp.float32,
        )                                                                # (16, 778)
        self.weights = jnp.asarray(d["weights"], jnp.float32)            # (778, 16)
        kt = np.asarray(d["kintree_table"])
        self.parents = kt[0].astype(np.int32)                            # (16,)
        self.parents[0] = 0
        # triangle faces (1538, 3) — present in the official pickle ('f');
        # optional so synthetic test params keep working
        self.faces = (
            np.asarray(d["f"], np.int32) if d.get("f") is not None else None
        )

    def shaped_joints(self, beta: jnp.ndarray) -> jnp.ndarray:
        """(B, 10) betas -> (B, 16, 3) rest-pose skeleton joints."""
        v_shaped = (
            jnp.einsum("vck,bk->bvc", self.shapedirs, beta) + self.v_template
        )
        return jnp.einsum("jv,bvc->bjc", self.J_regressor, v_shaped)

    def __call__(self, pose_rotmats: jnp.ndarray, beta: jnp.ndarray):
        """MANO forward.

        Args:
          pose_rotmats: (B, 16, 3, 3) — global root rotation + 15 relative
            joint rotations in MANO order.
          beta: (B, 10) shape coefficients.

        Returns:
          verts: (B, 778, 3), joints21: (B, 21, 3) in MANO 21-joint order
          (16 skeleton joints + 5 fingertip vertices, the reference's
          get_joints_from_mano_mesh convention).
        """
        B = beta.shape[0]
        v_shaped = (
            jnp.einsum("vck,bk->bvc", self.shapedirs, beta) + self.v_template
        )
        joints = jnp.einsum("jv,bvc->bjc", self.J_regressor, v_shaped)  # (B,16,3)

        eye = jnp.eye(3, dtype=pose_rotmats.dtype)
        pose_feat = (pose_rotmats[:, 1:] - eye).reshape(B, 135)
        v_posed = v_shaped + jnp.einsum("vck,bk->bvc", self.posedirs, pose_feat)

        # forward kinematics
        def make_transform(R, t):
            top = jnp.concatenate([R, t[..., None]], axis=-1)
            bottom = jnp.broadcast_to(
                jnp.array([0.0, 0.0, 0.0, 1.0], R.dtype), top.shape[:-2] + (1, 4)
            )
            return jnp.concatenate([top, bottom], axis=-2)

        transforms = [make_transform(pose_rotmats[:, 0], joints[:, 0])]
        for j in range(1, 16):
            p = int(self.parents[j])
            local = make_transform(
                pose_rotmats[:, j], joints[:, j] - joints[:, p]
            )
            transforms.append(jnp.einsum("bij,bjk->bik", transforms[p], local))
        A = jnp.stack(transforms, axis=1)                                # (B,16,4,4)

        # remove the rest-pose joint location (SMPL-style correction)
        joints_h = jnp.concatenate(
            [joints, jnp.zeros((B, 16, 1), joints.dtype)], axis=-1
        )
        correction = jnp.einsum("bjik,bjk->bji", A, joints_h)            # (B,16,4)
        A = A.at[:, :, :3, 3].add(-correction[..., :3])

        T = jnp.einsum("vj,bjik->bvik", self.weights, A)                 # (B,778,4,4)
        v_h = jnp.concatenate([v_posed, jnp.ones((B, 778, 1), v_posed.dtype)], -1)
        verts = jnp.einsum("bvik,bvk->bvi", T, v_h)[..., :3]

        posed_joints = A[:, :, :3, 3] + jnp.einsum(
            "bjik,bjk->bji", A[:, :, :3, :3], joints
        )
        tips = verts[:, TIP_VERTEX_IDS, :]
        joints21 = jnp.concatenate([posed_joints, tips], axis=1)
        return verts, joints21


def relative_bone_lengths(mano: ManoModel, beta: jnp.ndarray) -> jnp.ndarray:
    """15 bone lengths of the shaped skeleton, normalized by the
    wrist->middle_mcp reference bone, in the reference's reorder
    (minimal-hand/model/shape_net.py:49-81 new_cal_ref_bone)."""
    parent_index = jnp.asarray(
        [0, 0, 1, 2, 0, 4, 5, 0, 7, 8, 0, 10, 11, 0, 13, 14], jnp.int32
    )
    reorder = jnp.asarray(
        [13, 14, 15, 1, 2, 3, 4, 5, 6, 10, 11, 12, 7, 8, 9], jnp.int32
    )
    j = mano.shaped_joints(beta)                                         # (B,16,3)
    rel = j - j[:, parent_index]
    ref = jnp.linalg.norm(j[:, 4] - j[:, 0], axis=-1, keepdims=True)
    lengths = jnp.linalg.norm(rel, axis=-1) / ref
    return lengths[:, reorder]
