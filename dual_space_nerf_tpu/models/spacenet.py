"""The Dual-Space NeRF model family as Flax modules.

Architecture (behavioral reference, re-designed for JAX — citations are to
/root/reference):

- ``SpaceNet`` (`model/spacenet.py:18-148`): canonical-space radiance MLP.
  PE(L=10, incl. input) -> 63-d; per-frame code nn.Embedding(500, 8); 16-d
  pose feature; stage1 = 4 x Linear(87->256)+ReLU; stage2 = 3 x
  Linear(256+63->256)+ReLU with positional skip; density head Linear(256->1)
  (no activation); essence head ReLU->Linear(256->128)->ReLU->Linear(128->3).
  `use_dir` is hardcoded False in the reference (`spacenet.py:22`).
- ``LightingMLP`` (`model/spacenet.py:152-188`): world-space lighting.
  Input [normal(3), xyz_world(3), unit view dir(3)] (L=0 PE = identity),
  MLP 9->128->128->1 + ELU; output w+1 multiplies the essence RGB.
- ``PoseMLP`` (`model/spacenet.py:199-205`): 23 joints x quaternion-minus-
  identity (92-d) -> 64 -> 64 -> 16.
- ``rod2quat`` (`model/spacenet.py:314-331`): rotation vectors -> (qx, qy,
  qz, qw-1), zero at rest pose.

Everything is a pure function of (params, inputs): frame-code zeroing for
novel-pose inference (`spacenet.py:126-129`, `test.py:196`) is the
``code_scale`` argument instead of mutable module state; lighting-space
rotation/translation (`spacenet.py:254-263`) are explicit renderer inputs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.posenc import posenc, posenc_dim
from .layers import Dense, mlp


def rod2quat(rot_vecs: jnp.ndarray) -> jnp.ndarray:
    """Rotation vectors (J, 3) -> quaternions-minus-identity (J, 4).

    qw = cos(theta/2) - 1 so the rest pose maps to the zero vector
    (reference `spacenet.py:314-331`, including its +1e-16 regularizer).
    """
    angle = jnp.linalg.norm(rot_vecs + 1e-16, axis=-1, keepdims=True)
    rot_dir = rot_vecs / angle
    half = angle / 2.0
    sin = jnp.sin(half)
    xyz = rot_dir * sin
    qw = jnp.cos(half) - 1.0
    return jnp.concatenate([xyz, qw], axis=-1)


class SpaceNet(nn.Module):
    """Canonical-space density + essence-color field."""

    max_frames: int = 500
    code_dim: int = 8
    essence_dim: int = 3
    backbone_dim: int = 256
    pe_freqs: int = 10
    compute_dtype: object = None  # e.g. jnp.bfloat16; params stay f32

    def setup(self):
        if self.code_dim > 0:
            self.embedding = nn.Embed(
                self.max_frames,
                self.code_dim,
                embedding_init=nn.initializers.normal(stddev=1.0),
            )

    @nn.compact
    def __call__(
        self,
        pos: jnp.ndarray,          # (N, 3) canonical xyz
        frame_idx: jnp.ndarray,    # (N,) int32
        pose_feat: jnp.ndarray,    # (N, 16)
        code_scale: jnp.ndarray | float = 1.0,
        density_only: bool = False,
        code: jnp.ndarray | None = None,  # precomputed (code_dim,) frame code
    ):
        """Returns (essence (N, 3), density (N, 1)); essence is None when
        density_only.

        When all points share one frame (the renderer's case), pass the
        embedding row via ``code`` — its gradient is then a cheap reduction
        over the broadcast instead of a 352k-row scatter-add into the
        (max_frames, code_dim) table (~3 ms/step on v5e, measured)."""
        pe = posenc(pos, self.pe_freqs)  # (N, 63)
        if self.code_dim > 0:
            if code is None:
                # out-of-range frame ids would make XLA's gather FILL with
                # NaN (torch's nn.Embedding raises); clamp as a bounds check
                frame_idx = jnp.clip(frame_idx, 0, self.max_frames - 1)
                code = self.embedding(frame_idx) * code_scale
            else:
                code = code * code_scale
            code = jnp.broadcast_to(code, (pos.shape[0], self.code_dim))
            x = jnp.concatenate([code, pe, pose_feat], axis=-1)
        else:
            x = pe
        dt = self.compute_dtype
        x = mlp(x, [self.backbone_dim] * 4, activate_final=True, dtype=dt)
        x = jnp.concatenate([x, pe.astype(x.dtype)], axis=-1)
        x = mlp(x, [self.backbone_dim] * 3, activate_final=True, dtype=dt)
        # heads in f32: density feeds second-order normals and the
        # compositing exponent; essence feeds the photometric loss
        density = Dense(1)(x.astype(jnp.float32))
        if density_only:
            return None, density
        h = jax.nn.relu(x)
        h = jax.nn.relu(Dense(self.backbone_dim // 2, dtype=dt)(h))
        essence = Dense(self.essence_dim)(h.astype(jnp.float32))
        return essence, density

    @property
    def pos_dim(self) -> int:
        return posenc_dim(3, self.pe_freqs)


class LightingMLP(nn.Module):
    """World-space scalar lighting multiplier."""

    width: int = 128
    compute_dtype: object = None

    @nn.compact
    def __call__(
        self,
        normal: jnp.ndarray,       # (N, 3) world-space unit surface normal
        xyz_world: jnp.ndarray,    # (N, 3)
        view_dir_world: jnp.ndarray,  # (N, 3), normalized inside
        essence: jnp.ndarray,      # (N, 3)
    ) -> jnp.ndarray:
        view = view_dir_world / jnp.linalg.norm(
            view_dir_world, axis=-1, keepdims=True
        )
        x = jnp.concatenate([normal, xyz_world, view], axis=-1)  # (N, 9)
        x = mlp(x, [self.width, self.width, 1], dtype=self.compute_dtype)
        w = jax.nn.elu(x.astype(jnp.float32)) + 1.0
        return w * essence


class PoseMLP(nn.Module):
    """23-joint quaternion pose encoding -> 16-d feature."""

    @nn.compact
    def __call__(self, pose_quat_flat: jnp.ndarray) -> jnp.ndarray:
        """pose_quat_flat: (..., 92) -> (..., 16)."""
        return mlp(pose_quat_flat, [64, 64, 16])


class DualSpaceNeRF(nn.Module):
    """Composition of the three networks.

    The renderer orchestrates the actual dual-space pipeline (warp, autodiff
    normals, normal re-mapping, light-space transforms); this module only owns
    parameters and the three differentiable sub-functions, exposed as methods
    so they can be addressed via ``model.apply(..., method=...)``.
    """

    max_frames: int = 500
    code_dim: int = 8
    essence_dim: int = 3
    backbone_dim: int = 256
    compute_dtype: object = None

    def setup(self):
        self.nerf = SpaceNet(
            max_frames=self.max_frames,
            code_dim=self.code_dim,
            essence_dim=self.essence_dim,
            backbone_dim=self.backbone_dim,
            compute_dtype=self.compute_dtype,
        )
        self.lighting_mlp = LightingMLP(compute_dtype=self.compute_dtype)
        self.pose_mlp = PoseMLP()

    def pose_feature(self, body_pose: jnp.ndarray) -> jnp.ndarray:
        """body_pose: (23, 3) joint rotation vectors -> (16,) feature.

        Reference `spacenet.py:222-236` (body joints = poses[1:, :]).
        """
        quat = rod2quat(body_pose).reshape(-1)  # (92,)
        return self.pose_mlp(quat)

    def sigma_essence(
        self,
        pos_cano: jnp.ndarray,
        frame_idx: jnp.ndarray,
        pose_feat: jnp.ndarray,
        code_scale,
        density_only: bool = False,
        code: jnp.ndarray | None = None,
    ):
        return self.nerf(
            pos_cano, frame_idx, pose_feat, code_scale,
            density_only=density_only, code=code,
        )

    def frame_code(self, frame: jnp.ndarray) -> jnp.ndarray:
        """Embedding row for one scalar frame index (clamped); a zero-width
        code when the model is configured without one (CODE_DIM=0 creates
        no embedding table)."""
        if self.code_dim <= 0:
            return jnp.zeros((0,), jnp.float32)
        idx = jnp.clip(frame, 0, self.max_frames - 1)
        return self.nerf.embedding(idx[None])[0]

    def lighting(self, normal, xyz_world, view_dir_world, essence):
        return self.lighting_mlp(normal, xyz_world, view_dir_world, essence)

    def __call__(self, pos_cano, frame_idx, pose_feat, code_scale=1.0):
        """Parameter-initialization convenience: touches every submodule."""
        essence, density = self.sigma_essence(
            pos_cano, frame_idx, pose_feat, code_scale
        )
        dummy_normal = jnp.zeros_like(pos_cano)
        color = self.lighting(dummy_normal, pos_cano, pos_cano + 1.0, essence)
        _ = self.pose_feature(jnp.zeros((23, 3), pos_cano.dtype))
        return color, density
