"""Camera model and projection matrices (3DGS conventions).

Reference parity: Camera / getProjectionMatrix / getWorld2View2
(igs/models/gs.py:48-113), fov2focal/focal2fov
(igs/utils/graphics_utils.py:73-81).

Convention notes (these trip everyone up):
  * ``world_view_transform`` and ``full_proj_transform`` are stored
    TRANSPOSED (row-vector convention: ``p_row @ M``), exactly like the
    torch reference; the CUDA kernels index them column-major
    (auxiliary.h:74-93) which is the same memory layout.
  * Camera looks down +z in view space; near plane cull is z <= 0.2
    (auxiliary.h:21,170).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp
from flax import struct


def fov2focal(fov, pixels):
    return pixels / (2 * jnp.tan(fov / 2))


def focal2fov(focal, pixels):
    return 2 * jnp.arctan(pixels / (2 * focal))


def get_projection_matrix(znear: float, zfar: float, fovx, fovy) -> jnp.ndarray:
    """Perspective matrix, math convention (column-vector), z∈[0,1].

    Parity: getProjectionMatrix (igs/models/gs.py:61-81) — note the
    reference stores P[2,2]=zfar/(zfar-znear), P[2,3]=-zfar*znear/(zfar-znear)
    (an OpenGL-style matrix mapping znear→near/(far-near)·…, used only for
    culling/w in the rasterizer; depth outputs come from the view transform).
    """
    tan_half_fovy = jnp.tan(fovy / 2)
    tan_half_fovx = jnp.tan(fovx / 2)
    z = jnp.zeros((), dtype=jnp.float32)
    p = jnp.array(
        [
            [1.0 / tan_half_fovx, z, z, z],
            [z, 1.0 / tan_half_fovy, z, z],
            [z, z, zfar / (zfar - znear), -(zfar * znear) / (zfar - znear)],
            [z, z, jnp.ones(()), z],
        ],
        dtype=jnp.float32,
    )
    return p


def world_to_view(r: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """w2c 4x4 from colmap-style R (c2w rotation) and t (w2c translation).

    Parity: getWorld2View2 (igs/models/gs.py:48-59) with default
    translate/scale — reduces to [[Rᵀ, t], [0, 1]].
    """
    m = jnp.zeros((4, 4), dtype=jnp.float32)
    m = m.at[:3, :3].set(r.T)
    m = m.at[:3, 3].set(t)
    m = m.at[3, 3].set(1.0)
    return m


@struct.dataclass
class Camera:
    """Immutable pytree camera.

    ``world_view_transform`` / ``full_proj_transform`` are stored in the
    transposed (row-vector) layout of the reference so downstream math can
    mirror the CUDA indexing 1:1.
    """

    world_view_transform: jnp.ndarray  # (4,4), transposed w2c
    full_proj_transform: jnp.ndarray  # (4,4), transposed w2c@proj
    camera_center: jnp.ndarray  # (3,)
    tanfovx: jnp.ndarray  # scalar
    tanfovy: jnp.ndarray  # scalar
    height: int = struct.field(pytree_node=False, default=512)
    width: int = struct.field(pytree_node=False, default=512)

    znear: float = struct.field(pytree_node=False, default=0.01)
    zfar: float = struct.field(pytree_node=False, default=100.0)

    @property
    def focal_x(self):
        return self.width / (2.0 * self.tanfovx)

    @property
    def focal_y(self):
        return self.height / (2.0 * self.tanfovy)

    @classmethod
    def from_w2c(
        cls,
        w2c: jnp.ndarray,
        fovx,
        fovy,
        height: int,
        width: int,
        znear: float = 0.01,
        zfar: float = 100.0,
    ) -> "Camera":
        """Parity: Camera.__init__ (igs/models/gs.py:90-106)."""
        w2c = jnp.asarray(w2c, dtype=jnp.float32)
        fovx = jnp.asarray(fovx, dtype=jnp.float32)
        fovy = jnp.asarray(fovy, dtype=jnp.float32)
        wvt = w2c.T  # stored transposed
        proj = get_projection_matrix(znear, zfar, fovx, fovy).T
        full = wvt @ proj  # (w2c.T @ proj.T) == (proj_math @ w2c_math).T
        cam_center = jnp.linalg.inv(wvt)[3, :3]
        return cls(
            world_view_transform=wvt,
            full_proj_transform=full,
            camera_center=cam_center,
            tanfovx=jnp.tan(fovx / 2),
            tanfovy=jnp.tan(fovy / 2),
            height=height,
            width=width,
            znear=znear,
            zfar=zfar,
        )

    @classmethod
    def from_c2w(
        cls, c2w: jnp.ndarray, fov: Tuple, resolution: Tuple[int, int]
    ) -> "Camera":
        """Parity: Camera.from_c2w (igs/models/gs.py:108-113)."""
        w2c = jnp.linalg.inv(jnp.asarray(c2w, dtype=jnp.float32))
        return cls.from_w2c(
            w2c, fov[0], fov[1], height=int(resolution[0]), width=int(resolution[1])
        )


def intrinsic_to_fov(fx, fy, w, h):
    """Parity: intrinsic_to_fov (igs/models/gs.py:83-87)."""
    return 2 * jnp.arctan2(w, 2 * fx), 2 * jnp.arctan2(h, 2 * fy)


def get_ray_directions(
    h: int, w: int, focal, principal=None, use_pixel_centers: bool = True
) -> jnp.ndarray:
    """(H, W, 3) camera-space ray dirs, OpenGL-style (-z forward).

    Parity: igs/utils/ops.py:99-136.
    """
    center = 0.5 if use_pixel_centers else 0.0
    if principal is None:
        fx = fy = focal
        cx, cy = w / 2, h / 2
    else:
        fx, fy = focal
        cx, cy = principal
    i, j = jnp.meshgrid(
        jnp.arange(w, dtype=jnp.float32) + center,
        jnp.arange(h, dtype=jnp.float32) + center,
        indexing="xy",
    )
    return jnp.stack([(i - cx) / fx, -(j - cy) / fy, -jnp.ones_like(i)], -1)


def get_rays(directions: jnp.ndarray, c2w: jnp.ndarray, keepdim: bool = True):
    """World-space (origins, normalized dirs). Parity: igs/utils/ops.py:139-183."""
    rays_d = jnp.einsum("...c,rc->...r", directions, c2w[:3, :3])
    rays_o = jnp.broadcast_to(c2w[:3, 3], rays_d.shape)
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True).clip(1e-12)
    if not keepdim:
        rays_o, rays_d = rays_o.reshape(-1, 3), rays_d.reshape(-1, 3)
    return rays_o, rays_d


def ray_to_plucker(rays: jnp.ndarray) -> jnp.ndarray:
    """[origin | dir] (..., 6) → Plücker [unit dir | moment o×d] (..., 6).

    Parity: igs/IGS.py:286-295 (torch F.normalize has eps=1e-12 on the
    denominator; matched here so zero-direction rows behave identically).
    """
    origin, direction = rays[..., :3], rays[..., 3:6]
    direction = direction / jnp.linalg.norm(
        direction, axis=-1, keepdims=True).clip(1e-12)
    moment = jnp.cross(origin, direction)
    return jnp.concatenate([direction, moment], axis=-1)
