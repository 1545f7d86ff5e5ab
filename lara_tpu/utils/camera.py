"""Camera and ray utilities (JAX + NumPy variants for the data pipeline).

TPU-native counterpart of the reference camera math:
  - build_rays                    (dataLoader/utils.py:6-34)
  - fov_to_ixt / intrinsic_to_fov (dataLoader/utils.py:67-86)
  - projection of grid points     (lightning/network.py:182-187)
  - MiniCam / projection matrix   (lightning/utils.py:5-48)
  - ray -> Pluecker encoding      (lightning/network.py:414-423)

Conventions: OpenCV pinhole (+z forward, x right, y down), pixel centers at
(u+0.5, v+0.5), c2w/w2c are 4x4 row-major matrices acting on column vectors.

Note the reference quirk `camera_center = -c2w[:3, 3]` (lightning/utils.py:48):
the SH view direction is computed from the *negated* camera translation. We
reproduce it (``campos_quirk``) because trained weights bake it in.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


def invert_ixt(ixt: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of pinhole intrinsics [..., 3, 3] (fx, fy, cx, cy);
    exact in f32, unlike a general LU inverse."""
    fx, fy = ixt[..., 0, 0], ixt[..., 1, 1]
    cx, cy = ixt[..., 0, 2], ixt[..., 1, 2]
    zeros = jnp.zeros_like(fx)
    ones = jnp.ones_like(fx)
    row0 = jnp.stack([1.0 / fx, zeros, -cx / fx], -1)
    row1 = jnp.stack([zeros, 1.0 / fy, -cy / fy], -1)
    row2 = jnp.stack([zeros, zeros, ones], -1)
    return jnp.stack([row0, row1, row2], -2)


def invert_rigid(m: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of rigid 4x4 transforms [..., 4, 4]."""
    r = m[..., :3, :3]
    t = m[..., :3, 3]
    rt = jnp.swapaxes(r, -1, -2)
    top = jnp.concatenate([rt, -jnp.einsum("...ij,...j->...i", rt, t)[..., None]], -1)
    bottom = jnp.broadcast_to(jnp.array([0.0, 0.0, 0.0, 1.0], m.dtype), (*m.shape[:-2], 1, 4))
    return jnp.concatenate([top, bottom], -2)


class Camera(NamedTuple):
    """Pytree camera for the rasterizer. All fields are arrays so the struct
    can be vmapped over views/batch; image extent is passed statically."""

    w2c: jnp.ndarray      # [4,4] world -> camera
    campos: jnp.ndarray   # [3] position used for SH view dirs (see quirk above)
    tanfovx: jnp.ndarray  # scalar tan(fovx/2)
    tanfovy: jnp.ndarray  # scalar tan(fovy/2)
    near: jnp.ndarray     # scalar
    far: jnp.ndarray      # scalar


def make_camera(c2w, fovx, fovy, near, far, campos_quirk: bool = True) -> Camera:
    """Build a rasterizer Camera from a NeRF/OpenCV c2w pose.

    campos_quirk=True reproduces lightning/utils.py:48 (campos = -c2w[:3,3]);
    set False for the geometrically correct center c2w[:3,3].
    """
    c2w = jnp.asarray(c2w, jnp.float32)
    w2c = invert_rigid(c2w)
    campos = -c2w[:3, 3] if campos_quirk else c2w[:3, 3]
    return Camera(
        w2c=w2c,
        campos=campos,
        tanfovx=jnp.tan(jnp.asarray(fovx, jnp.float32) * 0.5),
        tanfovy=jnp.tan(jnp.asarray(fovy, jnp.float32) * 0.5),
        near=jnp.asarray(near, jnp.float32),
        far=jnp.asarray(far, jnp.float32),
    )


def fov_to_ixt(fov, reso):
    """fov [2] (radians), reso [2] (W,H) -> 3x3 intrinsics.
    Mirrors dataLoader/gobjverse.py:10-15 (principal point at reso/2)."""
    fov = np.asarray(fov, np.float32)
    reso = np.asarray(reso, np.float32)
    ixt = np.eye(3, dtype=np.float32)
    ixt[0, 2], ixt[1, 2] = reso[0] / 2, reso[1] / 2
    focal = 0.5 * reso / np.tan(0.5 * fov)
    ixt[0, 0], ixt[1, 1] = focal[0], focal[1]
    return ixt


def intrinsic_to_fov(K, w=None, h=None):
    """3x3 intrinsics -> (fovx, fovy); dataLoader/utils.py:74-86."""
    fx, fy = K[0, 0], K[1, 1]
    w = K[0, 2] * 2 if w is None else w
    h = K[1, 2] * 2 if h is None else h
    return 2 * np.arctan2(w, 2 * fx), 2 * np.arctan2(h, 2 * fy)


def build_rays_np(c2ws, ixts, H, W, scale: float = 1.0):
    """Per-pixel rays [V,H*scale,W*scale,6] (origin+unnormalized dir).

    NumPy path used by dataset loaders; matches dataLoader/utils.py:21-34
    (pixel centers +0.5, dir_world = K^-1 [u,v,1] rotated by c2w).
    Does NOT mutate `ixts` (the reference scales in place).
    """
    H2, W2 = int(H * scale), int(W * scale)
    ixts = np.array(ixts, np.float32).copy()
    ixts[:, :2] *= scale
    rays_o = c2ws[:, :3, 3][:, None, None]  # [V,1,1,3]
    X, Y = np.meshgrid(np.arange(W2), np.arange(H2))
    uv1 = np.concatenate(
        (X[..., None] + 0.5, Y[..., None] + 0.5, np.ones_like(X[..., None])), axis=-1
    ).astype(np.float32)  # [H,W,3]
    i2w = np.linalg.inv(ixts).transpose(0, 2, 1) @ c2ws[:, :3, :3].transpose(0, 2, 1)
    dirs = np.einsum("hwc,vck->vhwk", uv1, i2w)
    rays_o = np.broadcast_to(rays_o, dirs.shape)
    return np.concatenate((rays_o, dirs), axis=-1).astype(np.float32)


def build_rays(c2ws, ixts, H: int, W: int, scale: float = 1.0) -> jnp.ndarray:
    """JAX version of build_rays_np (same output, differentiable)."""
    H2, W2 = int(H * scale), int(W * scale)
    ixts = jnp.asarray(ixts, jnp.float32)
    ixts = ixts.at[:, :2].multiply(scale)
    X, Y = jnp.meshgrid(jnp.arange(W2, dtype=jnp.float32),
                        jnp.arange(H2, dtype=jnp.float32))
    uv1 = jnp.stack((X + 0.5, Y + 0.5, jnp.ones_like(X)), axis=-1)
    i2w = jnp.swapaxes(invert_ixt(ixts), -1, -2) @ jnp.swapaxes(c2ws[:, :3, :3], -1, -2)
    # Geometry math must not drop to bf16 on the MXU (TPU default precision).
    dirs = jnp.einsum("hwc,vck->vhwk", uv1, i2w, precision=jax.lax.Precision.HIGHEST)
    rays_o = jnp.broadcast_to(c2ws[:, None, None, :3, 3], dirs.shape)
    return jnp.concatenate((rays_o, dirs), axis=-1)


def project_points(points: jnp.ndarray, w2cs: jnp.ndarray, ixts: jnp.ndarray):
    """Project world points into views.

    points [..., 3], w2cs [V,4,4], ixts [V,3,3] ->
    (xy [V, P, 2] pixel coords, z [V, P, 1] camera depth).
    Mirrors lightning/network.py:182-187 (`projection`).
    """
    pts = points.reshape(1, -1, 3)
    cam = pts @ jnp.swapaxes(w2cs[:, :3, :3], -1, -2) + w2cs[:, None, :3, 3]
    img = cam @ jnp.swapaxes(ixts, -1, -2)
    xy = img[..., :2] / img[..., 2:3]
    return xy, img[..., 2:3]


def ray_to_plucker(rays: jnp.ndarray) -> jnp.ndarray:
    """Rays [...,6] (o,d) -> Pluecker coords [...,6] (unit dir, moment o x d).
    Mirrors lightning/network.py:414-423."""
    origin, direction = rays[..., :3], rays[..., 3:6]
    n = jnp.linalg.norm(direction, axis=-1, keepdims=True)
    direction = direction / jnp.maximum(n, 1e-12)
    moment = jnp.cross(origin, direction)
    return jnp.concatenate((direction, moment), axis=-1)


def canonicalize_cameras_np(tar_c2ws, tar_w2cs):
    """Align all poses so the first camera sits at distance r on -z looking at
    the origin (dataLoader/gobjverse.py:59-66). Returns new (c2ws, w2cs,
    transform_mats [1,4,4])."""
    r = np.linalg.norm(tar_c2ws[0, :3, 3])
    ref_c2w = np.eye(4, dtype=np.float32).reshape(1, 4, 4)
    ref_w2c = np.eye(4, dtype=np.float32).reshape(1, 4, 4)
    ref_c2w[:, 2, 3], ref_w2c[:, 2, 3] = -r, r
    transform_mats = ref_c2w @ tar_w2cs[:1]
    new_w2cs = tar_w2cs.copy() @ tar_c2ws[:1] @ ref_w2c
    new_c2ws = transform_mats @ tar_c2ws.copy()
    return new_c2ws.astype(np.float32), new_w2cs.astype(np.float32), transform_mats.astype(np.float32)


def gs_projection_matrix(znear, zfar, fovx, fovy):
    """Gaussian-splatting style projection matrix (lightning/utils.py:5-19).
    Kept for API parity / culling tests; the Pallas rasterizer consumes fov
    directly."""
    tx, ty = np.tan(fovx / 2), np.tan(fovy / 2)
    P = np.zeros((4, 4), np.float32)
    P[0, 0] = 1 / tx
    P[1, 1] = 1 / ty
    P[3, 2] = 1.0
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return P


def depths_to_points(rays: jnp.ndarray, depth: jnp.ndarray) -> jnp.ndarray:
    """Unproject a depthmap along (unnormalized) rays.
    rays [H,W,6], depth [H,W] -> points [H,W,3]
    (lightning/renderer_2dgs.py:74-76)."""
    return rays[..., :3] + depth[..., None] * rays[..., 3:6]


def depth_to_normal(rays: jnp.ndarray, depth: jnp.ndarray):
    """Finite-difference normals from a ray-parameterized depth map.

    rays [H,W,6], depth [H,W] -> (normal [H,W,3] zero-padded at borders,
    points [H,W,3]); mirrors lightning/renderer_2dgs.py:78-89.
    """
    points = depths_to_points(rays, depth)
    dx = points[2:, 1:-1] - points[:-2, 1:-1]
    dy = points[1:-1, 2:] - points[1:-1, :-2]
    n = jnp.cross(dx, dy)
    # rsqrt(sum+eps) keeps the gradient finite at n = 0 (background pixels
    # have constant zero depth → zero cross products; jnp.linalg.norm has a
    # NaN gradient at exactly zero)
    n = n * jax.lax.rsqrt(jnp.sum(n * n, axis=-1, keepdims=True) + 1e-20)
    normal = jnp.zeros_like(points)
    normal = normal.at[1:-1, 1:-1, :].set(n)
    return normal, points
