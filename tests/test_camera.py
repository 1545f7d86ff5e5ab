import jax.numpy as jnp
import numpy as np

from lara_tpu.utils.camera import (
    build_rays,
    build_rays_np,
    canonicalize_cameras_np,
    depth_to_normal,
    fov_to_ixt,
    intrinsic_to_fov,
    make_camera,
    project_points,
    ray_to_plucker,
)


def _look_at(eye, target=np.zeros(3), up=np.array([0.0, 1.0, 0.0])):
    """OpenCV-convention c2w: +z toward target."""
    z = target - eye
    z = z / np.linalg.norm(z)
    x = np.cross(up, z)
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = x, y, z, eye
    return c2w


def test_fov_ixt_roundtrip():
    fov = np.array([0.7, 0.7], np.float32)
    ixt = fov_to_ixt(fov, np.array([512, 512]))
    fx, fy = intrinsic_to_fov(ixt)
    np.testing.assert_allclose([fx, fy], fov, atol=1e-5)


def test_rays_hit_projected_point():
    c2w = _look_at(np.array([0.4, 0.3, -2.0]))
    ixt = fov_to_ixt(np.array([0.8, 0.8]), np.array([64, 64]))
    rays = build_rays_np(c2w[None], ixt[None], 64, 64, 1.0)

    p = np.array([0.05, -0.08, 0.1], np.float32)
    w2c = np.linalg.inv(c2w)
    xy, z = project_points(jnp.asarray(p), jnp.asarray(w2c[None]), jnp.asarray(ixt[None]))
    u, v = np.asarray(xy[0, 0])
    assert z[0, 0, 0] > 0
    j, i = int(u), int(v)
    o, d = rays[0, i, j, :3], rays[0, i, j, 3:]
    # The pixel-center ray should pass within a pixel's footprint of p.
    t = np.dot(p - o, d) / np.dot(d, d)
    dist = np.linalg.norm(o + t * d - p)
    pixel_world = float(z[0, 0, 0]) / ixt[0, 0] * 1.5
    assert dist < pixel_world


def test_build_rays_jax_matches_np():
    c2w = np.stack([_look_at(np.array([0.0, 0.5, -2.0])), _look_at(np.array([1.5, 0.0, -1.0]))])
    ixt = np.stack([fov_to_ixt(np.array([0.8, 0.8]), np.array([32, 32]))] * 2)
    r_np = build_rays_np(c2w, ixt, 32, 32, 1.0)
    r_jx = np.asarray(build_rays(jnp.asarray(c2w), jnp.asarray(ixt), 32, 32, 1.0))
    np.testing.assert_allclose(r_jx, r_np, atol=1e-5)
    # scale=1/16 path must not mutate ixt and yields 2x2 ray grid
    r_dn = build_rays_np(c2w, ixt, 32, 32, 1.0 / 16)
    assert r_dn.shape == (2, 2, 2, 6)


def test_canonicalize_first_view_on_minus_z():
    c2ws = np.stack([_look_at(np.array([1.0, 0.8, -1.2])), _look_at(np.array([-1.0, 0.2, 1.4]))])
    w2cs = np.linalg.inv(c2ws)
    r = np.linalg.norm(c2ws[0, :3, 3])
    new_c2w, new_w2c, tmats = canonicalize_cameras_np(c2ws, w2cs)
    np.testing.assert_allclose(new_c2w[0, :3, 3], [0, 0, -r], atol=1e-5)
    np.testing.assert_allclose(new_c2w[0, :3, :3], np.eye(3), atol=1e-5)
    # Relative pose between the two cameras is preserved.
    rel_old = w2cs[1] @ c2ws[0]
    rel_new = new_w2c[1] @ new_c2w[0]
    np.testing.assert_allclose(rel_new, rel_old, atol=1e-4)
    # w2c stays the inverse of c2w.
    np.testing.assert_allclose(new_w2c[1] @ new_c2w[1], np.eye(4), atol=1e-4)


def test_plucker_invariance():
    # Pluecker coords are invariant to sliding the origin along the ray.
    o = jnp.array([[0.3, -0.2, 0.5]])
    d = jnp.array([[0.1, 0.9, 0.4]])
    r1 = ray_to_plucker(jnp.concatenate([o, d], -1))
    r2 = ray_to_plucker(jnp.concatenate([o + 2.7 * d, d * 3.0], -1))
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-5)


def test_depth_to_normal_flat_plane():
    # A fronto-parallel plane at depth z0 seen through a pinhole: normals -z.
    c2w = np.eye(4, dtype=np.float32)
    ixt = fov_to_ixt(np.array([0.6, 0.6]), np.array([16, 16]))
    rays = jnp.asarray(build_rays_np(c2w[None], ixt[None], 16, 16, 1.0)[0])
    depth = jnp.full((16, 16), 2.0)
    normal, points = depth_to_normal(rays, depth)
    inner = np.asarray(normal[2:-2, 2:-2] @ np.array([0.0, 0.0, 1.0]))
    assert np.all(np.abs(np.abs(inner) - 1.0) < 1e-4)
    np.testing.assert_allclose(np.asarray(points[..., 2]), 2.0, atol=1e-5)


def test_make_camera_quirk():
    c2w = _look_at(np.array([0.0, 0.0, -2.0]))
    cam = make_camera(jnp.asarray(c2w), 0.8, 0.8, 0.5, 4.0)
    np.testing.assert_allclose(np.asarray(cam.campos), [0, 0, 2.0], atol=1e-6)
    cam2 = make_camera(jnp.asarray(c2w), 0.8, 0.8, 0.5, 4.0, campos_quirk=False)
    np.testing.assert_allclose(np.asarray(cam2.campos), [0, 0, -2.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(cam.w2c @ c2w), np.eye(4), atol=1e-5)
