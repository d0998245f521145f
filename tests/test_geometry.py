import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transplat_tpu.geometry import (
    build_covariance,
    epipolar_sample_grid,
    eval_sh,
    get_fov,
    get_world_rays,
    project,
    quaternion_to_matrix,
    relative_pose,
    rotate_sh,
    sample_image_grid,
    unnormalize_intrinsics,
    unproject,
)
from transplat_tpu.geometry.epipolar import inverse_depth_candidates


def random_pose(key):
    """Random camera-to-world pose."""
    k1, k2 = jax.random.split(key)
    q = jax.random.normal(k1, (4,))
    q = q / jnp.linalg.norm(q)
    r = quaternion_to_matrix(q)
    t = jax.random.normal(k2, (3,))
    pose = jnp.eye(4).at[:3, :3].set(r).at[:3, 3].set(t)
    return pose


def default_intrinsics():
    return jnp.array([[1.0, 0.0, 0.5], [0.0, 1.0, 0.5], [0.0, 0.0, 1.0]])


class TestProjection:
    def test_project_unproject_roundtrip(self):
        key = jax.random.PRNGKey(0)
        intr = default_intrinsics()
        extr = random_pose(key)
        coords = jax.random.uniform(jax.random.PRNGKey(1), (64, 2))
        z = jax.random.uniform(jax.random.PRNGKey(2), (64,), minval=1.0, maxval=10.0)
        cam_pts = unproject(coords, z, intr)
        world = jnp.einsum(
            "ij,nj->ni", extr, jnp.concatenate([cam_pts, jnp.ones((64, 1))], -1)
        )[:, :3]
        xy, in_front = project(world, extr, intr)
        np.testing.assert_allclose(np.asarray(xy), np.asarray(coords), atol=1e-4)
        assert bool(jnp.all(in_front))

    def test_world_rays_hit_projection(self):
        intr = default_intrinsics()
        extr = random_pose(jax.random.PRNGKey(3))
        coords = jnp.array([[0.25, 0.75], [0.5, 0.5]])
        origins, dirs = get_world_rays(coords, extr, intr)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(dirs), axis=-1), 1.0, atol=1e-5
        )
        pts = origins + dirs * 3.7
        xy, _ = project(pts, extr, intr)
        np.testing.assert_allclose(np.asarray(xy), np.asarray(coords), atol=1e-4)

    def test_sample_image_grid(self):
        coords, idx = sample_image_grid((4, 8))
        assert coords.shape == (4, 8, 2)
        assert idx.shape == (4, 8, 2)
        # First pixel center: x = 0.5/8, y = 0.5/4.
        np.testing.assert_allclose(
            np.asarray(coords[0, 0]), [0.5 / 8, 0.5 / 4], atol=1e-6
        )
        np.testing.assert_allclose(np.asarray(idx[1, 3]), [1, 3])

    def test_fov_of_unit_intrinsics(self):
        fov = get_fov(default_intrinsics()[None])
        # fx=1 (normalized) -> half-frustum extent 0.5/1 -> fov = 2*atan(0.5)
        np.testing.assert_allclose(
            np.asarray(fov[0]), 2 * np.arctan(0.5), atol=1e-5
        )

    def test_unnormalize_intrinsics(self):
        k = unnormalize_intrinsics(default_intrinsics(), (128, 256))
        np.testing.assert_allclose(np.asarray(k[0, 0]), 256.0)
        np.testing.assert_allclose(np.asarray(k[1, 2]), 64.0)


class TestCovariance:
    def test_quaternion_identity(self):
        r = quaternion_to_matrix(jnp.array([0.0, 0.0, 0.0, 1.0]))
        np.testing.assert_allclose(np.asarray(r), np.eye(3), atol=1e-6)

    def test_quaternion_orthonormal(self):
        q = jax.random.normal(jax.random.PRNGKey(5), (10, 4))
        q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
        r = quaternion_to_matrix(q)
        rtr = jnp.einsum("nij,nik->njk", r, r)
        np.testing.assert_allclose(
            np.asarray(rtr), np.broadcast_to(np.eye(3), (10, 3, 3)), atol=1e-5
        )

    def test_covariance_psd_and_eigvals(self):
        scale = jnp.array([1.0, 2.0, 3.0])
        q = jax.random.normal(jax.random.PRNGKey(6), (4,))
        q = q / jnp.linalg.norm(q)
        cov = build_covariance(scale, q)
        np.testing.assert_allclose(np.asarray(cov), np.asarray(cov).T, atol=1e-5)
        eig = np.sort(np.linalg.eigvalsh(np.asarray(cov)))
        np.testing.assert_allclose(eig, [1.0, 4.0, 9.0], rtol=1e-4)


class TestSH:
    @pytest.mark.parametrize("degree", [0, 1, 2, 3, 4])
    def test_rotation_consistency(self, degree):
        """eval(rotate_sh(c, R), d) == eval(c, R^T d)."""
        n = (degree + 1) ** 2
        key = jax.random.PRNGKey(degree)
        sh = jax.random.normal(key, (3, n))
        q = jax.random.normal(jax.random.PRNGKey(degree + 10), (4,))
        q = q / jnp.linalg.norm(q)
        r = quaternion_to_matrix(q)
        dirs = jax.random.normal(jax.random.PRNGKey(degree + 20), (32, 3))
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

        rotated = rotate_sh(sh, r)
        lhs = eval_sh(rotated[None], dirs[:, None, :].squeeze(1))
        rhs = eval_sh(sh[None], jnp.einsum("ji,nj->ni", r, dirs))
        # eval_sh broadcasting: evaluate per direction.
        lhs = jax.vmap(lambda d: eval_sh(rotated, d))(dirs)
        rhs = jax.vmap(lambda d: eval_sh(sh, d))(jnp.einsum("ji,nj->ni", r, dirs))
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-4)

    def test_identity_rotation_is_noop(self):
        sh = jax.random.normal(jax.random.PRNGKey(0), (3, 25))
        out = rotate_sh(sh, jnp.eye(3))
        np.testing.assert_allclose(np.asarray(out), np.asarray(sh), atol=1e-4)

    def test_dc_component_invariant(self):
        sh = jax.random.normal(jax.random.PRNGKey(1), (3, 25))
        q = jax.random.normal(jax.random.PRNGKey(2), (4,))
        r = quaternion_to_matrix(q / jnp.linalg.norm(q))
        out = rotate_sh(sh, r)
        np.testing.assert_allclose(
            np.asarray(out[..., 0]), np.asarray(sh[..., 0]), atol=1e-5
        )


class TestEpipolar:
    def test_inverse_depth_candidates(self):
        d = inverse_depth_candidates(jnp.array(1.0), jnp.array(100.0), 128)
        assert d.shape == (128,)
        np.testing.assert_allclose(float(d[0]), 0.01, atol=1e-6)
        np.testing.assert_allclose(float(d[-1]), 1.0, atol=1e-6)

    def test_identity_pose_grid_maps_to_self(self):
        h = w = 16
        intr = unnormalize_intrinsics(default_intrinsics(), (h, w))
        rel = jnp.eye(4)
        depths = jnp.array([1.0, 2.0, 5.0])
        grid = epipolar_sample_grid(intr, rel, depths, h, w)
        assert grid.shape == (3, h * w, 2)
        xs = (jnp.arange(w, dtype=jnp.float32) / (w - 1))[None, :].repeat(h, 0).reshape(-1)
        ys = (jnp.arange(h, dtype=jnp.float32) / (h - 1))[:, None].repeat(w, 1).reshape(-1)
        for d in range(3):
            np.testing.assert_allclose(np.asarray(grid[d, :, 0]), np.asarray(xs), atol=1e-4)
            np.testing.assert_allclose(np.asarray(grid[d, :, 1]), np.asarray(ys), atol=1e-4)

    def test_translated_camera_shifts_grid(self):
        h = w = 16
        intr = unnormalize_intrinsics(default_intrinsics(), (h, w))
        # Other camera shifted +x in ref-camera coords: points appear shifted -x,
        # scaled by disparity.
        e_ref = jnp.eye(4)
        e_tgt = jnp.eye(4).at[0, 3].set(1.0)
        rel = relative_pose(e_ref, e_tgt)
        depths = jnp.array([2.0])
        grid = epipolar_sample_grid(intr, rel, depths, h, w)
        # Shift in pixels: fx * tx / z = 16 * (-1) / 2 = -8 px -> -8/(w-1) in [0,1].
        expected_shift = -16.0 / 2.0 / (w - 1)
        base = epipolar_sample_grid(intr, jnp.eye(4), depths, h, w)
        np.testing.assert_allclose(
            np.asarray(grid[0, :, 0] - base[0, :, 0]),
            np.full(h * w, expected_shift),
            atol=1e-4,
        )
