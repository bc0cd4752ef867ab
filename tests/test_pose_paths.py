"""Camera path generation tests."""

import numpy as np

from aip_tpu.gs.cameras import Camera
from aip_tpu.gs.pose_paths import (
    generate_ellipse_path,
    generate_spiral_path,
    apply_pose,
    circular_pose,
    gaussian_pose,
    viewmatrix,
    focus_point_fn,
)


def _orbit_views(n=8, radius=3.0):
    views = []
    for i in range(n):
        ang = 2 * np.pi * i / n
        # Camera on a circle in xz, looking at the origin.
        pos = np.array([radius * np.sin(ang), 0.0, radius * np.cos(ang)])
        z = -pos / np.linalg.norm(pos)  # forward towards origin
        up = np.array([0.0, 1.0, 0.0])
        x = np.cross(up, z); x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R_c2w = np.stack([x, y, z], 1)
        w2c_R = R_c2w.T
        T = -w2c_R @ pos
        img = np.zeros((16, 16, 3), np.float32)
        views.append(Camera(colmap_id=i, R=w2c_R.T, T=T, FoVx=0.8, FoVy=0.8,
                            image=img, image_name=f"v{i}", uid=i))
    return views


def test_viewmatrix_orthonormal():
    m = viewmatrix(np.array([0.0, 0, 1]), np.array([0.0, 1, 0]), np.zeros(3))
    R = m[:, :3]
    np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-12)


def test_ellipse_path_count_and_validity():
    views = _orbit_views()
    poses = generate_ellipse_path(views, n_frames=24)
    assert len(poses) == 24
    for p in poses:
        # The PCA alignment includes a uniform scale (reference behavior), so
        # R is a scaled rotation: R^T R = s^2 I.
        R = p[:3, :3]
        g = R.T @ R
        s2 = g[0, 0]
        assert s2 > 0
        np.testing.assert_allclose(g, s2 * np.eye(3), atol=1e-6 * max(1, s2))
        assert np.isfinite(p).all()


def test_apply_pose_updates_camera():
    views = _orbit_views()
    poses = generate_ellipse_path(views, n_frames=4)
    cam = apply_pose(views[0], poses[0])
    assert cam.world_view_transform.shape == (4, 4)
    assert np.isfinite(cam.camera_center).all()
    assert not np.allclose(cam.world_view_transform, views[0].world_view_transform)


def test_circular_and_gaussian_poses():
    views = _orbit_views()
    c = circular_pose(views[0], radius=0.5, angle=1.0)
    assert not np.allclose(c.camera_center, views[0].camera_center)
    rng = np.random.default_rng(0)
    g = gaussian_pose(views[0], rng)
    assert np.linalg.norm(g.camera_center - views[0].camera_center) < 0.5


def test_spiral_path():
    views = _orbit_views()
    poses = generate_spiral_path(views, n_frames=12)
    assert len(poses) == 12
    assert all(np.isfinite(p).all() for p in poses)


def test_focus_point_near_origin():
    views = _orbit_views()
    from aip_tpu.gs.pose_paths import _poses_from_views

    poses = _poses_from_views(views)
    fp = focus_point_fn(poses)
    assert np.linalg.norm(fp) < 0.5, fp


def test_spherify_and_spherical_sample_paths():
    from aip_tpu.gs.pose_paths import (
        generate_spherify_path, generate_spherical_sample_path,
    )

    views = _orbit_views()
    sp = generate_spherify_path(views, n_frames=16)
    assert len(sp) == 16
    assert all(np.isfinite(p).all() for p in sp)
    ss = generate_spherical_sample_path(views, n=3)
    assert len(ss) == 9
    assert all(np.isfinite(p).all() for p in ss)
