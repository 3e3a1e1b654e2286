"""Camera model: pixel->ray generation with iterative undistortion, pose
interpolation, and scene normalization.

Semantics match the reference (cited by file:line into /root/reference):
  * OpenGL-style c2w poses: camera looks down -z, pixel ray direction in
    camera frame is (u, -v, -1) with u=(j+.5-cx)/fx, v=(i+.5-cy)/fy in
    OpenCV image coords (Dataset.cu:98-123, Dataset.cpp:148-178).
  * Radial-tangential (k1,k2,p1,p2) distortion inverted by Newton iteration
    (Dataset.cu:14-69). The reference runs 100 iterations with numerical
    central-difference Jacobians; on TPU we run a fixed, jit-friendly number
    of Newton steps with the analytic Jacobian, which converges to the same
    fixed point (validated in tests against the reference formulas).
  * Scene normalization: camera centroid -> origin, max radius -> 1
    (Dataset.cpp:127-146).
  * Pose slerp for novel-view paths (CameraUtils.cpp:11-41).

All functions are pure jnp and jittable. Everything is float32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def apply_distortion(params: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray):
    """Forward distortion displacement (du, dv).

    Matches apply_camera_distortion (reference Dataset.cu:14-27):
      radial = k1*r2 + k2*r2^2
      du = u*radial + 2*p1*u*v + p2*(r2 + 2*u^2)
      dv = v*radial + 2*p2*u*v + p1*(r2 + 2*v^2)
    ``params`` is [..., 4] = (k1, k2, p1, p2); u, v broadcast against it.
    """
    k1, k2, p1, p2 = params[..., 0], params[..., 1], params[..., 2], params[..., 3]
    u2, v2, uv = u * u, v * v, u * v
    r2 = u2 + v2
    radial = k1 * r2 + k2 * r2 * r2
    du = u * radial + 2.0 * p1 * uv + p2 * (r2 + 2.0 * u2)
    dv = v * radial + 2.0 * p2 * uv + p1 * (r2 + 2.0 * v2)
    return du, dv


def undistort(params: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray, n_iters: int = 10):
    """Invert the distortion: find (x, y) with (x, y) + D(x, y) = (u, v).

    Newton iteration with the analytic Jacobian of the OpenCV
    radial-tangential model; same fixed point as the reference's
    iterative_camera_undistortion (Dataset.cu:31-69).
    """
    k1, k2, p1, p2 = params[..., 0], params[..., 1], params[..., 2], params[..., 3]

    def body(_, xy):
        x, y = xy
        x2, y2, xy_ = x * x, y * y, x * y
        r2 = x2 + y2
        radial = k1 * r2 + k2 * r2 * r2
        dradial_dr2 = k1 + 2.0 * k2 * r2
        # residual F = (x + du - u, y + dv - v)
        du = x * radial + 2.0 * p1 * xy_ + p2 * (r2 + 2.0 * x2)
        dv = y * radial + 2.0 * p2 * xy_ + p1 * (r2 + 2.0 * y2)
        fx_ = x + du - u
        fy_ = y + dv - v
        # analytic Jacobian of (x + du, y + dv)
        j00 = 1.0 + radial + x * dradial_dr2 * 2.0 * x + 2.0 * p1 * y + 6.0 * p2 * x
        j01 = x * dradial_dr2 * 2.0 * y + 2.0 * p1 * x + 2.0 * p2 * y
        j10 = y * dradial_dr2 * 2.0 * x + 2.0 * p2 * y + 2.0 * p1 * x
        j11 = 1.0 + radial + y * dradial_dr2 * 2.0 * y + 2.0 * p2 * x + 6.0 * p1 * y
        det = j00 * j11 - j01 * j10
        det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
        sx = (j11 * fx_ - j01 * fy_) / det
        sy = (-j10 * fx_ + j00 * fy_) / det
        return (x - sx, y - sy)

    x, y = jax.lax.fori_loop(0, n_iters, body, (u, v))
    return x, y


def pixel_to_ray(pose: jnp.ndarray, intri: jnp.ndarray, dist: jnp.ndarray,
                 i: jnp.ndarray, j: jnp.ndarray, n_undistort_iters: int = 10):
    """Pixel (i=row, j=col, already +0.5-shifted) -> world ray (o, d).

    ``pose`` [..., 3, 4] c2w, ``intri`` [..., 3, 3], ``dist`` [..., 4].
    Matches Img2WorldRayKernel (reference Dataset.cu:98-123): OpenCV (u, v)
    are undistorted, then dir = R @ (u, -v, -1) (OpenGL), o = translation.
    """
    fx = intri[..., 0, 0]
    fy = intri[..., 1, 1]
    cx = intri[..., 0, 2]
    cy = intri[..., 1, 2]
    u = (j - cx) / fx
    v = (i - cy) / fy  # OpenCV-style v
    u, v = undistort(dist, u, v, n_undistort_iters)
    dirs_cam = jnp.stack([u, -v, -jnp.ones_like(u)], axis=-1)  # OpenGL
    rays_d = jnp.einsum("...ab,...b->...a", pose[..., :3, :3], dirs_cam)
    rays_o = jnp.broadcast_to(pose[..., :3, 3], rays_d.shape)
    return rays_o, rays_d


def normalize_scene(poses: np.ndarray, bounds: np.ndarray):
    """Translate camera centroid to origin and scale max radius to 1.

    Returns (poses, bounds, center, radius); reference Dataset.cpp:127-146.
    Host-side numpy (runs once at dataset load).
    """
    poses = np.array(poses, dtype=np.float32, copy=True)
    cam_pos = poses[:, :3, 3]
    center = cam_pos.mean(axis=0)
    radius = float(np.linalg.norm(cam_pos - center, axis=-1).max())
    poses[:, :3, 3] = (cam_pos - center) / radius
    bounds = np.asarray(bounds, dtype=np.float32) / radius
    return poses, bounds, center.astype(np.float32), radius


def invert_pose(poses: np.ndarray) -> np.ndarray:
    """c2w [n,3,4] -> w2c [n,3,4] (reference Dataset.cpp:137-143)."""
    n = poses.shape[0]
    full = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    full[:, :3, :] = poses
    return np.linalg.inv(full)[:, :3, :].astype(np.float32)


def _quat_from_mat(m: np.ndarray) -> np.ndarray:
    """Rotation matrix -> quaternion (w, x, y, z), host numpy."""
    w = np.sqrt(max(0.0, 1.0 + m[0, 0] + m[1, 1] + m[2, 2])) / 2.0
    if w < 1e-6:
        # fall back to largest diagonal element branch
        if m[0, 0] >= m[1, 1] and m[0, 0] >= m[2, 2]:
            x = np.sqrt(max(0.0, 1.0 + m[0, 0] - m[1, 1] - m[2, 2])) / 2.0
            y = (m[0, 1] + m[1, 0]) / (4.0 * x)
            z = (m[0, 2] + m[2, 0]) / (4.0 * x)
            w = (m[2, 1] - m[1, 2]) / (4.0 * x)
        elif m[1, 1] >= m[2, 2]:
            y = np.sqrt(max(0.0, 1.0 - m[0, 0] + m[1, 1] - m[2, 2])) / 2.0
            x = (m[0, 1] + m[1, 0]) / (4.0 * y)
            z = (m[1, 2] + m[2, 1]) / (4.0 * y)
            w = (m[0, 2] - m[2, 0]) / (4.0 * y)
        else:
            z = np.sqrt(max(0.0, 1.0 - m[0, 0] - m[1, 1] + m[2, 2])) / 2.0
            x = (m[0, 2] + m[2, 0]) / (4.0 * z)
            y = (m[1, 2] + m[2, 1]) / (4.0 * z)
            w = (m[1, 0] - m[0, 1]) / (4.0 * z)
        return np.array([w, x, y, z])
    x = (m[2, 1] - m[1, 2]) / (4.0 * w)
    y = (m[0, 2] - m[2, 0]) / (4.0 * w)
    z = (m[1, 0] - m[0, 1]) / (4.0 * w)
    return np.array([w, x, y, z])


def _mat_from_quat(q: np.ndarray) -> np.ndarray:
    w, x, y, z = q / np.linalg.norm(q)
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def pose_interpolate(pose_0: np.ndarray, pose_1: np.ndarray, alpha: float) -> np.ndarray:
    """Quaternion slerp between two [3,4] c2w poses + lerp of translation.

    Reference CameraUtils.cpp:11-41 (PoseInterpolate). Host numpy.
    """
    q0 = _quat_from_mat(pose_0[:3, :3])
    q1 = _quat_from_mat(pose_1[:3, :3])
    dot = float(np.dot(q0, q1))
    if dot < 0.0:
        q1, dot = -q1, -dot
    if dot > 0.9995:
        q = q0 + alpha * (q1 - q0)
    else:
        theta0 = np.arccos(np.clip(dot, -1.0, 1.0))
        theta = theta0 * alpha
        s0 = np.cos(theta) - dot * np.sin(theta) / np.sin(theta0)
        s1 = np.sin(theta) / np.sin(theta0)
        q = s0 * q0 + s1 * q1
    rot = _mat_from_quat(q)
    trans = (1.0 - alpha) * pose_0[:3, 3] + alpha * pose_1[:3, 3]
    out = np.zeros((3, 4), dtype=np.float32)
    out[:3, :3] = rot
    out[:3, 3] = trans
    return out
