"""Quaternion algebra, batched and AD-friendly.

Quaternions are scalar-first ``[w, x, y, z]`` arrays of shape ``(..., 4)``;
every function broadcasts over leading batch dimensions, so there is no need
for separate "array versions" as in the reference
(parity: /root/reference/lib/coordinate.py:31-100,442-548 and
/root/reference/src/wrapper_coordinate.hpp:50-103).
"""

import jax.numpy as jnp


def quatmult(q, p):
    """Hamilton product q ⊗ p of two (batched) quaternions."""
    qw, qx, qy, qz = jnp.moveaxis(q, -1, 0)
    pw, px, py, pz = jnp.moveaxis(p, -1, 0)
    return jnp.stack(
        [
            qw * pw - qx * px - qy * py - qz * pz,
            qx * pw + qw * px - qz * py + qy * pz,
            qy * pw + qz * px + qw * py - qx * pz,
            qz * pw - qy * px + qx * py + qw * pz,
        ],
        axis=-1,
    )


def quatconj(q):
    """Quaternion conjugate [w, -x, -y, -z]."""
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def normalize(v, eps=0.0):
    """Normalize the last axis of ``v`` to unit length."""
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    if eps:
        n = jnp.maximum(n, eps)
    return v / n


def quatrot(q, v):
    """Rotate vector(s) ``v`` by the frame-transformation quaternion ``q``.

    ``q`` maps frame A to frame B; given ``v`` expressed in A, returns the
    representation of ``v`` in B, i.e. conj(q) ⊗ [0, v] ⊗ q
    (parity: /root/reference/lib/coordinate.py:55-68).
    Implemented directly with cross products (cheaper than two Hamilton
    products and identical to applying the transposed DCM).
    """
    w = q[..., :1]
    u = q[..., 1:]
    # conj(q) ⊗ [0,v] ⊗ q  ==  v - 2w(u×v) + 2u×(u×v)  for unit q
    t = 2.0 * jnp.cross(u, v)
    return v - w * t + jnp.cross(u, t)


def quatrot_inv(q, v):
    """Rotate ``v`` from frame B back to frame A (inverse of :func:`quatrot`)."""
    return quatrot(quatconj(q), v)


def dcm_from_quat(q):
    """Direction cosine matrix of the frame transformation quaternion.

    Returns shape ``(..., 3, 3)``; rows are the B-frame axes expressed in A
    (parity: /root/reference/lib/coordinate.py:71-86).
    """
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    r0 = jnp.stack(
        [w * w + x * x - y * y - z * z, 2.0 * (x * y + w * z), 2.0 * (x * z - w * y)],
        axis=-1,
    )
    r1 = jnp.stack(
        [2.0 * (x * y - w * z), w * w - x * x + y * y - z * z, 2.0 * (y * z + w * x)],
        axis=-1,
    )
    r2 = jnp.stack(
        [2.0 * (x * z + w * y), 2.0 * (y * z - w * x), w * w - x * x - y * y + z * z],
        axis=-1,
    )
    return jnp.stack([r0, r1, r2], axis=-2)


def quat_from_dcm(C):
    """Quaternion from a DCM, assuming trace(C) > -1 (the rocket-frame case).

    Parity: /root/reference/lib/coordinate.py:89-100 (which prints an error and
    returns identity for the degenerate branch; here we clamp the sqrt argument
    so the function stays differentiable and NaN-free).
    """
    tr = C[..., 0, 0] + C[..., 1, 1] + C[..., 2, 2]
    w = 0.5 * jnp.sqrt(jnp.maximum(1.0 + tr, 1e-30))
    k = 0.25 / w
    return jnp.stack(
        [
            w,
            k * (C[..., 1, 2] - C[..., 2, 1]),
            k * (C[..., 2, 0] - C[..., 0, 2]),
            k * (C[..., 0, 1] - C[..., 1, 0]),
        ],
        axis=-1,
    )


def quat_from_euler(az_deg, el_deg, ro_deg):
    """Z-Y-X (yaw-pitch-roll) Euler angles [deg] to frame quaternion.

    Parity: /root/reference/lib/coordinate.py:442-457.
    """
    az = jnp.deg2rad(jnp.asarray(az_deg)) * 0.5
    el = jnp.deg2rad(jnp.asarray(el_deg)) * 0.5
    ro = jnp.deg2rad(jnp.asarray(ro_deg)) * 0.5
    ca, sa = jnp.cos(az), jnp.sin(az)
    ce, se = jnp.cos(el), jnp.sin(el)
    cr, sr = jnp.cos(ro), jnp.sin(ro)
    # qz(az) ⊗ qy(el) ⊗ qx(ro), expanded
    return jnp.stack(
        [
            ca * ce * cr + sa * se * sr,
            ca * ce * sr - sa * se * cr,
            ca * se * cr + sa * ce * sr,
            sa * ce * cr - ca * se * sr,
        ],
        axis=-1,
    )


def euler_from_quat(q):
    """Frame quaternion to Z-Y-X Euler angles [deg], yaw wrapped to [0, 360).

    Parity: /root/reference/lib/coordinate.py:505-528.  The gimbal-lock branch
    (sin(el) >= 1) is handled by clipping, which agrees in the limit.
    """
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    s = jnp.clip(2.0 * (w * y - z * x), -1.0, 1.0)
    el = jnp.arcsin(s)
    az = jnp.arctan2(2.0 * (w * z + x * y), 1.0 - 2.0 * (y * y + z * z))
    ro = jnp.arctan2(2.0 * (w * x + y * z), 1.0 - 2.0 * (x * x + y * y))
    locked = jnp.abs(s) >= 1.0
    az = jnp.where(locked, 0.0, az)
    ro = jnp.where(locked, 0.0, ro)
    az = jnp.where(az < 0.0, az + 2.0 * jnp.pi, az)
    return jnp.rad2deg(jnp.stack([az, el, ro], axis=-1))
