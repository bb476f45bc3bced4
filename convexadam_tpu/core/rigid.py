"""Rigid fitting and thin-plate-spline densification.

Reference capabilities from the L1 utils and challenge scripts:
* Kabsch SVD rigid fit — convex_adam_utils.py:173-184,
* least-trimmed-squares robust rigid — convex_adam_utils.py:187-193 and
  l2r_2020_convexAdam_CuRIOUS.py:264-270 (rigid extraction from a
  deformable field),
* TPS densification of sparse correspondences —
  l2r_2021_convexAdam_task1_docker.py:198-262,
* keypoint normalized/world coordinate conversions —
  l2r_2021_convexAdam_task1_docker.py:181-189.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from convexadam_tpu.core.warp import resize_trilinear


def _f32_matmuls(fn):
    """Force full-precision matmuls inside ``fn``.

    XLA:TPU matmuls default to bfloat16 accumulation even for f32 inputs;
    the Kabsch covariance / TPS system matrices here are tiny and
    precision-critical (measured on-chip: 4e-3 rigid-transform error at
    default precision vs <1e-4 at float32).
    """

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)

    return wrapped


@_f32_matmuls
def find_rigid_3d(x: jax.Array, y: jax.Array) -> jax.Array:
    """Kabsch: the rigid 4x4 transform T with y ≈ T @ x (points are (N, 3)
    or (N, 4) homogeneous; only the first 3 columns are used).
    Mirrors convex_adam_utils.py:173-184."""
    x3 = x[:, :3]
    y3 = y[:, :3]
    x_mean = jnp.mean(x3, axis=0)
    y_mean = jnp.mean(y3, axis=0)
    u, s, vt = jnp.linalg.svd((x3 - x_mean).T @ (y3 - y_mean))
    v = vt.T
    m = jnp.eye(3).at[-1, -1].set(jnp.linalg.det(v @ u.T))
    rotation = v @ m @ u.T
    translation = y_mean - rotation @ x_mean
    T = jnp.eye(4)
    T = T.at[:3, :3].set(rotation)
    T = T.at[:3, 3].set(translation)
    return T


@_f32_matmuls
def least_trimmed_rigid(
    fixed_pts: jax.Array, moving_pts: jax.Array, iters: int = 5
) -> jax.Array:
    """Robust rigid fit: iteratively refit on the 50% of points with the
    smallest residuals (convex_adam_utils.py:187-193).

    Points are (N, 4) homogeneous (as the reference passes them).  Returns
    the 4x4 transform with moving ≈ fixed @ T^T.
    """
    n = fixed_pts.shape[0]
    k = n // 2

    def body(idx, _):
        # weighted fit via gather of the currently-kept points
        fp = jnp.take(fixed_pts, idx, axis=0)
        mp = jnp.take(moving_pts, idx, axis=0)
        x = find_rigid_3d(fp, mp).T
        residual = jnp.sqrt(jnp.sum((moving_pts - fixed_pts @ x) ** 2, axis=1))
        _, new_idx = lax.top_k(-residual, k)
        return new_idx, x

    idx0 = jnp.arange(n)
    # first iteration uses all points; subsequent use the trimmed half —
    # replicate by running the first fit on idx0 then scanning
    fp = fixed_pts
    mp = moving_pts
    x = find_rigid_3d(fp, mp).T
    residual = jnp.sqrt(jnp.sum((moving_pts - fixed_pts @ x) ** 2, axis=1))
    _, idx = lax.top_k(-residual, k)
    for _ in range(iters - 1):
        idx, x = body(idx, None)
    return x.T


@_f32_matmuls
def rigid_from_field(
    disp: jax.Array,
    mask: "jax.Array | None" = None,
    num_samples: int = 4096,
    seed: int = 0,
    iters: int = 5,
) -> jax.Array:
    """Extract a robust rigid transform from a dense displacement field —
    the CuRIOUS capability (l2r_2020_convexAdam_CuRIOUS.py:359-371): sample
    voxel positions (optionally within a mask), pair them with their
    displaced positions, and fit a least-trimmed-squares rigid transform.

    ``disp`` is (3, H, W, D) voxel displacements; returns a 4x4 transform in
    voxel coordinates (array order).
    """
    H, W, D = disp.shape[1:]
    key = jax.random.PRNGKey(seed)
    if mask is not None:
        # sample proportionally to the mask by resampling candidate indices
        flat = mask.reshape(-1).astype(jnp.float32)
        probs = flat / jnp.sum(flat)
        idx = jax.random.choice(key, flat.shape[0], (num_samples,), p=probs)
    else:
        idx = jax.random.randint(key, (num_samples,), 0, H * W * D)
    hh = idx // (W * D)
    ww = (idx // D) % W
    dd = idx % D
    fixed_pts = jnp.stack(
        [hh.astype(jnp.float32), ww.astype(jnp.float32), dd.astype(jnp.float32)],
        axis=1,
    )
    d = disp.reshape(3, -1)
    sampled = jnp.stack([jnp.take(d[c], idx) for c in range(3)], axis=1)
    moving_pts = fixed_pts + sampled
    ones = jnp.ones((num_samples, 1))
    return least_trimmed_rigid(
        jnp.concatenate([fixed_pts, ones], 1),
        jnp.concatenate([moving_pts, ones], 1),
        iters=iters,
    )


# ---------------------------------------------------------------------------
# thin plate splines
# ---------------------------------------------------------------------------

def _tps_u(r: jax.Array) -> jax.Array:
    return (r**2) * jnp.log(r + 1e-6)


def _tps_dist(a: jax.Array, b: jax.Array) -> jax.Array:
    ra = jnp.sum(a**2, axis=1)[:, None]
    rb = jnp.sum(b**2, axis=1)[None, :]
    d2 = jnp.clip(ra + rb - 2.0 * (a @ b.T), 0.0, None)
    return jnp.sqrt(d2)


@_f32_matmuls
def tps_fit(c: jax.Array, f: jax.Array, lambd: float = 0.0) -> jax.Array:
    """Fit TPS coefficients mapping control points ``c`` (N,3) to values
    ``f`` (N,F) (l2r_2021_convexAdam_task1_docker.py:199-223)."""
    n = c.shape[0]
    K = _tps_u(_tps_dist(c, c)) + jnp.eye(n) * lambd
    P = jnp.concatenate([jnp.ones((n, 1)), c], axis=1)
    A = jnp.zeros((n + 4, n + 4))
    A = A.at[:n, :n].set(K)
    A = A.at[:n, n:].set(P)
    A = A.at[n:, :n].set(P.T)
    v = jnp.zeros((n + 4, f.shape[1]))
    v = v.at[:n].set(f)
    return jnp.linalg.solve(A, v)


@_f32_matmuls
def tps_eval(x: jax.Array, c: jax.Array, theta: jax.Array) -> jax.Array:
    """Evaluate a fitted TPS at points ``x`` (M,3)
    (l2r_2021_convexAdam_task1_docker.py:238-243)."""
    U = _tps_u(_tps_dist(x, c))
    w, a = theta[:-4], theta[-4:]
    b = U @ w
    return a[0][None, :] + x[:, 0:1] * a[1][None, :] + x[:, 1:2] * a[2][None, :] + x[:, 2:3] * a[3][None, :] + b


@functools.partial(jax.jit, static_argnames=("shape", "step", "lambd"))
@_f32_matmuls
def thin_plate_dense(
    x1: jax.Array,
    y1: jax.Array,
    shape: tuple[int, int, int],
    step: int,
    lambd: float = 0.0,
) -> jax.Array:
    """Densify sparse displacements: control points ``x1`` (N,3) in
    normalized array-order coords with displacement values ``y1`` (N,3) →
    dense field (H, W, D, 3) (l2r_2021_convexAdam_task1_docker.py:246-262).

    Evaluates the TPS on a ``step``-strided grid (align_corners=True
    normalized coordinates) and upsamples trilinearly.
    """
    H, W, D = shape
    H1, W1, D1 = H // step, W // step, D // step
    from convexadam_tpu.core.warp import identity_grid_normalized

    x2 = identity_grid_normalized((H1, W1, D1), align_corners=True).reshape(-1, 3)
    theta = tps_fit(x1, y1, lambd)
    y2 = tps_eval(x2, x1, theta)
    y2 = jnp.moveaxis(y2.reshape(H1, W1, D1, 3), -1, 0)
    y2 = resize_trilinear(y2, (H, W, D), align_corners=True)
    return jnp.moveaxis(y2, 0, -1)
