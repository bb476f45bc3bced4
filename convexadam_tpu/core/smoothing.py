"""Box / Gaussian / spline smoothing with exact ``F.avg_pool3d`` semantics.

The reference leans on ``F.avg_pool3d`` everywhere: feature downsampling
(convex_adam_MIND.py:118-119), cost-volume smoothing (convex_adam_utils.py:85),
the coupled-convex field smoothing (:96,:107), the Adam B-spline cascade
(convex_adam_MIND.py:166) and the final-output smoothing (:191).  Two distinct
border semantics appear:

* ``F.avg_pool3d(x, k, stride=1, padding=p)`` — **zero** padding, and torch's
  default ``count_include_pad=True`` divides by ``k**3`` even at borders.
* ``avg_pool3d(ReplicationPad3d(r)(x), 2r+1, stride=1)`` — replicate padding
  (MIND-SSC patch filter, convex_adam_utils.py:53,56).

On TPU the cubic box filter is implemented as three separable 1-D
``lax.reduce_window`` passes (3k adds/voxel instead of k**3), which XLA maps
onto the VPU with fused padding.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _reduce_window_sum_axis(x: jax.Array, axis: int, k: int, stride: int, pad: int):
    """1-D window sum along ``axis`` via ``k`` static shifted slices.

    Differentiable everywhere (unlike the generic ``lax.reduce_window``
    primitive, which has no JVP rule and breaks grad-inside-scan); the static
    slices fuse into a single VPU pass under XLA.
    """
    if pad:
        padding = [(0, 0)] * x.ndim
        padding[axis] = (pad, pad)
        x = jnp.pad(x, padding, mode="constant")
    n = x.shape[axis]
    out_n = (n - k) // stride + 1
    acc = None
    for j in range(k):
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(j, j + (out_n - 1) * stride + 1, stride)
        term = x[tuple(sl)]
        acc = term if acc is None else acc + term
    return acc


def avg_pool3d(
    x: jax.Array,
    kernel: int,
    stride: int | None = None,
    padding: int = 0,
    count_include_pad: bool = True,
) -> jax.Array:
    """``F.avg_pool3d`` over the last three axes of ``x`` (any leading dims).

    Zero padding; with ``count_include_pad=True`` (torch default) the divisor
    is always ``kernel**3``.  Implemented as separable 1-D window sums.
    """
    if stride is None:
        stride = kernel
    nd = x.ndim
    if (
        stride == kernel
        and padding == 0
        and all(s % kernel == 0 for s in x.shape[-3:])
    ):
        # non-overlapping pooling: XLA's native ReduceWindow lowering is
        # ~10-30x faster on TPU than either strided slicing (lane-dim
        # strides force relayouts) or splitting the lane dim via reshape
        # (measured 31→3.5 ms for k=2 and 16→0.5 ms for k=6 on 12x192^3
        # bf16 on v5e).  These pools are outside all grad loops (feature
        # downsampling); the overlapping path below stays differentiable.
        import jax  # noqa: PLC0415

        k = kernel
        win = (1,) * (nd - 3) + (k, k, k)
        out = jax.lax.reduce_window(x, jnp.zeros((), x.dtype), jax.lax.add, win, win, "VALID")
        return out / float(k**3)
    out = x
    for ax in (nd - 3, nd - 2, nd - 1):
        out = _reduce_window_sum_axis(out, ax, kernel, stride, padding)
    if count_include_pad:
        return out / float(kernel**3)
    ones = jnp.ones(x.shape[-3:], x.dtype)
    cnt = ones
    for ax in (0, 1, 2):
        cnt = _reduce_window_sum_axis(cnt, ax, kernel, stride, padding)
    return out / cnt


def avg_pool3d_replicate(x: jax.Array, kernel: int) -> jax.Array:
    """Stride-1 box filter with replicate (edge) padding, output same size.

    Equivalent to ``F.avg_pool3d(ReplicationPad3d(k//2)(x), k, stride=1)``
    used for the MIND-SSC patch-SSD (convex_adam_utils.py:53,56).
    """
    r = kernel // 2
    nd = x.ndim
    pad = [(0, 0)] * (nd - 3) + [(r, r)] * 3
    xp = jnp.pad(x, pad, mode="edge")
    return avg_pool3d(xp, kernel, stride=1, padding=0)


def box_smooth_repeated(x: jax.Array, kernel: int, repeats: int) -> jax.Array:
    """``repeats`` cascaded stride-1 zero-padded box filters (the reference's
    B-spline-like smoother, e.g. triple avg_pool at convex_adam_MIND.py:166,191
    and double avg_pool in the cost volume, convex_adam_utils.py:85).

    NOTE: the cascade does NOT compose into a single correlation — each pass
    re-pads its (nonzero) border outputs with zeros, so the composed-kernel
    shortcut diverges in a (repeats * (kernel//2))-thick border shell.
    Parity requires the literal cascade.
    """
    pad = kernel // 2
    for _ in range(repeats):
        x = avg_pool3d(x, kernel, stride=1, padding=pad)
    return x


def filter1d(x: jax.Array, weight: jax.Array, axis: int, padding_mode: str = "edge") -> jax.Array:
    """Correlate the last-3-axes array ``x`` with a 1-D kernel along ``axis``.

    Mirrors ``filter1D`` (self_configuring/convexAdam_hyper_util.py:425-437):
    replicate padding by ``N//2``, correlation (no kernel flip — torch conv
    with an explicitly-built symmetric kernel; we correlate to be exact for
    asymmetric kernels too since torch's F.conv3d is a correlation).
    """
    n = weight.shape[0]
    r = n // 2
    pad = [(0, 0)] * x.ndim
    pad[axis] = (r, r)
    xp = jnp.pad(x, pad, mode=padding_mode)
    # correlation via windowed weighted sum: gather n shifted slices
    out = None
    for i in range(n):
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(i, i + x.shape[axis])
        term = xp[tuple(sl)] * weight[i]
        out = term if out is None else out + term
    return out


def gaussian_kernel_1d(sigma: float, dtype=jnp.float32) -> jax.Array:
    """Gaussian weights as in ``smooth`` (convexAdam_hyper_util.py:439-452):
    N = ceil(sigma*3/2)*2 + 1, normalized."""
    n = int(np.ceil(sigma * 3.0 / 2.0)) * 2 + 1
    x = np.linspace(-(n // 2), n // 2, n)
    w = np.exp(-(x**2) / (2.0 * sigma**2))
    w = w / w.sum()
    return jnp.asarray(w, dtype=dtype)


def gaussian_smooth(x: jax.Array, sigma: float) -> jax.Array:
    """Separable Gaussian smoothing with replicate padding over the last three
    axes (convexAdam_hyper_util.py:439-452)."""
    w = gaussian_kernel_1d(sigma, x.dtype)
    nd = x.ndim
    for ax in (nd - 3, nd - 2, nd - 1):
        x = filter1d(x, w, ax)
    return x


def kovesi_widths(sigma: float, n: int = 4) -> list[int]:
    """Box-filter widths approximating a Gaussian of ``sigma`` by ``n``
    cascaded box filters (Kovesi's method; convexAdam_hyper_util.py:475-488).

    Returns the widths of the cascade, omitting width-1 (identity) filters
    exactly as the reference does.
    """
    w_ideal = np.sqrt(12 * sigma**2 / n + 1)
    w_u = int(np.ceil((w_ideal - 1) / 2) * 2 + 1)
    w_l = max(w_u - 2, 1)
    m = int(np.round((12 * sigma**2 - n * w_l**2 - 4 * n * w_l - 3 * n) / (-4 * w_l - 4)))
    widths: list[int] = []
    for _ in range(m):
        if w_l > 1:
            widths.append(w_l)
    for _ in range(n - m):
        widths.append(w_u)
    return widths


def kovesi_spline(x: jax.Array, sigma: float, n: int = 4) -> jax.Array:
    """Apply the Kovesi box-cascade Gaussian approximation (zero-padded,
    count-include-pad box filters, matching nn.AvgPool3d defaults)."""
    for w in kovesi_widths(sigma, n):
        x = avg_pool3d(x, w, stride=1, padding=(w - 1) // 2)
    return x
