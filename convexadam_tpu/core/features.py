"""Feature front-ends: MIND-SSC self-similarity descriptor and nnU-Net
semantic one-hot features, plus nnU-Net-style intensity normalizers.

Reference behaviour:
* MIND-SSC — reference src/convexAdam/convex_adam_utils.py:24-68.  The
  reference realises the 12 neighbourhood shift-pairs as two sparse one-hot
  3x3x3 dilated convolutions; a one-hot dilated conv on a replicate-padded
  volume is exactly a clamped spatial shift, so the TPU-native version uses
  12 pairs of static shifted slices (pure VPU work, no conv at all) followed
  by a separable replicate-padded box filter.
* nnU-Net one-hot features — reference src/convexAdam/convex_adam_nnUNet.py:19-38
  and self_configuring/convexAdam_hyper_util.py:64-83 (`mult` weight scale).
  The reference drops absent labels (data-dependent channel count); we keep a
  static channel dimension and zero the weights of absent labels instead —
  SSD cost volumes are identical because zeroed channels contribute zero.
* normalizers — convex_adam_utils.py:142-170.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp

from convexadam_tpu.core.smoothing import avg_pool3d_replicate

# MIND-SSC channel permutation applied by the reference "to have same ordering
# as C++ code" (convex_adam_utils.py:66).
MIND_CHANNEL_PERMUTATION = (6, 8, 1, 11, 2, 10, 0, 7, 9, 4, 5, 3)


def _mind_shift_pairs() -> list[tuple[tuple[int, int, int], tuple[int, int, int]]]:
    """The 12 ordered shift pairs of the MIND-SSC self-similarity pattern.

    Derived from the six-neighbourhood of the 3x3x3 patch: all ordered pairs
    (i > j in row-major enumeration) of distinct neighbours at squared
    distance 2 (i.e. sharing an edge of the octahedron), as in
    convex_adam_utils.py:31-47.  Offsets are relative to the patch centre.
    """
    six = [(0, 1, 1), (1, 1, 0), (1, 0, 1), (1, 1, 2), (2, 1, 1), (1, 2, 1)]
    # row-major enumeration over (x = shift1 index, y = shift2 index) with
    # mask (x > y) & (squared distance == 2), matching the reference's
    # flattened meshgrid mask.
    ordered = []
    for x in range(6):
        for y in range(6):
            d = sum((a - b) ** 2 for a, b in zip(six[x], six[y]))
            if x > y and d == 2:
                ordered.append((six[x], six[y]))
    assert len(ordered) == 12
    return ordered


def shifted_replicate(img: jax.Array, offset: Sequence[int]) -> jax.Array:
    """``img`` (..., H, W, D) spatially shifted by ``offset`` (voxels) with
    replicate (clamp) boundary handling: out[x] = img[clamp(x + offset)].

    Equivalent to a one-hot 3x3x3 conv with dilation on a replicate-padded
    volume (convex_adam_utils.py:48-56).
    """
    nd = img.ndim
    pads = []
    slices = [slice(None)] * nd
    m = max(abs(int(o)) for o in offset) if len(offset) else 0
    pad = [(0, 0)] * (nd - 3)
    for k, o in enumerate(offset):
        o = int(o)
        pad.append((m, m))
        start = m + o
        slices[nd - 3 + k] = slice(start, start + img.shape[nd - 3 + k])
    if m == 0:
        return img
    imgp = jnp.pad(img, pad, mode="edge")
    return imgp[tuple(slices)]


@functools.partial(jax.jit, static_argnames=("radius", "dilation", "dtype"))
def mindssc(
    img: jax.Array, radius: int = 2, dilation: int = 2, dtype=jnp.float32
) -> jax.Array:
    """MIND-SSC descriptor of ``img`` (H, W, D) → features (12, H, W, D).

    Exact semantics of MINDSSC (convex_adam_utils.py:24-68):
      1. 12 shift-pair squared differences (replicate boundary, offsets scaled
         by ``dilation``),
      2. patch-SSD box filter of size ``2*radius+1`` with replicate padding,
      3. per-voxel min subtraction across channels,
      4. variance normalisation clamped to [0.001, 1000] x global mean,
      5. exp(-mind),
      6. fixed channel permutation (C++-code ordering).

    ``dtype`` is the compute/output precision of the 12-channel stages (the
    normalisation statistics always accumulate in f32): bf16 halves the HBM
    traffic of the dominant (12, H, W, D) streams on TPU (the reference
    casts the descriptor to fp16 right after computing it in fp32,
    convex_adam_MIND.py:57-59; the bf16 golden test pins the accuracy
    envelope of computing the descriptor itself in bf16).
    """
    x = img.reshape(img.shape[-3:]).astype(dtype)

    use_pallas = False
    if jax.default_backend() == "tpu":
        from convexadam_tpu.ops.mind_pallas import (  # noqa: PLC0415
            mind_supported,
        )

        use_pallas = mind_supported(x.shape, radius, dilation, x.dtype.itemsize)
    if use_pallas:
        # fused Pallas pass: diffs + box filter + min/variance per VMEM tile
        # (the 12-channel volume is written once instead of streamed ~6x)
        from convexadam_tpu.ops.mind_pallas import (  # noqa: PLC0415
            mind_ssd_stats_batchable,
        )

        mind, mind_var = mind_ssd_stats_batchable(x, radius, dilation)
        mind_var = mind_var[None]
    else:
        pairs = _mind_shift_pairs()
        diffs = []
        for (s1, s2) in pairs:
            o1 = tuple((c - 1) * dilation for c in s1)
            o2 = tuple((c - 1) * dilation for c in s2)
            d = shifted_replicate(x, o1) - shifted_replicate(x, o2)
            diffs.append(d * d)
        ssd = jnp.stack(diffs, axis=0)  # (12, H, W, D)
        ssd = avg_pool3d_replicate(ssd, 2 * radius + 1)
        mind = ssd - jnp.min(ssd, axis=0, keepdims=True)
        mind_var = jnp.mean(mind.astype(jnp.float32), axis=0, keepdims=True)

    gm = jnp.mean(mind_var)
    mind_var = jnp.clip(mind_var, gm * 0.001, gm * 1000.0)
    mind = jnp.exp(-(mind.astype(jnp.float32) / mind_var)).astype(dtype)
    return mind[jnp.array(MIND_CHANNEL_PERMUTATION), :, :, :]


def mindssc_multichannel(
    imgs: Sequence[jax.Array], radius: int = 2, dilation: int = 2
) -> jax.Array:
    """Concatenated MIND-SSC descriptors of multiple aligned volumes —
    the CuRIOUS MRI-US front-end computes MIND(r=d=3) on T1 and FLAIR and
    concatenates the 24 channels (l2r_2020_convexAdam_CuRIOUS.py:323-327)."""
    return jnp.concatenate(
        [mindssc(img, radius, dilation) for img in imgs], axis=0
    )


def label_counts(seg: jax.Array, num_labels: int) -> jax.Array:
    """Per-label voxel counts, ``jnp.bincount``-equivalent for non-negative
    labels < num_labels.  NOT bincount: its scatter-add is per-INDEX bound
    on TPU (~85 M idx/s — ~60 ms for a 4.9M-voxel volume) where
    ``num_labels`` fused compare-and-sum sweeps are bandwidth bound
    (<1 ms).  Returns (num_labels,) int32."""
    flat = seg.astype(jnp.int32).reshape(-1)
    return jax.vmap(
        lambda lab: jnp.sum((flat == lab).astype(jnp.int32))
    )(jnp.arange(num_labels, dtype=jnp.int32))


def semantic_features(
    pred_fixed: jax.Array,
    pred_moving: jax.Array,
    num_labels: int,
    mult: float = 10.0,
    dtype=jnp.float32,
    weights: "jax.Array | None" = None,
) -> tuple[jax.Array, jax.Array]:
    """nnU-Net semantic one-hot features with inverse-frequency weighting.

    ``pred_*`` are integer label volumes (H, W, D); ``num_labels`` is the
    static channel count (>= max label + 1).  Mirrors
    convex_adam_nnUNet.py:19-38 / convexAdam_hyper_util.py:64-83:
    weight_l = 1 / (count_fix(l) + count_mov(l) + eps)^0.3, normalized to unit
    mean **over jointly-present labels**, scaled by ``mult``.  Labels absent
    from both volumes get zero weight (the reference drops those channels;
    zero-weighting is SSD-equivalent and keeps shapes static for XLA).

    ``weights``: optional precomputed per-label weights (num_labels,) that
    replace the per-pair derivation (before the ``mult`` scale) — the OASIS
    task-3 script freezes the weights of one template pair for the whole
    test set (l2r_2021_convexAdam_task3_docker.py:118-120,140-141).
    """
    pf = pred_fixed.astype(jnp.int32)
    pm = pred_moving.astype(jnp.int32)
    if weights is None:
        eps = 1e-32
        counts = (
            label_counts(pf, num_labels) + label_counts(pm, num_labels)
        ).astype(jnp.float32)
        present = counts > 0
        w = 1.0 / jnp.power(counts + eps, 0.3)
        w = jnp.where(present, w, 0.0)
        w_mean = jnp.sum(w) / jnp.maximum(jnp.sum(present), 1)
        w = (w / w_mean) * mult
    else:
        w = weights.astype(jnp.float32) * mult

    oh_f = jax.nn.one_hot(pf, num_labels, dtype=dtype, axis=0)  # (L, H, W, D)
    oh_m = jax.nn.one_hot(pm, num_labels, dtype=dtype, axis=0)
    wv = w.astype(dtype).reshape(num_labels, 1, 1, 1)
    return oh_f * wv, oh_m * wv


def semantic_template_weights(
    seg_a: jax.Array, seg_b: jax.Array, num_labels: int
) -> jax.Array:
    """Frozen per-label weights from one template pair, as the OASIS task-3
    script derives them once and reuses for every case
    (l2r_2021_convexAdam_task3_docker.py:118-120):
    ``w = 1/(bincount(a)+bincount(b))^0.3; w /= w.mean()`` — note the mean is
    over ALL labels (no joint-presence restriction) in that script.

    A label absent from BOTH template volumes (reachable here because
    ``num_labels`` is a static channel count) gets weight 0 and is excluded
    from the mean — the script's literal ``1/0^0.3 = inf`` would NaN every
    weight; when all labels are present (the script's only reachable
    regime) the results are identical."""
    counts = (
        label_counts(seg_a, num_labels) + label_counts(seg_b, num_labels)
    ).astype(jnp.float32)
    present = counts > 0
    w = jnp.where(present, 1.0 / jnp.power(counts + 1e-32, 0.3), 0.0)
    w_mean = jnp.sum(w) / jnp.maximum(jnp.sum(present), 1)
    return w / w_mean


# ---------------------------------------------------------------------------
# intensity normalizers (convex_adam_utils.py:142-170)
# ---------------------------------------------------------------------------

def nnunet_norm(img: jax.Array) -> jax.Array:
    """Z-score over the positive-intensity mask, zeros elsewhere
    (convex_adam_utils.py:142-148)."""
    mask = img > 0
    n = jnp.maximum(jnp.sum(mask), 1)
    mean = jnp.sum(jnp.where(mask, img, 0.0)) / n
    var = jnp.sum(jnp.where(mask, (img - mean) ** 2, 0.0)) / jnp.maximum(n - 1, 1)
    std = jnp.sqrt(var)
    out = (img - mean) / (std + 1e-8)
    return jnp.where(mask, out, 0.0)


def nnunet_norm_props(img: jax.Array, props: dict) -> jax.Array:
    """Clamp to stored percentiles then z-score with stored statistics
    (convex_adam_utils.py:151-159)."""
    img1 = jnp.clip(img, props["percentile_00_5"], props["percentile_99_5"])
    return (img1 - props["mean"]) / props["sd"]


def nnunet_ct_norm(img: jax.Array) -> jax.Array:
    """CT normalisation: clamp to [-1000, 1500], then clamp to the 0.5/99.5
    percentiles and z-score (convex_adam_utils.py:162-170)."""
    img = jnp.clip(img, -1000.0, 1500.0)
    mean = jnp.mean(img)
    std = jnp.std(img, ddof=1)  # torch .std() is unbiased
    lower = jnp.quantile(img, 0.005)
    upper = jnp.quantile(img, 0.995)
    img = jnp.clip(img, lower, upper)
    return (img - mean) / std
