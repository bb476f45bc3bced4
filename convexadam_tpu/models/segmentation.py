"""Segmentation front-end: a compact nnU-Net-style 3D U-Net (flax) and
Gaussian-blended sliding-window inference.

The reference consumes nnU-Net segmentations from disk
(``predictedlabels``, main_for_l2r3_nnUNet.py:76-80) and only vendors the
sliding-window helpers (convex_adam_utils.py:196-237).  This module closes
the loop: a TPU-native segmentation network whose predictions feed
``convex_adam_semantic_jax`` directly, so semantic registration runs
end-to-end from raw images.

Architecture follows the nnU-Net recipe (3x3x3 convs, instance norm,
leaky ReLU, strided-conv downsampling, transposed-conv upsampling, skip
concatenation); channel widths are configurable and deliberately small by
default — the segmentation budget of this method is minor next to the
registration itself.
"""

from __future__ import annotations

from typing import Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from convexadam_tpu.utils.sliding_window import (
    compute_steps_for_sliding_window,
    get_gaussian,
)


class ConvBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        for _ in range(2):
            x = nn.Conv(self.features, (3, 3, 3), padding="SAME", use_bias=True)(x)
            # instance norm = group norm with one channel per group
            x = nn.GroupNorm(num_groups=None, group_size=1)(x)
            x = nn.leaky_relu(x, 0.01)
        return x


class UNet3D(nn.Module):
    """nnU-Net-style encoder/decoder over (B, H, W, D, C_in) volumes →
    (B, H, W, D, num_classes) logits."""

    num_classes: int
    channels: Sequence[int] = (16, 32, 64)

    @nn.compact
    def __call__(self, x):
        skips = []
        for c in self.channels[:-1]:
            x = ConvBlock(c)(x)
            skips.append(x)
            x = nn.Conv(c, (3, 3, 3), strides=(2, 2, 2), padding="SAME")(x)
        x = ConvBlock(self.channels[-1])(x)
        for c, skip in zip(reversed(self.channels[:-1]), reversed(skips)):
            x = nn.ConvTranspose(c, (2, 2, 2), strides=(2, 2, 2))(x)
            x = jnp.concatenate([x, skip], axis=-1)
            x = ConvBlock(c)(x)
        return nn.Conv(self.num_classes, (1, 1, 1))(x)


def dice_ce_loss(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """nnU-Net's training objective: soft-Dice + cross-entropy
    (class-mean soft Dice over the batch, CE over voxels)."""
    num_classes = logits.shape[-1]
    onehot = jax.nn.one_hot(labels, num_classes)
    probs = jax.nn.softmax(logits, axis=-1)
    axes = tuple(range(labels.ndim))  # batch + spatial
    inter = jnp.sum(probs * onehot, axis=axes)
    denom = jnp.sum(probs, axis=axes) + jnp.sum(onehot, axis=axes)
    dice = jnp.mean(1.0 - (2.0 * inter + 1e-5) / (denom + 1e-5))
    ce = -jnp.mean(
        jnp.sum(onehot * jax.nn.log_softmax(logits, axis=-1), axis=-1)
    )
    return dice + ce


def train_unet3d(
    images: np.ndarray,
    labels: np.ndarray,
    num_classes: int,
    patch_size=(32, 32, 32),
    steps: int = 200,
    batch_size: int = 2,
    learning_rate: float = 1e-3,
    channels=(16, 32, 64),
    seed: int = 0,
    params=None,
    fg_fraction: float = 0.0,
    verbose: bool = False,
):
    """Train a :class:`UNet3D` on random patches (Dice+CE, adamw with
    cosine decay — a compact stand-in for the nnU-Net trainer whose
    predictions the reference consumes from disk,
    main_for_l2r3_nnUNet.py:76-80).

    ``images``/``labels``: (N, H, W, D) float / int volumes.  Returns
    (params, loss_history).  Pass ``params`` to fine-tune an existing
    checkpoint (see :func:`save_unet3d` / :func:`load_unet3d`).

    ``fg_fraction``: fraction of patches forced to contain foreground
    (label > 0) by centring them on a random foreground voxel — nnU-Net's
    oversampling rule for sparse targets (it forces 1/3); essential when
    the foreground occupies <1% of the volume (e.g. prostate in pelvis).
    """
    import optax

    images = np.asarray(images, np.float32)
    labels = np.asarray(labels, np.int32)
    if any(p > s for p, s in zip(patch_size, images.shape[1:])):
        # a short axis would yield ragged patches (np.stack crash mid-run)
        raise ValueError(
            f"patch_size {tuple(patch_size)} exceeds volume shape "
            f"{images.shape[1:]} — pad the volumes or shrink the patch"
        )
    model = UNet3D(num_classes=num_classes, channels=tuple(channels))
    rng = np.random.default_rng(seed)
    if params is None:
        params = model.init(
            jax.random.PRNGKey(seed),
            jnp.zeros((1,) + tuple(patch_size) + (1,), jnp.float32),
        )

    opt = optax.adamw(
        optax.cosine_decay_schedule(learning_rate, max(steps, 1))
    )
    opt_state = opt.init(params)

    @jax.jit
    def step_fn(params, opt_state, x, y):
        def loss_fn(p):
            logits = model.apply(p, x[..., None])
            return dice_ce_loss(logits, y)

        loss, g = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(g, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    fg_voxels = (
        [np.argwhere(lab > 0) for lab in labels] if fg_fraction > 0 else None
    )

    def sample_batch():
        xs, ys = [], []
        for _ in range(batch_size):
            i = rng.integers(0, len(images))
            if (
                fg_voxels is not None
                and len(fg_voxels[i])
                and rng.random() < fg_fraction
            ):
                # centre the patch on a random foreground voxel, clamped
                # into the volume
                c = fg_voxels[i][rng.integers(0, len(fg_voxels[i]))]
                starts = [
                    int(np.clip(cv - p // 2, 0, max(s - p, 0)))
                    for cv, s, p in zip(c, images[i].shape, patch_size)
                ]
            else:
                starts = [
                    rng.integers(0, max(s - p, 0) + 1)
                    for s, p in zip(images[i].shape, patch_size)
                ]
            sl = tuple(
                slice(s, s + p) for s, p in zip(starts, patch_size)
            )
            xs.append(images[i][sl])
            ys.append(labels[i][sl])
        return jnp.asarray(np.stack(xs)), jnp.asarray(np.stack(ys))

    history = []
    for it in range(steps):
        x, y = sample_batch()
        params, opt_state, loss = step_fn(params, opt_state, x, y)
        history.append(float(loss))
        if verbose and it % 50 == 0:
            print(f"step {it}: loss {history[-1]:.4f}")
    return params, history


def save_unet3d(params, path) -> None:
    """Persist trained parameters with orbax (the framework's checkpoint
    layer, like the sweep state in selfconfig/checkpoint.py)."""
    import pathlib

    import orbax.checkpoint as ocp

    path = pathlib.Path(path).absolute()
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, params, force=True)


def load_unet3d(path):
    """Restore parameters as host numpy arrays — device-agnostic, so a
    checkpoint written on the TPU backend loads on CPU meshes and vice
    versa (orbax otherwise replays the saved device sharding, which fails
    across topologies)."""
    import pathlib

    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    path = pathlib.Path(path).absolute()
    restore_args = jax.tree.map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray),
        ckptr.metadata(path).item_metadata.tree,
    )
    return ckptr.restore(path, restore_args=restore_args)


def load_pretrained_unet3d(name: str = "unet3d_prostate_adc"):
    """Load a checkpoint shipped with the package
    (``models/checkpoints/<name>/``: orbax params + meta.json) and bind it
    into a jitted patch predictor.

    Returns ``(predict_logits, meta)`` where ``meta`` carries
    ``num_classes``, ``channels``, ``patch_size`` and the expected input
    ``normalization`` ("zscore": feed ``(v - v.mean()) / v.std()``).

    Shipped checkpoints (regen recipes under ``tests/``):

    * ``unet3d_prostate_adc`` — single-case overfit on the snapshot's real
      prostate ADC (``python -m tests.regen_unet_checkpoint``);
    * ``unet3d_prostate_multi`` — trained across 10 cases (ADC + HBV
      contrasts x {identity + 4 smooth deformations}) and validated on a
      held-out deformation of each contrast
      (``python -m tests.regen_unet_multicase``).

    Both demonstrate the end-to-end path from raw images to the
    *imperfect* ``predictedlabels`` regime the reference consumes from
    disk (main_for_l2r3_nnUNet.py:76-80).
    """
    import json
    import pathlib

    root = pathlib.Path(__file__).parent / "checkpoints" / name
    meta = json.loads((root / "meta.json").read_text())
    params = load_unet3d(root / "params")
    predictor = make_predictor(
        params, meta["num_classes"], tuple(meta["channels"])
    )
    return predictor, meta


def make_predictor(params, num_classes: int, channels=(16, 32, 64)):
    """Bind (params, architecture) into the jitted patch → logits function
    :func:`sliding_window_predict` and
    pipeline.convex_adam.convex_adam_semantic_from_images consume."""
    model = UNet3D(num_classes=num_classes, channels=tuple(channels))

    @jax.jit
    def predict_logits(patch):
        return model.apply(params, patch[None, ..., None])[0]

    return predict_logits


def sliding_window_predict(
    predict_logits: Callable[[jax.Array], jax.Array],
    volume: np.ndarray,
    patch_size: Sequence[int],
    step_size: float = 0.5,
    gaussian: bool = True,
) -> np.ndarray:
    """Tile ``volume`` (H, W, D) with overlapping patches, blend the
    per-patch logits with a Gaussian importance map, and return the argmax
    label volume (the nnU-Net inference scheme the reference's helpers
    support, convex_adam_utils.py:196-237).

    ``predict_logits``: (h, w, d) patch → (h, w, d, C) logits; it is called
    with one static patch shape, so a single jit compilation serves all
    windows.
    """
    volume = np.asarray(volume, np.float32)
    # pad BEFORE any clamping: the network was trained at patch_size (its
    # stride-2 levels need those extents), so short axes get edge-padded up
    # to the patch and cropped back — clamping the patch instead would feed
    # the U-Net shapes its down/up path cannot concatenate
    patch_size = [int(p) for p in patch_size]
    pad = [max(0, p - s) for p, s in zip(patch_size, volume.shape)]
    if any(pad):
        volume = np.pad(volume, [(0, p) for p in pad], mode="edge")
    shape = volume.shape

    steps = compute_steps_for_sliding_window(patch_size, shape, step_size)
    imp = (
        get_gaussian(patch_size)
        if gaussian
        else np.ones(patch_size, np.float32)
    )

    acc = None
    norm = np.zeros(shape, np.float32)
    for sx in steps[0]:
        for sy in steps[1]:
            for sz in steps[2]:
                patch = volume[
                    sx: sx + patch_size[0],
                    sy: sy + patch_size[1],
                    sz: sz + patch_size[2],
                ]
                logits = np.asarray(predict_logits(jnp.asarray(patch)))
                if acc is None:
                    acc = np.zeros(shape + (logits.shape[-1],), np.float32)
                acc[
                    sx: sx + patch_size[0],
                    sy: sy + patch_size[1],
                    sz: sz + patch_size[2],
                ] += logits * imp[..., None]
                norm[
                    sx: sx + patch_size[0],
                    sy: sy + patch_size[1],
                    sz: sz + patch_size[2],
                ] += imp
    labels = np.argmax(acc / norm[..., None], axis=-1).astype(np.int32)
    if any(pad):
        labels = labels[
            : shape[0] - pad[0], : shape[1] - pad[1], : shape[2] - pad[2]
        ]
    return labels
