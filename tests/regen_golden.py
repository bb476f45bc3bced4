"""Regenerate the golden displacement fixture (run only for intentional
behaviour changes): ``python -m tests.regen_golden "<why>"``.

The one-line WHY is mandatory (VERDICT r3 weak#5: each regeneration weakens
the cross-round behaviour lock, so the motivating intentional change must be
auditable).  It is embedded in the fixture itself and must also appear in the
commit message that ships the new npz.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import pathlib
import sys

import numpy as np


def main():
    if len(sys.argv) < 2 or not sys.argv[1].strip():
        raise SystemExit(
            "usage: python -m tests.regen_golden \"<one-line reason: which "
            "intentional behaviour change motivates regenerating the golden>\""
        )
    why = sys.argv[1].strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    import torch
    import torch.nn.functional as F

    from convexadam_tpu.pipeline.convex_adam import ConvexAdamConfig, convex_adam

    seed, shift = 42, (4, -3, 2)
    rng = np.random.default_rng(seed)
    vol = rng.standard_normal((48, 48, 48)).astype(np.float32)
    t = torch.from_numpy(vol)[None, None]
    for _ in range(2):
        t = F.avg_pool3d(t, 3, stride=1, padding=1)
    vol = t[0, 0].numpy()
    vol = (vol - vol.mean()) / vol.std() * 100
    mov = np.roll(vol, shift, axis=(0, 1, 2))
    cfg = ConvexAdamConfig(
        grid_sp=4, disp_hw=2, lambda_weight=1.25, selected_niter=80, grid_sp_adam=2
    )
    disp = convex_adam(vol, mov, cfg)
    out = pathlib.Path(__file__).parent / "golden_disp_48.npz"
    # the input volume ships inside the fixture: the golden tests load it
    # instead of re-deriving it, so this recipe cannot silently diverge
    # from what the guard compares against
    np.savez_compressed(
        out, disp=disp.astype(np.float16), shift=shift, seed=seed, vol=vol,
        why=np.array(why),
    )
    print(f"wrote {out}\nwhy: {why}\n(quote this line in the commit message)")


if __name__ == "__main__":
    main()
