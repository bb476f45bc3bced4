"""Sub-piece on-chip timing of core/edt.py:surface_lists (round-5).

Round-4 left the HD95 engine at ~196 ms/pair-variant split roughly in
thirds: surface_lists 69 / label_buffers 65 / searches+sorts 62 (see
scripts/profile_hd95_pieces.py).  This splits the full-volume preamble the
same way profile_label_buffers.py split the partition:

  1. neighbor_stack + diff        — 6 shifted full-volume copies + any()
  2. compaction cumsum            — N-long prefix sum per volume
  3. compaction scatter           — N-index 1-D scatter per volume
  4. packed word build            — full-volume VPU shifts/ors
  5. word gather + field unpack   — Kg-index take + shifts
  6. label_counts                 — compare-and-reduce per label
  7. whole surface_lists          — the sum, for cross-checking

Run:
    PYTHONPATH=/root/repo:/root/.axon_site \
    CONVEXADAM_COMPILE_CACHE=/tmp/jaxcache \
    python scripts/profile_surface_lists.py
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo/scripts")
from measure_hd95_share import make_fixture  # noqa: E402
from profile_hd95_pieces import timed  # noqa: E402


def main():
    from convexadam_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from convexadam_tpu.core.edt import surface_lists
    from convexadam_tpu.selfconfig.engine import _suggest_label_groups

    segs, L = make_fixture()
    _, kg = _suggest_label_groups(segs, L)
    sf = jnp.asarray(segs[0])
    H, W, D = sf.shape
    N = H * W * D
    bits = (L + 1).bit_length()
    print(f"# N={N} Kg={kg} bits={bits}", flush=True)

    from convexadam_tpu.core.edt import _neighbor_stack as neighbor_stack

    # 1. neighbour stack + diff
    def p1(i, a):
        seg = jnp.roll(a, i, axis=2).astype(jnp.int16)
        nb = neighbor_stack(seg)
        return jnp.any(nb != seg[None], axis=0)

    timed(p1, sf, label="neighbor_stack+diff")

    seg16 = sf.astype(jnp.int16)
    nb0 = neighbor_stack(seg16)
    diff0 = jnp.any(nb0 != seg16[None], axis=0).reshape(-1)

    # 2. compaction cumsum
    def p2(i, d):
        d = jnp.roll(d, i)
        return jnp.cumsum(d.astype(jnp.int32))

    timed(p2, diff0, label="compaction cumsum (N)")

    pos0 = jnp.cumsum(diff0.astype(jnp.int32)) - 1

    # 3. compaction scatter
    def p3(i, d, pos):
        tgt = jnp.where(jnp.roll(d, i), pos, kg)
        buf = jnp.full((kg,), -1, jnp.int32)
        return buf.at[tgt].set(jnp.arange(N, dtype=jnp.int32), mode="drop")

    timed(p3, diff0, pos0, label="compaction scatter (N idx)")

    # 4. packed word build (full volume)
    def p4(i, seg):
        seg = jnp.roll(seg, i, axis=2)
        nb = neighbor_stack(seg)
        word = seg.astype(jnp.int32)
        for k in range(6):
            word = word | (nb[k].astype(jnp.int32) << (bits * (k + 1)))
        return word

    timed(p4, seg16, label="packed word build (incl stack)")

    word0 = p4(jnp.int32(0), seg16).reshape(-1)
    gidx0 = p3(jnp.int32(0), diff0, pos0)

    # 5. word gather + unpack
    def p5(i, w, g):
        g = jnp.roll(g, i)
        gv = g >= 0
        safe = jnp.maximum(g, 0)
        wv = jnp.where(gv, w[safe], -1)
        fmask = jnp.int32((1 << bits) - 1)
        own = wv & fmask
        nbv = [(wv >> (bits * (k + 1))) & fmask for k in range(6)]
        return own, jnp.stack(nbv)

    timed(p5, word0, gidx0, label="word gather+unpack (Kg idx)")

    # 6. label_counts
    from convexadam_tpu.core.features import label_counts

    def p6(i, seg):
        return label_counts(jnp.roll(seg, i, axis=2), L + 1)

    timed(p6, seg16, label="label_counts")

    # 7. whole surface_lists (both volumes)
    def p7(i, a, b):
        return surface_lists(
            jnp.roll(a, i, axis=2), jnp.roll(b, i, axis=2), L, kg
        )

    timed(p7, sf, jnp.asarray(segs[1]), label="surface_lists (2 vols)")

    # 8. coords from flat idx
    def p8(i, g):
        g = jnp.roll(g, i)
        safe = jnp.maximum(g, 0)
        z = safe // (W * D)
        y = (safe // D) % W
        x = safe % D
        return jnp.stack([z, y, x]).astype(jnp.float32)

    timed(p8, gidx0, label="coords from flat idx")

    del jax


if __name__ == "__main__":
    main()
