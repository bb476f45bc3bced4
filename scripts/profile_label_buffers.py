"""Sub-piece timing of core/edt.py:label_buffers (round-4 investigation).

label_buffers measured 947 ms per (pair, variant) on the bench fixture —
~87% of the HD95 engine (scripts/profile_hd95_pieces.py).  Split it:

  A. inner ranks   — (L+1, Kg) onehot + 2 cumsums + take_along_axis
  B. inner scatter — Kg indices
  C. outer expand  — dedup/valid masks over (6, Kg), elementwise
  D. outer ranks   — (L+1, 6Kg) onehot + cumsum + take_along_axis
  E. outer scatter — 6Kg indices
  F. cumsum only   — jnp.cumsum over (L+1, 6Kg) int32, axis=1
  G. cumsum via transposed layout / associative_scan variants

Run:
    PYTHONPATH=/root/repo:/root/.axon_site \
    CONVEXADAM_COMPILE_CACHE=/tmp/jaxcache \
    python scripts/profile_label_buffers.py
"""

import sys

sys.path.insert(0, "/root/repo/scripts")
from measure_hd95_share import make_fixture  # noqa: E402
from profile_hd95_pieces import timed  # noqa: E402


def main():
    from convexadam_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from convexadam_tpu.core.edt import _COORD_PAD, surface_lists
    from convexadam_tpu.selfconfig.engine import _suggest_label_groups

    segs, L = make_fixture()
    groups, kg = _suggest_label_groups(segs, L)
    caps_l = [0] * (L + 1)
    for labs, k in groups:
        for lab in labs:
            caps_l[lab] = k
    caps = tuple(caps_l)
    offs_host = []
    acc = 0
    for c in caps:
        offs_host.append(acc)
        acc += int(c)
    M = acc
    print(f"Kg={kg} M={M} caps={caps}")

    sf = jnp.asarray(segs[0])
    sw = jnp.asarray(segs[1])
    pre = jax.jit(surface_lists, static_argnums=(2, 3))(sf, sw, L, kg)
    own, nbv, gc, inside = pre.own_f, pre.nbv_f, pre.gc_f, pre.inside_f
    offs = jnp.asarray(offs_host, jnp.int32)
    capsj = jnp.asarray(caps, jnp.int32)
    labs_iota = jnp.arange(L + 1, dtype=jnp.int16)

    def vary16(x, i):
        return x + (i % 2).astype(x.dtype)

    # A. inner ranks
    def inner_ranks(i, own, inside):
        own = vary16(own, i)
        onehot = own[None, :] == labs_iota[:, None]
        oh_in = onehot & inside[None, :]
        ranks_in = jnp.cumsum(oh_in.astype(jnp.int32), axis=1) - 1
        ranks_out = jnp.cumsum(
            (onehot & ~inside[None, :]).astype(jnp.int32), axis=1
        ) - 1
        own_c = jnp.clip(own.astype(jnp.int32), 0, L)
        r_in = jnp.take_along_axis(ranks_in, own_c[None, :], axis=0)[0]
        r_out = jnp.take_along_axis(ranks_out, own_c[None, :], axis=0)[0]
        return r_in, r_out, ranks_in[:, -1], ranks_out[:, -1]

    timed(inner_ranks, own, inside, label="A inner ranks")

    # B. inner scatter
    r_in, r_out, nin, nout_i = jax.jit(inner_ranks)(jnp.int32(0), own, inside)
    n_inside = nin + 1

    def inner_scatter(i, gc, pos):
        pos = pos + (i % 2)
        own_c = jnp.clip(own.astype(jnp.int32), 0, L)
        valid = (own >= 1) & (pos < capsj[own_c])
        tgt = jnp.where(valid, offs[own_c] + pos, M)
        buf = jnp.full((3, M), _COORD_PAD, jnp.float32)
        return buf.at[:, tgt].set(gc, mode="drop")

    pos0 = jnp.where(inside, r_in, n_inside[jnp.clip(own.astype(jnp.int32), 0, L)] + r_out)
    timed(inner_scatter, gc, pos0, label="B inner scatter (Kg idx)")

    # C. outer expand masks
    def outer_expand(i, nbv):
        nbv = vary16(nbv, i)
        dedup = [jnp.ones(own.shape, bool)]
        for k in range(1, 6):
            seen = nbv[k] == nbv[0]
            for kp in range(1, k):
                seen = seen | (nbv[k] == nbv[kp])
            dedup.append(~seen)
        ovalid = (
            (nbv != own[None]) & (nbv >= 1) & (nbv <= L)
            & jnp.stack(dedup) & (own >= 0)[None]
        )
        return ovalid

    timed(outer_expand, nbv, label="C outer expand masks")

    ovalid = jax.jit(outer_expand)(jnp.int32(0), nbv)

    # D. outer ranks
    def outer_ranks(i, nbv, ovalid):
        nbv = vary16(nbv, i)
        lab_flat = nbv.T.reshape(-1)
        val_flat = ovalid.T.reshape(-1)
        o_onehot = val_flat[None, :] & (lab_flat[None, :] == labs_iota[:, None])
        oranks = jnp.cumsum(o_onehot.astype(jnp.int32), axis=1) - 1
        lab_c = jnp.clip(lab_flat.astype(jnp.int32), 0, L)
        rank_lab = jnp.take_along_axis(oranks, lab_c[None, :], axis=0)[0]
        return rank_lab, oranks[:, -1]

    timed(outer_ranks, nbv, ovalid, label="D outer ranks (14 x 6Kg)")

    rank_lab, _ = jax.jit(outer_ranks)(jnp.int32(0), nbv, ovalid)

    # E. outer scatter
    def outer_scatter(i, gc, rank_lab):
        rank_lab = rank_lab + (i % 2)
        lab_flat = nbv.T.reshape(-1)
        val_flat = ovalid.T.reshape(-1)
        lab_c = jnp.clip(lab_flat.astype(jnp.int32), 0, L)
        ok = val_flat & (rank_lab < capsj[lab_c])
        otgt = jnp.where(ok, offs[lab_c] + rank_lab, M)
        gc_rep = jnp.broadcast_to(gc[:, :, None], gc.shape + (6,)).reshape(3, -1)
        buf = jnp.full((3, M), _COORD_PAD, jnp.float32)
        return buf.at[:, otgt].set(gc_rep, mode="drop")

    timed(outer_scatter, gc, rank_lab, label="E outer scatter (6Kg idx)")

    # F. bare cumsum (L+1, 6Kg) int32 axis=1
    import numpy as np

    big = jnp.asarray(
        np.random.default_rng(0).integers(0, 2, (L + 1, 6 * kg), dtype=np.int32)
    )

    def bare_cumsum(i, x):
        return jnp.cumsum(x + (i % 2), axis=1)[:, -1]

    timed(bare_cumsum, big, label="F bare cumsum (14, 6Kg) axis=1")

    # G. cumsum along axis 0 of the transposed layout
    bigT = big.T

    def bare_cumsum_T(i, x):
        return jnp.cumsum(x + (i % 2), axis=0)[-1]

    timed(bare_cumsum_T, bigT, label="G bare cumsum (6Kg, 14) axis=0")

    # H. associative_scan over axis=1
    from jax import lax

    def assoc(i, x):
        return lax.associative_scan(jnp.add, x + (i % 2), axis=1)[:, -1]

    timed(assoc, big, label="H associative_scan (14, 6Kg) axis=1")

    # I. blocked two-level cumsum: within 128-wide blocks via matmul-free
    #    reshape trick, then block offsets
    def blocked(i, x):
        x = x + (i % 2)
        nb = x.shape[1] // 512
        xb = x.reshape(L + 1, nb, 512)
        within = jnp.cumsum(xb, axis=2)
        totals = within[:, :, -1]
        offs_b = jnp.cumsum(totals, axis=1) - totals
        return (within + offs_b[:, :, None]).reshape(L + 1, -1)[:, -1]

    timed(blocked, big, label="I blocked cumsum 512")

    # J. one fat scatter vs six thinner ones: scatter 1M idx x6 separate
    def six_scatters(i, gc, rank_lab):
        rank_lab = (rank_lab + (i % 2)).reshape(-1, 6)
        buf = jnp.full((3, M), _COORD_PAD, jnp.float32)
        lab6 = nbv.T.reshape(-1, 6)
        ov6 = ovalid.T.reshape(-1, 6)
        for k in range(6):
            lab_c = jnp.clip(lab6[:, k].astype(jnp.int32), 0, L)
            ok = ov6[:, k] & (rank_lab[:, k] < capsj[lab_c])
            otgt = jnp.where(ok, offs[lab_c] + rank_lab[:, k], M)
            buf = buf.at[:, otgt].set(gc, mode="drop")
        return buf

    timed(six_scatters, gc, rank_lab, label="J outer scatter as 6 x Kg idx")


if __name__ == "__main__":
    main()
