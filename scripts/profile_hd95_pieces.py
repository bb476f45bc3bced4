"""Piece-level on-chip timing of the HD95 engine (round-4 investigation).

The round-3 share measurement (scripts/measure_hd95_share.py) showed HD95 at
~2.29 s/setting on the bench fixture but lumps the whole engine.  This splits
it per (pair, variant) call:

  1. surface_lists       — full-volume preamble (compaction scatter is N-sized)
  2. label_buffers       — per-label partition (cumsums + scatters over Kg)
  3. hd95_from_buffers   — per-group K x K searches + sort/percentile
  4. searches only       — same but with the sort/percentile replaced by sums
  5. sort only           — 26 standalone jnp.sort calls at bucket sizes

Timing pattern per CLAUDE.md: repeat inside lax.scan within one jit, vary the
input cheaply per iteration (roll / +epsilon) so XLA cannot hoist the body,
force a scalar out.

Run:
    PYTHONPATH=/root/repo:/root/.axon_site \
    CONVEXADAM_COMPILE_CACHE=/tmp/jaxcache \
    python scripts/profile_hd95_pieces.py
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo/scripts")
from measure_hd95_share import make_fixture  # noqa: E402


def timed(fn, *args, n=4, label=""):
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def run(*a):
        def body(acc, i):
            out = fn(i, *a)
            s = sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(out))
            return acc + s, None

        acc, _ = lax.scan(body, jnp.float32(0.0), jnp.arange(n))
        return acc

    v = float(np.asarray(run(*args)))  # compile + run
    t0 = time.time()
    v = float(np.asarray(run(*args)))
    dt = (time.time() - t0) / n
    print(json.dumps({"piece": label, "ms": round(dt * 1000, 2)}), flush=True)
    return dt


def main():
    from convexadam_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    from convexadam_tpu.core.edt import (
        hd95_from_buffers,
        label_buffers,
        surface_lists,
    )
    from convexadam_tpu.selfconfig.engine import _suggest_label_groups

    segs, L = make_fixture()
    groups, kg = _suggest_label_groups(segs, L)
    caps_l = [0] * (L + 1)
    for labs, k in groups:
        for lab in labs:
            caps_l[lab] = k
    caps = tuple(caps_l)
    sf = jnp.asarray(segs[0])
    sw = jnp.asarray(segs[1])

    # 1. surface_lists
    timed(
        lambda i, a, b: surface_lists(
            jnp.roll(a, i, axis=2), jnp.roll(b, i, axis=2), L, kg
        ),
        sf, sw, label="surface_lists",
    )

    import jax

    pre = jax.jit(surface_lists, static_argnums=(2, 3))(sf, sw, L, kg)

    # 2. label_buffers (vary pre coords by +0/+1 so the body stays variant)
    def lb(i, p):
        p2 = p._replace(
            gc_f=p.gc_f + (i % 2).astype(jnp.float32),
            gc_m=p.gc_m + (i % 2).astype(jnp.float32),
        )
        return label_buffers(p2, L, caps)

    timed(lb, pre, label="label_buffers")

    bufs = jax.jit(label_buffers, static_argnums=(1, 2))(pre, L, caps)

    # 3. hd95_from_buffers, all groups (vary buffers by +0/+1)
    def h95(i, b):
        eps = (i % 2).astype(jnp.float32)
        b2 = b._replace(
            inner_f=b.inner_f + eps, inner_m=b.inner_m + eps,
            outer_f=b.outer_f + eps, outer_m=b.outer_m + eps,
        )
        return [
            hd95_from_buffers(b2, caps, k, labels=labs, coords_bf16_exact=True)
            for labs, k in groups
        ]

    timed(h95, bufs, label="hd95_from_buffers(all groups)")

    # 3b. per-group timing of the two largest groups
    for gi in (0, len(groups) - 1):
        labs, k = groups[gi]

        def h95g(i, b, labs=labs, k=k):
            eps = (i % 2).astype(jnp.float32)
            b2 = b._replace(
                inner_f=b.inner_f + eps, inner_m=b.inner_m + eps,
                outer_f=b.outer_f + eps, outer_m=b.outer_m + eps,
            )
            return hd95_from_buffers(
                b2, caps, k, labels=labs, coords_bf16_exact=True
            )

        timed(h95g, bufs, label=f"group {labs} K={k}")

    # 4. searches only (no sort/percentile): sum the raw min-distances
    from convexadam_tpu.core.edt import _nearest_sq, _nearest_sq_dual
    from jax import lax as _lax

    def searches(i, b):
        eps = (i % 2).astype(jnp.float32)
        offs = []
        acc = 0
        for c in caps:
            offs.append(acc)
            acc += int(c)
        tot = jnp.float32(0.0)
        for labs, k in groups:
            for lab in labs:
                off = offs[lab]
                ci_f = _lax.dynamic_slice(b.inner_f, (0, off), (3, k)) + eps
                ci_m = _lax.dynamic_slice(b.inner_m, (0, off), (3, k)) + eps
                co_f = _lax.dynamic_slice(b.outer_f, (0, off), (3, k)) + eps
                co_m = _lax.dynamic_slice(b.outer_m, (0, off), (3, k)) + eps
                d1, d2 = _nearest_sq_dual(
                    ci_m, ci_f, coords_bf16_exact=True,
                    n_query=b.n_inner_m[lab], n_target=b.n_inner_f[lab],
                    head_query=jnp.minimum(b.n_inside_m[lab], k),
                    head_target=jnp.minimum(b.n_inside_f[lab], k),
                )
                d3 = _nearest_sq(
                    ci_m, co_f, coords_bf16_exact=True,
                    n_query=jnp.minimum(b.n_inside_m[lab], k),
                    n_target=b.n_outer_f[lab],
                )
                d4 = _nearest_sq(
                    ci_f, co_m, coords_bf16_exact=True,
                    n_query=jnp.minimum(b.n_inside_f[lab], k),
                    n_target=b.n_outer_m[lab],
                )
                tot = tot + jnp.sum(d1) + jnp.sum(d2) + jnp.sum(d3) + jnp.sum(d4)
        return tot

    timed(searches, bufs, label="searches only (no sort)")

    # 5. sorts only: 2 sorts per label at its bucket size
    def sorts(i, b):
        eps = (i % 2).astype(jnp.float32)
        tot = jnp.float32(0.0)
        for labs, k in groups:
            for _lab in labs:
                key = jnp.arange(k, dtype=jnp.float32)
                tot = tot + jnp.sort(key + eps)[k // 2]
                tot = tot + jnp.sort(key * 0.99 + eps)[k // 2]
        return tot

    timed(sorts, None, label="sorts only (26 x bucket-size)")


if __name__ == "__main__":
    main()
