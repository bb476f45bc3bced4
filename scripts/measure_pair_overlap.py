"""Settle VERDICT r3 next#6: is cross-pair overlap a throughput lever?

The proposal was to dispatch pair N+1's feature/convex stages while pair
N's Adam scan runs.  On this hardware the question reduces to dispatch
policy: `convex_adam_jax` is ONE jitted program (features -> cost volume ->
coupled convex -> Adam scan -> compose), and a v5e chip has a single
TensorCore that executes enqueued programs serially — there are no
concurrent streams to overlap compute on.  The only possible win is hiding
HOST-side latency (dispatch + ~35 ms tunnel round-trip per call, see
CLAUDE.md) behind device compute.  bench.py's headline loop already
dispatches all runs before blocking once, so the committed pairs/s number
is already the fully-overlapped regime.

This script quantifies the gap explicitly, over DISTINCT input pairs:

  blocked    — block_until_ready after every pair (a naive caller's loop)
  pipelined  — enqueue all pairs, block once at the end (bench.py's policy,
               and what `register_pairs` does internally)

Run:  PYTHONPATH=/root/repo:/root/.axon_site \
      CONVEXADAM_COMPILE_CACHE=/tmp/jaxcache \
      python scripts/measure_pair_overlap.py

Prints one JSON line: pairs/s in each mode and the overlap gain.
"""

import json
import time

import numpy as np


def make_pairs(n: int, shape=(192, 192, 192), seed: int = 0):
    import jax.numpy as jnp

    from convexadam_tpu.core.warp import resize_trilinear

    rng = np.random.default_rng(seed)
    pairs = []
    for k in range(n):
        base = rng.standard_normal([s // 4 for s in shape]).astype(np.float32)
        vol = np.asarray(resize_trilinear(jnp.asarray(base)[None], shape)[0])
        vol = (vol - vol.mean()) / vol.std() * 100
        moving = np.roll(vol, (5 - k, -4 + k, 3), axis=(0, 1, 2))
        pairs.append((jnp.asarray(vol), jnp.asarray(moving)))
    return pairs


def main():
    from convexadam_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax

    from convexadam_tpu.pipeline.convex_adam import (
        ConvexAdamConfig,
        convex_adam_jax,
    )

    cfg = ConvexAdamConfig()
    fn = jax.jit(lambda a, b: convex_adam_jax(a, b, cfg))

    n = 6
    pairs = make_pairs(n)
    fn(*pairs[0]).block_until_ready()  # compile + warmup

    # blocked: serialize host round-trips between pairs
    t0 = time.perf_counter()
    for a, b in pairs:
        fn(a, b).block_until_ready()
    t_blocked = time.perf_counter() - t0

    # pipelined: enqueue everything, one sync (bench.py / register_pairs)
    t0 = time.perf_counter()
    outs = [fn(a, b) for a, b in pairs]
    outs[-1].block_until_ready()
    for o in outs:
        o.block_until_ready()
    t_pipe = time.perf_counter() - t0

    blocked = n / t_blocked
    pipelined = n / t_pipe
    print(
        json.dumps(
            {
                "pairs": n,
                "blocked_pairs_per_s": round(blocked, 4),
                "pipelined_pairs_per_s": round(pipelined, 4),
                "overlap_gain": round(pipelined / blocked, 4),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
