"""On-chip primitive microbenchmarks for the street-scale raster step.

Measures the candidate building blocks behind the round-4 optimization
choices (pair-sort emission width, backward segment-reduction strategy,
transpose/gather layouts) in isolation, so redesigns are picked from
device data rather than toy-scale extrapolation.

IMPORTANT measurement note: over the axon tunnel ``jax.block_until_ready``
returns WITHOUT waiting for device completion (measured 0.056 ms for a
16M-row sort that actually takes ~37 ms).  Every timing here therefore
runs the op inside a lax.scan whose carry feeds the next iteration (no
hoisting possible) and is timed with ``jax.device_get`` on a scalar.

Run on the real TPU (foreground):  python -u tools/microbench_tpu.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 8


def bench_scan(make_body, init_carry, iters=ITERS, reps=3):
    """make_body() -> fn(carry) -> carry (same pytree structure).
    Returns per-iteration ms, scan-amortized, fetched via device_get."""

    @jax.jit
    def run(c0):
        body = make_body()
        c, _ = jax.lax.scan(lambda c, _: (body(c), None), c0, None,
                            length=iters)
        return jax.tree.map(
            lambda x: jnp.asarray(x).ravel()[0].astype(jnp.float32), c)

    jax.device_get(run(init_carry))      # compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.device_get(run(init_carry))
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e3


def main():
    rng = np.random.default_rng(0)
    results = {}

    def rep(name, ms):
        results[name] = ms
        print(f"{ms:9.3f} ms  {name}", flush=True)

    # ---- pair sorts at emission sizes (street: T=8160 tiles, 13-bit keys).
    # Carry the keys through; xor-perturb so each iteration re-sorts.
    for m in (4_000_000, 8_000_000, 16_000_000):
        keys = jnp.asarray(rng.integers(0, 8161, m), jnp.int32)
        ranks = jnp.asarray(rng.integers(0, 1 << 20, m), jnp.int32)
        packed = (keys << 18) | (ranks & ((1 << 18) - 1))

        rep(f"sort1op_{m//1000000}M", bench_scan(
            lambda: lambda p: jax.lax.sort((p ^ 3,), num_keys=1,
                                           is_stable=False)[0], packed))
        rep(f"sort2op_{m//1000000}M", bench_scan(
            lambda: lambda c: jax.lax.sort((c[0] ^ 3, c[1]), num_keys=2,
                                           is_stable=False),
            (keys, ranks)))
        rep(f"sort2op_1key_{m//1000000}M", bench_scan(
            lambda: lambda c: jax.lax.sort((c[0] ^ 3, c[1]), num_keys=1,
                                           is_stable=False),
            (packed, ranks)))
        rep(f"sort3op_1key_{m//1000000}M", bench_scan(
            lambda: lambda c: jax.lax.sort((c[0] ^ 3, c[1], c[2]),
                                           num_keys=1, is_stable=False),
            (packed, ranks, ranks)))

    # ---- backward reduce candidates (street slot grid P=T*K=3.13M,
    # nq = V+1 = 1M queries)
    p = 8160 * 384
    nq = 1_000_001
    m_tot = p + nq
    ids = jnp.asarray(rng.integers(0, 1_000_000, p), jnp.int32)
    keys_m = jnp.concatenate([ids * 2 + 1,
                              jnp.arange(nq, dtype=jnp.int32) * 2])
    d10 = tuple(jnp.asarray(rng.normal(size=m_tot), jnp.float32)
                for _ in range(10))

    rep("bwd_sort11op_4.13M", bench_scan(
        lambda: lambda c: jax.lax.sort((c[0] ^ 3,) + c[1:], num_keys=1,
                                       is_stable=False),
        (keys_m,) + d10))
    rep("bwd_plan_sort2op_4.13M", bench_scan(
        lambda: lambda c: jax.lax.sort(
            (c[0] ^ 3, c[1]), num_keys=1, is_stable=False),
        (keys_m, jnp.arange(m_tot, dtype=jnp.int32))))

    plan = jnp.asarray(rng.permutation(m_tot), jnp.int32)
    rows = jnp.stack(d10, axis=1)                      # [M, 10] row-major

    rep("bwd_rowgather_4.13Mx10", bench_scan(
        lambda: lambda c: (c[0][c[1]], (c[1] + 1) % m_tot),
        (rows, plan)))

    cm = jnp.stack(d10, axis=0)                        # [10, M]
    rep("transpose_both_ways_pair", bench_scan(
        lambda: lambda c: ((c[1] + 1.0).T, (c[0] + 1.0).T),
        (cm, rows)))

    from street_sparse_3dgs_tpu.ops.pallas_blend import _blocked_cumsum_cm
    rep("cumsum_cm_10x4.13M", bench_scan(
        lambda: lambda c: (_blocked_cumsum_cm(c[0]) * 1e-6,), (cm,)))

    def cumsum_rm(x):        # [M, C] row-major: [nb, 512, C] lane-padded dots
        mrows, c = x.shape
        block = 512
        pad = (-mrows) % block
        xp = jnp.concatenate([x, jnp.zeros((pad, c), x.dtype)])
        nb = (mrows + pad) // block
        r = xp.reshape(nb, block, c)
        tri = (jax.lax.broadcasted_iota(jnp.int32, (block, block), 1)
               <= jax.lax.broadcasted_iota(jnp.int32, (block, block), 0)
               ).astype(x.dtype)
        within = jax.lax.dot_general(tri, r, (((1,), (1,)), ((), ())),
                                     precision=jax.lax.Precision.HIGHEST)
        within = jnp.swapaxes(within, 0, 1)
        totals = within[:, -1, :]
        off = jnp.cumsum(totals, axis=0) - totals
        return (within + off[:, None, :]).reshape(-1, c)[:mrows]

    rep("cumsum_rm_4.13Mx10", bench_scan(
        lambda: lambda c: (cumsum_rm(c[0]) * 1e-6,), (rows,)))

    # pos-gather: [nq] boundary rows out of [M, 10] row-major
    pos = jnp.asarray(np.sort(rng.integers(0, m_tot, nq)), jnp.int32)
    rep("posgather_1Mx10_from_4.13Mx10", bench_scan(
        lambda: lambda c: (c[0].at[0, 0].add(c[0][pos].sum()),), (rows,)))

    # scatter-add segment reduce (XLA native VJP baseline)
    seg = jnp.asarray(np.sort(rng.integers(0, 1_000_000, p)), jnp.int32)
    zero_v = jnp.zeros((1_000_000, 10), jnp.float32)
    rep("scatteradd_3.13Mx10_to_1M", bench_scan(
        lambda: lambda c: (c[0].at[:1_000_000].add(
            jnp.zeros((1_000_000, 10), jnp.float32).at[seg].add(
                c[0][:p]) * 1e-6),),
        (rows,)))

    # dim-1 merge sort (two sorted K-lists per tile): [8160, 768] 1-op
    tbl = jnp.asarray(rng.integers(0, 1 << 20, (8160, 768)), jnp.int32)
    rep("dim1sort_8160x768", bench_scan(
        lambda: lambda c: (jax.lax.sort((c[0] ^ 3,), num_keys=1,
                                        is_stable=False,
                                        dimension=1)[0],), (tbl,)))

    # bf16-packed payload sort: 1 key + 5 packed operands (street bwd idea)
    d5 = tuple(jnp.asarray(rng.integers(0, 1 << 31, m_tot), jnp.int32)
               for _ in range(5))
    rep("bwd_sort6op_4.13M", bench_scan(
        lambda: lambda c: jax.lax.sort((c[0] ^ 3,) + c[1:], num_keys=1,
                                       is_stable=False),
        (keys_m,) + d5))
    rep("bwd_sort6op_3.13M", bench_scan(
        lambda: lambda c: jax.lax.sort((c[0] ^ 3,) + c[1:], num_keys=1,
                                       is_stable=False),
        (keys_m[:p],) + tuple(x[:p] for x in d5)))
    rep("bwd_sort11op_3.13M", bench_scan(
        lambda: lambda c: jax.lax.sort((c[0] ^ 3,) + c[1:], num_keys=1,
                                       is_stable=False),
        (keys_m[:p],) + tuple(x[:p] for x in d10)))

    # ---- attr gather (fwd): [T*K] ranks -> rows from depth-ordered [1M,10]
    src = jnp.asarray(rng.normal(size=(1_000_000, 10)), jnp.float32)
    gidx = jnp.asarray(rng.integers(0, 1_000_000, p), jnp.int32)
    gsort = jnp.sort(gidx)
    for tag, g in (("rand", gidx), ("tilesorted", gsort)):
        rep(f"attr_rowgather_3.13Mx10_{tag}", bench_scan(
            lambda g=g: lambda c: (c[0].at[0, 0].add(c[0][g].sum() * 1e-9),),
            (src,)))

    print({k: round(v, 3) for k, v in results.items()})


if __name__ == "__main__":
    main()
