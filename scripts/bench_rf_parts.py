"""Microbench: decompose the batched RF synthesis into its pallas
kernel and XLA tail (deconvolution + inverse DFT) on the real chip.

Same 1-vs-5 unrolled-calls slope methodology as
bench_secular_scaling.py — dispatch cost and fixed program overhead
cancel in the difference, distinct inputs prevent elision.

Usage: python scripts/bench_rf_parts.py [nchains]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir',
                  os.path.join(os.path.dirname(__file__), '..',
                               '.jax_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

NL = 21
C = int(sys.argv[1]) if len(sys.argv) > 1 else 10240
REPS = 30


def models(k, seed):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(k):
        nact = rng.integers(4, 9, size=C)
        h = np.zeros((C, NL), np.float32)
        vs = np.full((C, NL), 4.4, np.float32)
        for c in range(C):
            h[c, :nact[c] - 1] = rng.uniform(1., 10., nact[c] - 1)
            vs[c, :nact[c]] = np.sort(rng.uniform(2.5, 4.4, nact[c]))
        vp = vs * 1.73
        rho = 0.32 * vp + 0.77
        out.append(tuple(map(jnp.asarray, (h, vp, vs, rho))))
    return out


def slope(name, one):
    """Per-call device time of ``one(h, vp, vs, rho)`` via the
    1-vs-5 unrolled slope."""
    ms = models(5, 3)
    flat = tuple(x for m in ms for x in m)

    @jax.jit
    def f1(*a):
        return one(*a[0:4])

    @jax.jit
    def f5(*a):
        return [one(*a[4 * i:4 * i + 4]) for i in range(5)]

    jax.block_until_ready(f1(*flat[:4]))
    jax.block_until_ready(f5(*flat))

    def t(f, a):
        t0 = time.time()
        for _ in range(REPS):
            o = f(*a)
        jax.block_until_ready(o)
        return (time.time() - t0) / REPS

    d1 = t(f1, flat[:4])
    d5 = t(f5, flat)
    per = (d5 - d1) / 4.0
    print(f'{name:34s} {per * 1e3:8.3f} ms/call '
          f'(1-call {d1 * 1e3:.3f}, 5-call {d5 * 1e3:.3f})')
    return per


def main():
    from bayhunter_tpu.ops.rf import synrf_batch
    from bayhunter_tpu.ops.pallas_rf import transmission_response_pallas

    fixtures = os.path.join(os.path.dirname(__file__), '..', 'tests',
                            'fixtures')
    prf = np.loadtxt(os.path.join(fixtures, 'st3_prf.dat'))
    ndata = prf.shape[0]
    nsamp = int(2 ** np.ceil(np.log2(2 * ndata)))
    fsamp = 1.0 / (prf[1, 0] - prf[0, 0])
    tshift = -prf[0, 0]
    qp = jnp.full((C, NL), 500.0, jnp.float32)
    qs = jnp.full((C, NL), 225.0, jnp.float32)
    dw = 2.0 * np.pi * fsamp / nsamp
    cut = min(nsamp // 2 + 1, int(np.ceil(6.0 / dw)) + 1)
    print(f'nchains={C} nsamp={nsamp} fsamp={fsamp:.2f} cut={cut}')

    slope('synrf_batch (full)',
          lambda h, vp, vs, rho: synrf_batch(
              h, vp, vs, rho, qp, qs, 6.4, 1.0, nsamp, fsamp, tshift,
              vs[:, 0], jnp.full((C,), 0.25, jnp.float32)))

    slope('transmission kernel only',
          lambda h, vp, vs, rho: transmission_response_pallas(
              h, vp, vs, rho, qp, qs,
              jnp.full((C,), 6.4 * 0.0089932, jnp.float32),
              nsamp, fsamp, nfreq_out=cut))


if __name__ == '__main__':
    main()
