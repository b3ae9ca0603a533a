"""Microbench: device-side time of one pallas secular-kernel
invocation at the warm-solve's actual shapes, across the dynamic
layer-skip modes (None / 'branch' / 'loop').

Methodology: host-side timing of single calls is unreliable here (the
axon dispatch pipeline and shared-chip variance drown 0.2-1 ms
kernels), so the per-invocation time is measured as the slope between
ONE call and FIVE unrolled calls on distinct inputs inside one jitted
program — dispatch cost and fixed program overhead cancel in the
difference, and distinct inputs prevent any caching/elision.
(A fori_loop-chained variant does NOT work: the loop hides entirely
under the ~1 ms per-program dispatch floor.)

Reference numbers (v5e, 2026-08-18, 512 chains, nl=21, models with
4-8 active layers):
    L= 384: full 422 us   branch 246 us   loop 246 us
    L= 768: full 896 us   branch 459 us   loop 443 us
i.e. the dynamic skip halves the kernel at real warm shapes; the old
"2x slower" measurement for 'branch' was an L=128 artifact (carry
save/restore dominating a single-vreg lane axis).

Usage: python scripts/bench_secular_scaling.py
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

import bayhunter_tpu.ops.pallas_secular as ps  # noqa: E402

NL = 21
REPS = 100


def model(C, rng):
    nact = rng.integers(4, 9, size=C)
    d = np.zeros((C, NL), np.float32)
    b = np.full((C, NL), 4.4, np.float32)
    for c in range(C):
        d[c, :nact[c]] = rng.uniform(1., 10., nact[c])
        b[c, :nact[c] + 1] = rng.uniform(2.5, 4.2, nact[c] + 1)
    a = (b * 1.73).astype(np.float32)
    rho = (0.32 * a + 0.77).astype(np.float32)
    return tuple(map(jnp.asarray, (d, a, b, rho)))


def timeit(f, *args):
    out = f(*args)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(4):
        t0 = time.time()
        for _ in range(REPS):
            out = f(*args)
        jax.block_until_ready(out)
        best = min(best, (time.time() - t0) / REPS)
    return best


def main():
    rng = np.random.default_rng(0)
    raw = ps.dltar4_pallas.__wrapped__
    for C in (512, 2048):
        d, a, b, rho = model(C, rng)
        print(f'--- C={C} (programs={C // 8}) ---')
        for L in (384, 768, 1408):
            om = jnp.full((C, L), 2.0 * np.pi / 20.0, jnp.float32)
            wvs = [om / jnp.asarray(
                rng.uniform(2.5, 4.3, (C, L)).astype(np.float32))
                for _ in range(5)]
            for mode in (None, 'branch', 'loop'):
                ps.DYNAMIC_NL_MODE = mode

                def f5_(w0, w1, w2, w3, w4):
                    s = 0.
                    for w in (w0, w1, w2, w3, w4):
                        s = s + raw(w, om, d, a, b, rho).sum()
                    return s

                f5 = jax.jit(f5_)
                f1 = jax.jit(lambda w0: raw(w0, om, d, a, b,
                                            rho).sum())
                t1 = timeit(f1, wvs[0])
                t5 = timeit(f5, *wvs)
                per = (t5 - t1) / 4
                print(f'L={L:5d} mode={str(mode):6s}: '
                      f'{per * 1e6:7.1f} us/invocation '
                      f'(1call {t1 * 1e3:6.3f} ms)')
                sys.stdout.flush()


if __name__ == '__main__':
    main()
