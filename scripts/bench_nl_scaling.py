"""On-chip A/B: secular-kernel dynamic layer skip vs padded width nl.

The dynamic skip (ops/pallas_secular.py DYNAMIC_NL) was measured a 2x
LOSS at the production nl=21 (each unrolled layer is one (8,128) f32
vreg of work; the scf.if carry save/restore dominates) and defaults
OFF for the secular kernels.  The reference supports up to 100 layers
(surfdisp96.f:60-62) — a user raising maxlayers pads every batch to a
much wider nl, and the skip's saved work grows linearly while its
branch overhead stays constant.  This script locates the crossover so
the default can be documented (and, if warranted, auto-enabled above
a width threshold).

Run on the real chip:  python scripts/bench_nl_scaling.py [nl ...]
"""

import os
import os.path as op
import sys
import time

os.environ.setdefault('BAYHUNTER_DYNAMIC_NL_SWD', '0')

sys.path.insert(0, op.join(op.dirname(op.abspath(__file__)), '..'))

import jax                                              # noqa: E402
import jax.numpy as jnp                                 # noqa: E402
import numpy as np                                      # noqa: E402

jax.config.update('jax_compilation_cache_dir',
                  op.join(op.dirname(__file__), '..', '.jax_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from bayhunter_tpu.ops import pallas_secular as ps      # noqa: E402

C, L = 512, 128
REPS = 200


def make_args(nl, rng):
    nact = rng.integers(4, 9, size=C)
    d = np.zeros((C, nl), np.float32)
    a = rng.uniform(5.0, 8.5, (C, nl)).astype(np.float32)
    for c in range(C):
        d[c, :nact[c]] = rng.uniform(1.0, 10.0, nact[c])
        a[c, nact[c]:] = a[c, nact[c]]
    b = (a / 1.73).astype(np.float32)
    rho = (0.32 * a + 0.77).astype(np.float32)
    per = rng.uniform(5., 50., (C, L)).astype(np.float32)
    omega = (2 * np.pi / per).astype(np.float32)
    cc = rng.uniform(2.0, 4.8, (C, L)).astype(np.float32)
    wvno = (omega / cc).astype(np.float32)
    return tuple(map(jnp.asarray, (wvno, omega, d, a, b, rho)))


def time_arm(dynamic, args):
    # dynamic: None (full unroll), 'branch', or 'loop'
    ps.DYNAMIC_NL_MODE = dynamic
    raw = ps.dltar4_pallas.__wrapped__
    f = jax.jit(lambda *a: raw(*a))
    f(*args).block_until_ready()
    t0 = time.time()
    for _ in range(REPS):
        r = f(*args)
    r.block_until_ready()
    return (time.time() - t0) / REPS * 1e3


def main():
    nls = ([int(x) for x in sys.argv[1:]] if len(sys.argv) > 1
           else [21, 32, 48, 64, 100])
    rng = np.random.default_rng(0)
    print('nl    full ms   dyn ms    dyn/full')
    for nl in nls:
        args = make_args(nl, rng)
        t_full = time_arm(None, args)
        t_dyn = time_arm('branch', args)
        print('%-4d  %7.3f   %7.3f   %.2f'
              % (nl, t_full, t_dyn, t_dyn / t_full))


if __name__ == '__main__':
    main()
