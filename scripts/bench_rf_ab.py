"""A/B microbenchmark: the production batched RF path (pallas
transmission kernel + Gauss-cutoff frequency truncation) vs the
full-spectrum vmapped XLA synrf.

NOTE this compares the two PATHS, not the bare kernels — the batch
arm computes only the lanes below the Gauss low-pass knee, so part of
its advantage is the truncation.  Times the full batched RF synthesis
(transmission response + deconvolution + irfft) both ways on
realistic sampler shapes, within ONE session (chip throughput varies
>2x between sessions).

Usage:  python scripts/bench_rf_ab.py [nchains] [nsamp]
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

C = int(sys.argv[1]) if len(sys.argv) > 1 else 512
NSAMP = int(sys.argv[2]) if len(sys.argv) > 2 else 256
NL = 21
REPS = 50


def main():
    from bayhunter_tpu.ops.rf import synrf, synrf_batch

    rs = np.random.RandomState(0)
    H = np.zeros((C, NL), np.float32)
    VS = np.zeros((C, NL), np.float32)
    for i in range(C):
        nlay = rs.randint(3, 8)
        H[i, :nlay - 1] = rs.uniform(3, 15, nlay - 1)
        vv = np.sort(rs.uniform(2.5, 4.5, nlay))
        VS[i] = vv[-1]
        VS[i, :nlay] = vv
    VP = VS * 1.73
    RHO = VP * 0.32 + 0.77
    QP = np.full((C, NL), 500., np.float32)
    QS = np.full((C, NL), 225., np.float32)
    args = [jnp.asarray(x) for x in (H, VP, VS, RHO, QP, QS)]
    nsv = jnp.asarray(VS[:, 0])
    poisson = jnp.full((C,), 0.25, jnp.float32)

    fb = jax.jit(lambda *a: synrf_batch(
        *a, 6.4, 1.0, NSAMP, 5.0, 5.0, nsv, poisson, wave_type=0))
    fv = jax.jit(lambda *a: jax.vmap(
        lambda h, vp, vs, rho, qp, qs, n, po: synrf(
            h, vp, vs, rho, qp, qs, 6.4, 1.0, NSAMP, 5.0, 5.0, n, po,
            wave_type=0)[2])(*a, nsv, poisson))

    out = {}
    for name, fn in (('pallas', fb), ('xla_vmap', fv)):
        r = fn(*args)
        jax.block_until_ready(r)
        t0 = time.time()
        for _ in range(REPS):
            r = fn(*args)
        jax.block_until_ready(r)
        dt = (time.time() - t0) / REPS
        out[name] = dt
        print(f'{name:10s} {dt * 1e3:8.3f} ms/call '
              f'({C / dt:,.0f} RFs/s)')
    print(f'speedup pallas vs xla_vmap: '
          f'{out["xla_vmap"] / out["pallas"]:.2f}x')


if __name__ == '__main__':
    main()
