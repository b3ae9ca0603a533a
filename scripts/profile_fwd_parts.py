"""Time the forward-solve building blocks of one sampling step on TPU.

Separates the step budget into: warm SWD ring solve (perturbation
variant), anchored SWD solve (dimension variant), RF synthesis, and
the whitened-Gaussian likelihood — so kernel work can be prioritized
by measured share rather than guessed.

Usage: python scripts/profile_fwd_parts.py [nchains] [reps]
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

NCHAINS = int(sys.argv[1]) if len(sys.argv) > 1 else 512
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 50


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / REPS
    print(f'{name:28s} {dt * 1e3:8.3f} ms')
    return dt


def main():
    import bench
    from bayhunter_tpu.ops.swd import surfdisp_roots_batch
    from bayhunter_tpu.ops.rf import synrf_batch
    from bayhunter_tpu.ops.voronoi import voronoi_to_layers

    sampler = bench.build(iters=4096)
    states = sampler.init_states_host(0, NCHAINS)
    for m in sampler.moves_for(-4096, 200):
        states = sampler.step_fn(states, int(m))
    jax.block_until_ready(states.logL)

    ev = bench.build.__globals__  # noqa — just for clarity below
    vs, z, n, vpvs = states.vs, states.z, states.n, states.vpvs
    h, vp, vs_l, rho = jax.jit(jax.vmap(
        lambda a, b, c, d: voronoi_to_layers(a, b, c, d)))(vs, z, n,
                                                           vpvs)
    jax.block_until_ready(h)

    # tutorial SWD target periods & cached roots
    fixtures = os.path.join(os.path.dirname(__file__), '..', 'tests',
                            'fixtures')
    swd = np.loadtxt(os.path.join(fixtures, 'st3_rdispph.dat'))
    periods = jnp.asarray(swd[:, 0], jnp.float32)
    roots = states.cache[0][1]
    print(f'nchains={NCHAINS} periods={periods.shape[0]} '
          f'reps={REPS}')

    swd_warm = jax.jit(lambda cp: surfdisp_roots_batch(
        h, vp, vs_l, rho, periods, c_prev=cp, warm_halfwidth=16,
        warm_trips_cap=2))
    swd_dim = jax.jit(lambda cp: surfdisp_roots_batch(
        h, vp, vs_l, rho, periods, c_prev=cp, warm_halfwidth=24,
        anchor_warm=True, warm_trips_cap=2))
    swd_warm1 = jax.jit(lambda cp: surfdisp_roots_batch(
        h, vp, vs_l, rho, periods, c_prev=cp, warm_halfwidth=32,
        warm_trips_cap=1))
    swd_dim1 = jax.jit(lambda cp: surfdisp_roots_batch(
        h, vp, vs_l, rho, periods, c_prev=cp, warm_halfwidth=48,
        anchor_warm=True, warm_trips_cap=1))

    prf = np.loadtxt(os.path.join(fixtures, 'st3_prf.dat'))
    ndata = prf.shape[0]
    nsamp = int(2 ** np.ceil(np.log2(2 * ndata)))
    fsamp = 1.0 / (prf[1, 0] - prf[0, 0])
    tshift = -prf[0, 0]
    C = NCHAINS
    qp = jnp.full((C, h.shape[1]), 500.0, jnp.float32)
    qs = jnp.full((C, h.shape[1]), 225.0, jnp.float32)
    vpvs0 = vp[:, 0] / vs_l[:, 0]
    poisson = (2.0 - vpvs0 ** 2) / (2.0 - 2.0 * vpvs0 ** 2)
    rf = jax.jit(lambda: synrf_batch(
        h, vp, vs_l, rho, qp, qs, 6.4, 1.0, nsamp, fsamp, tshift,
        vs_l[:, 0], poisson))

    noise_step = jax.jit(lambda s: sampler.step_fn(s, 4))

    timeit('SWD warm ring16 cap2 (vs/z)', swd_warm, roots)
    timeit('SWD anchored ring24 (dim)', swd_dim, roots)
    timeit('SWD warm ring32 cap1', swd_warm1, roots)
    timeit('SWD anchored ring48 cap1', swd_dim1, roots)
    timeit('RF synth batch', rf)
    timeit('noise step (dispatch+logL)', lambda: sampler.step_fn(
        states, 4))
    print(f'(step_fn vs total {NCHAINS} chains: see '
          'profile_moves.py)')


if __name__ == '__main__':
    main()
