"""Bisect the vs-step budget: eval_full_batch vs its parts, on
REALISTIC inputs (perturbed models warm-started from the previous
state's roots), plus the step's non-eval remainder.

The standalone kernel probes in profile_fwd_parts.py warm-solve the
UNPERTURBED model from its own converged roots (zero walk trips) —
this script measures each part with the walk the production step
actually pays.

Usage: python scripts/probe_eval_gap.py [nchains] [reps]
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

NCHAINS = int(sys.argv[1]) if len(sys.argv) > 1 else 10240
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 30


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / REPS
    print(f'{name:36s} {dt * 1e3:8.3f} ms')
    return dt


def build_eval():
    """Same evaluator configuration as bench.build."""
    from bayhunter_tpu import Targets
    from bayhunter_tpu.sampler.evaluator import build_evaluator
    fixtures = os.path.join(os.path.dirname(__file__), '..', 'tests',
                            'fixtures')
    swd = np.loadtxt(os.path.join(fixtures, 'st3_rdispph.dat'))
    prf = np.loadtxt(os.path.join(fixtures, 'st3_prf.dat'))
    targets = [Targets.RayleighDispersionPhase(swd[:, 0], swd[:, 1]),
               Targets.PReceiverFunction(prf[:, 0], prf[:, 1])]
    joint = Targets.JointTarget(targets=targets)
    priors = {'vs': (2.0, 5.0), 'z': (0.0, 60.0), 'layers': (1, 20),
              'vpvs': 1.73, 'mohoest': None, 'mantle': None,
              'swdnoise_corr': 0.0, 'swdnoise_sigma': (1e-5, 0.05),
              'rfnoise_corr': 0.98, 'rfnoise_sigma': (1e-5, 0.02)}
    initparams = {'propdist': (0.015, 0.015, 0.015, 0.005, 0.005),
                  'acceptance': (40, 45), 'thickmin': 0.1,
                  'lvz': None, 'hvz': None, 'rcond': 1e-5,
                  'iter_burnin': 4096, 'iter_main': 4096}
    return build_evaluator(joint, priors, initparams, 21,
                           use_batch_swd=True)


def main():
    import bench
    from bayhunter_tpu.ops.voronoi import voronoi_to_layers

    sampler = bench.build(iters=4096)
    ev = build_eval()
    states = sampler.init_states_host(0, NCHAINS)
    for m in sampler.moves_for(-4096, 200):
        states = sampler.step_fn(states, int(m))
    jax.block_until_ready(states.logL)

    # realistic vs perturbation: one nucleus per chain nudged by the
    # tutorial propdist scale; fixed key so every rep does same work
    key = jax.random.PRNGKey(7)
    C = NCHAINS
    k1, k2 = jax.random.split(key)
    slot = jax.random.randint(k1, (C,), 0, 4)
    dvs = 0.04 * jax.random.normal(k2, (C,), states.vs.dtype)
    onehot = (jnp.arange(states.vs.shape[1])[None, :] ==
              slot[:, None])
    vs_pert = states.vs + jnp.where(onehot, dvs[:, None], 0.0)
    vs_pert = jax.block_until_ready(vs_pert)

    cache = states.cache
    cell = states.cell

    full = jax.jit(lambda v: ev.eval_full_batch(
        v, states.z, states.n, states.vpvs, states.noise, cache,
        cell))
    timeit('eval_full_batch (perturbed)', full, vs_pert)
    timeit('eval_full_batch (unperturbed)', full, states.vs)

    v2l = jax.jit(lambda v: jax.vmap(
        lambda a, b, c, d: voronoi_to_layers(a, b, c, d))(
            v, states.z, states.n, states.vpvs))
    timeit('voronoi_to_layers', v2l, vs_pert)
    h, vp, vs_l, rho = jax.block_until_ready(v2l(vs_pert))

    from bayhunter_tpu.ops.swd import surfdisp_roots_batch
    from bayhunter_tpu.ops.rf import synrf_batch
    spec = ev.specs[0]
    cap = int(os.environ.get('BAYHUNTER_WARM_CAP', 2))
    swd = jax.jit(lambda hh, aa, bb, rr: surfdisp_roots_batch(
        hh, aa, bb, rr, spec.periods, c_prev=cache[0][1],
        iwave=spec.iwave, igr=spec.igr, iflsph=spec.flsph,
        warm_halfwidth=16, warm_trips_cap=cap))
    timeit('SWD warm (perturbed model)', swd, h, vp, vs_l, rho)

    rspec = ev.specs[1]
    qp = jnp.full((C, h.shape[1]), 500.0, h.dtype)
    qs = jnp.full((C, h.shape[1]), 225.0, h.dtype)
    vpvs0 = vp[:, 0] / vs_l[:, 0]
    poisson = (2.0 - vpvs0 ** 2) / (2.0 - 2.0 * vpvs0 ** 2)
    rf = jax.jit(lambda hh, aa, bb, rr: synrf_batch(
        hh, aa, bb, rr, qp, qs, rspec.p, rspec.gauss_a, rspec.nsamp,
        rspec.fsamp, rspec.tshift, bb[:, 0], poisson,
        wave_type=rspec.wave_type))
    timeit('RF synth (perturbed model)', rf, h, vp, vs_l, rho)

    timeit('vs step (production)',
           lambda: sampler.step_fn(states, 0))
    timeit('noise step (production)',
           lambda: sampler.step_fn(states, 4))


if __name__ == '__main__':
    main()
