"""Break the non-forward step overhead into parts at large nchains.

The noise move does no forward solve, yet costs ~8.5 ms at 10240
chains — ~40% of every move step.  This times: (a) a donated identity
pass over the full ChainState, (b) eval_noise alone, (c) a PRNG +
proposal-shaped draw, so the overhead can be attributed.

Usage: python scripts/probe_overhead.py [nchains] [reps]
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


def main():
    import bench
    from bayhunter_tpu import Targets
    from bayhunter_tpu.sampler.evaluator import build_evaluator

    sampler = bench.build(iters=4096)
    states = sampler.init_states_host(0, NCHAINS)
    for m in sampler.moves_for(-4096, 100):
        states = sampler.step_fn(states, int(m))
    jax.block_until_ready(states.logL)

    leaves = jax.tree_util.tree_leaves(states)
    tot = sum(l.size * l.dtype.itemsize for l in leaves)
    print(f'nchains={NCHAINS} state leaves={len(leaves)} '
          f'bytes={tot / 1e6:.1f} MB')
    for l in sorted(leaves,
                    key=lambda l: -l.size * l.dtype.itemsize)[:6]:
        print(f'  leaf {str(l.shape):18s} {l.dtype} '
              f'{l.size * l.dtype.itemsize / 1e6:.2f} MB')

    # (a) donated identity pass: dispatch + donation floor
    ident_d = jax.jit(lambda s: s._replace(iiter=s.iiter + 1),
                      donate_argnums=0)
    out = ident_d(states)
    jax.block_until_ready(out.logL)
    t0 = time.time()
    for _ in range(REPS):
        out = ident_d(out)
    jax.block_until_ready(out.logL)
    print(f'{"identity pass (donated)":34s} '
          f'{(time.time() - t0) / REPS * 1e3:8.3f} ms')
    states = out

    # (b) eval_noise alone (vmapped over chains, jitted)
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
    ev = build_evaluator(joint, priors, initparams, 21,
                         use_batch_swd=True)

    f = jax.jit(jax.vmap(ev.eval_noise))
    out2 = f(states.noise, states.cache, states.cell)
    jax.block_until_ready(out2)
    t0 = time.time()
    for _ in range(REPS):
        out2 = f(states.noise, states.cache, states.cell)
    jax.block_until_ready(out2)
    print(f'{"eval_noise (vmapped)":34s} '
          f'{(time.time() - t0) / REPS * 1e3:8.3f} ms')

    # (c) PRNG: split + normal/uniform draws at proposal shapes
    @jax.jit
    def prng(keys):
        ks = jax.vmap(lambda k: jax.random.split(k, 2))(keys)
        k1, k2 = ks[:, 0], ks[:, 1]
        u = jax.vmap(jax.random.uniform)(k1)
        g = jax.vmap(lambda k: jax.random.normal(k, (2,)))(k2)
        return k2, u, g
    out3 = prng(states.key)
    jax.block_until_ready(out3)
    t0 = time.time()
    for _ in range(REPS):
        out3 = prng(out3[0])
    jax.block_until_ready(out3)
    print(f'{"prng split+draws":34s} '
          f'{(time.time() - t0) / REPS * 1e3:8.3f} ms')


if __name__ == '__main__':
    main()
