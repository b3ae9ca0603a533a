"""Same-session A/B of the full sampler step with the pallas RF
kernel on vs off (vmapped XLA synrf fallback).

Builds BOTH evaluators in one process (monkeypatching the module
toggle between builds) and interleaves timed segments, so the chip's
session-to-session throughput variance cancels.

Usage:  python scripts/bench_step_ab.py [nchains] [iters_per_arm]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax

jax.config.update('jax_compilation_cache_dir',
                  os.path.join(os.path.dirname(__file__), '..',
                               '.jax_cache'))

NCHAINS = int(sys.argv[1]) if len(sys.argv) > 1 else 512
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
THIN = 50


def build(use_pallas_rf):
    from bayhunter_tpu import Targets
    from bayhunter_tpu.sampler import evaluator as ev_mod
    from bayhunter_tpu.sampler.chain import build_sampler, make_config
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
                  'iter_burnin': ITERS, 'iter_main': ITERS}
    nl = 21
    ev_mod._USE_PALLAS_RF = use_pallas_rf
    cfg = make_config(priors, initparams, ['swd', 'rf'], nl=nl)
    use_batch = jax.devices()[0].platform == 'tpu'
    eval_fn = build_evaluator(joint, priors, initparams, nl,
                              use_batch_swd=use_batch)
    return build_sampler(eval_fn, cfg)


def main():
    arms = {'pallas_rf': build(True), 'xla_rf': build(False)}
    states = {k: s.init_states_host(0, NCHAINS)
              for k, s in arms.items()}
    for st in states.values():
        jax.block_until_ready(st.logL)

    nseg = max(2, ITERS // THIN)

    def seg(name, it0):
        smp = arms[name]
        s = states[name]
        for m in smp.moves_for(it0, THIN):
            s = smp.step_fn(s, int(m))
        states[name] = s
        return s

    # warm-up/compile both arms
    for name in arms:
        jax.block_until_ready(seg(name, -ITERS).logL)

    elapsed = {k: 0.0 for k in arms}
    it = -ITERS + THIN
    for i in range(nseg):
        for name in arms:           # interleave to cancel drift
            t0 = time.time()
            jax.block_until_ready(seg(name, it).logL)
            elapsed[name] += time.time() - t0
        it += THIN

    for name, dt in elapsed.items():
        rate = nseg * THIN * NCHAINS / dt
        print(f'{name:10s} {rate:12,.0f} proposals/s')
    print(f'pallas_rf vs xla_rf: '
          f'{elapsed["xla_rf"] / elapsed["pallas_rf"]:.3f}x')


if __name__ == '__main__':
    main()
