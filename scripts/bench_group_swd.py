"""A/B: grouped vs per-target SWD solves in a full 6-target joint
inversion step (4 SWD types + P/S RF) at 512 chains on the TPU.

Same-wave-type SWD targets share solver kernel calls when grouping is
on (evaluator/_grouped_swd_results); run each arm in its own process:

  BAYHUNTER_GROUP_SWD=1 python scripts/bench_group_swd.py
  BAYHUNTER_GROUP_SWD=0 python scripts/bench_group_swd.py
"""

import os
import os.path as op
import sys
import time

import numpy as np

sys.path.insert(0, op.join(op.dirname(__file__), '..'))

import jax

jax.config.update('jax_compilation_cache_dir',
                  op.join(op.dirname(__file__), '..', '.jax_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

NCHAINS = int(os.environ.get('BENCH_NCHAINS', 512))
ITERS = int(os.environ.get('BENCH_ITERS', 1500))


def build():
    from bayhunter_tpu import Targets
    from bayhunter_tpu.synthobs import SynthObs
    from bayhunter_tpu.sampler.chain import build_sampler, make_config
    from bayhunter_tpu.sampler.evaluator import build_evaluator

    h = np.array([5., 23., 8., 0.])
    vs = np.array([2.7, 3.6, 3.8, 4.4])
    swd = SynthObs.return_swddata(h, vs, vpvs=1.73,
                                  x=np.linspace(2.0, 30.0, 21))
    rf = SynthObs.return_rfdata(h, vs, vpvs=1.73,
                                x=np.linspace(-5, 20, 126))
    targets = [
        Targets.RayleighDispersionPhase(*map(np.asarray,
                                             swd['rdispph'])),
        Targets.RayleighDispersionGroup(*map(np.asarray,
                                             swd['rdispgr'])),
        Targets.LoveDispersionPhase(*map(np.asarray, swd['ldispph'])),
        Targets.LoveDispersionGroup(*map(np.asarray, swd['ldispgr'])),
        Targets.PReceiverFunction(*map(np.asarray, rf['prf'])),
        Targets.SReceiverFunction(*map(np.asarray, rf['srf'])),
    ]
    joint = Targets.JointTarget(targets=targets)
    priors = {'vs': (2.0, 5.0), 'z': (0.0, 60.0), 'layers': (1, 20),
              'vpvs': 1.73, 'mohoest': None, 'mantle': None,
              'swdnoise_corr': 0.0, 'swdnoise_sigma': (1e-5, 0.05),
              'rfnoise_corr': 0.92, 'rfnoise_sigma': (1e-5, 0.02)}
    initparams = {'propdist': (0.015, 0.015, 0.015, 0.005, 0.005),
                  'acceptance': (40, 45), 'thickmin': 0.1,
                  'lvz': None, 'hvz': None, 'rcond': 1e-5,
                  'iter_burnin': ITERS, 'iter_main': ITERS}
    nl = 21
    noiserefs = ['swd', 'swd', 'swd', 'swd', 'rf', 'rf']
    cfg = make_config(priors, initparams, noiserefs, nl=nl)
    ev = build_evaluator(joint, priors, initparams, nl,
                         use_batch_swd=True)
    return build_sampler(ev, cfg)


def main():
    from bayhunter_tpu.sampler.chain import (dispatch_cycles,
                                             precompile_cycles)
    group = os.environ.get('BAYHUNTER_GROUP_SWD', '1')
    sampler = build()
    states = sampler.init_states_host(0, NCHAINS)
    jax.block_until_ready(states.logL)
    precompile_cycles(sampler, states)

    clen = sampler.cycle_len
    thin = 8 * clen
    it = -ITERS
    n_early = int(np.ceil(max(0.0, sampler.early_cutoff - it)
                          / sampler.cycle_early_len)) \
        * sampler.cycle_early_len
    states = dispatch_cycles(sampler, states, it, n_early)
    it += n_early
    states = dispatch_cycles(sampler, states, it, thin, sync_every=0)
    it += thin
    jax.block_until_ready(states.logL)

    t0 = time.time()
    total = 0
    for _ in range(max(1, ITERS // thin)):
        states = dispatch_cycles(sampler, states, it, thin,
                                 sync_every=0)
        it += thin
        total += thin
        jax.block_until_ready(states.logL)
    dt = time.time() - t0
    print('GROUP_SWD=%s: %d chains x %d iters: %.1f proposals/s '
          '(%.2f ms/step)'
          % (group, NCHAINS, total, NCHAINS * total / dt,
             dt / total * 1e3))


if __name__ == '__main__':
    main()
