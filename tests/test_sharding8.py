"""Production-path sharding tests at full virtual-mesh width: the
fused-cycle dispatch loop (sampler/chain.py dispatch_cycles) and the
optimizer must execute correctly with the chain batch sharded over all
8 virtual CPU devices (conftest), and the results must be independent
of the device layout.

This is the framework's replacement for the reference's process-pool
scale-out (reference: src/mcmcOptimizer.py:202-282): chains are data-
parallel over a 1-D ``Mesh(('chains',))``, so an n-device run must be
numerically identical to the single-device run chain by chain.
"""

import os.path as op

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bayhunter_tpu import Targets, MCMC_Optimizer
from bayhunter_tpu.synthobs import SynthObs
from bayhunter_tpu.sampler.chain import (build_sampler, make_config,
                                         dispatch_cycles)
from bayhunter_tpu.sampler.evaluator import build_evaluator

NCH = 16


def _tiny_sampler(nl=6):
    """Small SWD-only problem, float32 (the production dtype)."""
    import jax.numpy as jnp
    h = np.array([5., 23., 8., 0.])
    vs = np.array([2.7, 3.6, 3.8, 4.4])
    x, y = SynthObs.return_swddata(h, vs, vpvs=1.73,
                                   x=np.linspace(2., 30., 8))['rdispph']
    joint = Targets.JointTarget(targets=[
        Targets.RayleighDispersionPhase(np.asarray(x), np.asarray(y))])
    priors = {'vs': (2.0, 5.0), 'z': (0.0, 60.0), 'layers': (1, nl - 1),
              'vpvs': 1.73, 'swdnoise_corr': 0.0,
              'swdnoise_sigma': (1e-5, 0.05)}
    initparams = {'propdist': (0.015, 0.015, 0.015, 0.005, 0.005),
                  'acceptance': (40, 45), 'thickmin': 0.1,
                  'iter_burnin': 512, 'iter_main': 512}
    cfg = make_config(priors, initparams, ['swd'], nl=nl,
                      dtype=jnp.float32)
    eval_fn = build_evaluator(joint, priors, initparams, nl,
                              dtype=jnp.float32)
    return build_sampler(eval_fn, cfg)


def _run_cycles(sampler, sharding=None):
    """Fresh-init NCH chains, optionally commit them to ``sharding``,
    and advance one production segment crossing the early->late
    transition (early cycles + per-step remainder + late cycles)."""
    states = sampler.init_states_host(0, NCH)
    if sharding is not None:
        states = jax.device_put(states, sharding)
    it = int(sampler.early_cutoff) - sampler.cycle_early_len - 1
    count = 1 + sampler.cycle_early_len + 3 * sampler.cycle_len + 2
    states = dispatch_cycles(sampler, states, it, count)
    jax.block_until_ready(states.logL)
    return states


def test_dispatch_cycles_8dev_matches_1dev(cpu_devices):
    assert len(cpu_devices) >= 8, 'conftest must provision 8 devices'
    sampler = _tiny_sampler()

    ref = _run_cycles(sampler)  # default placement (single device)

    mesh = Mesh(np.array(cpu_devices[:8]), ('chains',))
    sharded = _run_cycles(sampler,
                          NamedSharding(mesh, P('chains')))

    # (ii) the result state actually carries the 8-way chain sharding
    assert len(sharded.logL.sharding.device_set) == 8

    # (i) chain-parallel execution is layout-independent: every chain's
    # trajectory identical to the single-device run
    np.testing.assert_array_equal(np.asarray(sharded.n),
                                  np.asarray(ref.n))
    np.testing.assert_allclose(np.asarray(sharded.logL),
                               np.asarray(ref.logL), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(sharded.vs),
                               np.asarray(ref.vs), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(sharded.z),
                               np.asarray(ref.z), rtol=1e-6,
                               atol=1e-6)
    assert np.all(np.isfinite(np.asarray(sharded.logL)))


def test_optimizer_8dev_full_run(cpu_devices, tmp_path):
    """MCMC_Optimizer end-to-end with the chain batch sharded 8-way
    through the production segment loop; same .npy output contract."""
    tmp = str(tmp_path)
    h = np.array([5., 23., 8., 0.])
    vs = np.array([2.7, 3.6, 3.8, 4.4])
    x, y = SynthObs.return_swddata(h, vs, vpvs=1.73)['rdispph']
    rs = np.random.RandomState(3)
    ynoisy = np.asarray(y) + 0.012 * rs.normal(size=np.asarray(y).size)
    joint = Targets.JointTarget(targets=[
        Targets.RayleighDispersionPhase(np.asarray(x), ynoisy)])
    priors = {'vs': (2.0, 5.0), 'z': (0.0, 60.0), 'layers': (1, 8),
              'vpvs': 1.73, 'swdnoise_corr': 0.0,
              'swdnoise_sigma': (1e-5, 0.05)}
    initparams = {'nchains': 8, 'iter_burnin': 200, 'iter_main': 200,
                  'propdist': (0.015, 0.015, 0.015, 0.005, 0.005),
                  'acceptance': (40, 45), 'thickmin': 0.1,
                  'maxmodels': 20, 'savepath': tmp, 'station': 'mesh8',
                  'segment_seconds': 0.5, 'checkpoint_seconds': 0}
    opt = MCMC_Optimizer(joint, initparams=initparams, priors=priors,
                         random_seed=9, devices=cpu_devices[:8])

    states = opt._init_states()
    assert len(states.logL.sharding.device_set) == 8

    opt.mp_inversion()
    datadir = op.join(tmp, 'data')
    for c in range(8):
        f = op.join(datadir, 'c%.3d_p2models.npy' % c)
        assert op.exists(f), f
    likes = np.load(op.join(datadir, 'c000_p2likes.npy'))
    assert likes.size > 0 and np.all(np.isfinite(likes))
