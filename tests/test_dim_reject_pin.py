"""Regression pin for the dimension-move forward-reject class.

Warm-cap sentinel rejects on birth/death proposals are this
framework's analogue of the reference's rare ``getsol`` search
failure (surfdisp96.f:313-354 err -> rejected proposal): a lane whose
dispersion root moved beyond the walk bound of the (Newton-
recentered) warm start is rejected outright.  Ten sessions of
ring/cap/depth throughput cuts each nudged this class (on-chip
history: fwd_reject_dim_pct 10.5-11% at the 10,240-chain bench
config); nothing previously FAILED if a future cut silently bent the
transition kernel.

This test drives the production batch path (eval_full_batch +
step_fn with static move ids, pallas kernels in interpret mode) on a
fixed, seeded ensemble of grown posterior-like models and pins the
per-direction reject fractions in a measured band.  Everything is
deterministic (fixed seeds, fixed propdist), so the bands are tight:

  measured at the pin commit (CPU, production default knobs):
    birth  5/256  = 2.0 %
    death 66/256  = 25.8 %
    combined      = 13.9 %
  knob-bending sensitivity: BAYHUNTER_DIM_NEWTON_ITERS=0 (prepass
  off, ring 1) pushes the combined rate to 19.1 % -> trips the
  ceiling; disabling the caps entirely pushes it to 0 -> trips the
  floor.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bayhunter_tpu import Targets
from bayhunter_tpu.sampler.chain import (build_sampler, make_config,
                                         MOVE_BIRTH, MOVE_DEATH)
from bayhunter_tpu.sampler.evaluator import build_evaluator


def _bench_config_sampler(nl=21):
    """The bench.py tutorial configuration (joint SWD+RF), built on
    the batch path with pallas kernels in interpret mode."""
    fixtures = os.path.join(os.path.dirname(__file__), 'fixtures')
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
    cfg = make_config(priors, initparams, ['swd', 'rf'], nl=nl)
    eval_fn = build_evaluator(joint, priors, initparams, nl,
                              use_batch_swd=True, interpret=True)
    return build_sampler(eval_fn, cfg), eval_fn


def _grown_states(sampler, eval_fn, C, nl=21):
    """Seeded ensemble of 5-8 layer models around the tutorial truth
    with jittered nuclei — a stand-in for mid-run posterior states
    (fresh init states are 1-2 layers and never exercise the dim
    solve's hard lanes)."""
    states = sampler.init_states_host(0, C)
    rs = np.random.RandomState(3)
    VS = np.zeros((C, nl), np.float32)
    Z = np.zeros((C, nl), np.float32)
    N = np.zeros(C, np.int32)
    for i in range(C):
        nex = rs.randint(1, 5)
        n = 4 + nex
        znuc = np.sort(np.concatenate([
            np.array([2.5, 15., 32., 48.]) + rs.uniform(-1.5, 1.5, 4),
            rs.uniform(1., 58., nex)]))
        vsn = np.interp(znuc,
                        [0, 5, 5.01, 28, 28.01, 36, 36.01, 60],
                        [2.7, 2.7, 3.6, 3.6, 3.8, 3.8, 4.4, 4.4])
        vsn = vsn + rs.normal(0, 0.05, n)
        VS[i, :n] = np.sort(vsn)
        Z[i, :n] = znuc
        N[i] = n
    cold = jax.vmap(lambda v, z, n, vv, no:
                    eval_fn.eval_cold(v, z, n, vv, no))
    logL, misfits, valid, cache = cold(
        jnp.asarray(VS), jnp.asarray(Z), jnp.asarray(N),
        states.vpvs, states.noise)
    assert bool(valid.all()), 'cold evaluation of the pin ensemble ' \
        'failed — the ensemble itself regressed'
    return states._replace(vs=jnp.asarray(VS), z=jnp.asarray(Z),
                           n=jnp.asarray(N), logL=logL,
                           misfits=misfits, cache=cache)


def test_dim_reject_class_stays_in_band():
    sampler, eval_fn = _bench_config_sampler()
    C = 128
    s = _grown_states(sampler, eval_fn, C)

    fails = {'birth': 0, 'death': 0}
    prev = 0
    for _ in range(2):
        for name, mv in (('birth', MOVE_BIRTH),
                         ('death', MOVE_DEATH)):
            s = sampler.step_fn(s, mv)
            f = int(np.asarray(s.fwdfail).sum(0)[2])
            fails[name] += f - prev
            prev = f
    jax.block_until_ready(s.logL)
    nprop = int(np.asarray(s.proposed).sum(0)[2])
    assert nprop == 4 * C

    birth_pct = 100.0 * fails['birth'] / (2 * C)
    death_pct = 100.0 * fails['death'] / (2 * C)
    combined = 100.0 * (fails['birth'] + fails['death']) / (4 * C)

    # bands around the deterministic pin-commit measurement (2.0 /
    # 25.8 / 13.9 %), wide enough for XLA-version rounding drift but
    # tight enough that known knob-bending trips them (see module
    # docstring)
    assert birth_pct <= 10.0, birth_pct
    assert 12.0 <= death_pct <= 33.0, death_pct
    assert 5.0 <= combined <= 17.0, combined
