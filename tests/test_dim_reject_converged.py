"""Converged-regime pin for the dimension-move forward-reject class.

``test_dim_reject_pin`` bands the dim-move warm-cap reject class on a
synthetic MID-BURN-IN ensemble (the bench's measurement point,
~10.5-12.5%).  The round-4 tutorial E2E measured a much larger class
at CONVERGENCE: ~26% of dimension proposals from the 21-chain
posterior-mode ensemble fail by warm-cap, because converged chains'
birth/death proposals are mostly structure-breaking — their
dispersion roots shift beyond any warm bound (VALIDATION.md round-4;
VERDICT round-4 item 3 asked for this pin).

This test drives the production batch path (static-move step_fn,
pallas kernels in interpret mode) from a REAL late-phase snapshot of
the tutorial inversion captured on-chip
(``tests/fixtures/converged_state_st3.npz``,
scripts/capture_converged_state.py: 21 chains, burn-in + 25% of the
main phase, adapted proposal widths included) and pins the
converged-state reject fraction in a band.  The reference-baseline
comparison (how many of these failures the reference's own
exhaustive ``getsol`` search would share) is quantified in
VALIDATION.md with the f64 golden.
"""

import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(__file__))

from test_dim_reject_pin import _bench_config_sampler

FIXTURE = os.path.join(os.path.dirname(__file__), 'fixtures',
                       'converged_state_st3.npz')


def _converged_states(sampler, eval_fn, reps=12):
    """Load the captured snapshot, tile it ``reps`` times with
    distinct PRNG keys (21 chains alone give too few dim proposals
    for a tight band), and rebuild the forward cache with one cold
    evaluation of the snapshot models."""
    snap = np.load(FIXTURE)
    C0 = snap['n'].shape[0]
    C = C0 * reps

    def tile(x):
        return np.tile(np.asarray(x), (reps,) + (1,) * (x.ndim - 1))

    states = sampler.init_states_host(0, C)
    eval_batch = jax.jit(jax.vmap(eval_fn.eval_cold))
    vs = jnp.asarray(tile(snap['vs']), jnp.float32)
    z = jnp.asarray(tile(snap['z']), jnp.float32)
    n = jnp.asarray(tile(snap['n']), jnp.int32)
    vpvs = jnp.asarray(tile(snap['vpvs']), jnp.float32)
    noise = jnp.asarray(tile(snap['noise']), jnp.float32)
    logL, misfits, _, cache = eval_batch(vs, z, n, vpvs, noise,
                                         states.cell)
    return states._replace(
        vs=vs, z=z, n=n, vpvs=vpvs, noise=noise, logL=logL,
        misfits=misfits, cache=cache,
        propdist=jnp.asarray(tile(snap['propdist']), jnp.float32),
        key=jax.random.split(jax.random.PRNGKey(77), C))


def test_converged_dim_reject_band():
    if not os.path.exists(FIXTURE):
        import pytest
        pytest.skip('converged snapshot fixture not captured')
    sampler, eval_fn = _bench_config_sampler()
    states = _converged_states(sampler, eval_fn)

    tot_prop = np.zeros(5, np.int64)
    tot_fail = np.zeros(5, np.int64)
    for m in (2, 3, 2, 3):
        st = sampler.step_fn(states, m)
        ff = np.asarray(st.fwdfail) - np.asarray(states.fwdfail)
        pp = np.asarray(st.proposed) - np.asarray(states.proposed)
        tot_fail += ff.sum(axis=0).astype(np.int64)
        tot_prop += pp.sum(axis=0).astype(np.int64)
        states = st

    rate = 100.0 * tot_fail[2] / max(tot_prop[2], 1)
    # Band calibration: the on-chip tutorial E2E measured ~26% at
    # true convergence; this CPU proxy (tiled snapshot, fresh keys,
    # 1,008 dim proposals) sits lower and is sensitive to f32
    # fusion-order changes at the ~1 pp level — measured 10.9-11.9%
    # across the round-5 model-kernel/deletion arms and the suite's
    # SCAN_CYCLES pin (15.x% at the round-5 session-1 pin commit).
    # The guard that matters is the UPPER bound: the round-4
    # slope-cache incident DOUBLED this class (would read >25 here);
    # the lower bound only catches the class vanishing artificially
    # (e.g. dim proposals no longer reaching the solver).
    assert 6.0 < rate < 22.0, (
        'converged-state dim reject rate %.2f%% left the pinned '
        'band — a knob or solver change bent the converged-regime '
        'transition kernel (round-4 slope-cache incident class)'
        % rate)
