"""Capture a CONVERGED-regime ensemble snapshot as a test fixture.

Round-4's tutorial E2E measured ~26% of converged-state dimension
proposals failing by warm-cap (vs ~11% at the bench's mid-burn-in
measurement point) — a transition-kernel deviation class with no
regression pin (VERDICT round-4 item 3).  This script runs the
tutorial joint SWD+RF configuration at the reference's own 21-chain
operating point through burn-in plus a slice of the main phase on
the real chip, then saves the small late-phase state snapshot
(models, noise, adapted proposal widths) to
``tests/fixtures/converged_state_st3.npz`` for
``tests/test_dim_reject_converged.py`` to drive deterministically.

Usage: python scripts/capture_converged_state.py [nchains] [iters]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np

import jax

jax.config.update('jax_compilation_cache_dir',
                  os.path.join(os.path.dirname(__file__), '..',
                               '.jax_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

NCHAINS = int(sys.argv[1]) if len(sys.argv) > 1 else 21
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 24576


def main():
    import bench
    from bayhunter_tpu.sampler.chain import dispatch_cycles, \
        precompile_cycles

    sampler = bench.build(iters=ITERS)
    states = sampler.init_states_host(0, NCHAINS)
    precompile_cycles(sampler, states)

    # burn-in + 25% of main: safely in the converged regime of the
    # round-4 tutorial E2E (posterior recovery on target from the
    # main phase onward)
    total = ITERS + ITERS // 4
    it = -ITERS
    done = 0
    chunk = 4096
    while done < total:
        k = min(chunk, total - done)
        states = dispatch_cycles(sampler, states, it, k)
        it += k
        done += k
        jax.block_until_ready(states.logL)
        print('iter %d / %d  logL med %.1f' % (
            done, total, float(np.median(np.asarray(states.logL)))),
            flush=True)

    ff, pp = jax.device_get((states.fwdfail, states.proposed))
    dim_rate = 100.0 * ff[:, 2].sum() / max(pp[:, 2].sum(), 1)
    print('cumulative dim fwd-reject over the whole run: %.2f%%'
          % dim_rate)

    out = os.path.join(os.path.dirname(__file__), '..', 'tests',
                       'fixtures', 'converged_state_st3.npz')
    np.savez_compressed(
        out,
        vs=np.asarray(states.vs), z=np.asarray(states.z),
        n=np.asarray(states.n), vpvs=np.asarray(states.vpvs),
        noise=np.asarray(states.noise),
        propdist=np.asarray(states.propdist),
        logL=np.asarray(states.logL),
        iiter=np.asarray(states.iiter))
    print('saved', out)


if __name__ == '__main__':
    main()
