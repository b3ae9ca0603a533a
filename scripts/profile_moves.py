"""Per-move-type timing of the production step_fn on TPU.

Each move id compiles to its own specialized program; this times each
one separately to show where a sampling iteration's budget goes.

Usage:  python scripts/profile_moves.py [nchains] [reps]
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
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

NCHAINS = int(sys.argv[1]) if len(sys.argv) > 1 else 512
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 50

MOVE_NAMES = ['vs', 'z', 'birth', 'death', 'noise', 'vpvs']


def build():
    """Shared tutorial fixture — see bench.build."""
    import bench
    return bench.build(iters=4096)


def main():
    sampler = build()
    states = sampler.init_states_host(0, NCHAINS)
    jax.block_until_ready(states.logL)

    # burn a few hundred mixed iterations so the state is typical
    for m in sampler.moves_for(-4096, 300):
        states = sampler.step_fn(states, int(m))
    jax.block_until_ready(states.logL)

    total = 0.0
    rates = {}
    for mid, name in enumerate(MOVE_NAMES):
        s = sampler.step_fn(states, mid)      # compile
        jax.block_until_ready(s.logL)
        t0 = time.time()
        s = states
        for _ in range(REPS):
            s = sampler.step_fn(s, mid)
        jax.block_until_ready(s.logL)
        dt = (time.time() - t0) / REPS
        rates[name] = dt
        total += dt
        print(f'{name:6s} {dt * 1e3:8.3f} ms/step '
              f'({NCHAINS / dt:10,.0f} proposals/s)')
    # schedule-weighted mean (all six moves uniform after early phase)
    mean = total / len(MOVE_NAMES)
    print(f'uniform-schedule mean: {mean * 1e3:.3f} ms/step '
          f'({NCHAINS / mean:,.0f} proposals/s)')


if __name__ == '__main__':
    main()
