"""Time the production noise step at large nchains and inspect its
compiled HLO: if the constant-predicate forward cond failed to fold,
the noise program would still carry the pallas forward kernels.

Usage: python scripts/probe_noise_step.py [nchains] [reps]
"""

import os
import re
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax

jax.config.update('jax_compilation_cache_dir',
                  os.path.join(os.path.dirname(__file__), '..',
                               '.jax_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

NCHAINS = int(sys.argv[1]) if len(sys.argv) > 1 else 10240
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 50

MOVE_NOISE = 4


def main():
    import bench
    sampler = bench.build(iters=4096)
    states = sampler.init_states_host(0, NCHAINS)
    for m in sampler.moves_for(-4096, 100):
        states = sampler.step_fn(states, int(m))
    jax.block_until_ready(states.logL)

    lowered = sampler.step_fn.lower(states, MOVE_NOISE)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    ccalls = re.findall(r'custom_call_target="([^"]+)"', hlo)
    print(f'HLO lines: {len(hlo.splitlines())}')
    from collections import Counter
    for tgt, cnt in Counter(ccalls).most_common():
        print(f'  custom-call {tgt}: {cnt}')
    # biggest fusions by named op
    ca = compiled.cost_analysis()
    if ca:
        if isinstance(ca, list):
            ca = ca[0]
        for k in ('flops', 'bytes accessed', 'transcendentals'):
            if k in ca:
                print(f'  cost[{k}] = {ca[k]:.3e}')

    s = sampler.step_fn(states, MOVE_NOISE)
    jax.block_until_ready(s.logL)
    t0 = time.time()
    s = states
    for _ in range(REPS):
        s = sampler.step_fn(s, MOVE_NOISE)
    jax.block_until_ready(s.logL)
    dt = (time.time() - t0) / REPS
    print(f'noise step: {dt * 1e3:.3f} ms  '
          f'({NCHAINS / dt:,.0f} proposals/s)')


if __name__ == '__main__':
    main()
