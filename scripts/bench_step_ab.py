"""Same-session A/B of the full sampler step with the pallas RF
kernel on vs off (vmapped XLA synrf fallback).

Builds BOTH evaluators in one process (the toggle is captured per
evaluator at build time) and interleaves timed segments, so the
chip's session-to-session throughput variance cancels.

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
    """Shared tutorial fixture — see bench.build."""
    import bench
    return bench.build(iters=ITERS,
                       use_pallas_rf=use_pallas_rf)


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
