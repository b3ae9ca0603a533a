"""Dump the compiled HLO of a production step program so trace op
names (fusion.N, multiply_bitcast_fusion.N, ...) can be attributed to
Python source lines via op metadata.

Usage: python scripts/dump_step_hlo.py [nchains] [move_id] > /tmp/hlo.txt
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax

jax.config.update('jax_compilation_cache_dir',
                  os.path.join(os.path.dirname(__file__), '..',
                               '.jax_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

NCHAINS = int(sys.argv[1]) if len(sys.argv) > 1 else 10240
MOVE = int(sys.argv[2]) if len(sys.argv) > 2 else 0


def main():
    import bench
    sampler = bench.build(iters=4096)
    states = sampler.init_states_host(0, NCHAINS)
    lowered = jax.jit(
        lambda s: sampler.step_fn(s, MOVE)).lower(states)
    compiled = lowered.compile()
    print(compiled.as_text())


if __name__ == '__main__':
    main()
