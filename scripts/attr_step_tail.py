"""Join a step-program profiler trace with its HLO metadata: ranks
device time by Python source line instead of fusion name.

Usage: python scripts/attr_step_tail.py [nchains] [move_id] [reps]
"""

import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax

jax.config.update('jax_compilation_cache_dir',
                  os.path.join(os.path.dirname(__file__), '..',
                               '.jax_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

NCHAINS = int(sys.argv[1]) if len(sys.argv) > 1 else 10240
MOVE = int(sys.argv[2]) if len(sys.argv) > 2 else 0
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 10


def main():
    import bench
    sampler = bench.build(iters=4096)
    states = sampler.init_states_host(0, NCHAINS)
    for m in sampler.moves_for(-4096, 200):
        states = sampler.step_fn(states, int(m))
    jax.block_until_ready(states.logL)

    # compiled HLO -> fusion name -> source attribution
    hlo = jax.jit(lambda s: sampler.step_fn(s, MOVE)) \
        .lower(states).compile().as_text()
    attr = {}
    pat = re.compile(
        r'%(\S+?) = .*?source_file="([^"]+)" source_line=(\d+)')
    for m in pat.finditer(hlo):
        attr[m.group(1)] = '%s:%s' % (os.path.basename(m.group(2)),
                                      m.group(3))

    s = sampler.step_fn(states, MOVE)
    jax.block_until_ready(s.logL)
    tdir = '/tmp/jax_trace_attr'
    os.system('rm -rf ' + tdir)
    with jax.profiler.trace(tdir):
        for _ in range(REPS):
            s = sampler.step_fn(s, MOVE)
        jax.block_until_ready(s.logL)

    files = glob.glob(tdir + '/**/*.trace.json.gz', recursive=True)
    with gzip.open(files[0], 'rt') as f:
        trace = json.load(f)

    by_src = defaultdict(float)
    top = None
    for ev in trace.get('traceEvents', []):
        if ev.get('ph') != 'X' or 'dur' not in ev:
            continue
        name = ev['name']
        if name.startswith('jit_'):
            top = max(top or 0.0, ev['dur'])
            continue
        src = attr.get(name)
        if src is None:
            # kernels show as step_fn.N custom calls
            src = 'pallas:' + name if name.startswith('step_fn') \
                else None
        by_src[src or ('xla:' + name.split('.')[0])] += ev['dur']
    total = sum(by_src.values())
    print(f'step total ~{(top or 0.0) / 1e3:.3f} ms; attributed '
          f'{total / 1e3 / REPS:.3f} ms/step')
    for src, dur in sorted(by_src.items(), key=lambda kv: -kv[1])[:30]:
        print(f'{dur / 1e3 / REPS:9.3f} ms  {src}')


if __name__ == '__main__':
    main()
