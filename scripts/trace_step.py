"""Capture a device profile of production steps and rank XLA ops.

Runs a handful of production step_fn calls (static move id) under
jax.profiler.trace, then parses the trace protobuf/JSON for per-op
device durations, aggregated by fusion name — the only reliable way
to decompose a fused step program (separate-program probes each pay
the ~1 ms dispatch floor, drowning the signal).

Usage: python scripts/trace_step.py [nchains] [move_id] [reps]
"""

import glob
import gzip
import json
import os
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

    # warm the target program
    s = sampler.step_fn(states, MOVE)
    jax.block_until_ready(s.logL)

    tdir = '/tmp/jax_trace_step'
    os.system('rm -rf ' + tdir)
    with jax.profiler.trace(tdir):
        for _ in range(REPS):
            s = sampler.step_fn(s, MOVE)
        jax.block_until_ready(s.logL)

    files = glob.glob(tdir + '/**/*.trace.json.gz', recursive=True)
    if not files:
        print('no trace file found under', tdir)
        return
    with gzip.open(files[0], 'rt') as f:
        trace = json.load(f)

    # device-lane complete events only (TPU op events carry 'dur')
    by_name = defaultdict(float)
    count = defaultdict(int)
    pid_names = {}
    for ev in trace.get('traceEvents', []):
        if ev.get('ph') == 'M' and ev.get('name') == 'process_name':
            pid_names[ev['pid']] = ev['args'].get('name', '')
    dev_pids = {p for p, n in pid_names.items()
                if 'TPU' in n or 'Device' in n or 'XLA' in n}
    for ev in trace.get('traceEvents', []):
        if ev.get('ph') != 'X' or 'dur' not in ev:
            continue
        if dev_pids and ev.get('pid') not in dev_pids:
            continue
        by_name[ev['name']] += ev['dur']
        count[ev['name']] += 1
    total = sum(by_name.values())
    print(f'total device-op time {total / 1e3 / REPS:.3f} '
          f'ms/step over {REPS} steps  (pids={sorted(dev_pids)})')
    ranked = sorted(by_name.items(), key=lambda kv: -kv[1])
    for name, dur in ranked[:40]:
        print(f'{dur / 1e3 / REPS:9.3f} ms  x{count[name] // REPS:<4d}'
              f' {name[:110]}')
    rest = ranked[40:]
    if rest:
        print(f'{sum(d for _, d in rest) / 1e3 / REPS:9.3f} ms  '
              f'in {len(rest)} further ops '
              f'(x{sum(count[n] for n, _ in rest) // REPS} calls)')
    # crude category split of everything but the outermost event
    cats = defaultdict(float)
    for name, dur in ranked[1:]:
        key = ('pallas' if name.startswith('step_fn') else
               'copy' if name.startswith('copy') else
               'broadcast' if name.startswith('broadcast') else
               'concat' if name.startswith('concatenate') else
               'fusion' if 'fusion' in name else
               'other')
        cats[key] += dur
    print('categories:', {k: round(v / 1e3 / REPS, 3)
                          for k, v in sorted(cats.items(),
                                             key=lambda kv: -kv[1])})


if __name__ == '__main__':
    main()
