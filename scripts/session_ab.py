"""Session A/B battery for the session-3 optimizations.

Runs each arm in its own process (the toggles are read at import) on
the real TPU, sequentially (ONE process on the chip at a time):

  1. bench.py            dynamic layer skip ON  (default)
  2. bench.py            BAYHUNTER_DYNAMIC_NL=0 (full layer loops)
  3. bench.py            BENCH_RESORT=1         (skip + n-sorted tiles)
  4. bench.py            10240 chains, skip + resort (north star)
  5. bench_group_swd.py  grouped / per-target SWD solves (6 targets)

All arms share .jax_cache; chip throughput varies >2x between
sessions, so only compare numbers from ONE run of this script (each
bench line carries the session normalizer).
"""

import os
import os.path as op
import subprocess
import sys
import time

ROOT = op.dirname(op.dirname(op.abspath(__file__)))


def run(label, cmd, env_extra, timeout=3600):
    env = dict(os.environ)
    env.update(env_extra)
    print('=== %s: %s %s' % (label, ' '.join('%s=%s' % kv
                                             for kv in
                                             env_extra.items()), cmd),
          flush=True)
    t0 = time.time()
    p = subprocess.run([sys.executable] + cmd, cwd=ROOT, env=env,
                       capture_output=True, text=True, timeout=timeout)
    print(p.stdout.strip())
    if p.returncode != 0:
        print(p.stderr[-2000:])
    print('=== %s done (%.0f s)\n' % (label, time.time() - t0),
          flush=True)


def main():
    arms = [
        ('bench dynamic-on', ['bench.py'], {}),
        ('bench dynamic-off', ['bench.py'],
         {'BAYHUNTER_DYNAMIC_NL': '0'}),
        ('bench dynamic+noresort', ['bench.py'], {'BENCH_RESORT': '0'}),
        ('bench 10240 dynamic+resort', ['bench.py'],
         {'BENCH_NCHAINS': '10240', 'BENCH_ITERS': '500'}),
        ('group-swd on', ['scripts/bench_group_swd.py'],
         {'BAYHUNTER_GROUP_SWD': '1'}),
        ('group-swd off', ['scripts/bench_group_swd.py'],
         {'BAYHUNTER_GROUP_SWD': '0'}),
    ]
    only = sys.argv[1:] if len(sys.argv) > 1 else None
    for label, cmd, env in arms:
        if only and not any(k in label for k in only):
            continue
        run(label, cmd, env)


if __name__ == '__main__':
    main()
