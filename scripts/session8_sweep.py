"""Session-8 on-chip sweep: collapse the REMAINING walk bounds.

Session 7 collapsed the dim ring to 1 and the vs/vpvs (Newton-
recentered) rings to 2, but the z move still walks a ring-8 bound
(max_steps 32) sized before the per-move shift measurements, and the
walker's bracket refinement still runs the full 4-bisection depth.
Every unfound lane forces its whole block to the walk bound, so the
bound IS the cost wherever any lane caps.

Arms (each its own process; toggles are read at import):
  base        current defaults
  z4/z2/z1    BAYHUNTER_NARROW_RING sweep (z-move ring)
  pert1       BAYHUNTER_PERT_RING=1 (vs/vpvs under Newton)
  nb2         BAYHUNTER_WALK_NBISECT=2 (bracket DDC/4 + secant)
  rfb2        BAYHUNTER_RF_BLOCK=2 (finer dynamic-skip granularity)

Watch extra.fwd_reject_pct / fwd_reject_dim_pct: a collapsed bound is
only shippable if the reject class stays flat.  Compare within THIS
run only (same-session normalizer in every line).
"""

import os
import os.path as op
import subprocess
import sys
import time

ROOT = op.dirname(op.dirname(op.abspath(__file__)))

ARMS = [
    ('base', {}),
    ('z4', {'BAYHUNTER_NARROW_RING': '4'}),
    ('z2', {'BAYHUNTER_NARROW_RING': '2'}),
    ('z1', {'BAYHUNTER_NARROW_RING': '1'}),
    ('pert1', {'BAYHUNTER_PERT_RING': '1'}),
    ('nb2', {'BAYHUNTER_WALK_NBISECT': '2'}),
    ('rfb2', {'BAYHUNTER_RF_BLOCK': '2'}),
]


def run(label, env_extra, timeout=5400):
    env = dict(os.environ)
    env.update(env_extra)
    print('=== %s: %s' % (label, ' '.join('%s=%s' % kv for kv in
                                          env_extra.items())),
          flush=True)
    t0 = time.time()
    p = subprocess.run([sys.executable, 'bench.py'], cwd=ROOT,
                       env=env, capture_output=True, text=True,
                       timeout=timeout)
    print(p.stdout.strip())
    if p.returncode != 0:
        print(p.stderr[-2000:])
    print('=== %s done (%.0f s)\n' % (label, time.time() - t0),
          flush=True)


def main():
    only = sys.argv[1:] or None
    for label, env in ARMS:
        if only and label not in only:
            continue
        run(label, env)


if __name__ == '__main__':
    main()
