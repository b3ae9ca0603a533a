"""Reproducer harness for the XLA:CPU persistent-cache SIGABRT.

Context (CLAUDE.md / bench.py header): enabling
``jax_compilation_cache_dir`` for CPU runs intermittently SIGABRTs
when an AOT-compiled CPU executable is RELOADED in a later process —
the abort happens during machine-feature re-detection of the cached
object, not during compilation.  This is the blocker for defaulting
``BAYHUNTER_TEST_CACHE=1`` (which would cut the test suite's ~25 min
of XLA:CPU compiles); the suite therefore runs cache-less and pays
the full compile bill every time (VERDICT round-4 item 6).

This harness makes the failure countable:

  phase 1 (populate): compile a representative program set into a
      fresh cache directory — a plain XLA program, a scan-heavy
      program (the secular sweep shape), and an interpret-mode
      pallas program (what the suite actually compiles).
  phase 2 (reload x N): re-exec a child process per trial that ONLY
      loads the cached executables and runs them once; count clean
      exits vs signal deaths (SIGABRT shows as returncode -6).

Usage:
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
      python scripts/repro_cpu_cache_abort.py [ntrials]

Prints one summary line; a nonzero abort count plus the failing
trial's stderr tail is the root-cause evidence to attach to an
upstream report (or to scope a safe cache subset: if only the
pallas-containing trials die, cache only non-pallas programs).
"""

import os
import subprocess
import sys
import tempfile

NTRIALS = int(sys.argv[1]) if len(sys.argv) > 1 else 20
CACHE = os.environ.get('REPRO_CACHE_DIR')


def body(populate):
    import jax
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir', CACHE)
    jax.config.update('jax_persistent_cache_min_compile_time_secs',
                      0.0)

    # (a) plain XLA elementwise+reduce program
    f1 = jax.jit(lambda x: jnp.tanh(x * 1.5 + x ** 2).sum(axis=0))
    # (b) scan-heavy program shaped like the secular sweep
    def sweep(c, x):
        def step(e, l):
            return (e[0] * l + e[1], e[0] - e[1] * l), None
        (a, b), _ = jax.lax.scan(step, (c, c + 1.0), x)
        return a * b
    f2 = jax.jit(sweep)
    # (c) interpret-mode pallas program (what tests compile)
    from bayhunter_tpu.ops.pallas_secular import dltar4_pallas
    d = jnp.zeros((8, 21), jnp.float32).at[:, 0].set(5.0)
    a4 = jnp.full((8, 21), 6.0, jnp.float32)
    b4 = jnp.full((8, 21), 3.5, jnp.float32)
    r4 = jnp.full((8, 21), 2.7, jnp.float32)
    wv = jnp.full((8, 128), 2.0, jnp.float32)
    om = jnp.full((8, 128), 6.0, jnp.float32)
    f3 = jax.jit(lambda w, o: dltar4_pallas(w, o, d, a4, b4, r4,
                                            interpret=True))

    x = jnp.linspace(0.0, 1.0, 256).reshape(16, 16)
    outs = [f1(x), f2(x[0], x), f3(wv, om)]
    jax.block_until_ready(outs)
    print('ran 3 programs', '(populate)' if populate else '(reload)')


def main():
    global CACHE
    if os.environ.get('_REPRO_CHILD') == '1':
        body(populate=False)
        return
    if CACHE is None:
        CACHE = tempfile.mkdtemp(prefix='repro_xla_cache_')
        os.environ['REPRO_CACHE_DIR'] = CACHE
    print('cache dir:', CACHE)
    # populate in a child so the parent process never holds jax state
    env = dict(os.environ, _REPRO_CHILD='1')
    first = subprocess.run([sys.executable, __file__], env=env,
                           capture_output=True, text=True)
    print('populate rc:', first.returncode)
    if first.returncode != 0:
        print(first.stderr[-2000:])
        return
    aborts = 0
    for i in range(NTRIALS):
        r = subprocess.run([sys.executable, __file__], env=env,
                           capture_output=True, text=True)
        if r.returncode != 0:
            aborts += 1
            print('trial %d rc=%d' % (i, r.returncode))
            print(r.stderr[-2000:])
    print('RESULT: %d/%d reload trials died (rc=-6 is SIGABRT)'
          % (aborts, NTRIALS))


if __name__ == '__main__':
    main()
