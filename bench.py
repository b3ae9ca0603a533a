"""Headline benchmark: aggregate McMC proposal throughput for the
tutorial joint SWD+RF inversion at the 10,240-chain north-star
configuration (BASELINE.md defines the >=100x target at a 10k-chain
joint inversion) on one chip.  BENCH_NCHAINS=512 for the
small-batch / latency-oriented figure.

Baseline (BASELINE.md): the reference's multiprocessing CPU run
achieves ~2,570 proposals/s aggregate (21 chains x 150k iterations in
20.4 min on an 8-core workstation, tutorial.rst:294-303).  One
proposal = one forward SWD solve + one forward RF solve + a
correlated-Gaussian likelihood, identical work per iteration here.

Prints one JSON line:
  {"metric": ..., "value": N, "unit": "proposals/s", "vs_baseline": N}
"""

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

# persistent compile cache for the slow axon remote compiles ONLY:
# XLA:CPU AOT executables intermittently fail machine-feature
# detection on reload (SIGABRT risk, see CLAUDE.md), so CPU runs of
# this module (scripts importing bench.build on a CPU box) must not
# touch the cache.
if not (os.environ.get('JAX_PLATFORMS') == 'cpu'
        or 'PALLAS_AXON_POOL_IPS' not in os.environ):
    jax.config.update(
        'jax_compilation_cache_dir',
        os.path.join(os.path.dirname(__file__), '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs',
                      1.0)

BASELINE_PROPOSALS_PER_S = 2570.0
NCHAINS = int(os.environ.get('BENCH_NCHAINS', 10240))
ITERS = int(os.environ.get('BENCH_ITERS', 2000))

# Small-batch lane padding (BENCH_PAD=1 to enable): EXECUTE the next
# multiple of 128 chains (extra chains are ordinary independent
# chains) and credit throughput only for the REQUESTED count.  The
# theory was that a C that is not a multiple of 128 forces lane-pad
# concats + trim slices around every pallas operand; ADJUDICATED OFF
# on-chip (2026-08-21, one session, normalizer ~154): 21 chains
# padded-to-128 = 26.5-27.2k vs unpadded 28.2-28.6k proposals/s —
# the extra per-tile device work of the 128-chain grids costs more
# than the removed pad ops, and the model kernel's exact-C blocks
# (ops/pallas_prep.model_operands_t) remove the biggest pad/trim
# block without executing extra chains.
PAD = os.environ.get('BENCH_PAD', '0') == '1'
NCHAINS_EXEC = (-(-NCHAINS // 128) * 128) if PAD else NCHAINS


def build(iters=None, use_pallas_rf=None):
    """Tutorial-configuration sampler — ALSO the shared fixture for
    the perf scripts (scripts/profile_moves.py, scripts/bench_step_ab
    .py import this so all measurements run the same sampler)."""
    from bayhunter_tpu import Targets
    from bayhunter_tpu.sampler.chain import build_sampler, make_config
    from bayhunter_tpu.sampler.evaluator import build_evaluator

    iters = ITERS if iters is None else int(iters)
    fixtures = os.path.join(os.path.dirname(__file__), 'tests',
                            'fixtures')
    swd = np.loadtxt(os.path.join(fixtures, 'st3_rdispph.dat'))
    prf = np.loadtxt(os.path.join(fixtures, 'st3_prf.dat'))

    targets = [Targets.RayleighDispersionPhase(swd[:, 0], swd[:, 1]),
               Targets.PReceiverFunction(prf[:, 0], prf[:, 1])]
    joint = Targets.JointTarget(targets=targets)

    # tutorial configuration (reference tutorial/tutorialhunt.py:84-121)
    priors = {'vs': (2.0, 5.0), 'z': (0.0, 60.0), 'layers': (1, 20),
              'vpvs': 1.73, 'mohoest': None, 'mantle': None,
              'swdnoise_corr': 0.0, 'swdnoise_sigma': (1e-5, 0.05),
              'rfnoise_corr': 0.98, 'rfnoise_sigma': (1e-5, 0.02)}
    initparams = {'propdist': (0.015, 0.015, 0.015, 0.005, 0.005),
                  'acceptance': (40, 45), 'thickmin': 0.1,
                  'lvz': None, 'hvz': None, 'rcond': 1e-5,
                  'iter_burnin': iters, 'iter_main': iters}
    nl = 21
    cfg = make_config(priors, initparams, ['swd', 'rf'], nl=nl)
    use_batch = jax.devices()[0].platform == 'tpu'
    eval_fn = build_evaluator(joint, priors, initparams, nl,
                              use_batch_swd=use_batch,
                              use_pallas_rf=use_pallas_rf)
    return build_sampler(eval_fn, cfg)


def _normalizer_gflops():
    """Same-session chip normalizer: sustained bf16 matmul rate on a
    fixed 2048^3 problem.  Chip-session throughput varies >2x between
    sessions (see CLAUDE.md); recording this alongside the headline
    number makes BENCH_r*.json comparable across rounds."""
    import jax.numpy as jnp
    n = 8192  # ~1.1 TFLOP/call: compute-bound, not dispatch-floor
    a = jnp.ones((n, n), jnp.bfloat16)
    b = jnp.ones((n, n), jnp.bfloat16)
    f = jax.jit(lambda x, y: x @ y)
    jax.block_until_ready(f(a, b))  # compile outside the timing
    t0 = time.time()
    reps = 20
    out = a
    for _ in range(reps):
        out = f(out, b)
    jax.block_until_ready(out)
    dt = time.time() - t0
    return 2.0 * n ** 3 * reps / dt / 1e9


def main():
    sampler = build()

    states = sampler.init_states_host(0, NCHAINS_EXEC)
    jax.block_until_ready(states.logL)

    # production hot path: fused move cycles (ONE device program per
    # sweep over the move set, input state donated) dispatched from
    # the host; see sampler/chain.py Sampler docstring
    from bayhunter_tpu.sampler.chain import (MOVE_BIRTH, MOVE_DEATH,
                                             dispatch_cycles,
                                             precompile_cycles)
    clen = sampler.cycle_len
    cel = sampler.cycle_early_len
    cutoff = sampler.early_cutoff
    it = -ITERS

    # thin is a whole number of late-phase cycles so the timed region
    # (and the warm-up tail) dispatches ONLY the four compiled cycle
    # variants — never the per-step fallback, whose six step_fn
    # programs would otherwise compile INSIDE the timed region on a
    # cold cache (each axon compile is 40 s - 10 min)
    thin = 8 * clen
    nseg = max(1, ITERS // thin)

    # warm-up: AOT-compile every dispatch program CONCURRENTLY
    # (cold-cache cost ~max instead of ~sum of per-program compiles),
    # then clear the early phase in whole early-cycles and run one
    # un-timed late segment so every timed program is resident.
    # Safety net: the dynamic layer skip branches inside the pallas
    # kernels (scf.if in Mosaic); if a toolchain rejects or miscompiles
    # it anywhere before the timed region, fall back to the full
    # unrolled loops rather than failing the benchmark of record.
    def _fallback_dynamic_off(exc):
        import sys
        if os.environ.get('_BENCH_NL_FALLBACK') != '1':
            print('bench warm-up failed (%s: %s); retrying with '
                  'BAYHUNTER_DYNAMIC_NL=0 BAYHUNTER_WARM_SOLVER='
                  'staged' % (type(exc).__name__, exc),
                  file=sys.stderr)
            env = dict(os.environ,
                       BAYHUNTER_DYNAMIC_NL='0',
                       BAYHUNTER_WARM_SOLVER='staged',
                       _BENCH_NL_FALLBACK='1')
            os.execve(sys.executable,
                      [sys.executable] + sys.argv, env)
        raise exc

    compiled = []
    try:
        compiled = precompile_cycles(sampler, states)
        n_early = int(np.ceil(max(0.0, cutoff - it) / cel)) * cel
        states = dispatch_cycles(sampler, states, it, n_early)
        it += n_early
        if sampler.dim_mixture != 'per_chain':
            # host-slot mode: touch all four dimension-slot variants
            for d1, d2 in ((MOVE_BIRTH, MOVE_BIRTH),
                           (MOVE_BIRTH, MOVE_DEATH),
                           (MOVE_DEATH, MOVE_BIRTH),
                           (MOVE_DEATH, MOVE_DEATH)):
                states = sampler.cycle_fn(states, d1, d2)
                it += clen
        states = dispatch_cycles(sampler, states, it, thin,
                                 sync_every=0)
        it += thin
        jax.block_until_ready(states.logL)
    except Exception as exc:
        _fallback_dynamic_off(exc)

    # BENCH_RESORT (default on): sort chains by layer count between
    # segments so the dynamic layer skip sees n-homogeneous tiles
    # (exact chain relabeling, see chain.resort_states; bench needs no
    # perm bookkeeping because it never reads per-chain traces).  Cost
    # is one extra program per timed segment (<0.5%); upside is the
    # tile-max -> per-chain layer-count gap.
    resort = os.environ.get('BENCH_RESORT', '1') == '1'
    if resort:
        from bayhunter_tpu.sampler.chain import resort_states
        perm = jnp.arange(NCHAINS_EXEC, dtype=jnp.int32)
        states, perm = resort_states(states, perm)

    t0 = time.time()
    total = 0
    for _ in range(nseg):
        states = dispatch_cycles(sampler, states, it, thin,
                                 sync_every=0)
        it += thin
        total += thin
        if resort:
            states, perm = resort_states(states, perm)
        jax.block_until_ready(states.logL)
    dt = time.time() - t0

    proposals = total * NCHAINS
    rate = proposals / dt
    norm = _normalizer_gflops()
    ff, pp = jax.device_get((states.fwdfail, states.proposed))
    # HBM high-water mark: the axon plugin's device.memory_stats() is
    # None, so report the XLA STATIC peak of the largest dispatched
    # program (arguments + outputs + temps + code, from the compiled
    # executables' memory analysis) — the number that governs whether
    # a configuration fits the chip.
    hbm_gb = None
    try:
        peak = 0
        for c in compiled:
            ma = c.memory_analysis()
            p = getattr(ma, 'peak_memory_in_bytes', None)
            if p is None:
                p = (ma.argument_size_in_bytes
                     + ma.output_size_in_bytes
                     + ma.temp_size_in_bytes
                     - ma.alias_size_in_bytes
                     + ma.generated_code_size_in_bytes)
            peak = max(peak, p)
        if peak:
            hbm_gb = round(peak / 2 ** 30, 3)
    except Exception:
        pass
    dim_proposed = int(pp[:, 2].sum())
    dim_reject_pct = (100.0 * ff[:, 2].sum() / dim_proposed
                      if dim_proposed else None)
    print(json.dumps({
        'metric': 'joint SWD+RF McMC proposal throughput '
                  '(%d chains, 1 chip)' % NCHAINS,
        'value': round(rate, 1),
        'unit': 'proposals/s',
        'vs_baseline': round(rate / BASELINE_PROPOSALS_PER_S, 2),
        'extra': {
            'session_normalizer_bf16_matmul_gflops': round(norm, 1),
            'iters_timed': total,
            'nchains': NCHAINS,
            # chains actually executed (lane padding, see header) —
            # the rate above counts only the requested NCHAINS
            'nchains_exec': NCHAINS_EXEC,
            # warm-cap sentinel rejects (forward-solve failures), as
            # % of valid proposals; slot 2 = birth/death
            'fwd_reject_pct': round(
                100.0 * ff.sum() / max(pp.sum(), 1), 3),
            'fwd_reject_dim_pct': (
                None if dim_reject_pct is None
                else round(dim_reject_pct, 3)),
            # regression band for the dim-move reject class (measured
            # 10.5-11% across rounds 2-3; tests/test_dim_reject_pin.py
            # pins the CPU equivalent) — a throughput cut that bends
            # the transition kernel shows up as False here.  None =
            # no dim proposals in this (smoke-length) run: no data,
            # not a band violation.
            'fwd_reject_dim_in_band': (
                None if dim_reject_pct is None
                else bool(0.0 < dim_reject_pct < 12.5)),
            # warm-up failure fallback disclosure: True means this run
            # re-exec'd itself with the forced knobs below after the
            # primary arm failed to compile/run (the 10x slower
            # non-pallas arm) — a number of record with this flag set
            # is NOT comparable to the primary arm.  The round-4 SMEM
            # overflow hid behind the silent stderr-only fallback for
            # most of a session; the JSON now self-discloses.
            'fallback_arm': os.environ.get('_BENCH_NL_FALLBACK') == '1',
            'fallback_forced_knobs': (
                {'BAYHUNTER_DYNAMIC_NL': '0',
                 'BAYHUNTER_WARM_SOLVER': 'staged'}
                if os.environ.get('_BENCH_NL_FALLBACK') == '1'
                else None),
            'peak_hbm_gb': hbm_gb,
        },
    }))


if __name__ == '__main__':
    main()
