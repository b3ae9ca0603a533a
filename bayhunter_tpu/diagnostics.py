"""Ensemble convergence diagnostics: split-R-hat and effective sample
size over the optimizer's per-chain snapshot traces.

The reference's only ensemble-quality check is post-hoc outlier-chain
removal by median-likelihood deviation (reference: src/Plotting.py:
113-154).  A production run with thousands of chains needs positive
convergence evidence, not just failure pruning, so this module adds
the standard split-chain potential scale reduction factor (Gelman &
Rubin 1992; split form of Vehtari et al. 2021) and a Geyer
initial-positive-sequence effective sample size — both pure-numpy over
the already-collected host snapshots (shape (chains, draws)), so they
cost nothing on device.

Typical use::

    states, snaps = opt._run_phase(...)   # or np.load(...) of c_*.npy
    rep = convergence_report({'logL': likes, 'vpvs': vpvs})
    # {'logL': {'rhat': 1.003, 'ess': 812.4, ...}, ...}

Chains here are the batch axis; draws are the thinned snapshots of one
phase (use the main phase — burn-in is transient by construction).
"""

import numpy as np

__all__ = ['split_rhat', 'ess', 'convergence_report']


def _split(x):
    """(chains, draws) -> (2*chains, draws//2): first/second half of
    every chain become separate pseudo-chains, so within-chain drift
    shows up as between-chain variance."""
    x = np.asarray(x, float)
    if x.ndim != 2:
        raise ValueError('expected (chains, draws), got %s'
                         % (x.shape,))
    n = (x.shape[1] // 2) * 2
    return np.concatenate([x[:, :n // 2], x[:, n // 2:n]], axis=0)


def split_rhat(x):
    """Split-chain potential scale reduction factor of a (chains,
    draws) trace.  ~1 at convergence; >1.01 flags disagreement between
    chain halves (Vehtari et al. 2021 use 1.01 as the cutoff)."""
    z = _split(x)
    m, n = z.shape
    if n < 2:
        return np.nan
    means = z.mean(axis=1)
    b = n * means.var(ddof=1)          # between-chain
    w = z.var(axis=1, ddof=1).mean()   # within-chain
    if w <= 0.0:
        # degenerate constant chains: identical -> converged,
        # differing constants -> maximally unconverged
        return 1.0 if b <= 0.0 else np.inf
    var_plus = (n - 1) / n * w + b / n
    return float(np.sqrt(var_plus / w))


def ess(x, max_lag=None):
    """Bulk effective sample size of a (chains, draws) trace via
    Geyer's initial positive sequence: chain-mean-centered pooled
    autocorrelations are summed in lag pairs until a pair goes
    non-positive.  Returns min(m*n, m*n / (1 + 2 sum rho))."""
    z = np.asarray(x, float)
    if z.ndim == 1:
        z = z[None, :]
    m, n = z.shape
    if n < 4:
        return float(m * n)
    if max_lag is None:
        max_lag = n - 2
    zc = z - z.mean(axis=1, keepdims=True)
    w = zc.var(axis=1, ddof=0).mean()
    if w <= 0.0:
        return float(m * n)
    # FFT autocovariance per chain, averaged (pooled rho_t)
    nfft = 1 << int(np.ceil(np.log2(2 * n)))
    f = np.fft.rfft(zc, nfft, axis=1)
    acov = np.fft.irfft(f * np.conj(f), nfft, axis=1)[:, :n].real
    acov /= n
    rho = acov.mean(axis=0) / w
    # Geyer: sum rho[2k]+rho[2k+1] while positive
    tau = 1.0
    for k in range(1, min(max_lag, n - 1) // 2 + 1):
        pair = rho[2 * k - 1] + rho[2 * k]
        if pair <= 0.0:
            break
        tau += 2.0 * pair
    return float(min(m * n, m * n / tau))


def convergence_report(traces, rhat_tol=1.01):
    """Diagnostics dict per named (chains, draws) trace:
    ``{'rhat':…, 'ess':…, 'ess_per_chain':…, 'converged': rhat<tol}``.
    Accepts the optimizer's stacked snapshot arrays or reloaded
    ``c_*.npy`` columns."""
    out = {}
    for name, x in traces.items():
        x = np.asarray(x, float)
        if x.ndim == 1:
            x = x[None, :]
        r = split_rhat(x)
        e = ess(x)
        out[name] = {'rhat': r, 'ess': e,
                     'ess_per_chain': e / x.shape[0],
                     'converged': bool(np.isfinite(r)
                                       and r < rhat_tol)}
    return out
