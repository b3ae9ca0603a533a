"""Utility module with reference-compatible surface
(reference: src/utils.py): config loading/saving (re-exported from
config.py), the ZMQ numpy-array socket used by the BayWatch live
stream, and the r_RF noise-correlation estimation tools.
"""

import numpy as np

from bayhunter_tpu.config import (load_params, load_params_user,  # noqa: F401
                                  save_baywatch_config, save_config,
                                  read_config, get_path)

rstate = np.random.RandomState(333)


# ----------------------------------------------------------------------
# ZMQ serializing sockets (reference: src/utils.py:20-41)
# Wire format: JSON header {dtype, shape} + raw buffer — kept
# byte-compatible so the reference BayWatch client can connect.
# ----------------------------------------------------------------------

try:
    import zmq

    class SerializingSocket(zmq.Socket):
        """Socket with numpy-array send/recv carrying reconstruction
        metadata (dtype, shape)."""

        def send_array(self, arr, flags=0, copy=True, track=False):
            md = dict(dtype=str(arr.dtype), shape=arr.shape)
            self.send_json(md, flags | zmq.SNDMORE)
            return self.send(arr, flags, copy=copy, track=track)

        def recv_array(self, flags=0, copy=True, track=False):
            md = self.recv_json(flags=flags)
            msg = self.recv(flags=flags, copy=copy, track=track)
            arr = np.frombuffer(msg, dtype=md['dtype'])
            return arr.reshape(md['shape'])

    class SerializingContext(zmq.Context):
        _socket_class = SerializingSocket

except ImportError:  # pragma: no cover - zmq is an optional extra
    SerializingSocket = None
    SerializingContext = None


# ----------------------------------------------------------------------
# r_RF estimation: map the RF Gauss filter width to the Gaussian
# noise-correlation parameter (reference: src/utils.py:175-395)
# ----------------------------------------------------------------------

def _compute_gaussnoise(size, corr=0.85, sigma=0.0125, draws=1):
    """Gaussian correlated noise draws (reference: src/utils.py:175-185)."""
    idx = np.abs(np.subtract.outer(np.arange(size), np.arange(size)))
    rmatrix = corr ** (idx ** 2)
    Ce = sigma ** 2 * rmatrix
    data_noise = rstate.multivariate_normal(np.zeros(size), Ce, draws)
    return np.concatenate(data_noise)


def compute_spectrum(y, Fs):
    """Normed single-sided amplitude spectrum
    (reference: src/utils.py:188-208)."""
    y = y - np.mean(y)
    n = y.size
    n_half = int(n / 2.)
    k = np.arange(n)
    T = n / Fs
    frq = (k / T)[:n_half]
    Y = np.fft.fft(y) / n
    Y = np.abs(Y[:n_half])
    Y = Y / Y.max()
    return frq, Y


def gauss_fct(a, x):
    """Gaussian filter curve (reference: src/utils.py:211-213)."""
    return np.exp(-(x * 2 * np.pi) ** 2 / (4 * a ** 2))


def _min_fct(a, x, y):
    return gauss_fct(a, x) - y


def _spec_resample(frq, Y):
    """Resample a frequency/energy cloud to a 120-bin envelope
    (reference: src/utils.py:221-245)."""
    bins = 120
    limit = 3
    y_values = np.zeros(bins) * np.nan
    hist, xedges, yedges = np.histogram2d(frq, Y, bins=bins)
    xbin = (xedges[:-1] + xedges[1:]) / 2.
    ybin = ((yedges[:-1] + yedges[1:]) / 2.)[::-1]
    histp = hist.T[::-1]
    for i_y, row in enumerate(histp):
        for i_x, occurence in enumerate(row):
            if y_values[i_x] > 0:
                continue
            elif occurence > limit:
                y_values[i_x] = ybin[i_y]
    return xbin, y_values


def rrf_estimate(pars=dict()):
    """Return (rrfs, a) pairs fitting Gaussian envelopes to correlated
    noise spectra (reference: src/utils.py:357-395)."""
    from scipy.optimize import least_squares

    rfx = pars.get('rfx', np.linspace(-5, 35, 201))
    rfdt = np.median(np.unique(rfx[1:] - rfx[:-1]))
    rrfs = np.sort(np.array(pars.get('rrfs', [0.75, 0.85, 0.95])))
    dt = pars.get('dt', rfdt)
    df = 1. / dt
    draws = pars.get('draws', 50000)
    sigma = 0.0125
    a0 = 1

    a_est = []
    for rrf in rrfs:
        rfnoise = _compute_gaussnoise(rfx.size, rrf, sigma, draws=draws)
        frq, Y = compute_spectrum(rfnoise, df)
        res_frq, res_Y = _spec_resample(frq, Y)
        res_Y = res_Y / np.nanmax(res_Y)
        good = np.isfinite(res_Y)
        env_lsq = least_squares(_min_fct, a0,
                                args=(res_frq[good], res_Y[good]))
        a_est.append(env_lsq.x[0])
    return rrfs, a_est


def plot_rrf_estimate(pars=dict()):
    """Figure version of :func:`rrf_estimate`
    (reference: src/utils.py:248-354)."""
    import matplotlib.pyplot as plt
    from scipy.optimize import least_squares

    rfx = pars.get('rfx', np.linspace(-5, 35, 201))
    rfy = pars.get('rfy', None)
    rfa = pars.get('rfa', None)
    rfdt = np.median(np.unique(rfx[1:] - rfx[:-1]))
    rrfs = np.sort(np.array(pars.get('rrfs', [0.75, 0.85, 0.95])))
    a = pars.get('a', 2.)
    dt = pars.get('dt', rfdt)
    df = 1. / dt
    draws = pars.get('draws', 50000)
    sigma = 0.0125
    a0 = 1

    fig = plt.figure()
    res_frq = None
    if rfy is not None:
        ax_rf = fig.add_subplot(2, 1, 1)
        label = 'RF, a=%.1f' % rfa if rfa is not None else 'RF'
        ax_rf.plot(rfx, rfy, 'k', lw=1, label=label)
        ax_rf.set_xlabel('Time in s')
        ax_rf.set_ylabel('Amplitude')
        ax_rf.set_xlim(rfx.min(), rfx.max())
        ax_rf.legend(loc=1)
        frq, Y = compute_spectrum(rfy, df)
        ax_p = fig.add_subplot(2, 1, 2)
        ax_p.plot(frq, Y, 'k', lw=1, label='RF-spec', zorder=200)
    else:
        ax_p = fig.add_subplot(1, 1, 1)

    for rrf in rrfs:
        rfnoise = _compute_gaussnoise(rfx.size, rrf, sigma, draws=draws)
        frq, Y = compute_spectrum(rfnoise, df)
        res_frq, res_Y = _spec_resample(frq, Y)
        res_Y_max = np.nanmax(res_Y)
        res_Y = res_Y / res_Y_max
        good = np.isfinite(res_Y)
        env_lsq = least_squares(_min_fct, a0,
                                args=(res_frq[good], res_Y[good]))
        env_a = env_lsq.x[0]
        env_G = gauss_fct(env_a, res_frq)
        label = 'a=%.1f; $r_{RF}$=%.2f' % (env_a, rrf)
        line, = ax_p.plot(res_frq, env_G, lw=1.2, zorder=100,
                          label=label)
        ax_p.plot(frq, Y / res_Y_max, lw=0.3, alpha=0.5,
                  color=line.get_color())

    ax_p.set_xlabel('Frequency in Hz')
    ax_p.set_ylabel('Spectral Power')
    ax_p.set_ylim(ymin=0)
    if res_frq is not None:
        G = gauss_fct(a, res_frq)
        ax_p.plot(res_frq, G, label='a=%.1f' % a, color='k', ls='--',
                  zorder=200)
    handles, labels = ax_p.get_legend_handles_labels()
    if labels:
        labels, handles = zip(*sorted(zip(labels, handles),
                                      key=lambda t: t[0]))
        ax_p.legend(handles[::-1], labels[::-1], loc=2,
                    bbox_to_anchor=(1, 1.1))
    fig.subplots_adjust(hspace=0.4)
    return fig
