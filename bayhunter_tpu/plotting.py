"""Post-processing & plotting from saved chain files.

API-compatible port of the reference ``PlotFromStorage``
(reference: src/Plotting.py:47-1271): loads the per-chain
``c???_p{1,2}*.npy`` files + config pickle, detects outlier chains,
merges the final posterior distribution, and produces the posterior
summary figures and the merged summary PDF.

Differences from the reference:
  * PDF merging uses pypdf when available and otherwise an internal
    PdfPages collector filled while figures are saved (PyPDF2 is not a
    required dependency).
  * ``matplotlib.colormaps`` replaces the removed ``cm.get_cmap``.
"""

import glob
import logging
import os
import os.path as op
from collections import OrderedDict

import numpy as np

import matplotlib
import matplotlib.pyplot as plt

from bayhunter_tpu import utils
from bayhunter_tpu import Targets
from bayhunter_tpu.models import Model, ModelMatrix

logger = logging.getLogger(__name__)

rstate = np.random.RandomState(333)


def vs_round(vs):
    """Round down to the next 0.025 interval
    (reference: src/Plotting.py:29-32)."""
    vs_floor = np.floor(vs)
    return np.round((vs - vs_floor) * 40) / 40 + vs_floor


def tryexcept(func):
    def wrapper_tryexcept(*args, **kwargs):
        try:
            return func(*args, **kwargs)
        except Exception as e:
            print('* %s: Plotting was not possible\nErrorMessage: %s'
                  % (func.__name__, e))
            return None
    return wrapper_tryexcept


def _cmap(name):
    return matplotlib.colormaps[name]


class PlotFromStorage(object):
    """Plot and save from storage (files); no chain object necessary."""

    def __init__(self, configfile):
        condict = self.read_config(configfile)
        self.targets = condict['targets']
        self.ntargets = len(self.targets)
        self.refs = condict['targetrefs'] + ['joint']
        self.priors = condict['priors']
        self.initparams = condict['initparams']

        self.datapath = op.dirname(configfile)
        self.figpath = self.datapath.replace('data', '')
        print('Current data path: %s' % self.datapath)

        self.init_filelists()
        self.init_outlierlist()

        self.mantle = self.priors.get('mantle', None)

        self.refmodel = {'model': None, 'nlays': None,
                         'noise': None, 'vpvs': None}
        self._summary_pdf = None

    def read_config(self, configfile):
        return utils.read_config(configfile)

    def savefig(self, fig, filename):
        if fig is not None:
            outfile = op.join(self.figpath, filename)
            fig.savefig(outfile, bbox_inches="tight")
            if filename.startswith('c_') and filename.endswith('.pdf'):
                self._summary_append(fig)
            plt.close('all')

    def _summary_append(self, fig):
        if self._summary_pdf is None:
            from matplotlib.backends.backend_pdf import PdfPages
            self._summary_pdf = PdfPages(
                op.join(self.figpath, 'c_summary.pdf'))
        self._summary_pdf.savefig(fig, bbox_inches='tight')

    def init_outlierlist(self):
        outlierfile = op.join(self.datapath, 'outliers.dat')
        if op.exists(outlierfile):
            self.outliers = np.loadtxt(outlierfile, usecols=[0],
                                       dtype=int, ndmin=1)
            print('Outlier chains from file: %d' % self.outliers.size)
        else:
            print('Outlier chains from file: None')
            self.outliers = np.zeros(0)

    def init_filelists(self):
        filetypes = ['models', 'likes', 'misfits', 'noise', 'vpvs']
        filepattern = op.join(self.datapath, 'c???_p%d%s.npy')
        files = []
        size = []
        for ftype in filetypes:
            p1files = sorted(glob.glob(filepattern % (1, ftype)))
            p2files = sorted(glob.glob(filepattern % (2, ftype)))
            files.append([p1files, p2files])
            size.append(len(p1files) + len(p2files))

        if len(set(size)) == 1:
            (self.modfiles, self.likefiles, self.misfiles,
             self.noisefiles, self.vpvsfiles) = files
        else:
            logger.info('You are missing files. Please check "%s" for '
                        'completeness.' % self.datapath)
            logger.info('(filetype, number): '
                        + str(list(zip(filetypes, size))))

    def get_outliers(self, dev):
        """Detect outlier chains by median-likelihood deviation from
        the best chain (reference: src/Plotting.py:113-154)."""
        nchains = len(self.likefiles[1])
        chainidxs = np.zeros(nchains) * np.nan
        chainmedians = np.zeros(nchains) * np.nan

        for i, likefile in enumerate(self.likefiles[1]):
            cidx, _, _ = self._return_c_p_t(likefile)
            chainlikes = np.load(likefile)
            chainidxs[i] = cidx
            chainmedians[i] = np.median(chainlikes)

        maxlike = np.max(chainmedians)
        if maxlike > 0:
            scores = chainmedians / maxlike
        else:
            scores = maxlike / chainmedians

        outliers = chainidxs[np.where((1 - scores) > dev)]
        outscores = 1 - scores[np.where((1 - scores) > dev)]

        if len(outliers) > 0:
            print('Outlier chains found with following chainindices:\n')
            print(outliers)
            outlierfile = op.join(self.datapath, 'outliers.dat')
            with open(outlierfile, 'w') as f:
                f.write('# Outlier chainindices with %.3f deviation '
                        'condition\n' % dev)
                for i, outlier in enumerate(outliers):
                    f.write('%d\t%.3f\n' % (outlier, outscores[i]))
        return outliers

    def _get_chaininfo(self):
        nmodels = [len(np.load(f)) for f in self.likefiles[1]]
        chainlist = [self._return_c_p_t(f)[0] for f in self.likefiles[1]]
        return chainlist, nmodels

    def save_final_distribution(self, maxmodels=200000, dev=0.05):
        """Merge phase-2 chain files into the final posterior
        (c_*.npy), excluding outliers, evenly subsampled
        (reference: src/Plotting.py:161-262)."""

        def save_finalmodels(models, likes, misfits, noise, vpvs):
            names = ['models', 'likes', 'misfits', 'noise', 'vpvs']
            print('> Saving posterior distribution.')
            for i, data in enumerate([models, likes, misfits, noise,
                                      vpvs]):
                outfile = op.join(self.datapath, 'c_%s' % names[i])
                np.save(outfile, data)
                print(outfile)

        outlierfile = op.join(self.datapath, 'outliers.dat')
        if op.exists(outlierfile):
            os.remove(outlierfile)
        self.outliers = self.get_outliers(dev=dev)

        nchains = int(len(self.likefiles[1]) - self.outliers.size)
        maxmodels = int(maxmodels)
        mpc = int(maxmodels / nchains)  # models per chain

        allmisfits = None
        allmodels = None
        alllikes = np.ones(maxmodels) * np.nan
        allnoise = np.ones((maxmodels, self.ntargets * 2)) * np.nan
        allvpvs = np.ones(maxmodels) * np.nan

        start = 0
        end = 0
        chainidxs, nmodels = self._get_chaininfo()

        for i, cidx in enumerate(chainidxs):
            if cidx in self.outliers:
                continue

            index = np.arange(nmodels[i]).astype(int)
            if nmodels[i] > mpc:
                index = rstate.choice(index, mpc, replace=False)
                index.sort()

            chainfiles = [self.modfiles[1][i], self.misfiles[1][i],
                          self.likefiles[1][i], self.noisefiles[1][i],
                          self.vpvsfiles[1][i]]

            for c, chainfile in enumerate(chainfiles):
                _, _, ftype = self._return_c_p_t(chainfile)
                data = np.load(chainfile)[index]

                if c == 0:
                    end = start + len(data)

                if ftype == 'likes':
                    alllikes[start:end] = data
                elif ftype == 'models':
                    if allmodels is None:
                        allmodels = np.ones((maxmodels,
                                             data[0].size)) * np.nan
                    allmodels[start:end, :] = data
                elif ftype == 'misfits':
                    if allmisfits is None:
                        allmisfits = np.ones((maxmodels,
                                              data[0].size)) * np.nan
                    allmisfits[start:end, :] = data
                elif ftype == 'noise':
                    allnoise[start:end, :] = data
                elif ftype == 'vpvs':
                    allvpvs[start:end] = data

            start = end

        keep = ~np.isnan(alllikes)
        save_finalmodels(allmodels[keep], alllikes[keep],
                         allmisfits[keep], allnoise[keep],
                         allvpvs[keep])

    def _unique_legend(self, handles, labels):
        legend = OrderedDict(zip(labels, handles))
        return legend.values(), legend.keys()

    def _return_c_p_t(self, filename):
        """(chainidx, phase, filetype) from filename."""
        c, pt = op.basename(filename).split('.npy')[0].split('_')
        cidx = int(c[1:])
        phase, ftype = pt[:2], pt[2:]
        return cidx, phase, ftype

    def _get_layers(self, models):
        return np.array([(len(model[~np.isnan(model)]) / 2 - 1)
                         for model in models])

    @tryexcept
    def plot_refmodel(self, fig, mtype='model', **kwargs):
        if fig is not None and self.refmodel[mtype] is not None:
            if mtype == 'nlays':
                fig.axes[0].axvline(self.refmodel[mtype], color='red',
                                    lw=0.5, alpha=0.7)
            if mtype == 'model':
                dep, vs = self.refmodel['model']
                assert len(dep) == len(vs)
                fig.axes[0].plot(vs, dep, **kwargs)
                if len(fig.axes) == 2:
                    for d in np.unique(dep):
                        fig.axes[1].axhline(d, **kwargs)
            if mtype == 'noise':
                for i, val in enumerate(self.refmodel[mtype]):
                    fig.axes[i].axvline(val, color='red', lw=0.5,
                                        alpha=0.7)
            if mtype == 'vpvs':
                fig.axes[0].axvline(self.refmodel[mtype], color='red',
                                    lw=0.5, alpha=0.7)
        return fig

    # ------------------------------------------------------- per-iteration

    def _plot_iitervalues(self, files, ax, layer=0, misfit=0, noise=0,
                          ind=-1):
        unifiles = set([f.replace('p1', 'p2') for f in files])
        color_list = _cmap('rainbow')(np.linspace(0, 1, len(unifiles)))

        xmin = -self.initparams['iter_burnin']
        xmax = self.initparams['iter_main']

        files.sort()
        n = 0
        datamin, datamax = 0., 1.
        for i, file in enumerate(files):
            phase = int(op.basename(file).split('_p')[1][0])
            alpha = 0.4 if phase == 1 else 0.7
            lw = 0.5 if phase == 1 else 0.8
            chainidx, _, _ = self._return_c_p_t(file)
            color = color_list[n % len(color_list)]

            data = np.load(file)
            if layer:
                data = self._get_layers(data)
            if misfit or noise:
                data = data.T[ind]

            iters = (np.linspace(xmin, 0, data.size) if phase == 1 else
                     np.linspace(0, xmax, data.size))
            ax.plot(iters, data, color=color, ls='-', lw=lw,
                    alpha=alpha,
                    label='c%d' % chainidx if phase == 2 else '')

            if phase == 2:
                if n == 0:
                    datamax = data.max()
                    datamin = data.min()
                else:
                    datamax = np.max([datamax, data.max()])
                    datamin = np.min([datamin, data.min()])
                n += 1

        ax.set_xlim(xmin, xmax)
        ax.set_ylim(datamin * 0.95, datamax * 1.05)
        ax.axvline(0, color='k', ls=':', alpha=0.7)

        center = np.array([abs(xmin / 2.), abs(xmin) + xmax / 2.]) \
            / (abs(xmin) + xmax)
        for i, text in enumerate(['Burn-in phase', 'Exploration phase']):
            ax.text(center[i], 0.97, text, fontsize=12, color='k',
                    horizontalalignment='center',
                    verticalalignment='top', transform=ax.transAxes)

        ax.set_xlabel('# Iteration')
        ax.legend(loc='center left', bbox_to_anchor=(1, 0.5))
        return ax

    @tryexcept
    def plot_iitermisfits(self, nchains=6, ind=-1):
        files = self.misfiles[0][:nchains] + self.misfiles[1][:nchains]
        fig, ax = plt.subplots(figsize=(7, 4))
        ax = self._plot_iitervalues(files, ax, misfit=True, ind=ind)
        ax.set_ylabel('%s misfit' % self.refs[ind])
        return fig

    @tryexcept
    def plot_iiterlikes(self, nchains=6):
        files = self.likefiles[0][:nchains] + self.likefiles[1][:nchains]
        fig, ax = plt.subplots(figsize=(7, 4))
        ax = self._plot_iitervalues(files, ax)
        ax.set_ylabel('Likelihood')
        return fig

    @tryexcept
    def plot_iiternoise(self, nchains=6, ind=-1):
        files = self.noisefiles[0][:nchains] \
            + self.noisefiles[1][:nchains]
        fig, ax = plt.subplots(figsize=(7, 4))
        ax = self._plot_iitervalues(files, ax, noise=True, ind=ind)
        parameter = np.concatenate(
            [['correlation (%s)' % ref, r'$\sigma$ (%s)' % ref]
             for ref in self.refs[:-1]])
        ax.set_ylabel(parameter[ind])
        return fig

    @tryexcept
    def plot_iiternlayers(self, nchains=6):
        files = self.modfiles[0][:nchains] + self.modfiles[1][:nchains]
        fig, ax = plt.subplots(figsize=(7, 4))
        ax = self._plot_iitervalues(files, ax, layer=True)
        ax.set_ylabel('Number of layers')
        return fig

    @tryexcept
    def plot_iitervpvs(self, nchains=6):
        files = self.vpvsfiles[0][:nchains] + self.vpvsfiles[1][:nchains]
        fig, ax = plt.subplots(figsize=(7, 4))
        ax = self._plot_iitervalues(files, ax)
        ax.set_ylabel('Vp / Vs')
        return fig

    # ------------------------------------------------------- posteriors

    @staticmethod
    def _plot_bestmodels(bestmodels, dep_int=None):
        fig, ax = plt.subplots(figsize=(4.4, 7))
        models = ['mean', 'median', 'stdminmax']
        colors = ['green', 'blue', 'black']
        ls = ['-', '--', ':']

        singlemodels = ModelMatrix.get_singlemodels(bestmodels, dep_int)
        for i, model in enumerate(models):
            vs, dep = singlemodels[model]
            ax.plot(vs.T, dep, color=colors[i], label=model, ls=ls[i],
                    lw=1)

        ax.invert_yaxis()
        ax.set_ylabel('Depth in km')
        ax.set_xlabel('$V_S$ in km/s')
        han, lab = ax.get_legend_handles_labels()
        ax.legend(han[:-1], lab[:-1], loc=3)
        return fig, ax

    @staticmethod
    def _plot_bestmodels_hist(models, dep_int=None):
        """2-D vs-depth histogram + interface-depth histogram + mode
        model (reference: src/Plotting.py:462-536)."""
        if dep_int is None:
            dep_int = np.linspace(0, 100, 201)
            depbins = np.linspace(0, 100, 101)
        else:
            maxdepth = int(np.ceil(dep_int.max()))
            interp = dep_int[1] - dep_int[0]
            dep_int = np.arange(dep_int[0], dep_int[-1] + interp / 2.,
                                interp / 2.)
            depbins = np.arange(0, maxdepth + 2 * interp, interp)

        models2 = ModelMatrix._replace_zvnoi_h(models)
        models2 = [model[~np.isnan(model)] for model in models2]
        yinterf = np.concatenate(
            [np.cumsum(model[int(model.size / 2):-1])
             for model in models2])

        vss_int, deps_int = ModelMatrix.get_interpmodels(models, dep_int)
        singlemodels = ModelMatrix.get_singlemodels(models,
                                                    dep_int=depbins)

        vss_flatten = vss_int.flatten()
        vsinterval = 0.025
        vs_histmin = vs_round(vss_flatten.min()) - 2 * vsinterval
        vs_histmax = vs_round(vss_flatten.max()) + 3 * vsinterval
        vsbins = np.arange(vs_histmin, vs_histmax, vsinterval)

        fig, axes = plt.subplots(1, 2,
                                 gridspec_kw={'width_ratios': [4, 1]},
                                 sharey=True, figsize=(5, 6.5))
        fig.subplots_adjust(wspace=0.05)

        data2d, xedges, yedges = np.histogram2d(
            vss_flatten, deps_int.flatten(), bins=(vsbins, depbins))

        axes[0].imshow(data2d.T,
                       extent=(xedges[0], xedges[-1], yedges[0],
                               yedges[-1]),
                       origin='lower', vmax=len(models), aspect='auto')

        vs_mode, dep_mode = singlemodels['mode']
        axes[0].plot(vs_mode, dep_mode, color='white', lw=1, alpha=0.9,
                     label='mode')
        axes[0].legend(loc=3)

        axes[1].hist(yinterf, bins=depbins, orientation='horizontal',
                     color='lightgray', alpha=0.7, edgecolor='k')

        axes[0].set_ylabel('Depth in km')
        axes[0].set_xlabel('$V_S$ in km/s')
        axes[0].invert_yaxis()
        axes[0].set_title('%d models' % len(models))
        axes[1].set_xticks([])
        return fig, axes

    def _get_posterior_data(self, data, final, chainidx=0):
        if final:
            filetempl = op.join(self.datapath, 'c_%s.npy')
        else:
            filetempl = op.join(self.datapath,
                                'c%.3d_p2%s.npy' % (chainidx, '%s'))
        return [np.load(filetempl % dataset) for dataset in data]

    def _plot_posterior_distribution(self, data, bins, formatter='%.2f',
                                     ax=None):
        if ax is None:
            fig, ax = plt.subplots(figsize=(3.5, 3))

        count, bins, _ = ax.hist(data, bins=bins, color='darkblue',
                                 alpha=0.7, edgecolor='white',
                                 linewidth=0.4)
        median = np.median(data)

        if formatter is not None:
            text = 'median: %s' % formatter % median
            ax.text(0.97, 0.97, text, fontsize=9, color='k',
                    horizontalalignment='right',
                    verticalalignment='top', transform=ax.transAxes)

        ax.axvline(median, color='k', ls=':', lw=1)
        ax.set_yticks([])
        ax.spines['top'].set_visible(False)
        ax.spines['right'].set_visible(False)
        return ax

    @tryexcept
    def plot_posterior_likes(self, final=True, chainidx=0):
        likes, = self._get_posterior_data(['likes'], final, chainidx)
        ax = self._plot_posterior_distribution(likes, 20, '%d')
        ax.set_xlabel('Likelihood')
        return ax.figure

    @tryexcept
    def plot_posterior_misfits(self, final=True, chainidx=0):
        misfits, = self._get_posterior_data(['misfits'], final, chainidx)
        datasets = [misfit for misfit in misfits.T][:-1]
        fig, axes = plt.subplots(1, len(datasets),
                                 figsize=(3.5 * len(datasets), 3))
        if len(datasets) == 1:
            axes = [axes]
        for i, data in enumerate(datasets):
            axes[i] = self._plot_posterior_distribution(data, 20,
                                                        '%.2f',
                                                        ax=axes[i])
            axes[i].set_xlabel('RMS misfit (%s)' % self.refs[i])
        return fig

    @tryexcept
    def plot_posterior_nlayers(self, final=True, chainidx=0):
        models, = self._get_posterior_data(['models'], final, chainidx)
        models = [model[~np.isnan(model)] for model in models]
        layers = np.array([(model.size / 2 - 1) for model in models])
        bins = np.arange(np.min(layers), np.max(layers) + 2) - 0.5
        ax = self._plot_posterior_distribution(layers, bins, '%d')
        xticks = np.arange(int(layers.min()), int(layers.max()) + 1)
        ax.set_xticks(xticks)
        ax.set_xticklabels(xticks)
        ax.set_xlabel('Number of layers')
        return ax.figure

    @tryexcept
    def plot_posterior_vpvs(self, final=True, chainidx=0):
        vpvs, = self._get_posterior_data(['vpvs'], final, chainidx)
        ax = self._plot_posterior_distribution(vpvs, 20, '%.2f')
        ax.set_xlabel('$V_P$ / $V_S$')
        return ax.figure

    @tryexcept
    def plot_posterior_noise(self, final=True, chainidx=0):
        noise, = self._get_posterior_data(['noise'], final, chainidx)
        label = np.concatenate(
            [['correlation (%s)' % ref, r'$\sigma$ (%s)' % ref]
             for ref in self.refs[:-1]])

        pars = int(len(noise.T) / 2)
        fig, axes = plt.subplots(pars, 2, figsize=(7, 3 * pars))
        fig.subplots_adjust(hspace=0.2)

        for i, data in enumerate(noise.T):
            if self.ntargets > 1:
                ax = axes[int(i / 2)][i % 2]
            else:
                ax = axes[i % 2]

            if np.std(data) == 0:  # constant during inversion
                m = np.mean(data)
                bins = [m - 1, m - 0.1, m + 0.1, m + 1]
                ax = self._plot_posterior_distribution(data, bins, None,
                                                       ax=ax)
                ax.text(0.5, 0.5, 'constant: %.2f' % m,
                        horizontalalignment='center',
                        verticalalignment='center',
                        transform=ax.transAxes, fontsize=12)
                ax.set_xticks([])
            else:
                ax = self._plot_posterior_distribution(data, 20,
                                                       '%.4f', ax=ax)
            ax.set_xlabel(label[i])
        return fig

    @tryexcept
    def plot_posterior_others(self, final=True, chainidx=0):
        likes, = self._get_posterior_data(['likes'], final, chainidx)
        misfits, = self._get_posterior_data(['misfits'], final, chainidx)
        misfits = misfits.T[-1]
        vpvs, = self._get_posterior_data(['vpvs'], final, chainidx)
        models, = self._get_posterior_data(['models'], final, chainidx)
        models = [model[~np.isnan(model)] for model in models]
        layers = np.array([(model.size / 2 - 1) for model in models])
        lbins = np.arange(np.min(layers), np.max(layers) + 2) - 0.5

        formatters = ['%d', '%.2f', '%.2f', '%d']
        nbins = [20, 20, 20, lbins]
        labels = ['Likelihood', 'Joint misfit', '$V_P$ / $V_S$',
                  'Number of layers']

        fig, axes = plt.subplots(2, 2, figsize=(7, 6))
        axes = axes.flatten()
        for i, data in enumerate([likes, misfits, vpvs, layers]):
            ax = axes[i]
            if i == 2 and np.std(data) == 0:
                m = np.mean(data)
                bins = [m - 1, m - 0.1, m + 0.1, m + 1]
                ax = self._plot_posterior_distribution(data, bins, None,
                                                       ax=ax)
                ax.text(0.5, 0.5, 'constant: %.2f' % m,
                        horizontalalignment='center',
                        verticalalignment='center',
                        transform=ax.transAxes, fontsize=12)
                ax.set_xticks([])
            else:
                ax = self._plot_posterior_distribution(
                    data, nbins[i], formatters[i], ax=ax)
                if i == 3:
                    xticks = np.arange(int(layers.min()),
                                       int(layers.max()) + 1)
                    ax.set_xticks(xticks)
                    ax.set_xticklabels(xticks)
            ax.set_xlabel(labels[i])
        return fig

    @tryexcept
    def plot_posterior_models1d(self, final=True, chainidx=0, depint=1):
        """depint: depth interpolation for binning (km)."""
        if final:
            nchains = self.initparams['nchains'] - self.outliers.size
        else:
            nchains = 1
        models, = self._get_posterior_data(['models'], final, chainidx)
        dep_int = np.arange(self.priors['z'][0],
                            self.priors['z'][1] + depint, depint)
        fig, ax = self._plot_bestmodels(models, dep_int)
        ax.set_ylim(self.priors['z'][::-1])
        ax.grid(color='gray', alpha=0.6, ls=':', lw=0.5)
        ax.set_title('%d models from %d chains' % (len(models), nchains))
        return fig

    @tryexcept
    def plot_posterior_models2d(self, final=True, chainidx=0, depint=1):
        if final:
            nchains = self.initparams['nchains'] - self.outliers.size
        else:
            nchains = 1
        models, = self._get_posterior_data(['models'], final, chainidx)
        dep_int = np.arange(self.priors['z'][0],
                            self.priors['z'][1] + depint, depint)
        fig, axes = self._plot_bestmodels_hist(models, dep_int)
        axes[0].set_ylim(self.priors['z'][::-1])
        axes[0].set_title('%d models from %d chains'
                          % (len(models), nchains))
        return fig

    # --------------------------------------------- moho-crust tradeoff

    @tryexcept
    def plot_moho_crustvel_tradeoff(self, moho=None, mohovs=None,
                                    refmodel=None):
        """Moho depth vs crustal-velocity tradeoff panels
        (reference: src/Plotting.py:753-902)."""
        models, vpvs = self._get_posterior_data(['models', 'vpvs'],
                                                final=True)
        if moho is None:
            moho = self.priors['z']
        if mohovs is None:
            mohovs = 4.2  # km/s

        mohos = np.zeros(len(models)) * np.nan
        vscrust = np.zeros(len(models)) * np.nan
        vslastlayer = np.zeros(len(models)) * np.nan
        vsjumps = np.zeros(len(models)) * np.nan

        for i, model in enumerate(models):
            thisvpvs = vpvs[i]
            vp, vs, h = Model.get_vp_vs_h(model, thisvpvs, self.mantle)
            ifaces = np.cumsum(h)
            vsstep = np.diff(vs)
            mohoidxs = np.argwhere((ifaces > moho[0])
                                   & (ifaces < moho[1]))
            if len(mohoidxs) == 0:
                continue
            mohoidxs = mohoidxs.flatten()
            mohoidxs_vs = np.where(vs > mohovs)[0] - 1
            if len(mohoidxs_vs) == 0:
                continue
            mohoidx = np.intersect1d(mohoidxs, mohoidxs_vs)
            if len(mohoidx) == 0:
                continue
            mohoidx = mohoidx[0]

            mohos[i] = ifaces[mohoidx]
            vscrust[i] = np.sum(vs[:(mohoidx + 1)]
                                * h[:(mohoidx + 1)]) / ifaces[mohoidx]
            vslastlayer[i] = vs[mohoidx]
            vsjumps[i] = vsstep[mohoidx]

        keep = ~np.isnan(vsjumps)
        mohos, vscrust = mohos[keep], vscrust[keep]
        vslastlayer, vsjumps = vslastlayer[keep], vsjumps[keep]

        fig, ax = plt.subplots(2, 4, figsize=(11, 6))
        fig.subplots_adjust(hspace=0.05, wspace=0.05)
        labels = ['$V_S$ last crustal layer', '$V_S$ crustal mean',
                  '$V_S$ increase']
        bins = 50

        for n, xdata in enumerate([vslastlayer, vscrust, vsjumps]):
            try:
                ax[0][n].hist(xdata, bins=bins, color='darkblue',
                              alpha=0.7, edgecolor='white',
                              linewidth=0.4)
                median = np.median(xdata)
                ax[0][n].axvline(median, color='k', ls='--', lw=1.2)
                ax[0][n].text(0.97, 0.97,
                              'median:\n%.2f km/s' % median,
                              fontsize=9, color='k',
                              horizontalalignment='right',
                              verticalalignment='top',
                              transform=ax[0][n].transAxes)
            except Exception:
                pass

        for n, xdata in enumerate([vslastlayer, vscrust, vsjumps]):
            try:
                ax[1][n].set_xlabel(labels[n])
                data2d, xedges, yedges, _ = ax[1][n].hist2d(
                    xdata, mohos, bins=bins)
                xi, yi = np.unravel_index(data2d.argmax(), data2d.shape)
                x_mode = ((xedges[:-1] + xedges[1:]) / 2.)[xi]
                y_mode = ((yedges[:-1] + yedges[1:]) / 2.)[yi]
                ax[1][n].axhline(y_mode, color='white', ls='--',
                                 lw=0.5, alpha=0.7)
                ax[1][n].axvline(x_mode, color='white', ls='--',
                                 lw=0.5, alpha=0.7)
                xmin, xmax = ax[1][n].get_xlim()
                ax[0][n].set_xlim([xmin, xmax])
            except Exception:
                pass
            ax[0][n].set_yticks([])
            ax[0][n].set_xticklabels([], visible=False)

        for n in (1, 2, 3):
            ax[1][n].set_yticklabels([], visible=False)
        ax[1][0].set_ylabel('Moho depth in km')

        ax[1][3].hist(mohos, bins=bins, orientation='horizontal',
                      color='darkblue', alpha=0.7, edgecolor='white',
                      linewidth=0.4)
        median = np.median(mohos)
        std = np.std(mohos)
        print('moho: %.4f +- %.4f km' % (median, std))
        ax[1][3].axhline(median, color='k', ls='--', lw=1.2)
        ax[1][3].text(0.97, 0.97, 'median:\n%.2f km' % median,
                      fontsize=9, color='k',
                      horizontalalignment='right',
                      verticalalignment='top',
                      transform=ax[1][3].transAxes)
        ymin, ymax = ax[1][0].get_ylim()
        for n in range(4):
            ax[1][n].set_ylim(ymin, ymax)
        ax[1][3].set_xticklabels([], visible=False)
        ax[1][3].set_yticks([])
        ax[0][3].axis('off')

        if refmodel is not None:
            dep, vs = refmodel
            h = (dep[1:] - dep[:-1])[::2]
            ifaces, lvs = dep[1::2], vs[::2]
            vsstep = np.diff(lvs)
            mohoidxs = np.argwhere((ifaces > moho[0])
                                   & (ifaces < moho[1]))
            mohoidx = mohoidxs[np.argmax(vsstep[mohoidxs])][0]
            truemoho = ifaces[mohoidx]
            truecrust = np.sum(lvs[:(mohoidx + 1)]
                               * h[:(mohoidx + 1)]) / ifaces[mohoidx]
            truevslast = lvs[mohoidx]
            truevsjump = vsstep[mohoidx]
            for n, xdata in enumerate([truevslast, truecrust,
                                       truevsjump]):
                ax[1][n].axhline(truemoho, color='red', ls='--',
                                 lw=0.5, alpha=0.7)
                ax[1][n].axvline(xdata, color='red', ls='--', lw=0.5,
                                 alpha=0.7)
        return fig

    # ------------------------------------------- current & best models

    @tryexcept
    def plot_currentmodels(self, nchains):
        """Latest model per chain (reference: src/Plotting.py:907-940)."""
        fig, ax = plt.subplots(figsize=(4, 6.5))
        color_list = _cmap('rainbow')(np.linspace(0, 1, nchains))

        for i, modfile in enumerate(self.modfiles[1][:nchains]):
            chainidx, _, _ = self._return_c_p_t(modfile)
            models = np.load(modfile)
            vpvs = np.load(modfile.replace('models', 'vpvs')).T
            currentvpvs = vpvs[-1]
            currentmodel = models[-1]

            color = color_list[i]
            vp, vs, h = Model.get_vp_vs_h(currentmodel, currentvpvs,
                                          self.mantle)
            cvp, cvs, cdepth = Model.get_stepmodel_from_h(h=h, vs=vs,
                                                          vp=vp)
            ax.plot(cvs, cdepth, color=color, ls='-', lw=0.8,
                    alpha=0.7, label='c%d / %d' % (chainidx,
                                                   vs.size - 1))

        ax.invert_yaxis()
        ax.set_xlabel('$V_S$ in km/s')
        ax.set_ylabel('Depth in km')
        ax.set_ylim(self.priors['z'][::-1])
        ax.set_title('Current models')
        ax.grid(color='gray', alpha=0.6, ls=':', lw=0.5)
        ax.legend(loc='center left', bbox_to_anchor=(1, 0.5))
        return fig

    @tryexcept
    def plot_currentdatafits(self, nchains):
        """Latest data fit per chain (reference: src/Plotting.py:942-997)."""
        color_list = _cmap('rainbow')(np.linspace(0, 1, nchains))
        targets = Targets.JointTarget(targets=self.targets)
        fig, ax = targets.plot_obsdata(mod=False)

        for i, modfile in enumerate(self.modfiles[1][:nchains]):
            color = color_list[i]
            chainidx, _, _ = self._return_c_p_t(modfile)
            models = np.load(modfile)
            vpvs = np.load(modfile.replace('models', 'vpvs')).T
            currentvpvs = vpvs[-1]
            currentmodel = models[-1]

            vp, vs, h = Model.get_vp_vs_h(currentmodel, currentvpvs,
                                          self.mantle)
            rho = vp * 0.32 + 0.77

            jmisfit = 0
            for n, target in enumerate(targets.targets):
                xmod, ymod = target.moddata.plugin.run_model(
                    h=h, vp=vp, vs=vs, rho=rho)
                misfit = target.valuation.get_rms(target.obsdata.y,
                                                  ymod)
                jmisfit += misfit

                if len(targets.targets) > 1:
                    label = ''
                    if ((len(targets.targets) - 1) - n) < 1e-2:
                        label = 'c%d / %.3f' % (chainidx, jmisfit)
                    ax[n].plot(xmod, ymod, color=color, alpha=0.7,
                               lw=0.8, label=label)
                else:
                    ax.plot(xmod, ymod, color=color, alpha=0.5, lw=0.7,
                            label='c%d / %.3f' % (chainidx, jmisfit))

        if len(targets.targets) > 1:
            ax[0].set_title('Current data fits')
            idx = len(targets.targets) - 1
            han, lab = ax[idx].get_legend_handles_labels()
            handles, labels = self._unique_legend(han, lab)
            ax[0].legend().set_visible(False)
        else:
            ax.set_title('Current data fits')
            han, lab = ax.get_legend_handles_labels()
            handles, labels = self._unique_legend(han, lab)
            ax.legend().set_visible(False)

        fig.legend(handles, labels, loc='center left',
                   bbox_to_anchor=(0.92, 0.5))
        return fig

    @tryexcept
    def plot_bestmodels(self):
        """Best-fit model per chain, ignoring outliers
        (reference: src/Plotting.py:1000-1051)."""
        fig, ax = plt.subplots(figsize=(4, 6.5))
        modfiles = self.modfiles[1]

        for i, modfile in enumerate(modfiles):
            chainidx, _, _ = self._return_c_p_t(modfile)
            if chainidx in self.outliers:
                continue
            models = np.load(modfile)
            vpvs = np.load(modfile.replace('models', 'vpvs')).T
            misfits = np.load(modfile.replace('models', 'misfits')).T[-1]
            bestmodel = models[np.argmin(misfits)]
            bestvpvs = vpvs[np.argmin(misfits)]

            vp, vs, h = Model.get_vp_vs_h(bestmodel, bestvpvs,
                                          self.mantle)
            cvp, cvs, cdepth = Model.get_stepmodel_from_h(h=h, vs=vs,
                                                          vp=vp)
            ax.plot(cvs, cdepth, color='k', ls='-', lw=0.8, alpha=0.5)

        ax.invert_yaxis()
        ax.set_xlabel('$V_S$ in km/s')
        ax.set_ylabel('Depth in km')
        ax.set_ylim(self.priors['z'][::-1])
        ax.set_title('Best fit models from %d chains'
                     % (len(modfiles) - self.outliers.size))
        ax.grid(color='gray', alpha=0.6, ls=':', lw=0.5)
        return fig

    @tryexcept
    def plot_bestdatafits(self):
        """Best data fit per chain, ignoring outliers
        (reference: src/Plotting.py:1053-1111)."""
        targets = Targets.JointTarget(targets=self.targets)
        fig, ax = targets.plot_obsdata(mod=False)
        modfiles = self.modfiles[1]

        for i, modfile in enumerate(modfiles):
            chainidx, _, _ = self._return_c_p_t(modfile)
            if chainidx in self.outliers:
                continue
            models = np.load(modfile)
            vpvs = np.load(modfile.replace('models', 'vpvs')).T
            misfits = np.load(modfile.replace('models', 'misfits')).T[-1]
            bestmodel = models[np.argmin(misfits)]
            bestvpvs = vpvs[np.argmin(misfits)]

            vp, vs, h = Model.get_vp_vs_h(bestmodel, bestvpvs,
                                          self.mantle)
            rho = vp * 0.32 + 0.77
            for n, target in enumerate(targets.targets):
                xmod, ymod = target.moddata.plugin.run_model(
                    h=h, vp=vp, vs=vs, rho=rho)
                if len(targets.targets) > 1:
                    ax[n].plot(xmod, ymod, color='k', alpha=0.5, lw=0.7)
                else:
                    ax.plot(xmod, ymod, color='k', alpha=0.5, lw=0.7)

        naxes = len(targets.targets)
        title = 'Best data fits from %d chains' \
            % (len(modfiles) - self.outliers.size)
        if naxes > 1:
            ax[0].set_title(title)
            han, lab = ax[0].get_legend_handles_labels()
            handles, labels = self._unique_legend(han, lab)
            ax[0].legend().set_visible(False)
        else:
            ax.set_title(title)
            han, lab = ax.get_legend_handles_labels()
            handles, labels = self._unique_legend(han, lab)
            ax.legend().set_visible(False)

        fig.legend(handles, labels, loc='center left',
                   bbox_to_anchor=(0.92, 0.5))
        return fig

    @tryexcept
    def plot_rfcorr(self, rf='prf'):
        """Best-model RF residual vs a noise realization from the
        inferred covariance (reference: src/Plotting.py:1114-1151)."""
        from bayhunter_tpu.synthobs import SynthObs

        p2models, p2noise, p2misfits, p2vpvs = self._get_posterior_data(
            ['models', 'noise', 'misfits', 'vpvs'], final=True)

        fig, axes = plt.subplots(2, sharex=True, sharey=True)
        ind = self.refs.index(rf)
        best = np.argmin(p2misfits.T[ind])
        model = p2models[best]
        vpvs = p2vpvs[best]

        target = self.targets[ind]
        x, y = target.obsdata.x, target.obsdata.y
        vp, vs, h = Model.get_vp_vs_h(model, vpvs, self.mantle)
        rho = vp * 0.32 + 0.77

        _, ymod = target.moddata.plugin.run_model(h=h, vp=vp, vs=vs,
                                                  rho=rho)
        yresiduals = y - ymod

        axes[0].plot(x, yresiduals, color='k', lw=0.7,
                     label='residuals')
        corr, sigma = p2noise[best][2 * ind:2 * (ind + 1)]
        yerr = SynthObs.compute_gaussnoise(y, corr=corr, sigma=sigma)
        axes[1].plot(x, yerr, color='k', lw=0.7,
                     label='noise realization')
        axes[1].set_xlabel('Time in s')

        axes[0].legend(loc=4)
        axes[1].legend(loc=4)
        axes[0].grid(color='gray', ls=':', lw=0.5)
        axes[1].grid(color='gray', ls=':', lw=0.5)
        axes[0].set_xlim([x[0], x[-1]])
        return fig

    # --------------------------------------------------------- drivers

    def merge_pdfs(self):
        """Merge all c_*.pdf figures into c_summary.pdf
        (reference: src/Plotting.py:1153-1170)."""
        outputfile = op.join(self.figpath, 'c_summary.pdf')
        try:
            from pypdf import PdfReader, PdfWriter
        except ImportError:
            try:
                from PyPDF2 import PdfReader, PdfWriter
            except ImportError:
                # figures were already collected incrementally
                if self._summary_pdf is not None:
                    self._summary_pdf.close()
                    self._summary_pdf = None
                    print('Saved summary: %s' % outputfile)
                return

        output = PdfWriter()
        pdffiles = glob.glob(op.join(self.figpath + os.sep + 'c_*.pdf'))
        pdffiles.sort(key=op.getmtime)
        for pdffile in pdffiles:
            if op.abspath(pdffile) == op.abspath(outputfile):
                continue
            document = PdfReader(pdffile)
            for page in document.pages:
                output.add_page(page)
        with open(outputfile, 'wb') as f:
            output.write(f)

    def save_chainplots(self, cidx=0, refmodel=dict(), depint=None):
        """Chain-specific posterior plots
        (reference: src/Plotting.py:1172-1207)."""
        self.refmodel.update(refmodel)

        fig5a = self.plot_posterior_misfits(final=False, chainidx=cidx)
        self.savefig(fig5a, 'c%.3d_posterior_misfit.pdf' % cidx)

        fig5b = self.plot_posterior_nlayers(final=False, chainidx=cidx)
        self.plot_refmodel(fig5b, 'nlays')
        self.savefig(fig5b, 'c%.3d_posterior_nlayers.pdf' % cidx)

        fig5c = self.plot_posterior_noise(final=False, chainidx=cidx)
        self.plot_refmodel(fig5c, 'noise')
        self.savefig(fig5c, 'c%.3d_posterior_noise.pdf' % cidx)

        fig5d = self.plot_posterior_models1d(final=False, chainidx=cidx,
                                             depint=depint or 1)
        self.plot_refmodel(fig5d, 'model', color='k', lw=1)
        self.savefig(fig5d, 'c%.3d_posterior_models1d.pdf' % cidx)

        fig5e = self.plot_posterior_models2d(final=False, chainidx=cidx,
                                             depint=depint or 1)
        self.plot_refmodel(fig5e, 'model', color='red', lw=0.5,
                           alpha=0.7)
        self.savefig(fig5e, 'c%.3d_posterior_models2d.pdf' % cidx)

    def save_plots(self, nchains=5, refmodel=dict(), depint=1):
        """Standard figure set (reference: src/Plotting.py:1209-1271)."""
        self.refmodel.update(refmodel)
        nchains = int(np.min([nchains, len(self.likefiles[1])]))

        fig1a = self.plot_iiterlikes(nchains=nchains)
        self.savefig(fig1a, 'c_iiter_likes.pdf')

        fig1b = self.plot_iitermisfits(nchains=nchains, ind=-1)
        self.savefig(fig1b, 'c_iiter_misfits.pdf')

        fig1c = self.plot_iiternlayers(nchains=nchains)
        self.savefig(fig1c, 'c_iiter_nlayers.pdf')

        fig1d = self.plot_iitervpvs(nchains=nchains)
        self.savefig(fig1d, 'c_iiter_vpvs.pdf')

        for i in range(self.ntargets):
            ind = i * 2 + 1
            fig1e = self.plot_iiternoise(nchains=nchains, ind=ind)
            self.savefig(fig1e, 'c_iiter_noisepar%d.pdf' % ind)

        fig3a = self.plot_currentmodels(nchains=nchains)
        self.plot_refmodel(fig3a, 'model', color='k', lw=1)
        self.savefig(fig3a, 'c_currentmodels.pdf')

        fig3b = self.plot_currentdatafits(nchains=nchains)
        self.savefig(fig3b, 'c_currentdatafits.pdf')

        fig2b = self.plot_posterior_nlayers()
        self.plot_refmodel(fig2b, 'nlays')
        self.savefig(fig2b, 'c_posterior_nlayers.pdf')

        fig2v = self.plot_posterior_vpvs()
        self.plot_refmodel(fig2v, 'vpvs')
        self.savefig(fig2v, 'c_posterior_vpvs.pdf')

        fig2c = self.plot_posterior_noise()
        self.plot_refmodel(fig2c, 'noise')
        self.savefig(fig2c, 'c_posterior_noise.pdf')

        fig2d = self.plot_posterior_models1d(depint=depint)
        self.plot_refmodel(fig2d, 'model', color='k', lw=1)
        self.savefig(fig2d, 'c_posterior_models1d.pdf')

        fig2e = self.plot_posterior_models2d(depint=depint)
        self.plot_refmodel(fig2e, 'model', color='red', lw=0.5,
                           alpha=0.7)
        self.savefig(fig2e, 'c_posterior_models2d.pdf')
