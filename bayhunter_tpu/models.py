"""Host-side model-vector utilities (numpy).

API-compatible with the reference's ``Model``/``ModelMatrix``
(reference: src/Models.py) — used for post-processing, plotting and
BayWatch, where models travel as the NaN-padded flat vectors
``[vs_0..vs_{n-1}, nan.., z_0..z_{n-1}, nan..]``.  The on-device
sampler uses the masked fixed-shape representation in ops/voronoi.py
instead; ``Model.split_modelparams`` decodes either layout.
"""

import copy

import numpy as np


class Model(object):
    """Interpolating/conversion helpers for a single model vector
    (reference: src/Models.py:13-104)."""

    @staticmethod
    def split_modelparams(model):
        model = model[~np.isnan(model)]
        n = int(model.size / 2)
        vs = model[:n]
        z_vnoi = model[-n:]
        return n, vs, z_vnoi

    @staticmethod
    def get_vp(vs, vpvs=1.73, mantle=[4.3, 1.8]):
        """Vp from Vs with crustal ratio and a separate mantle ratio
        from the first nucleus with vs >= mantle[0]
        (reference: src/Models.py:27-37)."""
        vs = np.asarray(vs)
        ind_m = np.where(vs >= mantle[0])[0]
        vp = vs * vpvs
        if len(ind_m) == 0:
            return vp
        vp = vp.copy()
        vp[ind_m[0]:] = vs[ind_m[0]:] * mantle[1]
        return vp

    @staticmethod
    def get_vp_vs_h(model, vpvs=1.73, mantle=None):
        """(vp, vs, h) from a [vs, z_vnoi] vector: interfaces at nuclei
        midpoints, halfspace thickness 0 (reference: src/Models.py:40-52)."""
        n, vs, z_vnoi = Model.split_modelparams(model)
        z_disc = (z_vnoi[:n - 1] + z_vnoi[1:n]) / 2.
        h_lay = z_disc - np.concatenate(([0], z_disc[:-1]))
        h = np.concatenate((h_lay, [0]))
        if mantle is not None:
            vp = Model.get_vp(vs, vpvs, mantle)
        else:
            vp = vs * vpvs
        return vp, vs, h

    @staticmethod
    def get_stepmodel(model, vpvs=1.73, mantle=None):
        """Step-like (vp, vs, depth) arrays for plotting
        (reference: src/Models.py:55-69)."""
        vp, vs, h = Model.get_vp_vs_h(model, vpvs, mantle)
        dep = np.cumsum(h)
        dep = np.repeat(dep, 2)
        dep_step = np.concatenate(([0], dep[:-1]))
        vp_step = np.repeat(vp, 2)
        vs_step = np.repeat(vs, 2)
        dep_step[-1] = np.max([150, dep_step[-1] * 2.5])  # halfspace
        return vp_step, vs_step, dep_step

    @staticmethod
    def get_stepmodel_from_h(h, vs, vpvs=1.73, dep=None, vp=None,
                             mantle=None):
        """Step-like model directly from (h, vs)
        (reference: src/Models.py:72-91)."""
        if dep is None:
            dep = np.cumsum(h)
        if vp is None:
            if mantle is not None:
                vp = Model.get_vp(vs, vpvs, mantle)
            else:
                vp = np.asarray(vs) * vpvs
        dep = np.repeat(dep, 2)
        dep_step = np.concatenate(([0], dep[:-1]))
        vp_step = np.repeat(vp, 2)
        vs_step = np.repeat(vs, 2)
        dep_step[-1] = dep_step[-1] * 2.5
        return vp_step, vs_step, dep_step

    @staticmethod
    def get_interpmodel(model, dep_int, vpvs=1.73, mantle=None):
        """Step model interpolated onto a fixed depth grid
        (reference: src/Models.py:94-104)."""
        vp_step, vs_step, dep_step = Model.get_stepmodel(model, vpvs,
                                                         mantle)
        vs_int = np.interp(dep_int, dep_step, vs_step)
        vp_int = np.interp(dep_int, dep_step, vp_step)
        return vp_int, vs_int


class ModelMatrix(object):
    """Ensemble statistics over a matrix of model vectors
    (reference: src/Models.py:107-274)."""

    @staticmethod
    def _delete_nanmodels(models):
        """Drop all-NaN rows (reference: src/Models.py:115-125)."""
        cmodels = copy.copy(np.asarray(models))
        mean = np.nanmean(cmodels, axis=1)
        nanidx = np.where(np.isnan(mean))[0]
        if nanidx.size == 0:
            return cmodels
        return np.delete(cmodels, nanidx, axis=0)

    @staticmethod
    def _replace_zvnoi_h(models):
        """Model matrix re-expressed as (vs, h)
        (reference: src/Models.py:127-140)."""
        models = ModelMatrix._delete_nanmodels(models)
        for i, model in enumerate(models):
            _, vs, h = Model.get_vp_vs_h(model)
            newmodel = np.concatenate((vs, h))
            models[i][:newmodel.size] = newmodel
        return models

    @staticmethod
    def get_interpmodels(models, dep_int):
        """All models interpolated onto dep_int
        (reference: src/Models.py:142-157)."""
        models = ModelMatrix._delete_nanmodels(models)
        deps_int = np.repeat([dep_int], len(models), axis=0)
        vss_int = np.empty((len(models), dep_int.size))
        for i, model in enumerate(models):
            _, vs_int = Model.get_interpmodel(model, dep_int)
            vss_int[i] = vs_int
        return vss_int, deps_int

    @staticmethod
    def get_singlemodels(models, dep_int=None, misfits=None):
        """Summary models: mean/median/minmax/stdminmax/mode(/best)
        (reference: src/Models.py:159-225)."""
        singlemodels = dict()
        if dep_int is None:
            dep_int = np.linspace(0, 100, 201)

        vss_int, deps_int = ModelMatrix.get_interpmodels(models, dep_int)

        mean = np.mean(vss_int, axis=0)
        median = np.median(vss_int, axis=0)
        minmax = np.array((np.min(vss_int, axis=0),
                           np.max(vss_int, axis=0))).T
        stdmodel = np.std(vss_int, axis=0)
        stdminmax = np.array((mean - stdmodel, mean + stdmodel)).T

        # mode from a 2-D (vs, depth) histogram; vs bin 0.025 km/s
        vss_flat = vss_int.flatten()
        vsbins = max(int((vss_flat.max() - vss_flat.min()) / 0.025), 1)
        bins, vs_bin, dep_bin = np.histogram2d(
            vss_int.flatten(), deps_int.flatten(), bins=(vsbins, dep_int))
        vs_center = (vs_bin[:-1] + vs_bin[1:]) / 2.
        dep_center = (dep_bin[:-1] + dep_bin[1:]) / 2.
        vs_mode = vs_center[np.argmax(bins.T, axis=1)]
        singlemodels['mode'] = (vs_mode, dep_center)

        if misfits is not None:
            ind = np.argmin(misfits)
            _, vs_best, dep_best = Model.get_stepmodel(models[ind])
            singlemodels['minmisfit'] = (vs_best, dep_best)

        singlemodels['mean'] = (mean, dep_int)
        singlemodels['median'] = (median, dep_int)
        singlemodels['minmax'] = (minmax.T, dep_int)
        singlemodels['stdminmax'] = (stdminmax.T, dep_int)
        return singlemodels

    @staticmethod
    def get_weightedvalues(weights, models=None, likes=None, misfits=None,
                           noiseparams=None, vpvs=None):
        """Repeat rows by acceptance-wait weights
        (reference: src/Models.py:227-274)."""
        weights = np.array(weights, dtype=int)
        wlikes = wmisfits = wmodels = wnoise = wvpvs = None

        if likes is not None:
            wlikes = np.repeat(likes, weights)
        if misfits is not None:
            misfits = np.asarray(misfits)
            if misfits.ndim == 1:
                wmisfits = np.repeat(misfits, weights)
            else:
                wmisfits = np.repeat(misfits, weights, axis=0)
        if models is not None:
            wmodels = np.repeat(np.asarray(models), weights, axis=0)
        if noiseparams is not None:
            wnoise = np.repeat(np.asarray(noiseparams), weights, axis=0)
        if vpvs is not None:
            wvpvs = np.repeat(vpvs, weights)

        return wmodels, wlikes, wmisfits, wnoise, wvpvs
