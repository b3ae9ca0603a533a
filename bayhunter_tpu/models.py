"""Host-side model-vector utilities (numpy, vectorized).

API-compatible with the reference's ``Model``/``ModelMatrix``
(reference: src/Models.py) — used for post-processing, plotting and
BayWatch, where models travel as the NaN-padded flat vectors
``[vs_0..vs_{n-1}, nan.., z_0..z_{n-1}, nan..]``.  The on-device
sampler uses the masked fixed-shape representation in ops/voronoi.py
instead; ``Model.split_modelparams`` decodes either layout.

Unlike the reference (per-model Python loops), the ensemble operations
here work on whole model matrices at once.
"""

import numpy as np

HALFSPACE_FLOOR_KM = 150.0   # plotted halfspace extent (src/Models.py:66)


def _nuclei(model):
    """Valid (vs, z_vnoi) pairs of one NaN-padded flat vector."""
    vec = np.asarray(model, float)
    vec = vec[np.isfinite(vec)]
    half = vec.size // 2
    return vec[:half], vec[vec.size - half:]


class Model(object):
    """Conversions for a single Voronoi model vector
    (reference: src/Models.py:13-104)."""

    @staticmethod
    def split_modelparams(model):
        vs, z_vnoi = _nuclei(model)
        return vs.size, vs, z_vnoi

    @staticmethod
    def get_vp(vs, vpvs=1.73, mantle=[4.3, 1.8]):
        """Vp from Vs; nuclei from the first one exceeding the mantle
        velocity threshold onward use the mantle ratio
        (reference: src/Models.py:27-37)."""
        vs = np.asarray(vs, float)
        is_mantle = vs >= mantle[0]
        if is_mantle.any():
            ratio = np.where(np.arange(vs.size) >= is_mantle.argmax(),
                             mantle[1], vpvs)
        else:
            ratio = vpvs
        return vs * ratio

    @staticmethod
    def get_vp_vs_h(model, vpvs=1.73, mantle=None):
        """(vp, vs, h) with interfaces at nuclei-depth midpoints and a
        zero-thickness halfspace (reference: src/Models.py:40-52)."""
        _, vs, z_vnoi = Model.split_modelparams(model)
        mids = 0.5 * (z_vnoi[:-1] + z_vnoi[1:])
        h = np.diff(np.concatenate(([0.0], mids, [mids[-1] if mids.size
                                                  else 0.0])))
        if h.size:
            h[-1] = 0.0
        vp = (Model.get_vp(vs, vpvs, mantle) if mantle is not None
              else vs * vpvs)
        return vp, vs, h

    @staticmethod
    def _steps(vp, vs, dep, floor=None):
        """Duplicate layer values into step polylines for plotting."""
        dep2 = np.concatenate(([0.0], np.repeat(dep, 2)[:-1]))
        bottom = (max(HALFSPACE_FLOOR_KM, dep2[-1] * 2.5)
                  if floor is None else dep2[-1] * 2.5)
        dep2[-1] = bottom
        return np.repeat(vp, 2), np.repeat(vs, 2), dep2

    @staticmethod
    def get_stepmodel(model, vpvs=1.73, mantle=None):
        """Step-like (vp, vs, depth) polylines
        (reference: src/Models.py:55-69)."""
        vp, vs, h = Model.get_vp_vs_h(model, vpvs, mantle)
        return Model._steps(vp, vs, np.cumsum(h))

    @staticmethod
    def get_stepmodel_from_h(h, vs, vpvs=1.73, dep=None, vp=None,
                             mantle=None):
        """Step-like polylines directly from (h, vs)
        (reference: src/Models.py:72-91)."""
        if dep is None:
            dep = np.cumsum(h)
        if vp is None:
            vp = (Model.get_vp(vs, vpvs, mantle) if mantle is not None
                  else np.asarray(vs, float) * vpvs)
        return Model._steps(np.asarray(vp, float),
                            np.asarray(vs, float),
                            np.asarray(dep, float), floor=0)

    @staticmethod
    def get_interpmodel(model, dep_int, vpvs=1.73, mantle=None):
        """Model resampled onto a fixed depth grid
        (reference: src/Models.py:94-104)."""
        vp_s, vs_s, dep_s = Model.get_stepmodel(model, vpvs, mantle)
        return (np.interp(dep_int, dep_s, vp_s),
                np.interp(dep_int, dep_s, vs_s))


class ModelMatrix(object):
    """Vectorized ensemble statistics over a matrix of model vectors
    (reference: src/Models.py:107-274)."""

    @staticmethod
    def _delete_nanmodels(models):
        """Keep only rows that contain at least one finite entry
        (reference: src/Models.py:115-125)."""
        models = np.asarray(models, float)
        keep = np.isfinite(models).any(axis=1)
        return models[keep].copy()

    @staticmethod
    def _replace_zvnoi_h(models):
        """Rewrite each row's depth half from nuclei depths to layer
        thicknesses (reference: src/Models.py:127-140)."""
        out = ModelMatrix._delete_nanmodels(models)
        for row in out:
            _, vs, h = Model.get_vp_vs_h(row)
            row[:vs.size] = vs
            row[vs.size:2 * vs.size] = h
        return out

    @staticmethod
    def _interp_matrix(models, dep_int):
        """Vectorized resampling of all models onto ``dep_int``.

        Works on the whole matrix: per row, layer bottoms come from
        cumulative midpoint thicknesses; vs at a queried depth is the
        vs of the first layer whose bottom lies at/below it
        (identical to interpolating the step polyline).
        """
        models = ModelMatrix._delete_nanmodels(models)
        m, width = models.shape
        half = width // 2
        vs_all = models[:, :half]
        z_all = models[:, half:]
        valid = np.isfinite(vs_all)
        n = valid.sum(axis=1)

        out = np.empty((m, np.size(dep_int)))
        for i in range(m):
            vs = vs_all[i, :n[i]]
            z = z_all[i, :n[i]]
            mids = 0.5 * (z[:-1] + z[1:])
            # searchsorted: index of the layer containing each depth
            idx = np.searchsorted(mids, dep_int, side='right')
            out[i] = vs[idx]
        return out

    @staticmethod
    def get_interpmodels(models, dep_int):
        """(vs, depth) matrices of all models on the common grid
        (reference: src/Models.py:142-157)."""
        vss = ModelMatrix._interp_matrix(models, dep_int)
        deps = np.broadcast_to(dep_int, vss.shape).copy()
        return vss, deps

    @staticmethod
    def get_singlemodels(models, dep_int=None, misfits=None):
        """Posterior summary profiles — mean / median / minmax /
        std-envelope / histogram mode (/ best-misfit)
        (reference: src/Models.py:159-225)."""
        if dep_int is None:
            dep_int = np.linspace(0, 100, 201)
        vss, deps = ModelMatrix.get_interpmodels(models, dep_int)

        mean = vss.mean(axis=0)
        std = vss.std(axis=0)
        summary = {
            'mean': (mean, dep_int),
            'median': (np.median(vss, axis=0), dep_int),
            'minmax': (np.vstack((vss.min(axis=0), vss.max(axis=0))),
                       dep_int),
            'stdminmax': (np.vstack((mean - std, mean + std)), dep_int),
        }

        # mode profile from the 2-D (vs, depth) histogram, vs bins of
        # 0.025 km/s (reference: src/Models.py:197-215)
        span = vss.max() - vss.min()
        nbins = max(int(span / 0.025), 1)
        hist, vs_edges, dep_edges = np.histogram2d(
            vss.ravel(), deps.ravel(), bins=(nbins, dep_int))
        vs_centers = 0.5 * (vs_edges[:-1] + vs_edges[1:])
        dep_centers = 0.5 * (dep_edges[:-1] + dep_edges[1:])
        summary['mode'] = (vs_centers[hist.argmax(axis=0)], dep_centers)

        if misfits is not None:
            _, vs_b, dep_b = Model.get_stepmodel(
                np.asarray(models)[np.argmin(misfits)])
            summary['minmisfit'] = (vs_b, dep_b)
        return summary

    @staticmethod
    def get_weightedvalues(weights, models=None, likes=None,
                           misfits=None, noiseparams=None, vpvs=None):
        """Expand thinned chains by acceptance-wait weights
        (reference: src/Models.py:227-274)."""
        weights = np.asarray(weights, int)

        def expand(arr):
            if arr is None:
                return None
            arr = np.asarray(arr)
            return np.repeat(arr, weights,
                             axis=0 if arr.ndim > 1 else None)

        return (expand(models), expand(likes), expand(misfits),
                expand(noiseparams), expand(vpvs))
