"""Batched TPU-native compute kernels: dispersion, reflectivity,
likelihood, model parametrization."""

from bayhunter_tpu.ops import (likelihood, rf, rf_pd,  # noqa: F401
                               swd, voronoi)
