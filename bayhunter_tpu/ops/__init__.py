"""Batched TPU-native compute kernels: dispersion, reflectivity,
likelihood, model parametrization."""

from bayhunter_tpu.ops import likelihood, rf, swd, voronoi  # noqa: F401
