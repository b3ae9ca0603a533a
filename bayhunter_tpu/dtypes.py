"""Dtype policy for the TPU-native build.

TPUs execute float32 natively on the VPU; float64 is software-emulated
and slow.  All numerical kernels therefore take an explicit ``dtype``
and default to float32 on accelerator backends.  CPU-based tests enable
x64 and pass float64 to validate against golden data at tight
tolerance.
"""

import jax
import jax.numpy as jnp


def default_real_dtype():
    if jax.config.jax_enable_x64 and jax.default_backend() == 'cpu':
        return jnp.float64
    return jnp.float32


def complex_dtype_for(real_dtype):
    return jnp.complex128 if jnp.dtype(real_dtype) == jnp.float64 \
        else jnp.complex64


def finfo_eps(dtype):
    return float(jnp.finfo(dtype).eps)
