"""Device-mesh utilities for the chain axis.

Chains (and tomography cells) are embarrassingly parallel — the only
sharding the framework needs is a 1-D mesh over the chain batch axis.
XLA inserts no collectives for the sampling itself; the posterior
gather at the end is a host fetch (or one all_gather when consumed
on-device).  This replaces the reference's process-pool + shared-memory
model (reference: src/mcmcOptimizer.py:202-267, SURVEY.md §2.3).
"""

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def chain_sharding(devices=None, axis='chains'):
    """A NamedSharding that splits the leading (chain) axis over all
    given devices (default: every visible device)."""
    if devices is None:
        devices = jax.devices()
    mesh = Mesh(np.asarray(devices), (axis,))
    return NamedSharding(mesh, P(axis))


def pad_chains(nchains, devices=None):
    """Round a chain count up to a multiple of the device count."""
    ndev = len(devices) if devices is not None else len(jax.devices())
    return int(np.ceil(nchains / ndev) * ndev)


def shard_states(states, devices=None):
    """Place a batched ChainState pytree onto the chain mesh.  The
    leading axis of every leaf must be divisible by the device count
    (use :func:`pad_chains` when drawing the batch)."""
    return jax.device_put(states, chain_sharding(devices))
