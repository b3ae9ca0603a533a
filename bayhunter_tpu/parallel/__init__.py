from bayhunter_tpu.parallel.tomo import TomoInversion  # noqa: F401
from bayhunter_tpu.parallel.mesh import (chain_sharding,  # noqa: F401
                                         shard_states)
