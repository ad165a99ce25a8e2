from . import distributed, pooled
from .freerun_obs_sharded import ObsShardedFreeRunCGGibbs
from .freerun_sharded import ShardedFreeRunCGGibbs
from .mesh import CHAIN_AXIS, OBS_AXIS, make_mesh
from .sharded_engine import ShardedCGGibbs
