from .mesh import make_mesh, factor3, grid_sharding, pad_to_multiple, AXIS_NAMES
from .halo import halo_exchange, halo_exchange_axis, crop
from .sharded import ShardedLevelSet, dryrun, reinit_step_local, minmax_step_local
