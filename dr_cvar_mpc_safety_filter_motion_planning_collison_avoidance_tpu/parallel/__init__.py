from . import distributed
from . import mesh
from . import sample_parallel
from . import sweep
from .distributed import (initialize_distributed, make_multihost_mesh,
                          to_global_array)
from .mesh import make_mesh, data_sharding, shard_batch, replicated
from .sample_parallel import dr_cvar_g_sample_parallel
from .sweep import run_batch_sharded, sharded_halfspace_throughput
