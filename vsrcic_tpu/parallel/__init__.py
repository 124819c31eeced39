from vsrcic_tpu.parallel.mesh import (  # noqa: F401
    data_sharding, make_mesh, replicate, replicated, shard_batch)
from vsrcic_tpu.parallel.sharded import (  # noqa: F401
    sharded_beam_search_v, sharded_greedy)
