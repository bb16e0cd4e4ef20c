from pffdtd_tpu.parallel.sharded_engine import ShardedEngine, make_mesh  # noqa: F401
from pffdtd_tpu.parallel.sharded_pallas import (  # noqa: F401
    ShardedPairEngine, ShardedPallasEngine, make_sharded_engine)
