from pffdtd_tpu.parallel.sharded_engine import ShardedEngine, make_mesh  # noqa: F401
