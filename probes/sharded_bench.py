"""Bench-scale sharded-pair validation (the new bench secondary config)."""
import numpy as np
import bench
mvps, err, frac = bench.sharded_pair_tpu()
print(f"sharded_pair: {mvps:.0f} MVPS err {err:.2e} frac {frac:.3f}")
