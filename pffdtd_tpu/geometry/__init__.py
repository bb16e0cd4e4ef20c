from pffdtd_tpu.geometry.tris import TriPre, tris_precompute  # noqa: F401
from pffdtd_tpu.geometry.predicates import (  # noqa: F401
    tri_ray_intersect,
    tri_box_intersect,
)
from pffdtd_tpu.geometry.room import RoomGeo  # noqa: F401
from pffdtd_tpu.geometry.box import Box  # noqa: F401
