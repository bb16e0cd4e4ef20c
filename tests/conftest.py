"""Test configuration: force CPU backend with 8 virtual devices and fp64.

Multi-device sharding tests run on a virtual CPU mesh (the reference project's
multi-GPU paths are likewise exercised with CUDA_VISIBLE_DEVICES subsets —
SURVEY.md §4.7); fp64 is required for the machine-precision energy oracle.
"""

import os

# force CPU even if the environment preselects a TPU platform (JAX_PLATFORMS
# may be preset to e.g. 'axon'); tests need fp64 + 8 virtual devices
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_ENABLE_X64"] = "1"

import jax  # noqa: E402

# the axon TPU plugin overrides JAX_PLATFORMS; force CPU via config too
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from pffdtd_tpu.geometry.room import RoomGeo  # noqa: E402


def make_shoebox(Lx=2.0, Ly=3.0, Lz=2.5, mats=None, sides=None):
    """A 12-triangle box room. mats: list of 6 material names (per face pair
    order -x,+x,-y,+y,-z,+z) or None for all-rigid.  Normals point inward is
    irrelevant; sides flag picks the live side (1=back, 2=front, 3=both)."""
    v = np.array([[0, 0, 0], [Lx, 0, 0], [0, Ly, 0], [Lx, Ly, 0],
                  [0, 0, Lz], [Lx, 0, Lz], [0, Ly, Lz], [Lx, Ly, Lz]],
                 np.float64)
    # two triangles per face, outward-oriented normals
    faces = {
        "xm": [(0, 4, 6), (0, 6, 2)],   # x=0,  normal -x
        "xp": [(1, 3, 7), (1, 7, 5)],   # x=Lx, normal +x
        "ym": [(0, 1, 5), (0, 5, 4)],   # y=0,  normal -y
        "yp": [(2, 6, 7), (2, 7, 3)],   # y=Ly, normal +y
        "zm": [(0, 2, 3), (0, 3, 1)],   # z=0,  normal -z
        "zp": [(4, 5, 7), (4, 7, 6)],   # z=Lz, normal +z
    }
    tris = np.array([t for key in faces for t in faces[key]], np.int64)

    if mats is None:
        mat_names = ["_RIGID"]
        mat_ind = np.full(12, -1, np.int8)
        mat_side = np.zeros(12, np.int8)
    else:
        names = sorted(set(m for m in mats if m != "_RIGID"))
        mat_names = names + (["_RIGID"] if "_RIGID" in mats else [])
        lookup = {m: i for i, m in enumerate(names)}
        lookup["_RIGID"] = -1
        mat_ind = np.array([lookup[mats[i // 2]] for i in range(12)], np.int8)
        if sides is None:
            sides = [1] * 6  # back side (interior side for outward normals)
        mat_side = np.array([sides[i // 2] if mat_ind[i] >= 0 else 0
                             for i in range(12)], np.int8)

    Sxyz = np.array([[0.55 * Lx, 0.6 * Ly, 0.5 * Lz]])
    Rxyz = np.array([[0.3 * Lx, 0.3 * Ly, 0.4 * Lz],
                     [0.7 * Lx, 0.45 * Ly, 0.6 * Lz]])
    return RoomGeo.from_arrays(v, tris, mat_ind, mat_side, mat_names, Sxyz, Rxyz)


@pytest.fixture
def shoebox():
    return make_shoebox()
