"""End-to-end pipeline on the reference project's real CTK church model.

Exercises: JSON scene import, material packaging from the bundled DEF files,
voxelization of a real 7k-triangle scene, both engines, machine-precision
energy balance, and post-processing to a RIR.  Skipped when the reference
data mount is absent.
"""

from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference/data")

pytestmark = pytest.mark.skipif(not REF.exists(),
                                reason="reference data not mounted")

CTK_MATS = {
    "AcousticPanel": "ctk_acoustic_panel.h5",
    "Altar": "ctk_altar.h5",
    "Carpet": "ctk_carpet.h5",
    "Ceiling": "ctk_ceiling.h5",
    "Glass": "ctk_window.h5",
    "PlushChair": "ctk_chair.h5",
    "Tile": "ctk_tile.h5",
    "Walls": "ctk_walls.h5",
}


@pytest.fixture(scope="module")
def ctk_folder(tmp_path_factory):
    from pffdtd_tpu.scene_setup import sim_setup

    folder = tmp_path_factory.mktemp("ctk")
    sim_setup(
        model_json_file=str(REF / "models/CTK_Church/model_export.json"),
        mat_folder=str(REF / "materials"),
        mat_files_dict=CTK_MATS,
        duration=0.04,
        insig_type="hann10",
        fmax=200.0, PPW=7.5,
        save_folder=str(folder),
    )
    return folder


def test_ctk_energy_balance_and_engines(ctk_folder):
    from pffdtd_tpu.engine.jax_engine import JaxEngine
    from pffdtd_tpu.engine.numpy_ref import NumpyEngine

    eng = JaxEngine(str(ctk_folder), dtype=np.float64, energy_on=True)
    eng.run(verbose=False)
    assert np.abs(eng.energy_balance()).max() < 1e-9
    assert eng.E_lost[-1] > 0  # the 8 fitted materials absorb

    o = NumpyEngine(str(ctk_folder))
    o.run_all()
    err = np.abs(eng.u_out - o.u_out).max() / np.abs(o.u_out).max()
    assert err < 1e-11
    eng.save_outputs(str(ctk_folder))


def test_ctk_post_processing(ctk_folder):
    import h5py

    from pffdtd_tpu.engine.jax_engine import JaxEngine
    from pffdtd_tpu.analysis.process_outputs import ProcessOutputs

    if not (ctk_folder / "sim_outs.h5").exists():
        eng = JaxEngine(str(ctk_folder), dtype=np.float64)
        eng.run(verbose=False)
        eng.save_outputs(str(ctk_folder))

    po = ProcessOutputs(ctk_folder)
    po.initial_process(fcut=10.0)
    po.resample(48e3)
    po.apply_lowpass(fcut=200.0, N_order=8, symmetric=True)
    po.apply_ola_filter()
    po.save_h5()
    po.save_wav()

    with h5py.File(ctk_folder / "sim_outs_processed.h5") as f:
        r = f["r_out_f"][...]
        assert f["Fs_f"][()] == 48e3
    assert np.isfinite(r).all() and np.abs(r).max() > 0
    assert (ctk_folder / "R001_out_normalised.wav").exists()
