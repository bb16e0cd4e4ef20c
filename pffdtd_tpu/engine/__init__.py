from pffdtd_tpu.engine.coeffs import SchemeCoeffs, MatCoeffs  # noqa: F401
from pffdtd_tpu.engine.numpy_ref import NumpyEngine  # noqa: F401
