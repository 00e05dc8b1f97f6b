"""TPU-native monocular ceiling-vision SRUKF SLAM engine.

A brand-new JAX/XLA/Pallas implementation with the capabilities of the
reference C++ MFC application (junliu111/CV-MonoSLAM), re-designed for TPU:
fixed-capacity SoA state, batched sigma-point transforms, QR-Schur joint
measurement updates, Pallas kernels for matching, and SPMD sharding for
large maps (see SURVEY.md section 7).
"""

from .config import CameraConfig, SlamConfig

__version__ = "0.1.0"
__all__ = ["CameraConfig", "SlamConfig"]
