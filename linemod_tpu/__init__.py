"""linemod_tpu — TPU-native LINE-MOD detection and 6-DOF pose estimation.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
aelmiger/LINE-MOD-Pipeline. See DESIGN.md for the architecture.
"""

__version__ = "0.1.0"
