"""daala_tpu: a TPU-native video codec with the capabilities of Daala.

A from-scratch JAX/XLA/Pallas implementation of the Daala coding tools
(lapped transforms, PVQ, Haar DC, CfL, OBMC, directional deringing, and a
multisymbol range coder), designed for batched whole-frame execution on
TPU rather than the reference's per-block scalar C loops.

Reference behavior spec: /root/reference (KyleSiefring/daala).
"""

__version__ = "0.1.0"
