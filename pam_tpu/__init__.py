"""pam_tpu: a TPU-native cloud-resolving-model framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
E3SM-Project/PAM (the Portable Atmosphere Model used for E3SM-MMF
superparameterization): batched ensembles of limited-area nonhydrostatic
compressible atmosphere solvers with coupled column physics, built for
jit/vmap/pjit over TPU device meshes.
"""

__version__ = "0.1.0"
