"""se3diff-tpu: a TPU-native SE(3) diffusion framework (JAX/XLA/Pallas/pjit).

From-scratch re-design of the capabilities of the reference ddrichman/SE3Diff
stack (BioEmu + bioemu-benchmarks + the se3diff IGSO(3) prototype). See
SURVEY.md for the structural analysis this build follows.
"""

__version__ = "0.1.0"
