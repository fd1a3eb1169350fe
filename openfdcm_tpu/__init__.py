"""openfdcm_tpu: a TPU-native Fast Directional Chamfer Matching framework.

Re-implements the full capability surface of Innoptech/OpenFDCM (reference)
with a JAX/XLA/Pallas compute path designed for TPUs.
"""
__version__ = "0.1.0"
