"""fgdm_tpu — a TPU-native factor-graph diffusion framework (JAX/Pallas).

Re-implements the capabilities of the FG-DM reference (text→condition→image
factor-chain latent diffusion) as an idiomatic JAX/XLA stack: flax modules,
lax.scan samplers, pjit-sharded training, orbax checkpoints.
"""

__version__ = "0.1.0"
