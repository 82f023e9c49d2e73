"""sde_sampler_tpu: TPU-native (JAX/XLA/Pallas) framework for sampling from
unnormalized densities via learned controlled SDEs.

Re-designed from scratch for TPU hardware with the capability surface of the
reference `sde_sampler` research code (DIS, PIS, DDS, bridges; KL and
log-variance trajectory losses; log-Z / ESS / Sinkhorn evaluation).

Key design differences from the reference (CUDA/torch) implementation:
- Euler-Maruyama rollouts are single jit-compiled `jax.lax.scan` loops with
  the control network fused into the scan body (reference: Python for-loops,
  see /root/reference/sde_sampler/losses/oc.py:176).
- Randomness is explicit (`jax.random` keys threaded through every rollout).
- The trajectory batch is sharded over a `jax.sharding.Mesh` data axis; loss
  reductions ride a single psum (reference is single-device only).
- The pykeops Sinkhorn kernel is replaced by a chunked log-domain Sinkhorn
  with a Pallas TPU kernel for the streamed pairwise logsumexp.
"""

__version__ = "0.1.0"
