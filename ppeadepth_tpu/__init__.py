"""PPEA-Depth TPU: a TPU-native (JAX/XLA/Pallas) framework for progressive
parameter-efficient self-supervised monocular depth estimation.

Re-designed from scratch with the capabilities of YuejiangDong/PPEA-Depth
(AAAI 2024). The compute path is JAX + Flax + Pallas; data-parallel scaling
uses `jax.sharding` over a device mesh with XLA collectives (no NCCL/DDP).

Layout conventions (TPU-native, differing from the torch reference on purpose):
  - images/features are NHWC (channel-last) so 1x1 convs / channel MLPs map
    directly onto the MXU and adapters become `nn.Dense` on the last axis;
  - parameters are float32, compute optionally bfloat16;
  - batch-norm statistics live in an explicit `batch_stats` collection;
  - all randomness is explicit (jax PRNG keys threaded through train steps).
"""

__version__ = "0.1.0"
