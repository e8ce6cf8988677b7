"""ct-diffusionmodelbench-tpu: TPU-native diffusion-LM benchmark & finetuning framework.

A from-scratch JAX/XLA/Pallas/pjit rebuild of the capabilities of
``romirthedev/ct-diffusionmodelbench`` (see /root/repo/SURVEY.md for the full
structural analysis of the reference):

- config-driven masked-diffusion transformer family (LLaDA-8B dense,
  LLaDA-MoE, Dream-Coder, DiffuCoder) with bidirectional cache-less attention
  backed by a Pallas flash-attention kernel,
- the iterative denoising sampler (low-confidence remasking, semi-AR block
  advance, CFG, Gumbel temperature sampling) as one jitted fused on-device
  loop,
- MoE expert FFNs as a Pallas grouped-GEMM,
- pjit/NamedSharding data/tensor parallelism over a device mesh,
- the masked-diffusion SFT training stack, and
- the eval harness (MathOlympiadBench sweeps, MiniF2F pass@1 with real
  `lake build` Lean verification, cross-model analyzer).
"""

__version__ = "0.1.0"
