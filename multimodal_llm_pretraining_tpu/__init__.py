"""TPU-native training-method search and pretraining framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
``tttyuntian/multimodal_llm_pretraining`` (the academic-pretraining harness,
arXiv:2410.23261): given a TPU topology and a model, enumerate efficient
training methods (precision, remat, ZeRO/FSDP-style sharding, host offload,
micro-batch x grad-accumulation), empirically time each valid combination,
and project total training days -- then actually pretrain with the optimal
configuration.

Unlike the reference (a thin layer over HuggingFace Trainer + DeepSpeed +
torch FSDP; see /root/reference/src/train.py), everything here compiles into
a single jitted ``train_step`` under GSPMD on an explicit ``jax.sharding.Mesh``:

- free-lunch      -> bf16 compute + Pallas kernels + persistent jit cache
- act checkpoint  -> ``jax.checkpoint`` (remat) policies
- zero_1/2/3      -> sharding specs for optimizer state / gradients / params
- fsdp_*          -> the same axis policies (shard_grad_op == zero_2 etc.)
- hybrid_shard    -> 2D mesh: shard over ICI axis, replicate over DCN axis
- offloading      -> optimizer state placed in host memory (pinned_host)
- grad accum      -> ``jax.lax.scan`` over microbatches inside the step
"""

__version__ = "0.1.0"
