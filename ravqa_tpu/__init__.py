"""ravqa_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
retrieval-augmented visual question answering.

Capabilities mirror LinWeizheDragon/Retrieval-Augmented-Visual-Question-Answering
(FLMR / PreFLMR late-interaction multimodal retrieval + RAVQA / RAVQA-v2
retrieve-then-generate), re-designed TPU-first:

- per-token late-interaction (MaxSim) scoring as fused Pallas matmul+max-reduce
  kernels over an HBM-resident token-embedding index sharded across ICI
  (replacing the reference's vendored ColBERT + FAISS + C++/CUDA extensions);
- encoders (BERT text, CLIP-ViT vision, MLP mapping network) as Flax modules
  compiled by XLA;
- one SPMD program under jax.sharding.Mesh + jit for training, validation-time
  index builds, search, and generation (replacing Lightning DDP + mp-spawn
  launchers + NCCL);
- a DAG data pipeline with node-level caching (replacing runway_for_ml).
"""

__version__ = "0.1.0"
