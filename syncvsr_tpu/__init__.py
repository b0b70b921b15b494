"""syncvsr_tpu — a TPU-native visual speech recognition framework.

A from-scratch JAX/XLA/Flax/Pallas rebuild of the capabilities of
KAIST-AILab/SyncVSR (frame-level crossmodal supervision with quantized audio
tokens): word-level lipreading (LRW video + landmark inputs; Transformer and
DC-TCN families) and sentence-level VSR (LRS2/LRS3; Conformer encoder, hybrid
CTC + attention training, jittable beam-search decoding).

Design: single Flax model zoo + one jit/Mesh training engine; augmentation runs
inside the compiled step; data loaders emit device-ready arrays; parallelism is
expressed with `jax.sharding.NamedSharding` over a device mesh (XLA inserts the
ICI/DCN collectives).
"""

__version__ = "0.1.0"
