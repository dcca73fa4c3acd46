"""tvretrieval_tpu: a TPU-native (JAX/XLA/Pallas) framework for video corpus
moment retrieval with the capabilities of jayleicn/TVRetrieval.

Subpackages
-----------
- ``evaluation``: standalone VCMR/SVMR/VR metrics, temporal NMS, submission IO
  (capability parity with reference ``standalone_eval/eval.py``).
- ``data``: annotation + feature loading, fixed-shape padding, host->HBM
  prefetching (replaces the reference's per-model ``*_dataset.py`` + DataLoader).
- ``models``: XML and baselines (MEE / CAL / ExCL) as flax modules.
- ``ops``: masking, span scoring, ConvSE and fused Pallas kernels.
- ``parallel``: device mesh + sharding helpers (data-parallel training,
  corpus-sharded inference).
- ``training``: BertAdam-in-optax, train loops, checkpointing.
- ``retrieval``: whole-corpus VCMR/SVMR/VR inference engine.
"""

__version__ = "0.1.0"
