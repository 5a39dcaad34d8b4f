"""dlsg_tpu — TPU-native JAX framework for Discriminative Latent Semantic Graph
video captioning (capability parity with baiyang4/D-LSG-Video-Caption, ACM MM 2021).

The reference implementation is a PyTorch/NCCL/CUDA codebase; this package is a
ground-up redesign for TPU hardware:

- compute path: jax / XLA / pallas, static shapes, `lax.scan` sequence loops
- parallelism: SPMD over a `jax.sharding.Mesh` (data + model axes), XLA collectives
- metrics: pure-Python + native C++ re-implementations of the reference's
  coco-caption stack (which shells out to Java jars)

Subpackages
-----------
- ``config``    : dataclass config with reference flag parity (utils/opt.py)
- ``vocab``     : Vocabulary (utils/utils.py:12-43) + reference-pkl importer
- ``models``    : generator (CapGnnModel), discriminator (DiscV2), encoders, decoder
- ``ops``       : beam search, LSTM scans, losses, pallas kernels
- ``data``      : HDF5/pickle dataset readers, host batcher, synthetic data
- ``metrics``   : BLEU / CIDEr / ROUGE-L / METEOR + PTB-style tokenizer
- ``train``     : trainers (GAN + CE baseline), optimizers, schedules, GAN lambda
- ``evaluation``: batched decode + scoring pipeline, result tracking
- ``parallel``  : mesh / sharding helpers
- ``serve``     : load-once Captioner (bucketed batches, warmup, fast beam)
- ``server``    : stdlib HTTP captioning service (/caption, /healthz, /metrics)
- ``bundle``    : single-file deployment bundles (params + vocab + config)
"""

__version__ = "0.1.0"
