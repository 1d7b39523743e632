"""latentrag-tpu: a TPU-native compressed-embedding RAG framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
``engares/latent-rag`` framework (see SURVEY.md): sentence embedding, latent
autoencoder compression (VAE/DAE/CAE), exact + sharded dense retrieval with a
fused distance/top-k kernel, sparse BM25 baseline, chunking, generation, and
full retrieval/generation evaluation.

Layout (functional core, host-side orchestration):
  utils/       config, logging, PRNG discipline, timing/stats, experiment sink
  ops/         device kernels: fused distance+top-k (Pallas + XLA), metrics ops
  parallel/    mesh construction, sharded corpus index, collective top-k merge
  models/      Flax modules: MiniLM sentence encoder, VAE/DAE/CAE autoencoders
  training/    Optax losses, jitted train steps, early stopping, checkpoints
  retrieval/   retriever surface: dense (exact/Pallas/sharded), BM25, embedder
  data/        host-side: chunkers, SQuAD pipeline, caches, batch iterators
  evaluation/  Recall@k/MRR/nDCG (jitted), BLEU/ROUGE-L + bootstrap, AE metrics
  generation/  RAG answer generation against OpenAI-compatible APIs
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    # Re-assert the user's explicit JAX_PLATFORMS choice. Some managed
    # environments (e.g. the axon TPU relay) install a sitecustomize that
    # force-pins jax.config.jax_platforms AFTER jax import, silently
    # overriding the documented env var — so `JAX_PLATFORMS=cpu python
    # main.py` would still dispatch to the remote TPU. Setting the config
    # from the env var here (the package imports before any device use)
    # restores standard JAX behavior; a no-op everywhere else.
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
