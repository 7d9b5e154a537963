"""plotpointe_tpu — TPU-native graph-attention recommender engine.

A from-scratch JAX/XLA/Pallas/pjit framework with the capabilities of the
reference `Axionis47/PlotPointe-GAT-Recommendation` system (multimodal item
embeddings -> fusion MLP -> GAT / LightGCN over user-item + item-item graphs
-> BPR/BCE training -> sampled Recall/NDCG eval -> item-embedding export ->
top-K retrieval serving), redesigned TPU-first:

- Static-shape, dst-sorted edge layouts that XLA/Pallas can tile.
- Pallas kernels for the irregular hot paths (segment-softmax attention,
  CSR SpMM, blocked cosine-kNN, MIPS top-K) with jnp golden references.
- shard_map/pjit parallelism over a named device mesh (row-sharded embedding
  tables, data-parallel towers) instead of the reference's one-GPU jobs.

Layer map mirrors SURVEY.md section 7's build plan.
"""

__version__ = "0.1.0"
