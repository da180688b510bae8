"""Training-data pipeline operators: dedup, similarity search, text analysis,
multimodal plumbing. All are Dataset-level stages built on map_batches /
groupby with vectorized kernels."""
