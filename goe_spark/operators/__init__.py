"""Higher-level operators: dedup signatures, validation, similarity,
multimodal plumbing."""
