"""Offload planning: partition selection, chunking, metadata, pipeline."""
