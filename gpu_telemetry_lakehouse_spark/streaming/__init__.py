"""Structured Streaming tier (reference future work: README.md:574-584)."""
