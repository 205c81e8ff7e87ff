"""I/O subsystem: COLMAP sparse-model codecs (Python + native fast path)."""
