"""Utilities: ID generation, binary codecs, crypto, logging."""
