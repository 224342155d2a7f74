"""Shared utilities (timing, logging, hexdump helpers)."""
