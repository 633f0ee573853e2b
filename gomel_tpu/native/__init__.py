"""C++ sources for the native helpers (FLAC decoder, PNG filters).

Shipping the sources inside the package (package-data) lets pip-installed
builds compile them on first use exactly like a dev checkout —
io/_native.py builds with g++ at import time and falls back to the pure
Python implementations (with a one-time warning) when no toolchain exists.
"""
