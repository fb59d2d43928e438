"""Stub `pytorch_fid` package (see inception.py)."""
