"""Maintenance / measurement scripts (import-able for bench.py)."""
