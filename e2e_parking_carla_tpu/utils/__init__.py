"""Auxiliary subsystems: profiling, metric logging, host visualization."""
