"""Pallas TPU kernels for the hot ops (renderer; pure-JAX fallbacks live in
sim/ and models/)."""
