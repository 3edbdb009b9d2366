"""Pallas TPU kernels: the device layer of radx_tpu.

The reference's device layer is GLSL compute shaders dispatched per digit
pass (counting/partition/scattering, /root/reference/shaders-sdk/).  Here the
device layer is Pallas/Mosaic kernels:

  * bitonic.py   — flagship sort: chunk-local bitonic sort + cross-chunk
                   bitonic merge network.  All data movement is static
                   (roll / block-pair exchange) — the TPU-native substitute
                   for RadX's subgroup-scatter, which has no TPU equivalent.
  * radix.py     — per-tile digit histogram / stable rank+destination
                   kernels (counting.comp / scattering.comp analogues);
                   feeds the scatter strategies, relational operators and
                   the distributed MSD shuffle.
"""
