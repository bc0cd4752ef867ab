"""Stylized 3D Gaussian Splatting vertical (Compact-3DGS + style embedding).

TPU-native rebuild of the reference's `Style_3DGS/` tree:
* scene IO: COLMAP / Blender readers, cameras (host-side numpy);
* model: fixed-capacity Gaussian parameter pytree, neural color field
  (multires hash grid + style-conditioned MLP -> SH coefficients);
* rendering: differentiable tile rasterizer in pure JAX (chunked per-tile
  top-K + cumulative-transmittance compositing) — the CUDA
  diff-gaussian-rasterization equivalent;
* training: two-phase (photometric then AdaIN-style-guided) optimization;
* compression: residual VQ, 8-bit post-quant, Huffman, Morton ordering.
"""
