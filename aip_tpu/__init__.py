"""applied-image-processing-tpu: a TPU-native (JAX/XLA/Pallas) rebuild of the
Applied-Image-Processing style-transfer suite.

Capability parity target: Ayushkuruvilla/Applied-Image-Processing (see SURVEY.md).
Architecture is TPU-first: NHWC layouts, bfloat16 matmuls on the MXU, fused
XLA graphs, Pallas kernels for the hot ops, and jax.sharding meshes for
multi-chip scale-out.

Subpackages
-----------
ops        pure-array kernels (AdaIN stats, color spaces, resize, SH, flow, ...)
models     VGG encoder / AdaIN decoder / hashgrid+MLP color field / depth & seg nets
pipelines  end-to-end user-facing pipelines (2D stylization, video, pixel-art, NST)
gs         3D Gaussian Splatting vertical (scene IO, model, rasterizer, training)
parallel   mesh construction, shardings, pjit train/infer steps
data       host-side IO (images, video frames, COLMAP)
cli        command-line entry points mirroring the reference's CLI surface
"""

__version__ = "0.1.0"
