"""Command-line entry points mirroring the reference's CLI surface.

Reference commands (README.md) -> TPU-native equivalents:
* ``python Style_3DGS/AdaIN/run_depth.py`` -> ``python -m aip_tpu.cli.run_depth``
* ``python Style_3DGS/run_semantic_segm.py`` -> ``python -m aip_tpu.cli.run_semantic_segm``
* ``python Style_3DGS/run_3dgs.py`` -> ``python -m aip_tpu.cli.run_3dgs``
* ``python test_video_st.py`` -> ``python -m aip_tpu.cli.run_video``
* ``pixel_art.utils.vectorization`` -> ``python -m aip_tpu.cli.run_vectorize``
* pixelize / NST / mixing -> ``python -m aip_tpu.cli.run_pixelize`` /
  ``run_nst``
"""
