"""General utilities (reference `Style_3DGS/utils/{general,system}_utils.py`)."""

from aip_tpu.utils.system import safe_state, mkdir_p, search_for_max_iteration
