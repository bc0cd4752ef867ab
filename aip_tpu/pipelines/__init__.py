"""End-to-end user-facing pipelines."""

from aip_tpu.pipelines.adain_infer import (
    stylize_simple,
    stylize_depth,
    adain_inference,
    get_style_embeddings,
)
