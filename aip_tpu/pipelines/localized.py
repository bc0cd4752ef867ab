"""Regional (semantic) style transfer: stylize background, harmonize foreground.

Parity with reference `Style_3DGS/localized_style_transfer.py:191-245`
``run_localized_style_transfer``:
1. background mask from segmentation (class-0 prob > 0.5);
2. AdaIN-stylize *only the background* (mask composite, alpha=1);
3. harmonize the untouched foreground's colors to the stylized background via
   Reinhard-lab PCA(1) + CDF matching;
4. composite and save ``localized_style_transfer_result.jpg``.

The harmonization step runs as one jitted program (aip_tpu.ops.color);
segmentation is pluggable (aip_tpu.models.segmenter).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import jax.numpy as jnp

from aip_tpu.models.segmenter import extract_background_mask
from aip_tpu.ops.color import harmonize_foreground
from aip_tpu.pipelines.adain_infer import adain_inference, _to_array, save_image


def run_localized_style_transfer(
    content_img_path,
    style_img_path,
    output_path: str = "output",
    file_name: str = "test",
    use_depth: bool = False,
    depth_offset: float = 0.5,
    depth_prominence: float = 20.0,
    segment_fn=None,
) -> str:
    """Returns the saved result path (reference :191-245)."""
    content_np = _to_array(content_img_path)

    if segment_fn is None:
        segment_fn = extract_background_mask
    background_mask = np.asarray(segment_fn(content_np))  # [H, W] {0,1}

    stylized_path = adain_inference(
        content_img=content_img_path,
        style_img=style_img_path,
        content_mask=background_mask[None],
        output=output_path,
        file_name=file_name,
        use_depth=use_depth,
        depth_offset=depth_offset,
        depth_prominence=depth_prominence,
        alpha=1.0,
    )
    stylized_np = _to_array(stylized_path)

    # Stylized output is at the working resolution; bring it to mask size
    # (reference :222-229, nearest).
    if stylized_np.shape[:2] != background_mask.shape:
        from aip_tpu.ops.image import resize_nearest

        stylized_np = np.asarray(
            resize_nearest(jnp.asarray(stylized_np), background_mask.shape)
        )
    if content_np.shape[:2] != background_mask.shape:
        raise ValueError("mask/content shape mismatch")

    bg = background_mask.astype(np.float32)
    fg = 1.0 - bg
    foreground_np = content_np * fg[..., None]
    background_np = stylized_np * bg[..., None]

    adjusted_fg = np.asarray(
        harmonize_foreground(
            jnp.asarray(foreground_np),
            jnp.asarray(background_np),
            # Non-black pixels only, as in reference :134-138.
            jnp.asarray((foreground_np.sum(-1) > 0) & (fg > 0)),
            jnp.asarray((background_np.sum(-1) > 0) & (bg > 0)),
        )
    )

    combined = adjusted_fg * fg[..., None] + background_np
    save_path = Path(output_path) / "localized_style_transfer_result.jpg"
    save_image(combined, save_path)
    return str(save_path)
