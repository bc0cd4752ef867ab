"""Neural network models (functional, pytree-parameterized, NHWC)."""

from aip_tpu.models.vgg import (
    VGG_LAYERS,
    init_vgg_params,
    vgg_encode,
    vgg_encode_with_intermediate,
)
from aip_tpu.models.decoder import (
    DECODER_LAYERS,
    init_decoder_params,
    decoder_apply,
)
