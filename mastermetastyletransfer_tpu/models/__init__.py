from mastermetastyletransfer_tpu.models.style_transformer import (
    init_style_transformer, style_transformer_apply,
)
from mastermetastyletransfer_tpu.models.decoder import init_cnn_decoder, cnn_decoder_apply
from mastermetastyletransfer_tpu.models.swin import init_swin_backbone, swin_backbone_apply
from mastermetastyletransfer_tpu.models.master import (
    cast_params, encode_features, encode_style_stream, init_master_model,
    master_apply, make_stylize_fn, stylize_from_features,
    stylize_from_features_with_stream, stylize_with_style_stream,
)
