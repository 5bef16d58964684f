from mastermetastyletransfer_tpu.losses.vgg import (
    init_vgg19_features, vgg19_features_apply, VGG19_LAYER_PLAN, VGG19_BN_LAYER_PLAN,
)
from mastermetastyletransfer_tpu.losses.loss import (
    content_loss, style_loss, similarity_loss, perceptual_loss, make_loss_fn,
)
