from mastermetastyletransfer_tpu.ops.windows import (
    relative_position_index,
    relative_position_bias,
    shift_attention_mask,
    window_partition,
    window_merge,
)
from mastermetastyletransfer_tpu.ops.norm import instance_norm, layer_norm
from mastermetastyletransfer_tpu.ops.mlp import (
    init_linear, linear, init_mlp, mlp_apply, stochastic_depth,
)
from mastermetastyletransfer_tpu.ops.attention import (
    init_window_attention,
    shifted_window_attention,
    init_dual_value_window_attention,
    shifted_window_attention_dual_value,
)
from mastermetastyletransfer_tpu.ops.precision import (
    applies_matmul_mode, kdot, matmul_mode,
)
