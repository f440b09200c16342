from fastervit_tpu.ops.windows import (ct_dewindow, ct_window,
                                       nearest_upsample_tokens,
                                       window_partition, window_reverse)
from fastervit_tpu.ops.attention import bias_attention, bias_attention_reference, set_default_impl
