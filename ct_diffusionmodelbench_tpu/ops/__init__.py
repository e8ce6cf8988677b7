from ct_diffusionmodelbench_tpu.ops.attention import attention
from ct_diffusionmodelbench_tpu.ops.sampling_ops import (
    gumbel_rescore,
    rank_topk_mask,
    token_confidence,
)
