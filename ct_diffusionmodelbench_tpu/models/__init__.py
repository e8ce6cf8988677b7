from ct_diffusionmodelbench_tpu.models.config import (
    ModelConfig,
    PRESETS,
    get_config,
    config_from_hf,
)
from ct_diffusionmodelbench_tpu.models.transformer import (
    init_params,
    forward,
    make_forward_fn,
)
from ct_diffusionmodelbench_tpu.models.block_cache import make_cached_fns
