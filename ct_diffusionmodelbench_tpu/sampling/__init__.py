from ct_diffusionmodelbench_tpu.sampling.schedule import get_num_transfer_tokens
from ct_diffusionmodelbench_tpu.sampling.llada import (
    LLaDASamplerConfig,
    make_llada_sampler,
    llada_generate,
)
from ct_diffusionmodelbench_tpu.sampling.dream import (
    DreamSamplerConfig,
    make_dream_sampler,
    dream_generate,
)
