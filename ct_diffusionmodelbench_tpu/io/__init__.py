from ct_diffusionmodelbench_tpu.io.safetensors_io import (
    load_safetensors,
    save_safetensors,
)
from ct_diffusionmodelbench_tpu.io.checkpoint import (
    load_checkpoint,
    save_checkpoint,
)
from ct_diffusionmodelbench_tpu.io.tokenizer import (
    Tokenizer,
    resolve_mask_id,
)
