from ct_diffusionmodelbench_tpu.train.diffusion_loss import (
    forward_process,
    diffusion_sft_loss,
)
from ct_diffusionmodelbench_tpu.train.collator import DiffusionCollator
from ct_diffusionmodelbench_tpu.train.trainer import TrainConfig, Trainer
