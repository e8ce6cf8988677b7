from ct_diffusionmodelbench_tpu.utils.logging import log, log_timing
from ct_diffusionmodelbench_tpu.utils.jsonutil import to_jsonable
