from ripor_tpu.models.config import (
    RiporConfig,
    T5Config,
    named_t5,
    ripor_base,
    ripor_small,
    t5_base,
    t5_large,
    t5_small,
)
from ripor_tpu.models.ripor import (
    RiporModel,
    init_ripor_params,
    install_codebooks,
    install_start_embed,
)

__all__ = [
    "RiporConfig", "T5Config", "named_t5", "ripor_base", "ripor_small",
    "t5_base", "t5_large", "t5_small",
    "RiporModel", "init_ripor_params", "install_codebooks", "install_start_embed",
]
