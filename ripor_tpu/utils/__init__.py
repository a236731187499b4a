from ripor_tpu.utils.observability import (
    MetricsLogger,
    StepTimer,
    estimate_train_flops_per_token,
    profile_trace,
)

__all__ = ["MetricsLogger", "StepTimer", "estimate_train_flops_per_token",
           "profile_trace"]
