from jodalrob_twotower_tpu.utils.profiling import (  # noqa: F401
    MetricsLogger,
    StepTimer,
    device_flops_estimate,
    trace,
)
