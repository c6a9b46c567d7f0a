"""Utilities: plotting, profiling, torch checkpoint interop."""

from . import plot, profiling, torch_interop  # noqa: F401
from .profiling import StepTimer, ThroughputMeter, sync, trace  # noqa: F401
from .torch_interop import (  # noqa: F401
    export_torch_state_dict,
    import_torch_state_dict,
    load_torch_checkpoint,
)

__all__ = [
    "plot",
    "profiling",
    "torch_interop",
    "StepTimer",
    "ThroughputMeter",
    "sync",
    "trace",
    "import_torch_state_dict",
    "export_torch_state_dict",
    "load_torch_checkpoint",
]
