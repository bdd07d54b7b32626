"""Diffusion math core: scheduling functions, preconditioners, noise
samplers, integrators and schedulers (the reference's L1 layer,
diffsci/models/karras/)."""

from diffsci_tpu.ops.scheduling import (
    SchedulingFunctions,
    EDMSchedulingFunctions,
    VPSchedulingFunctions,
    VESchedulingFunctions,
    name_to_scheduling_functions,
)
from diffsci_tpu.ops.preconditioners import (
    KarrasPreconditioner,
    EDMPreconditioner,
    VPPreconditioner,
    VEPreconditioner,
    SR3Preconditioner,
    NullPreconditioner,
)
from diffsci_tpu.ops.noise_samplers import (
    NoiseSampler,
    EDMNoiseSampler,
    VPNoiseSampler,
    VENoiseSampler,
    UniformNoiseSampler,
)
from diffsci_tpu.ops.integrators import (
    Integrator,
    EulerIntegrator,
    HeunIntegrator,
    EulerMaruyamaIntegrator,
    KarrasIntegrator,
    DPMSolverPlusPlus2M,
    name_to_integrator,
)
from diffsci_tpu.ops.schedulers import (
    Scheduler,
    EDMScheduler,
    VPScheduler,
    VEScheduler,
)
from diffsci_tpu.ops.parallel_sampling import (
    picard_propagate_backward,
)
from diffsci_tpu.ops.preprocessors import (
    EdgeDetectionPreprocessor,
    make_loss_preprocessor,
    smoothstep_window,
)

__all__ = [
    "SchedulingFunctions", "EDMSchedulingFunctions", "VPSchedulingFunctions",
    "VESchedulingFunctions", "name_to_scheduling_functions",
    "KarrasPreconditioner", "EDMPreconditioner", "VPPreconditioner",
    "VEPreconditioner", "SR3Preconditioner", "NullPreconditioner",
    "NoiseSampler", "EDMNoiseSampler", "VPNoiseSampler", "VENoiseSampler",
    "UniformNoiseSampler",
    "Integrator", "EulerIntegrator", "HeunIntegrator",
    "EulerMaruyamaIntegrator", "KarrasIntegrator", "DPMSolverPlusPlus2M", "name_to_integrator",
    "Scheduler", "EDMScheduler", "VPScheduler", "VEScheduler",
    "picard_propagate_backward",
    "EdgeDetectionPreprocessor", "make_loss_preprocessor",
    "smoothstep_window",
]
