"""Model families: score networks (nets), the Karras/EDM runtime, and
(coming) DDPM, VAE, flow-matching stacks."""

from diffsci_tpu.models import nets
from diffsci_tpu.models import karras
from diffsci_tpu.models import vae
from diffsci_tpu.models import ddpm
from diffsci_tpu.models import ddpm_v1
from diffsci_tpu.models import si
from diffsci_tpu.models import sde
from diffsci_tpu.models import regression
from diffsci_tpu.models.regression import ForecastModel, ForecastModelConfig
from diffsci_tpu.models.karras import (
    KarrasModel, KarrasModelConfig, IntervalGuidance,
    karras_model_from_description,
    EMATracker, TrainState,
    create_train_state, make_train_step, make_train_scan,
    make_eval_step,
    default_optimizer, schedule_free_optimizer, schedule_free_eval_params,
    warmup_cosine_schedule, cosine_restarts_schedule, accumulate_gradients,
)
from diffsci_tpu.models.nets import (
    PUNetG, PUNetGCond, PUNetGConfig, MLPUncond, MLPCond,
)

__all__ = [
    "nets", "karras",
    "KarrasModel", "IntervalGuidance", "KarrasModelConfig", "karras_model_from_description",
    "EMATracker", "TrainState",
    "create_train_state", "make_train_step", "make_train_scan",
    "make_eval_step",
    "default_optimizer", "schedule_free_optimizer",
    "warmup_cosine_schedule", "cosine_restarts_schedule",
    "accumulate_gradients",
    "schedule_free_eval_params",
    "PUNetG", "PUNetGCond", "PUNetGConfig", "MLPUncond", "MLPCond",
]
