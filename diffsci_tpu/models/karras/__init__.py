"""Karras/EDM diffusion runtime (the reference's diffsci/models/karras/)."""

from diffsci_tpu.models.karras.module import (
    KarrasModel,
    IntervalGuidance,
    KarrasModelConfig,
    karras_model_from_description,
    KarrasNet,
    DynamicLossWeight,
)
from diffsci_tpu.models.karras.ema import (
    EMATracker,
    synthesize_posthoc_ema,
    solve_posthoc_weights,
    EMAState,
    power_function_beta,
    power_function_exp_from_std,
)
from diffsci_tpu.models.karras.ensemble import (
    EnsembleKarrasModel,
    EnsembleKarrasModelConfig,
    make_ensemble_train_step,
    scheduled_replay_weight,
    l2_sp_regularization,
    select_regularization_reference,
)
from diffsci_tpu.models.karras.autoregressive import (
    autoregressive_sample,
    frames_to_window,
    window_to_frames,
)
from diffsci_tpu.models.karras.distill import (
    make_distill_step,
    distill_progressive,
    distill_targets,
    distill_interval_grid,
    halving_schedule,
    sample_onestep,
)
from diffsci_tpu.models.karras.edm_minimal import EDMModel, EDMModelConfig
from diffsci_tpu.models.karras.encoder import KarrasEncoderModel
from diffsci_tpu.models.karras.train import (
    TrainState,
    create_train_state,
    make_train_step, make_train_scan,
    make_eval_step,
    default_optimizer,
    warmup_cosine_schedule,
    cosine_restarts_schedule,
    accumulate_gradients,
    schedule_free_optimizer,
    schedule_free_eval_params,
    nan_to_zero_grads,
    renormalize_mp_weights,
    freeze_mask,
    freeze_optimizer,
    split_variables,
)

__all__ = [
    "KarrasModel", "KarrasModelConfig", "IntervalGuidance",
    "karras_model_from_description",
    "KarrasNet", "DynamicLossWeight",
    "EnsembleKarrasModel", "EnsembleKarrasModelConfig",
    "make_ensemble_train_step", "scheduled_replay_weight",
    "l2_sp_regularization", "select_regularization_reference",
    "autoregressive_sample", "frames_to_window", "window_to_frames",
    "EDMModel", "EDMModelConfig", "KarrasEncoderModel",
    "make_distill_step", "distill_progressive", "distill_targets",
    "distill_interval_grid", "halving_schedule", "sample_onestep",
    "EMATracker", "EMAState", "power_function_beta",
    "synthesize_posthoc_ema", "solve_posthoc_weights",
    "power_function_exp_from_std",
    "TrainState", "create_train_state", "make_train_step", "make_train_scan", "make_eval_step",
    "default_optimizer", "schedule_free_optimizer",
    "warmup_cosine_schedule", "cosine_restarts_schedule",
    "accumulate_gradients",
    "schedule_free_eval_params", "nan_to_zero_grads", "renormalize_mp_weights",
    "freeze_mask", "freeze_optimizer", "split_variables",
]
