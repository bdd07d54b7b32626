"""EMA weight tracking: traditional decay/half-life and EDM2 power-function
profiles.

TPU-native redesign of the reference ModelEMA (reference
diffsci/models/karras/ema.py:9-240). The reference mutates a dict of shadow
tensors outside the parameter tree; here EMA state is an immutable pytree of
shadow parameter copies (one per profile) updated by ``jax.tree.map`` lerp
*inside the jitted train step* — no host sync, and the whole state
checkpoints with orbax like any other pytree.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.struct


def power_function_exp_from_std(std: float) -> float:
    """EDM2 power-function EMA: relative std -> exponent (the largest real
    root of x^3 + 7x^2 + (16 - std^-2)x + (12 - std^-2), ema.py:9-15)."""
    if std <= 0:
        raise ValueError("Power-function EMA std must be positive")
    target = float(std) ** -2
    roots = np.roots([1.0, 7.0, 16.0 - target, 12.0 - target])
    return float(np.max(roots.real))


def power_function_beta(std: float, next_update) -> jnp.ndarray:
    """Per-update decay (1 - 1/t)^(exp+1), 0 on the first update
    (ema.py:18-23). ``next_update`` may be a traced integer."""
    exp = power_function_exp_from_std(std)
    t = jnp.asarray(next_update, jnp.float32)
    beta = (1.0 - 1.0 / jnp.maximum(t, 1.0)) ** (exp + 1.0)
    return jnp.where(t <= 1.0, 0.0, beta)


class EMAState(flax.struct.PyTreeNode):
    """Shadow parameter copies, one pytree per profile, plus the update
    counter. ``profiles`` is a tuple of param pytrees."""
    profiles: tuple
    num_updates: jnp.ndarray  # scalar int32


@dataclasses.dataclass(frozen=True)
class EMATracker:
    """Pure EMA updater (configuration is static; state is a pytree).

    ema_type: 'traditional' (fixed decay or half-life with ramp-up,
    ema.py:110-119) or 'power' (EDM2 multi-std profiles, ema.py:121-125).
    """
    ema_type: str = "traditional"
    decay: float = 0.999
    halflife_steps: Optional[float] = None
    rampup_ratio: Optional[float] = None
    power_function_stds: Sequence[float] = (0.05,)
    profile_index: int = 0
    update_every: int = 1

    def __post_init__(self):
        if self.ema_type not in ("traditional", "power"):
            raise ValueError("ema_type must be 'traditional' or 'power'")
        if not 0.0 <= self.decay < 1.0:
            raise ValueError("EMA decay must be in [0, 1)")
        if len(self.power_function_stds) == 0:
            raise ValueError("power_function_stds must not be empty")
        if self.update_every < 1:
            raise ValueError("update_every must be >= 1")

    @property
    def num_profiles(self) -> int:
        return len(self.power_function_stds) if self.ema_type == "power" else 1

    @property
    def profile_names(self) -> list[str]:
        if self.ema_type == "power":
            return [f"power_std_{s:g}" for s in self.power_function_stds]
        return ["traditional"]

    def init(self, params) -> EMAState:
        # real copies, not aliases: shadow buffers must be distinct from the
        # live params so the jitted train step can donate both
        profiles = tuple(jax.tree.map(lambda p: jnp.array(p, copy=True),
                                      params)
                         for _ in range(self.num_profiles))
        return EMAState(profiles=profiles,
                        num_updates=jnp.zeros((), jnp.int32))

    def _traditional_beta(self, next_update):
        if self.halflife_steps is None:
            return jnp.asarray(self.decay, jnp.float32)
        hl = jnp.asarray(self.halflife_steps, jnp.float32)
        if self.rampup_ratio is not None:
            hl = jnp.minimum(
                hl, jnp.maximum(next_update.astype(jnp.float32), 1.0)
                * self.rampup_ratio)
        return 0.5 ** (1.0 / jnp.maximum(hl, 1e-8))

    def betas(self, next_update):
        """Per-profile decay for this update; traced-int safe."""
        if self.ema_type == "power":
            return [power_function_beta(s, next_update)
                    for s in self.power_function_stds]
        return [self._traditional_beta(jnp.asarray(next_update))]

    def update(self, state: EMAState, params) -> EMAState:
        """shadow <- beta * shadow + (1 - beta) * params, per profile
        (ema.py:127-156). Pure; call inside the jitted train step.

        With ``update_every=K > 1`` the shadow read+write happens only on
        every K-th call, with the K per-step decays folded into one
        effective beta — for the power profile EXACTLY, by telescoping:
        prod_{i=t-K+1..t} ((i-1)/i)^(e+1) = ((t-K)/t)^(e+1). The only
        approximation vs per-step EMA is that the (1-beta) contributions
        sample params at the update call instead of each of the K steps;
        the payoff is 1/K of the EMA HBM traffic (shadows are a full
        param copy per profile, read+written each step when K=1)."""
        next_update = state.num_updates + 1
        if self.update_every == 1:
            betas = self.betas(next_update)
            new_profiles = tuple(
                jax.tree.map(
                    lambda s, p, b=b: b * s + (1.0 - b) * p.astype(s.dtype),
                    profile, params)
                for profile, b in zip(state.profiles, betas))
            return EMAState(profiles=new_profiles, num_updates=next_update)

        K = self.update_every
        t = next_update.astype(jnp.float32) if hasattr(
            next_update, "astype") else jnp.float32(next_update)
        if self.ema_type == "power":
            betas_eff = []
            for s in self.power_function_stds:
                e = power_function_exp_from_std(s)
                b = (jnp.maximum(t - K, 0.0) / jnp.maximum(t, 1.0)) \
                    ** (e + 1.0)
                betas_eff.append(b)
        else:
            # traditional: explicit product of the K per-step betas
            # (K is static and small; these are scalar traced ops)
            betas_eff = None
            for j in range(K):
                bs = self.betas(next_update - (K - 1 - j))
                betas_eff = bs if betas_eff is None else [
                    p * b for p, b in zip(betas_eff, bs)]

        def apply(profiles):
            return tuple(
                jax.tree.map(
                    lambda s, p, b=b: b * s + (1.0 - b) * p.astype(s.dtype),
                    profile, params)
                for profile, b in zip(profiles, betas_eff))

        new_profiles = jax.lax.cond(
            next_update % K == 0, apply, lambda pr: pr, state.profiles)
        return EMAState(profiles=new_profiles, num_updates=next_update)

    def get_params(self, state: EMAState, profile_index: int | None = None):
        """Shadow params of the selected profile (ema.py:158-165)."""
        idx = self.profile_index if profile_index is None else profile_index
        idx = min(max(idx, 0), self.num_profiles - 1)
        return state.profiles[idx]

    def export_description(self) -> dict[str, Any]:
        return dict(ema_type=self.ema_type, decay=self.decay,
                    halflife_steps=self.halflife_steps,
                    rampup_ratio=self.rampup_ratio,
                    power_function_stds=list(self.power_function_stds),
                    profile_index=self.profile_index,
                    update_every=self.update_every)


# --- post-hoc EMA synthesis (beyond parity) ---------------------------------
#
# Karras et al., "Analyzing and Improving the Training Dynamics of
# Diffusion Models" (arXiv:2312.02696) §3.3: a power-function EMA with
# exponent gamma snapshotted at training time t averages the parameter
# trajectory with response r(tau) = ((gamma+1)/t) * (tau/t)^gamma on
# [0, t]. Responses of stored snapshots span a subspace; ANY target
# profile is approximated post hoc by the least-squares combination of
# snapshots — so the EMA length can be chosen AFTER training (e.g. swept
# against FID) instead of committed to up front. The inner products
# below have closed forms, so the solve is a tiny host-side linalg
# problem; synthesis is one weighted pytree sum.


def _power_response_dot(t_a, gamma_a, t_b, gamma_b):
    """<r_a, r_b> for two power-function responses (closed form):
    integral_0^min(ta,tb) r_a(tau) r_b(tau) dtau."""
    t_a = np.asarray(t_a, np.float64)
    t_b = np.asarray(t_b, np.float64)
    gamma_a = np.asarray(gamma_a, np.float64)
    gamma_b = np.asarray(gamma_b, np.float64)
    t_ratio = t_a / t_b
    t_exp = np.where(t_a < t_b, gamma_b, -gamma_a)
    t_max = np.maximum(t_a, t_b)
    num = (gamma_a + 1.0) * (gamma_b + 1.0) * t_ratio ** t_exp
    den = (gamma_a + gamma_b + 1.0) * t_max
    return num / den


def solve_posthoc_weights(snap_ts, snap_stds, target_t, target_std):
    """Least-squares weights over stored snapshots reproducing the
    target profile: solve A w = b with A_ij = <r_i, r_j>,
    b_i = <r_i, r_target>. ``snap_ts`` are the training steps at which
    the shadows were saved; stds are the relative-std parameterization
    (converted through the same cubic as training-time EMA)."""
    snap_ts = np.asarray(snap_ts, np.float64)
    gammas = np.array([power_function_exp_from_std(s) for s in snap_stds],
                      np.float64)
    tg = float(target_t)
    gg = power_function_exp_from_std(target_std)
    A = _power_response_dot(snap_ts[:, None], gammas[:, None],
                            snap_ts[None, :], gammas[None, :])
    b = _power_response_dot(snap_ts, gammas, tg, gg)
    return np.linalg.solve(A, b)


def synthesize_posthoc_ema(snapshots, snap_ts, snap_stds, target_std,
                           target_t=None):
    """Combine stored EMA shadow pytrees into the target profile.

    ``snapshots``: sequence of param pytrees (the power-EMA shadows as
    checkpointed during training, possibly interleaved from several
    profiles); ``snap_ts``: their training steps; ``snap_stds``: the
    relative std each shadow was tracked with; ``target_std``: the
    profile to synthesize, evaluated at ``target_t`` (defaults to the
    latest snapshot step). Returns the weighted pytree sum in f32.
    """
    if not (len(snapshots) == len(snap_ts) == len(snap_stds)):
        raise ValueError("snapshots/snap_ts/snap_stds length mismatch")
    if len(snapshots) == 0:
        raise ValueError("need at least one snapshot")
    if target_t is None:
        target_t = max(snap_ts)
    w = solve_posthoc_weights(snap_ts, snap_stds, target_t, target_std)

    def combine(*leaves):
        out = None
        for wi, leaf in zip(w, leaves):
            term = jnp.float32(wi) * leaf.astype(jnp.float32)
            out = term if out is None else out + term
        return out

    return jax.tree.map(combine, *snapshots)
