"""VAE training runtime: NLL + KL loss with learned variance, total
variation, teacher distillation, and optional adversarial (PatchGAN)
training with accuracy-gated discriminator updates.

TPU-native redesign of the reference VAEModule
(reference diffsci/models/vae/vaemodule.py:38-776). The Lightning
manual-dual-optimizer loop (vaemodule.py:567-623) becomes ONE jitted train
step updating generator and discriminator together; the reference's
data-dependent "update discriminator only when accuracy < threshold" gate
becomes a traced 0/1 multiplier on the discriminator's optimizer updates —
identical dynamics, no host sync.
"""

from __future__ import annotations

from typing import Any, Callable, Literal, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn
import flax.struct
import optax

from diffsci_tpu.ops.losses import huber as huber_loss
from diffsci_tpu.models.nets.vae import DiagonalGaussianDistribution


class VAEModelConfig:
    """(vaemodule.py:38-113)"""

    def __init__(self,
                 kl_weight: float = 1e-3,
                 nll_weight: float = 1.0,
                 logvar_init: float = 0.0,
                 trainable_logvar: bool = False,
                 reduce_mean: bool = True,
                 teacher=None,  # object with .encode_moments(x) / .decode(z)
                 teaching_mode: str = "both",
                 distillation_alpha: float = 0.5,
                 latent_matching_type: str = "wasserstein",
                 adversarial_weight: float = 0.01,
                 reconstruction_loss: Literal["mse", "huber"] = "huber",
                 discriminator_frequency: int = 1,
                 discriminator_threshold: float = 0.85,
                 label_smoothing: float = 0.1,
                 total_variation_weight: float = 0.0,
                 kl_threshold: float | None = None,
                 loss_preprocessor="none",
                 loss_preprocessor_dim: int = 2):
        assert latent_matching_type in ("kl", "mse", "modhell",
                                        "wasserstein")
        assert teaching_mode in ("both", "encoder", "decoder")
        self.kl_weight = kl_weight
        self.nll_weight = nll_weight
        self.logvar_init = logvar_init
        self.trainable_logvar = trainable_logvar
        self.reduce_mean = reduce_mean
        self.teacher = teacher
        self.teaching_mode = teaching_mode
        self.distillation_alpha = distillation_alpha
        self.latent_matching_type = latent_matching_type
        self.adversarial_weight = adversarial_weight
        self.reconstruction_loss = reconstruction_loss
        self.discriminator_frequency = discriminator_frequency
        self.discriminator_threshold = discriminator_threshold
        self.label_smoothing = label_smoothing
        self.total_variation_weight = total_variation_weight
        self.kl_threshold = kl_threshold
        self.loss_preprocessor = loss_preprocessor
        self.loss_preprocessor_dim = loss_preprocessor_dim

    @property
    def has_distillation(self):
        return self.teacher is not None

    @property
    def distillation_training_only(self):
        return self.has_distillation and self.distillation_alpha == 1.0


def total_variation(x):
    """Anisotropic TV per sample, channels-last spatial axes
    (vaemodule.py:139-162)."""
    tv = 0.0
    for dim in range(1, x.ndim - 1):
        sl1 = [slice(None)] * x.ndim
        sl2 = [slice(None)] * x.ndim
        sl1[dim] = slice(1, None)
        sl2[dim] = slice(None, -1)
        diff = jnp.abs(x[tuple(sl1)] - x[tuple(sl2)])
        tv = tv + jnp.sum(diff, axis=tuple(range(1, diff.ndim)))
    return tv


def _recon_fn(kind: str):
    if kind == "mse":
        return lambda a, b: (a - b) ** 2
    if kind == "huber":
        return huber_loss
    raise ValueError(f"Reconstruction loss {kind} not supported")


class NLayerDiscriminator(nn.Module):
    """PatchGAN discriminator, dimension-agnostic channels-last (the
    reference vendored this in ldmlosses.py:11-136)."""
    ndf: int = 64
    n_layers: int = 3

    @nn.compact
    def __call__(self, x, y=None):
        ndim = x.ndim - 2
        if y is not None:
            yc = y["y"] if isinstance(y, dict) else y
            x = jnp.concatenate([x, jnp.broadcast_to(
                yc, x.shape[:-1] + yc.shape[-1:])], axis=-1)
        k = (4,) * ndim
        s = (2,) * ndim
        h = nn.Conv(self.ndf, k, strides=s, padding="SAME")(x)
        h = nn.leaky_relu(h, 0.2)
        nf = 1
        for n in range(1, self.n_layers):
            nf = min(2 ** n, 8)
            h = nn.Conv(self.ndf * nf, k, strides=s, padding="SAME",
                        use_bias=False)(h)
            h = nn.GroupNorm(num_groups=min(32, self.ndf * nf))(h)
            h = nn.leaky_relu(h, 0.2)
        nf = min(2 ** self.n_layers, 8)
        h = nn.Conv(self.ndf * nf, k, strides=(1,) * ndim, padding="SAME",
                    use_bias=False)(h)
        h = nn.GroupNorm(num_groups=min(32, self.ndf * nf))(h)
        h = nn.leaky_relu(h, 0.2)
        return nn.Conv(1, k, strides=(1,) * ndim, padding="SAME")(h)


class _VAENetWithLogvar(nn.Module):
    """Umbrella: autoencoder + (optionally trainable) output logvar."""
    autoencoder: nn.Module
    logvar_init: float = 0.0
    trainable_logvar: bool = False

    def setup(self):
        if self.trainable_logvar:
            self.logvar = self.param(
                "logvar", lambda k: jnp.ones((1,)) * self.logvar_init)

    def get_logvar(self):
        if self.trainable_logvar:
            return self.logvar
        return jnp.ones((1,)) * self.logvar_init

    def encode_moments(self, x, train: bool = False):
        # VAENet-style autoencoders bundle quant_conv inside the encoder
        # and expose encode_moments; AutoencoderKL keeps it separate
        if hasattr(self.autoencoder, "encode_moments"):
            return self.autoencoder.encode_moments(x, train)
        h = self.autoencoder.encoder(x, train)
        return self.autoencoder.quant_conv(h)

    def decode(self, z, train: bool = False):
        # keyword: VAENet.decode's second positional is `time`
        return self.autoencoder.decode(z, train=train)

    def __call__(self, x, key=None, train: bool = False):
        moments = self.encode_moments(x, train)
        post = DiagonalGaussianDistribution(moments)
        z = post.sample(key) if key is not None else post.mode()
        return self.decode(z, train), post


class VAEModel:
    """Functional VAE trainer around an AutoencoderKL-style net."""

    def __init__(self, autoencoder: nn.Module, config: VAEModelConfig,
                 conditional: bool = False,
                 discriminator: nn.Module | None = None):
        self.config = config
        self.conditional = conditional
        self.net = _VAENetWithLogvar(
            autoencoder=autoencoder,
            logvar_init=config.logvar_init,
            trainable_logvar=config.trainable_logvar)
        self.is_adversarial = config.adversarial_weight > 0.0 and \
            discriminator is not None
        self.discriminator = discriminator
        self._recon = _recon_fn(config.reconstruction_loss)
        # edge-feature loss preprocessing (vaemodule.py:209-217,260-261)
        from diffsci_tpu.ops.preprocessors import make_loss_preprocessor
        self._pre = make_loss_preprocessor(config.loss_preprocessor,
                                           config.loss_preprocessor_dim)

    # ------------------------------------------------------------------
    def init(self, key, x_shape):
        kp, kd, ks = jax.random.split(key, 3)
        x = jnp.zeros(x_shape, jnp.float32)
        variables = self.net.init({"params": kp, "dropout": kd}, x, key=ks)
        return variables

    def init_discriminator(self, key, x_shape):
        x = jnp.zeros(x_shape, jnp.float32)
        return self.discriminator.init({"params": key}, x)

    def encode(self, variables, x, key=None, train: bool = False,
               rngs=None, eps=None):
        moments = self.net.apply(variables, x, train,
                                 method=_VAENetWithLogvar.encode_moments,
                                 rngs=rngs)
        post = DiagonalGaussianDistribution(moments)
        if key is not None or eps is not None:
            z = post.sample(key, eps=eps)
        else:
            z = post.mode()
        return {"zdistrib": post, "zsample": z}

    def decode(self, variables, z, train: bool = False, rngs=None):
        return self.net.apply(variables, z, train,
                              method=_VAENetWithLogvar.decode, rngs=rngs)

    # ------------------------------------------------------------------
    # losses (vaemodule.py:233-339)
    # ------------------------------------------------------------------
    def loss_fn(self, variables, key, x, y=None, train: bool = True,
                eps=None):
        """``eps`` replays a fixed z-noise draw into every posterior
        sample this step takes (cross-framework parity hook)."""
        cfg = self.config
        ksamp, kdrop = jax.random.split(key)
        rngs = {"dropout": kdrop} if train else None

        if cfg.distillation_training_only:
            loss, logs = self._distillation_loss(variables, ksamp, x, None,
                                                 None, train, rngs, eps=eps)
            return loss, logs

        enc = self.encode(variables, x, key=ksamp, train=train, rngs=rngs,
                          eps=eps)
        zdistrib = enc["zdistrib"]
        x_recon = self.decode(variables, enc["zsample"], train=train,
                              rngs=rngs)

        logvar = self.net.apply(variables,
                                method=_VAENetWithLogvar.get_logvar)
        rec = self._recon(self._pre(x), self._pre(x_recon))
        nll = rec / jnp.exp(logvar) + logvar
        nsamples = x.shape[0]
        if cfg.reduce_mean:
            nll_loss = jnp.mean(nll)
            kl = zdistrib.kl(reduce_mean=True)
        else:
            nll_loss = jnp.sum(nll) / nsamples
            kl = zdistrib.kl(reduce_mean=False)
        if cfg.kl_threshold is not None:
            kl = zdistrib.kl_thresholded(threshold=cfg.kl_threshold)
        kl_loss = jnp.sum(kl) / nsamples

        main = cfg.nll_weight * nll_loss + cfg.kl_weight * kl_loss
        loss = main
        logs = {"nll_loss": nll_loss, "kl_loss": kl_loss, "main_loss": main,
                "logvar": logvar[0]}

        if cfg.total_variation_weight > 0.0:
            tv_real = total_variation(x)
            tv_recon = total_variation(x_recon)
            tv_loss = jnp.mean(self._recon(tv_recon, tv_real))
            loss = loss + cfg.total_variation_weight * tv_loss
            logs["tv_loss"] = tv_loss

        if cfg.has_distillation:
            dloss, dlogs = self._distillation_loss(
                variables, ksamp, x, zdistrib, x_recon, train, rngs,
                eps=eps)
            loss = ((1 - cfg.distillation_alpha) * loss
                    + cfg.distillation_alpha * dloss)
            logs.update(dlogs)

        return loss, {**logs, "x_recon": x_recon}

    def _latent_matching(self, zdistrib, teacher_z):
        cfg = self.config
        reduce_mean = cfg.reduce_mean
        if cfg.latent_matching_type == "kl":
            val = zdistrib.kl(teacher_z, reduce_mean=reduce_mean)
        elif cfg.latent_matching_type == "modhell":
            val = zdistrib.modified_hellinger(teacher_z,
                                              reduce_mean=reduce_mean)
        else:  # mse / wasserstein
            val = zdistrib.wasserstein(teacher_z, reduce_mean=reduce_mean)
        return jnp.mean(val)

    def _distillation_loss(self, variables, key, x, zdistrib, x_recon,
                           train, rngs, eps=None):
        """(vaemodule.py:300-399). ``config.teacher`` exposes
        encode_moments(x) and decode(z) bound to frozen params."""
        cfg = self.config
        teacher = cfg.teacher
        latent_loss = jnp.asarray(0.0)
        output_loss = jnp.asarray(0.0)
        nsamples = x.shape[0]

        def reduce(r):
            return jnp.mean(r) if cfg.reduce_mean else jnp.sum(r) / nsamples

        if cfg.teaching_mode == "decoder":
            tz = DiagonalGaussianDistribution(
                jax.lax.stop_gradient(teacher.encode_moments(x)))
            z = tz.mode()
            student = self.decode(variables, z, train=train, rngs=rngs)
            teacher_rec = jax.lax.stop_gradient(teacher.decode(z))
            output_loss = reduce(self._recon(self._pre(student),
                                             self._pre(teacher_rec)))
        elif cfg.teaching_mode == "encoder":
            if zdistrib is None:
                zdistrib = self.encode(variables, x, key=key, train=train,
                                       rngs=rngs, eps=eps)["zdistrib"]
            tz = DiagonalGaussianDistribution(
                jax.lax.stop_gradient(teacher.encode_moments(x)))
            latent_loss = self._latent_matching(zdistrib, tz)
        else:  # both
            if zdistrib is None:
                enc = self.encode(variables, x, key=key, train=train,
                                  rngs=rngs, eps=eps)
                zdistrib = enc["zdistrib"]
                x_recon = self.decode(variables, enc["zsample"],
                                      train=train, rngs=rngs)
            tmoments = jax.lax.stop_gradient(teacher.encode_moments(x))
            tz = DiagonalGaussianDistribution(tmoments)
            tzs = tz.sample(key, eps=eps)
            teacher_rec = jax.lax.stop_gradient(teacher.decode(tzs))
            latent_loss = self._latent_matching(zdistrib, tz)
            output_loss = reduce(self._recon(self._pre(x_recon),
                                             self._pre(teacher_rec)))

        loss = latent_loss + output_loss
        return loss, {"latent_space_matching_loss": latent_loss,
                      "output_matching_loss": output_loss}


class VAETrainState(flax.struct.PyTreeNode):
    params: Any
    consts: Any
    opt_state: Any
    disc_params: Optional[Any]
    disc_opt_state: Optional[Any]
    step: jnp.ndarray

    def variables(self):
        return {"params": self.params, **self.consts}


def default_vae_optimizer(learning_rate: float = 1e-4,
                          grad_clip: float = 1.0):
    """AdamW + global-norm clipping: the VAE+GAN path is spiky (the
    reference relies on Lightning's grad clipping; without it the
    generator NaNs within a few steps on TPU)."""
    return optax.chain(optax.clip_by_global_norm(grad_clip),
                       optax.adamw(learning_rate))


def create_vae_train_state(model: VAEModel, key, x_shape,
                           optimizer=None, disc_optimizer=None):
    tx = optimizer or default_vae_optimizer()
    variables = model.init(key, x_shape)
    params = variables.get("params", {})
    consts = {k: v for k, v in variables.items() if k != "params"}
    opt_state = tx.init(params)
    disc_params = disc_opt_state = None
    dtx = None
    if model.is_adversarial:
        dtx = disc_optimizer or default_vae_optimizer()
        dvars = model.init_discriminator(jax.random.fold_in(key, 1), x_shape)
        disc_params = dvars["params"]
        disc_opt_state = dtx.init(disc_params)
    state = VAETrainState(params=params, consts=consts, opt_state=opt_state,
                          disc_params=disc_params,
                          disc_opt_state=disc_opt_state,
                          step=jnp.zeros((), jnp.int32))
    return state, tx, dtx


def make_vae_train_step(model: VAEModel, tx, dtx=None):
    """One jitted step: VAE (+ generator adversarial) update, then the
    accuracy-gated discriminator update (vaemodule.py:567-623)."""
    cfg = model.config
    bce = optax.sigmoid_binary_cross_entropy

    def train_step(state: VAETrainState, key, x, y=None):
        kg, kd = jax.random.split(key)

        def gen_loss(params):
            variables = {"params": params, **state.consts}
            loss, logs = model.loss_fn(variables, kg, x, y, train=True)
            x_recon = logs.pop("x_recon")
            if model.is_adversarial:
                fake = model.discriminator.apply(
                    {"params": state.disc_params}, x_recon,
                    y if model.conditional else None)
                g_adv = jnp.mean(bce(fake, jnp.ones_like(fake)))
                loss = loss + cfg.adversarial_weight * g_adv
                logs["gen_adversarial_loss"] = g_adv
            return loss, (logs, x_recon)

        (loss, (logs, x_recon)), grads = jax.value_and_grad(
            gen_loss, has_aux=True)(state.params)
        grads = jax.tree.map(
            lambda g: jnp.nan_to_num(g, nan=0.0, posinf=0.0, neginf=0.0),
            grads)
        upds, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, upds)

        disc_params = state.disc_params
        disc_opt_state = state.disc_opt_state
        if model.is_adversarial:
            x_fake = jax.lax.stop_gradient(x_recon)

            def disc_loss(dparams):
                yy = y if model.conditional else None
                real = model.discriminator.apply({"params": dparams}, x, yy)
                fake = model.discriminator.apply({"params": dparams},
                                                 x_fake, yy)
                smooth = cfg.label_smoothing
                real_l = jnp.mean(bce(real, jnp.full_like(real, 1 - smooth)))
                fake_l = jnp.mean(bce(fake, jnp.full_like(fake, smooth)))
                d_acc = 0.5 * (jnp.mean(real > 0) + jnp.mean(fake < 0))
                return 0.5 * (real_l + fake_l), d_acc

            (d_loss, d_acc), d_grads = jax.value_and_grad(
                disc_loss, has_aux=True)(state.disc_params)
            # accuracy gate + frequency gate as traced 0/1 multipliers
            gate = (d_acc < cfg.discriminator_threshold).astype(jnp.float32)
            freq_gate = (state.step % cfg.discriminator_frequency
                         == 0).astype(jnp.float32)
            gate = gate * freq_gate
            d_upds, disc_opt_state = dtx.update(d_grads,
                                                state.disc_opt_state,
                                                state.disc_params)
            d_upds = jax.tree.map(lambda u: gate * u, d_upds)
            disc_params = optax.apply_updates(state.disc_params, d_upds)
            logs.update({"discriminator_loss": d_loss, "d_accuracy": d_acc,
                         "disc_updated": gate})

        new_state = VAETrainState(params=params, consts=state.consts,
                                  opt_state=opt_state,
                                  disc_params=disc_params,
                                  disc_opt_state=disc_opt_state,
                                  step=state.step + 1)
        return new_state, {"train_loss": loss, **logs}

    return jax.jit(train_step, donate_argnums=(0,))


class KLAnnealing:
    """Linear KL-weight warm-up callback (vae/totalvariationloss.py
    KLAnnealing:26-36 analogue): call per epoch to update config.kl_weight.
    Note: mutates the python config; rebuild the train step after changes
    (weights are baked into the jitted step)."""

    def __init__(self, config: VAEModelConfig, start: float, end: float,
                 num_epochs: int):
        self.config = config
        self.start = start
        self.end = end
        self.num_epochs = num_epochs

    def on_epoch(self, epoch: int):
        t = min(epoch / max(self.num_epochs, 1), 1.0)
        self.config.kl_weight = self.start + t * (self.end - self.start)
        return self.config.kl_weight


class BoundAutoencoder:
    """Adapter giving a trained VAE the autoencoder protocol KarrasModel
    expects (.encode(x, key=None, y=None) / .decode(z, y=None)), with the
    LDM scale factor."""

    def __init__(self, model: VAEModel, variables, scale_factor: float = 1.0,
                 sample_posterior: bool = True):
        self.model = model
        self.variables = variables
        self.scale_factor = scale_factor
        self.sample_posterior = sample_posterior

    def encode(self, x, key=None, y=None):
        use_key = key if (self.sample_posterior and key is not None) else None
        enc = self.model.encode(self.variables, x, key=use_key)
        return enc["zsample"] * self.scale_factor

    def decode(self, z, y=None):
        return self.model.decode(self.variables, z / self.scale_factor)
