"""Latent Consistency Model distillation (Luo et al. 2023).

Distills a trained epsilon-prediction UNet (the teacher) into a consistency
model (the student) that samples in 2-8 steps with ``scheduler="lcm"`` —
the framework's own route to few-step checkpoints where none exist to
download (the reference has no training at all; community LCM weights load
via ``models/lora_file.py``, this module MAKES them).

The consistency function shares every convention with the inference sampler
(``core/schedulers/lcm.py``): boundary coefficients c_skip/c_out with
``sigma_data=0.5`` / ``timestep_scaling=10``, and the 50-point
skipping-step origin schedule whose subsets the sampler walks at inference.
One deliberate simplification vs the paper: the classifier-free guidance
scale ``w`` is FIXED at distillation time (the published w-embedding input
would change the UNet architecture); the student bakes ``w`` in and is
sampled with ``guidance_scale=1.0`` cond-only — the engine's
``guidance_interval=(0, 0)`` compiles exactly that half-batch program.

Per step (paper's Algorithm 1, k = one origin-schedule stride):

    n ~ U[0, N-2];  t = ts[n] (high), s = ts[n+1] (low)
    x_t = sqrt(a_t) x0 + sqrt(1-a_t) eps
    teacher CFG:  e = e_u + w (e_c - e_u);  DDIM x_t -> x_s with e
    loss = d( f_theta(x_t, t, c),  stopgrad f_{theta^-}(x_s, s, c) )

with f(x, t, c) = c_skip(t) x + c_out(t) x0_pred(eps_model) and d the
pseudo-Huber distance sqrt(||.||^2 + c^2) - c (elementwise mean).
theta^- is an EMA of the student (mu=0.95, the paper's setting) and is
what ``export_params`` ships — the consistency literature samples from
the EMA network.
"""

from __future__ import annotations

import logging
from typing import Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..core.schedulers.base import SchedulerConfig, alphas_cumprod_for
from ..core.schedulers.lcm import LCM, lcm_timesteps
from ..parallel.mesh import batch_sharding, make_mesh, replicate, replicated

logger = logging.getLogger("sdv_tpu")


def boundary_coefficients(t):
    """(c_skip, c_out) at (unscaled) timestep ``t`` — EXACTLY the inference
    sampler's constants (core/schedulers/lcm.py:61-63), shared so training
    and sampling cannot drift."""
    st = LCM.timestep_scaling * jnp.asarray(t).astype(jnp.float32)
    c_skip = LCM.sigma_data ** 2 / (st ** 2 + LCM.sigma_data ** 2)
    c_out = st / jnp.sqrt(st ** 2 + LCM.sigma_data ** 2)
    return c_skip, c_out


@flax.struct.dataclass
class LCMDistillConfig:
    learning_rate: float = flax.struct.field(pytree_node=False, default=1e-4)
    beta1: float = flax.struct.field(pytree_node=False, default=0.9)
    beta2: float = flax.struct.field(pytree_node=False, default=0.999)
    weight_decay: float = flax.struct.field(pytree_node=False, default=0.0)
    max_grad_norm: float = flax.struct.field(pytree_node=False, default=1.0)
    #: the FIXED guidance scale the student bakes in (paper: w-embedding;
    #: here one w per distillation run keeps the UNet geometry unchanged)
    guidance_scale: float = flax.struct.field(pytree_node=False, default=3.0)
    #: the origin schedule length — inference step counts must divide into
    #: it (``lcm_timesteps``); 50 matches the published LCM checkpoints
    original_inference_steps: int = flax.struct.field(pytree_node=False,
                                                      default=50)
    #: EMA rate of the target network theta^- (mu in the paper)
    ema_decay: float = flax.struct.field(pytree_node=False, default=0.95)
    #: pseudo-Huber c; 0 degrades to plain MSE
    huber_c: float = flax.struct.field(pytree_node=False, default=0.001)


class LCMDistiller:
    """Owns student/EMA-target/optimizer state + the compiled distill step.

    ``models`` supplies the architecture and the TEACHER weights
    (``models.params["unet"]``); the student initialises from them.
    """

    def __init__(self, models, mesh=None,
                 config: Optional[LCMDistillConfig] = None,
                 scheduler_config: Optional[SchedulerConfig] = None):
        self.models = models
        self.mesh = mesh if mesh is not None else make_mesh()
        self.config = config or LCMDistillConfig()
        scfg = scheduler_config or models.scheduler_config
        acp = alphas_cumprod_for(scfg)
        # the full origin schedule, ASCENDING index = descending t:
        # ts[0]=T-ish ... ts[N-1]=lowest — matches the sampler's tables
        ts = lcm_timesteps(scfg, self.config.original_inference_steps,
                           self.config.original_inference_steps)
        self._ts = jnp.asarray(ts, jnp.int32)
        self._acp = jnp.asarray(acp, jnp.float32)

        cfg = self.config
        self.tx = optax.chain(
            optax.clip_by_global_norm(cfg.max_grad_norm),
            optax.adamw(cfg.learning_rate, b1=cfg.beta1, b2=cfg.beta2,
                        weight_decay=cfg.weight_decay))
        teacher32 = jax.tree.map(lambda x: jnp.array(x, jnp.float32,
                                                     copy=True),
                                 models.params["unet"])
        # teacher frozen + replicated; student and EMA target start from it
        self.teacher_params = replicate(self.mesh, teacher32)
        self.params = replicate(
            self.mesh, jax.tree.map(lambda x: jnp.array(x, copy=True),
                                    teacher32))
        self.target_params = replicate(
            self.mesh, jax.tree.map(lambda x: jnp.array(x, copy=True),
                                    teacher32))
        self.opt_state = replicate(self.mesh, self.tx.init(self.params))
        self.step_count = 0
        self._distill_step = self._build()

    # ------------------------------------------------------------------
    def _build(self):
        unet = self.models.unet()
        acp, ts = self._acp, self._ts
        n_ts = int(ts.shape[0])
        cfg = self.config
        tx = self.tx
        w = cfg.guidance_scale
        huber_c = cfg.huber_c
        ema = cfg.ema_decay

        def boundary(t):
            c_skip, c_out = boundary_coefficients(t)
            return (c_skip[:, None, None, None], c_out[:, None, None, None])

        def x0_from_eps(x, eps, a):
            return (x - jnp.sqrt(1.0 - a) * eps) / jnp.sqrt(a)

        def consistency(params, x, t, a, ctx):
            eps = unet.apply(params, x, t.astype(jnp.float32), ctx)
            c_skip, c_out = boundary(t)
            return c_skip * x + c_out * x0_from_eps(x, eps.astype(
                jnp.float32), a)

        def loss_fn(params, target_params, teacher_params, x0, ctx, uctx,
                    idx, noise):
            t_hi, t_lo = ts[idx], ts[idx + 1]
            a_hi = acp[t_hi][:, None, None, None]
            a_lo = acp[t_lo][:, None, None, None]
            x_t = jnp.sqrt(a_hi) * x0 + jnp.sqrt(1.0 - a_hi) * noise
            # teacher PF-ODE step t_hi -> t_lo under CFG (one 2B-row call)
            b = x0.shape[0]
            eps2 = unet.apply(teacher_params,
                              jnp.concatenate([x_t, x_t], 0),
                              jnp.concatenate([t_hi, t_hi]).astype(
                                  jnp.float32),
                              jnp.concatenate([uctx, ctx], 0))
            eps_u, eps_c = eps2[:b].astype(jnp.float32), \
                eps2[b:].astype(jnp.float32)
            eps_hat = eps_u + w * (eps_c - eps_u)
            x0_t = x0_from_eps(x_t, eps_hat, a_hi)
            x_s = jnp.sqrt(a_lo) * x0_t + jnp.sqrt(1.0 - a_lo) * eps_hat
            x_s = jax.lax.stop_gradient(x_s)
            f_student = consistency(params, x_t, t_hi, a_hi, ctx)
            f_target = jax.lax.stop_gradient(
                consistency(target_params, x_s, t_lo, a_lo, ctx))
            d = f_student - f_target
            if huber_c > 0.0:
                return jnp.mean(jnp.sqrt(d * d + huber_c ** 2) - huber_c)
            return jnp.mean(d * d)

        def distill_step(params, target, opt_state, teacher, x0, ctx, uctx,
                         key):
            ki, kn = jax.random.split(key)
            b = x0.shape[0]
            idx = jax.random.randint(ki, (b,), 0, n_ts - 1)
            noise = jax.random.normal(kn, x0.shape, jnp.float32)
            loss, grads = jax.value_and_grad(loss_fn)(
                params, target, teacher, x0, ctx, uctx, idx, noise)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            target = jax.tree.map(lambda e, p: ema * e + (1.0 - ema) * p,
                                  target, params)
            return params, target, opt_state, loss

        bs = batch_sharding(self.mesh)
        rep = replicated(self.mesh)
        return jax.jit(distill_step,
                       in_shardings=(rep, rep, rep, rep, bs, bs, bs, rep),
                       out_shardings=(rep, rep, rep, rep),
                       donate_argnums=(0, 1, 2))

    # ------------------------------------------------------------------
    def step(self, latents, context, uncond_context, key=None) -> float:
        """One distillation step.  latents: (B, h, w, 4) clean VAE latents
        (scaled); context/uncond_context: (B, S, D) text embeddings — the
        uncond rows feed ONLY the teacher's CFG."""
        if key is None:
            key = jax.random.PRNGKey(self.step_count)
        latents = jnp.asarray(latents, jnp.float32)
        context = jnp.asarray(context, jnp.float32)
        uncond_context = jnp.asarray(uncond_context, jnp.float32)
        if uncond_context.shape[0] == 1 and latents.shape[0] > 1:
            uncond_context = jnp.broadcast_to(
                uncond_context, (latents.shape[0],) + uncond_context.shape[1:])
        dp = self.mesh.shape["data"]
        b = latents.shape[0]
        if b % dp:
            idx = jnp.arange(-(-b // dp) * dp) % b
            latents, context, uncond_context = (latents[idx], context[idx],
                                                uncond_context[idx])
        bsh = batch_sharding(self.mesh)
        latents = jax.device_put(latents, bsh)
        context = jax.device_put(context, bsh)
        uncond_context = jax.device_put(uncond_context, bsh)
        self.params, self.target_params, self.opt_state, loss = \
            self._distill_step(self.params, self.target_params,
                               self.opt_state, self.teacher_params,
                               latents, context, uncond_context, key)
        self.step_count += 1
        return float(loss)

    def export_params(self, ema: bool = True):
        """Full params dict with the distilled UNet (EMA target by default —
        the network consistency models are sampled from).  COPIES every
        leaf: the distill step donates its param buffers, so a no-copy
        view exported here would be deleted by the next ``step()``."""
        src = self.target_params if ema else self.params
        out = dict(self.models.params)
        out["unet"] = jax.tree.map(
            lambda x: jnp.array(x, self.models.dtype, copy=True)
            if jnp.issubdtype(x.dtype, jnp.floating)
            else jnp.array(x, copy=True), src)
        return out
