"""Scheduler core — explicit-state, scan-compatible diffusion samplers.

Design (TPU-first, unlike the reference's stateful torch scheduler objects,
reference ``stable_diffusion_pipeline.py:17-24,393-426``):

* ``make_tables(config, num_inference_steps)`` runs ONCE on the host and
  precomputes every per-step coefficient as a dense array (timesteps, alphas,
  sigmas, multistep coefficients — including the scipy-integrated LMS
  Adams-Bashforth weights).  No scipy, no python branching, no dynamic shapes
  ever reach the device.
* ``init_state(...)`` builds a small fixed-shape pytree (history buffers,
  counters, PRNG key).
* ``scale_model_input(tables, state, i, x)`` and
  ``step(tables, state, i, model_output, sample) -> (state, prev_sample)``
  are pure jittable functions of the step *index* ``i`` — they gather their
  coefficients from the tables, so the whole denoise loop is a single
  ``lax.scan`` in one XLA program (the reference's flax pipeline got halfway
  there with ``fori_loop``, ``flax_stable_diffusion_pipeline.py:305-307``).

The six samplers of the reference torch pipeline are provided: DDIM, PNDM
(PLMS), LMS, Euler, Euler-Ancestral, DPM-Solver++ multistep (reference
``stable_diffusion_pipeline.py:17-24``).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np


@flax.struct.dataclass
class SchedulerConfig:
    """Static sampler configuration (mirrors the SD v1.x scheduler config)."""
    num_train_timesteps: int = flax.struct.field(pytree_node=False, default=1000)
    beta_start: float = flax.struct.field(pytree_node=False, default=0.00085)
    beta_end: float = flax.struct.field(pytree_node=False, default=0.012)
    beta_schedule: str = flax.struct.field(pytree_node=False, default="scaled_linear")
    prediction_type: str = flax.struct.field(pytree_node=False, default="epsilon")
    steps_offset: int = flax.struct.field(pytree_node=False, default=1)
    timestep_spacing: str = flax.struct.field(pytree_node=False, default="leading")
    clip_sample: bool = flax.struct.field(pytree_node=False, default=False)
    set_alpha_to_one: bool = flax.struct.field(pytree_node=False, default=False)
    # PNDM
    skip_prk_steps: bool = flax.struct.field(pytree_node=False, default=True)
    # DPM-Solver++
    solver_order: int = flax.struct.field(pytree_node=False, default=2)
    algorithm_type: str = flax.struct.field(pytree_node=False, default="dpmsolver++")
    lower_order_final: bool = flax.struct.field(pytree_node=False, default=True)
    thresholding: bool = flax.struct.field(pytree_node=False, default=False)
    # LMS / Euler
    lms_order: int = flax.struct.field(pytree_node=False, default=4)
    #: resample sigmas onto the Karras et al. 2022 rho-7 schedule
    #: (quality option for the sigma-space samplers)
    use_karras_sigmas: bool = flax.struct.field(pytree_node=False,
                                                default=False)
    #: rescale the beta schedule so the terminal SNR is exactly zero
    #: (Lin et al. 2024, "Common Diffusion Noise Schedules and Sample Steps
    #: are Flawed") — required for checkpoints fine-tuned with zero-SNR
    #: v-prediction; pairs with ``timestep_spacing='trailing'``
    rescale_betas_zero_snr: bool = flax.struct.field(pytree_node=False,
                                                     default=False)


def betas_for_schedule(cfg: SchedulerConfig) -> np.ndarray:
    """Training beta schedule -> float64 numpy (host precision)."""
    n = cfg.num_train_timesteps
    if cfg.beta_schedule == "linear":
        return np.linspace(cfg.beta_start, cfg.beta_end, n, dtype=np.float64)
    if cfg.beta_schedule == "scaled_linear":
        return np.linspace(cfg.beta_start ** 0.5, cfg.beta_end ** 0.5, n,
                           dtype=np.float64) ** 2
    if cfg.beta_schedule == "squaredcos_cap_v2":
        def alpha_bar(t):
            return np.cos((t + 0.008) / 1.008 * np.pi / 2) ** 2
        ts = np.arange(n, dtype=np.float64)
        return np.minimum(1 - alpha_bar((ts + 1) / n) / alpha_bar(ts / n), 0.999)
    raise ValueError(f"unknown beta_schedule {cfg.beta_schedule!r}")


def rescale_zero_terminal_snr(alphas_cumprod: np.ndarray) -> np.ndarray:
    """Shift+scale sqrt(alpha_bar) so the last train step has SNR == 0.

    The linear map in sqrt-space keeps the first step's SNR and zeroes the
    last (Lin et al. 2024 §4, the published fix).  The terminal value is
    clamped to 2**-24 instead of exact 0 so sigma-space samplers
    (sigma = sqrt((1-a)/a)) stay finite."""
    sqrt_acp = np.sqrt(alphas_cumprod)
    a0, aT = sqrt_acp[0], sqrt_acp[-1]
    sqrt_acp = (sqrt_acp - aT) * (a0 / (a0 - aT))
    acp = sqrt_acp ** 2
    acp[-1] = max(acp[-1], 2.0 ** -24)
    return acp


def alphas_cumprod_for(cfg: SchedulerConfig) -> np.ndarray:
    acp = np.cumprod(1.0 - betas_for_schedule(cfg))
    if cfg.rescale_betas_zero_snr:
        acp = rescale_zero_terminal_snr(acp)
    return acp


def check_num_steps(cfg: SchedulerConfig, num_inference_steps: int):
    if not 1 <= num_inference_steps <= cfg.num_train_timesteps:
        raise ValueError(
            f"num_inference_steps={num_inference_steps} must be in "
            f"[1, num_train_timesteps={cfg.num_train_timesteps}]")


def leading_timesteps(cfg: SchedulerConfig, num_inference_steps: int) -> np.ndarray:
    """'leading' spacing used by the SD checkpoints (descending int array)."""
    check_num_steps(cfg, num_inference_steps)
    ratio = cfg.num_train_timesteps // num_inference_steps
    ts = (np.arange(0, num_inference_steps) * ratio).round().astype(np.int64)
    return ts[::-1].copy() + cfg.steps_offset


def spaced_timesteps(cfg: SchedulerConfig, num_inference_steps: int) -> np.ndarray:
    check_num_steps(cfg, num_inference_steps)
    if cfg.timestep_spacing == "leading":
        return leading_timesteps(cfg, num_inference_steps)
    if cfg.timestep_spacing == "linspace":
        return np.linspace(0, cfg.num_train_timesteps - 1,
                           num_inference_steps)[::-1].round().astype(np.int64).copy()
    if cfg.timestep_spacing == "trailing":
        ratio = cfg.num_train_timesteps / num_inference_steps
        ts = np.round(np.arange(cfg.num_train_timesteps, 0, -ratio)).astype(np.int64) - 1
        return ts.copy()
    raise ValueError(f"unknown timestep_spacing {cfg.timestep_spacing!r}")


def pred_original_sample(eps: jax.Array, sample: jax.Array, alpha_prod_t,
                         prediction_type: str) -> jax.Array:
    """x0 prediction from the model output under the given parameterisation."""
    if prediction_type == "epsilon":
        return (sample - jnp.sqrt(1.0 - alpha_prod_t) * eps) / jnp.sqrt(alpha_prod_t)
    if prediction_type == "v_prediction":
        return jnp.sqrt(alpha_prod_t) * sample - jnp.sqrt(1.0 - alpha_prod_t) * eps
    if prediction_type == "sample":
        return eps
    raise ValueError(f"unknown prediction_type {prediction_type!r}")


def transition_noise(sub, sample, tables):
    """Stochastic-transition noise for one sampler step.

    Default: independent noise per batch row (each sample is its own
    trajectory).  With ``tables["frozen_noise"]`` (``Engine(
    frozen_noise=True)``) ONE noise field broadcasts across the batch:
    a latent-walk dispatch batches ADJACENT frames of one video
    trajectory, where per-frame transition noise in stochastic samplers
    (lcm, euler_ancestral, ddim eta>0) reads as temporal flicker — the
    same rationale as vid2vid's single frozen re-noising sample
    (pipeline/walk.py).  The flag is static tables metadata, so each
    mode compiles its own program.
    """
    if "frozen_noise" in tables and tables["frozen_noise"]:
        n = jax.random.normal(sub, sample.shape[1:], dtype=sample.dtype)
        return jnp.broadcast_to(n, sample.shape)
    return jax.random.normal(sub, sample.shape, dtype=sample.dtype)


class Scheduler:
    """Interface shared by all samplers.  Subclasses are stateless namespaces;
    all data lives in (tables, state) pytrees."""

    name: str = "base"
    #: how many i.i.d. noise draws the sampler consumes per trajectory
    #: (ancestral samplers); used to document determinism.
    stochastic: bool = False

    def make_tables(self, cfg: SchedulerConfig, num_inference_steps: int):
        raise NotImplementedError

    def init_state(self, tables, latent_shape, key: Optional[jax.Array] = None):
        """``latent_shape`` includes the batch dim; key only for stochastic
        samplers (a dummy key is fine otherwise)."""
        return {}

    def init_noise_sigma(self, tables) -> jax.Array:
        return tables["init_noise_sigma"]

    def scale_model_input(self, tables, state, i, sample):
        return sample

    def timestep(self, tables, i):
        """The training-timestep fed to the UNet at loop index ``i``."""
        return tables["timesteps"][i]

    def num_loop_steps(self, tables) -> int:
        """Number of loop iterations (== len(timesteps); PNDM repeats one)."""
        return int(tables["timesteps"].shape[0])

    def step(self, tables, state, i, model_output, sample):
        raise NotImplementedError

    def add_noise(self, tables, original, noise, timestep):
        acp = tables["alphas_cumprod"][timestep]
        return jnp.sqrt(acp) * original + jnp.sqrt(1.0 - acp) * noise


@jax.tree_util.register_pytree_node_class
class SchedTables:
    """Pytree wrapper for scheduler tables: arrays are traced children,
    metadata (strings/bools/ints like ``prediction_type``) is static aux
    data — so tables pass straight through ``jax.jit`` argument lists and
    python branching on the metadata stays legal inside traced code."""

    def __init__(self, entries: dict):
        self._d = dict(entries)

    def __getitem__(self, k):
        return self._d[k]

    def __contains__(self, k):
        return k in self._d

    def items(self):
        return self._d.items()

    @staticmethod
    def _is_array(v) -> bool:
        return hasattr(v, "dtype") and hasattr(v, "shape")

    def tree_flatten(self):
        arr_keys = tuple(sorted(k for k, v in self._d.items()
                                if self._is_array(v)))
        static = tuple(sorted((k, v) for k, v in self._d.items()
                              if not self._is_array(v)))
        return [self._d[k] for k in arr_keys], (arr_keys, static)

    @classmethod
    def tree_unflatten(cls, aux, children):
        arr_keys, static = aux
        d = dict(zip(arr_keys, children))
        d.update(dict(static))
        return cls(d)


_REGISTRY: dict[str, Any] = {}


def register(cls):
    _REGISTRY[cls.name] = cls()
    return cls


def get_scheduler(name: str) -> Scheduler:
    """Look up a sampler by name ('ddim', 'pndm', 'lms', 'euler',
    'euler_ancestral', 'dpm', 'unipc', 'lcm')."""
    from . import ddim, dpm, euler, lcm, lms, pndm, unipc  # noqa: F401  (registration)
    if name not in _REGISTRY:
        raise KeyError(f"unknown scheduler {name!r}; have {sorted(_REGISTRY)}")
    return _REGISTRY[name]
