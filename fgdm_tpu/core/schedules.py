"""Diffusion noise schedules and DDIM sub-schedule tables.

TPU-first design notes
----------------------
All schedule quantities are precomputed once on host in float64 (numerical
parity with the reference, which builds its buffers in float64 before casting:
`/root/reference/ldm/modules/diffusionmodules/util.py:21-44`,
`/root/reference/ldm/models/diffusion/ddpm.py:175-227`) and stored as a frozen
pytree of float32 ``jnp`` arrays.  Inside a jitted sampler the per-step values
are gathered with a static index table, so the whole schedule lives in device
constants — no host sync, no recompile per step count (one compile per
(num_steps, eta) pair, which are static hyperparameters).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Literal, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "make_beta_schedule",
    "make_ddim_timesteps",
    "DiffusionSchedule",
    "DDIMSchedule",
]


def make_beta_schedule(
    schedule: str,
    n_timestep: int,
    linear_start: float = 1e-4,
    linear_end: float = 2e-2,
    cosine_s: float = 8e-3,
) -> np.ndarray:
    """Beta schedule, float64, matching reference `util.py:21-44` semantics."""
    if schedule == "linear":
        betas = (
            np.linspace(linear_start**0.5, linear_end**0.5, n_timestep, dtype=np.float64)
            ** 2
        )
    elif schedule == "cosine":
        timesteps = np.arange(n_timestep + 1, dtype=np.float64) / n_timestep + cosine_s
        alphas = np.cos(timesteps / (1 + cosine_s) * math.pi / 2) ** 2
        alphas = alphas / alphas[0]
        betas = 1.0 - alphas[1:] / alphas[:-1]
        betas = np.clip(betas, 0.0, 0.999)
    elif schedule == "sqrt_linear":
        betas = np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64)
    elif schedule == "sqrt":
        betas = np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64) ** 0.5
    else:
        raise ValueError(f"schedule '{schedule}' unknown.")
    return betas


def make_ddim_timesteps(
    ddim_discr_method: str, num_ddim_timesteps: int, num_ddpm_timesteps: int
) -> np.ndarray:
    """DDIM sub-sequence of DDPM timesteps (reference `util.py:46-60`)."""
    if ddim_discr_method == "uniform":
        c = num_ddpm_timesteps // num_ddim_timesteps
        ddim_timesteps = np.asarray(list(range(0, num_ddpm_timesteps, c)))
    elif ddim_discr_method == "quad":
        ddim_timesteps = (
            np.linspace(0, np.sqrt(num_ddpm_timesteps * 0.8), num_ddim_timesteps) ** 2
        ).astype(int)
    else:
        raise NotImplementedError(f"unknown ddim discretization: {ddim_discr_method}")
    # +1 to get final alphas right (first-scale-to-data step), as in
    # reference; clamp because for non-divisor S the last entry would be T
    # (the reference only ever uses divisor step counts like 50/20 of 1000).
    return np.minimum(ddim_timesteps + 1, num_ddpm_timesteps - 1)


@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """All DDPM schedule buffers (reference `ddpm.py:175-227`), float32 jnp.

    Shapes are all ``[T]``.  This is a pytree of constants: pass it into a
    jitted function freely; XLA folds it into the executable.
    """

    num_timesteps: int
    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    log_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray
    lvlb_weights: jnp.ndarray
    # Float64 values kept as a hashable tuple (static pytree metadata) for
    # exact DDIM table derivation even after jit round trips.
    _alphas_cumprod_f64: Optional[Tuple[float, ...]] = dataclasses.field(
        repr=False, compare=False, default=None
    )

    @property
    def _alphas_cumprod_np(self) -> Optional[np.ndarray]:
        if self._alphas_cumprod_f64 is None:
            return None
        return np.asarray(self._alphas_cumprod_f64, dtype=np.float64)

    @staticmethod
    def create(
        timesteps: int = 1000,
        beta_schedule: str = "linear",
        linear_start: float = 1e-4,
        linear_end: float = 2e-2,
        cosine_s: float = 8e-3,
        v_posterior: float = 0.0,
        parameterization: Literal["eps", "x0", "v"] = "eps",
    ) -> "DiffusionSchedule":
        betas = make_beta_schedule(
            beta_schedule, timesteps, linear_start=linear_start,
            linear_end=linear_end, cosine_s=cosine_s,
        )
        alphas = 1.0 - betas
        alphas_cumprod = np.cumprod(alphas, axis=0)
        alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])

        posterior_variance = (1 - v_posterior) * betas * (
            1.0 - alphas_cumprod_prev
        ) / (1.0 - alphas_cumprod) + v_posterior * betas
        posterior_log_variance_clipped = np.log(np.maximum(posterior_variance, 1e-20))
        posterior_mean_coef1 = betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)
        posterior_mean_coef2 = (
            (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)
        )

        if parameterization == "eps":
            with np.errstate(divide="ignore"):
                lvlb_weights = betas**2 / (
                    2 * posterior_variance * alphas * (1 - alphas_cumprod)
                )
            lvlb_weights = np.asarray(lvlb_weights)
            # t=0 weight is 0/0; reference pins it to weight[1] (ddpm.py:225-227)
            lvlb_weights[0] = lvlb_weights[1]
        elif parameterization == "x0":
            lvlb_weights = 0.5 * np.sqrt(alphas_cumprod) / (2.0 * 1 - alphas_cumprod)
        elif parameterization == "v":
            # matches controlnet/ldm v-param ELBO weighting
            lvlb_weights = np.ones_like(betas)
        else:
            raise ValueError(parameterization)

        f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)
        return DiffusionSchedule(
            num_timesteps=int(timesteps),
            betas=f32(betas),
            alphas_cumprod=f32(alphas_cumprod),
            alphas_cumprod_prev=f32(alphas_cumprod_prev),
            sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
            sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
            log_one_minus_alphas_cumprod=f32(np.log(1.0 - alphas_cumprod)),
            sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod)),
            sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod - 1)),
            posterior_variance=f32(posterior_variance),
            posterior_log_variance_clipped=f32(posterior_log_variance_clipped),
            posterior_mean_coef1=f32(posterior_mean_coef1),
            posterior_mean_coef2=f32(posterior_mean_coef2),
            lvlb_weights=f32(lvlb_weights),
            _alphas_cumprod_f64=tuple(float(a) for a in alphas_cumprod),
        )

    # -- q(x_t | x_0) -------------------------------------------------------
    def q_sample(self, x_start, t, noise):
        """Forward-process sample; `t` is an int array of shape [B]."""
        a = self.sqrt_alphas_cumprod[t].reshape((-1,) + (1,) * (x_start.ndim - 1))
        s = self.sqrt_one_minus_alphas_cumprod[t].reshape(
            (-1,) + (1,) * (x_start.ndim - 1)
        )
        return a * x_start.astype(jnp.float32) + s * noise.astype(jnp.float32)

    def predict_start_from_noise(self, x_t, t, noise):
        ra = self.sqrt_recip_alphas_cumprod[t].reshape((-1,) + (1,) * (x_t.ndim - 1))
        rm = self.sqrt_recipm1_alphas_cumprod[t].reshape((-1,) + (1,) * (x_t.ndim - 1))
        return ra * x_t - rm * noise

    def get_v(self, x, noise, t):
        a = self.sqrt_alphas_cumprod[t].reshape((-1,) + (1,) * (x.ndim - 1))
        s = self.sqrt_one_minus_alphas_cumprod[t].reshape((-1,) + (1,) * (x.ndim - 1))
        return a * noise - s * x

    def predict_start_from_v(self, x_t, t, v):
        a = self.sqrt_alphas_cumprod[t].reshape((-1,) + (1,) * (x_t.ndim - 1))
        s = self.sqrt_one_minus_alphas_cumprod[t].reshape((-1,) + (1,) * (x_t.ndim - 1))
        return a * x_t - s * v


@dataclasses.dataclass(frozen=True)
class DDIMSchedule:
    """DDIM sub-schedule (reference `util.py:63-76`, `ddim.py:26-55`).

    ``timesteps[i]`` is the DDPM t fed to the model at scan step i (ascending;
    the sampler scans it reversed).  All arrays have shape ``[S]``.
    """

    num_steps: int
    eta: float
    timesteps: jnp.ndarray          # int32 [S]
    alphas: jnp.ndarray             # alpha_cumprod at each selected t
    alphas_prev: jnp.ndarray
    sqrt_one_minus_alphas: jnp.ndarray
    sigmas: jnp.ndarray

    @staticmethod
    def create(
        schedule: DiffusionSchedule,
        num_steps: int,
        eta: float = 0.0,
        discretize: str = "uniform",
    ) -> "DDIMSchedule":
        ts = make_ddim_timesteps(discretize, num_steps, schedule.num_timesteps)
        acp = schedule._alphas_cumprod_np
        if acp is None:  # reconstructed schedule (e.g. from checkpoint betas)
            acp = np.asarray(schedule.alphas_cumprod, dtype=np.float64)
        alphas = acp[ts]
        alphas_prev = np.asarray([acp[0]] + acp[ts[:-1]].tolist())
        sigmas = eta * np.sqrt(
            (1 - alphas_prev) / (1 - alphas) * (1 - alphas / alphas_prev)
        )
        f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)
        return DDIMSchedule(
            num_steps=int(len(ts)),
            eta=float(eta),
            timesteps=jnp.asarray(ts, dtype=jnp.int32),
            alphas=f32(alphas),
            alphas_prev=f32(alphas_prev),
            sqrt_one_minus_alphas=f32(np.sqrt(1.0 - alphas)),
            sigmas=f32(sigmas),
        )


# Register the schedules as pytrees so they can be jit/pjit arguments
# (arrays = leaves; step counts and the f64 table = static metadata).
jax.tree_util.register_dataclass(
    DiffusionSchedule,
    data_fields=[
        "betas", "alphas_cumprod", "alphas_cumprod_prev",
        "sqrt_alphas_cumprod", "sqrt_one_minus_alphas_cumprod",
        "log_one_minus_alphas_cumprod", "sqrt_recip_alphas_cumprod",
        "sqrt_recipm1_alphas_cumprod", "posterior_variance",
        "posterior_log_variance_clipped", "posterior_mean_coef1",
        "posterior_mean_coef2", "lvlb_weights",
    ],
    meta_fields=["num_timesteps", "_alphas_cumprod_f64"],
)
jax.tree_util.register_dataclass(
    DDIMSchedule,
    data_fields=[
        "timesteps", "alphas", "alphas_prev", "sqrt_one_minus_alphas",
        "sigmas",
    ],
    meta_fields=["num_steps", "eta"],
)
