"""Gaussian diffusion core (DDPM/DDIM), TPU-native.

Capability parity with the reference diffusion core
(/root/reference/improved_diffusion/gaussian_diffusion.py:101-963 and
respace.py:63-124), re-designed for XLA:

  * All schedule tables are precomputed on host in float64 (numpy) and enter
    the compiled program as float32 constants — no host<->device traffic in
    the hot loop.
  * ``p_sample_loop``/``ddim_sample_loop`` compile the full reverse
    trajectory into a single ``lax.scan`` so a 1000-step sampler never leaves
    HBM.
  * Timestep respacing is folded in (no subclass): ``timestep_map`` remaps
    spaced steps to original-process steps inside the jitted model call.
  * The model is a plain function ``model_fn(x, t, **kwargs) -> out`` — any
    closure over Flax params works; the core is functional and jit-safe.

Known reference bugs NOT replicated (documented in SURVEY.md §7):
  * learned-variance channel split used ``x.shape[:2]`` which is (B, T) for
    video tensors; we split on the true channel axis (-3).
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .losses import discretized_gaussian_log_likelihood, normal_kl
from .schedules import (
    get_named_beta_schedule,
    respaced_betas,
    space_timesteps,
    space_timesteps_lambda_uniform,
)


class ModelMeanType(enum.Enum):
    """Which quantity the model predicts."""

    PREVIOUS_X = enum.auto()
    START_X = enum.auto()
    EPSILON = enum.auto()


class ModelVarType(enum.Enum):
    """How the reverse-process variance is obtained."""

    LEARNED = enum.auto()
    FIXED_SMALL = enum.auto()
    FIXED_LARGE = enum.auto()
    LEARNED_RANGE = enum.auto()


class LossType(enum.Enum):
    MSE = enum.auto()
    RESCALED_MSE = enum.auto()
    KL = enum.auto()
    RESCALED_KL = enum.auto()

    def is_vb(self):
        return self in (LossType.KL, LossType.RESCALED_KL)


def mean_flat(tensor, mask=None):
    """Mean over all non-batch dims; optional multiplicative mask.

    NOTE: like the reference (nn.py:86-92) this does NOT renormalize by the
    mask size — the loss scale depends on the number of masked frames by
    design (frames-per-video weighting is implicit).
    """
    if mask is not None:
        tensor = tensor * mask
    return tensor.mean(axis=tuple(range(1, tensor.ndim)))


def _extract(table: np.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather per-timestep scalars and reshape for broadcasting.

    ``table`` is a host float64 numpy array; it becomes an f32 XLA constant.
    ``t`` is an int array of shape (B,). Output shape: (B, 1, 1, ...).
    """
    vals = jnp.asarray(table, dtype=jnp.float32)[t]
    return vals.reshape(vals.shape + (1,) * (ndim - 1))


ModelFn = Callable[..., jnp.ndarray]


@dataclasses.dataclass(frozen=True)
class GaussianDiffusion:
    """Immutable diffusion process definition + table cache.

    Construct via :meth:`create` (config-level, handles respacing) or directly
    from a beta array. Instances are static from JAX's perspective: methods
    trace to pure functions of their array arguments.
    """

    betas: np.ndarray
    model_mean_type: ModelMeanType
    model_var_type: ModelVarType
    loss_type: LossType
    rescale_timesteps: bool = False
    # Respacing: map from spaced step -> original step. None = no respacing.
    timestep_map: Optional[np.ndarray] = None
    original_num_steps: Optional[int] = None

    # ---- construction ----

    def __post_init__(self):
        betas = np.asarray(self.betas, dtype=np.float64)
        assert betas.ndim == 1 and (betas > 0).all() and (betas <= 1).all()
        object.__setattr__(self, "betas", betas)
        if self.original_num_steps is None:
            object.__setattr__(self, "original_num_steps", len(betas))

        alphas = 1.0 - betas
        acp = np.cumprod(alphas)
        acp_prev = np.append(1.0, acp[:-1])
        acp_next = np.append(acp[1:], 0.0)
        post_var = betas * (1.0 - acp_prev) / (1.0 - acp)
        tables = dict(
            alphas_cumprod=acp,
            alphas_cumprod_prev=acp_prev,
            alphas_cumprod_next=acp_next,
            sqrt_alphas_cumprod=np.sqrt(acp),
            sqrt_one_minus_alphas_cumprod=np.sqrt(1.0 - acp),
            log_one_minus_alphas_cumprod=np.log(1.0 - acp),
            sqrt_recip_alphas_cumprod=np.sqrt(1.0 / acp),
            sqrt_recipm1_alphas_cumprod=np.sqrt(1.0 / acp - 1),
            posterior_variance=post_var,
            posterior_log_variance_clipped=np.log(np.append(post_var[1], post_var[1:])),
            posterior_mean_coef1=betas * np.sqrt(acp_prev) / (1.0 - acp),
            posterior_mean_coef2=(1.0 - acp_prev) * np.sqrt(alphas) / (1.0 - acp),
            # FIXED_LARGE variance: beta_t with the t=0 slot patched to the
            # posterior variance for a better decoder likelihood.
            fixed_large_variance=np.append(post_var[1], betas[1:]),
        )
        tables["fixed_large_log_variance"] = np.log(tables["fixed_large_variance"])
        object.__setattr__(self, "_tables", tables)

    @classmethod
    def create(
        cls,
        *,
        steps: int = 1000,
        noise_schedule: str = "linear",
        timestep_respacing: str = "",
        learn_sigma: bool = False,
        sigma_small: bool = False,
        use_kl: bool = False,
        predict_xstart: bool = False,
        rescale_timesteps: bool = False,
        rescale_learned_sigmas: bool = False,
    ) -> "GaussianDiffusion":
        """Config-level constructor, mirroring script_util.create_gaussian_diffusion."""
        betas = get_named_beta_schedule(noise_schedule, steps)
        if use_kl:
            loss_type = LossType.RESCALED_KL
        elif rescale_learned_sigmas:
            loss_type = LossType.RESCALED_MSE
        else:
            loss_type = LossType.MSE
        timestep_map = None
        if timestep_respacing:
            if isinstance(timestep_respacing, str) and timestep_respacing.startswith("dpm"):
                # "dpmN": N timesteps uniform in half-log-SNR (lambda) space —
                # the DPM-Solver lattice (schedules.py). Beyond-reference spec;
                # all reference specs ("N", "a,b,c", "ddimN") are unchanged.
                use_ts = space_timesteps_lambda_uniform(
                    betas, int(timestep_respacing[len("dpm"):]))
            else:
                use_ts = space_timesteps(steps, timestep_respacing)
            betas, timestep_map = respaced_betas(betas, use_ts)
        return cls(
            betas=betas,
            model_mean_type=ModelMeanType.EPSILON if not predict_xstart else ModelMeanType.START_X,
            model_var_type=(
                (ModelVarType.FIXED_LARGE if not sigma_small else ModelVarType.FIXED_SMALL)
                if not learn_sigma
                else ModelVarType.LEARNED_RANGE
            ),
            loss_type=loss_type,
            rescale_timesteps=rescale_timesteps,
            timestep_map=timestep_map,
            original_num_steps=steps,
        )

    # ---- properties ----

    @property
    def num_timesteps(self) -> int:
        return int(self.betas.shape[0])

    def table(self, name: str) -> np.ndarray:
        return self._tables[name]

    # ---- timestep handling ----

    def _model_t(self, t: jnp.ndarray) -> jnp.ndarray:
        """Map spaced-domain t to what the model should see.

        Folds the reference's _WrappedModel remap (respace.py:110-124) and
        _scale_timesteps into one place.
        """
        if self.timestep_map is not None:
            t = jnp.asarray(self.timestep_map, dtype=jnp.int32)[t]
        if self.rescale_timesteps:
            t = t.astype(jnp.float32) * (1000.0 / self.original_num_steps)
        return t

    def call_model(self, model_fn: ModelFn, x, t, model_kwargs=None) -> jnp.ndarray:
        model_kwargs = model_kwargs or {}
        return model_fn(x, self._model_t(t), **model_kwargs)

    # ---- forward process q ----

    def q_mean_variance(self, x_start, t):
        mean = _extract(self.table("sqrt_alphas_cumprod"), t, x_start.ndim) * x_start
        variance = _extract(1.0 - self.table("alphas_cumprod"), t, x_start.ndim)
        log_variance = _extract(self.table("log_one_minus_alphas_cumprod"), t, x_start.ndim)
        return mean, variance, log_variance

    def q_sample(self, x_start, t, noise):
        """Sample q(x_t | x_0) with given noise (pass explicit noise for jit)."""
        assert noise.shape == x_start.shape
        return (
            _extract(self.table("sqrt_alphas_cumprod"), t, x_start.ndim) * x_start
            + _extract(self.table("sqrt_one_minus_alphas_cumprod"), t, x_start.ndim) * noise
        )

    def q_posterior_mean_variance(self, x_start, x_t, t):
        assert x_start.shape == x_t.shape
        posterior_mean = (
            _extract(self.table("posterior_mean_coef1"), t, x_t.ndim) * x_start
            + _extract(self.table("posterior_mean_coef2"), t, x_t.ndim) * x_t
        )
        posterior_variance = _extract(self.table("posterior_variance"), t, x_t.ndim)
        posterior_log_variance = _extract(
            self.table("posterior_log_variance_clipped"), t, x_t.ndim
        )
        return posterior_mean, posterior_variance, posterior_log_variance

    # ---- reverse process p ----

    def p_mean_variance_from_output(
        self, model_output, x, t, clip_denoised=True, denoised_fn=None
    ) -> dict:
        """Invert a raw model output into (mean, variance, pred_xstart).

        Split from the model call so training can reuse it with a frozen
        output (learned-sigma VB term) without a second forward pass.
        """
        if self.model_var_type in (ModelVarType.LEARNED, ModelVarType.LEARNED_RANGE):
            # Channel axis is -3 for (..., C, H, W) tensors (video: B,T,C,H,W).
            C = x.shape[-3]
            assert model_output.shape[-3] == 2 * C, (
                f"learned-variance model must output 2*C={2*C} channels, got "
                f"{model_output.shape[-3]}"
            )
            model_output, model_var_values = jnp.split(model_output, 2, axis=-3)
            if self.model_var_type == ModelVarType.LEARNED:
                model_log_variance = model_var_values
                model_variance = jnp.exp(model_log_variance)
            else:
                min_log = _extract(self.table("posterior_log_variance_clipped"), t, x.ndim)
                max_log = _extract(np.log(self.betas), t, x.ndim)
                frac = (model_var_values + 1) / 2  # model emits [-1, 1]
                model_log_variance = frac * max_log + (1 - frac) * min_log
                model_variance = jnp.exp(model_log_variance)
        else:
            var_table, logvar_table = {
                ModelVarType.FIXED_LARGE: ("fixed_large_variance", "fixed_large_log_variance"),
                ModelVarType.FIXED_SMALL: ("posterior_variance", "posterior_log_variance_clipped"),
            }[self.model_var_type]
            model_variance = jnp.broadcast_to(_extract(self.table(var_table), t, x.ndim), x.shape)
            model_log_variance = jnp.broadcast_to(
                _extract(self.table(logvar_table), t, x.ndim), x.shape
            )

        def process_xstart(xs):
            if denoised_fn is not None:
                xs = denoised_fn(xs)
            if clip_denoised:
                xs = jnp.clip(xs, -1.0, 1.0)
            return xs

        if self.model_mean_type == ModelMeanType.PREVIOUS_X:
            pred_xstart = process_xstart(self._predict_xstart_from_xprev(x, t, model_output))
            model_mean = model_output
        elif self.model_mean_type in (ModelMeanType.START_X, ModelMeanType.EPSILON):
            if self.model_mean_type == ModelMeanType.START_X:
                pred_xstart = process_xstart(model_output)
            else:
                pred_xstart = process_xstart(self._predict_xstart_from_eps(x, t, model_output))
            model_mean, _, _ = self.q_posterior_mean_variance(pred_xstart, x, t)
        else:
            raise NotImplementedError(self.model_mean_type)

        return {
            "mean": model_mean,
            "variance": model_variance,
            "log_variance": jnp.broadcast_to(model_log_variance, x.shape),
            "pred_xstart": pred_xstart,
        }

    def p_mean_variance(
        self, model_fn, x, t, clip_denoised=True, denoised_fn=None, model_kwargs=None
    ) -> dict:
        model_output = self.call_model(model_fn, x, t, model_kwargs)
        return self.p_mean_variance_from_output(
            model_output, x, t, clip_denoised=clip_denoised, denoised_fn=denoised_fn
        )

    def _predict_xstart_from_eps(self, x_t, t, eps):
        return (
            _extract(self.table("sqrt_recip_alphas_cumprod"), t, x_t.ndim) * x_t
            - _extract(self.table("sqrt_recipm1_alphas_cumprod"), t, x_t.ndim) * eps
        )

    def _predict_xstart_from_xprev(self, x_t, t, xprev):
        coef1 = self.table("posterior_mean_coef1")
        coef2 = self.table("posterior_mean_coef2")
        return (
            _extract(1.0 / coef1, t, x_t.ndim) * xprev
            - _extract(coef2 / coef1, t, x_t.ndim) * x_t
        )

    def _predict_eps_from_xstart(self, x_t, t, pred_xstart):
        return (
            _extract(self.table("sqrt_recip_alphas_cumprod"), t, x_t.ndim) * x_t - pred_xstart
        ) / _extract(self.table("sqrt_recipm1_alphas_cumprod"), t, x_t.ndim)

    # ---- sampling ----

    @staticmethod
    def _ancestral_update(pmv: dict, x, t, rng):
        """Draw x_{t-1} from the posterior params; no noise at t == 0."""
        noise = jax.random.normal(rng, x.shape, dtype=x.dtype)
        nonzero_mask = (t != 0).astype(x.dtype).reshape((-1,) + (1,) * (x.ndim - 1))
        return pmv["mean"] + nonzero_mask * jnp.exp(0.5 * pmv["log_variance"]) * noise

    def p_sample(
        self, model_fn, x, t, rng, clip_denoised=True, denoised_fn=None, model_kwargs=None
    ) -> dict:
        """One ancestral step x_t -> x_{t-1}. No noise added at t == 0."""
        out = self.p_mean_variance(
            model_fn, x, t, clip_denoised=clip_denoised, denoised_fn=denoised_fn,
            model_kwargs=model_kwargs,
        )
        sample = self._ancestral_update(out, x, t, rng)
        return {"sample": sample, "pred_xstart": out["pred_xstart"]}

    def p_sample_loop(
        self,
        model_fn,
        shape,
        rng,
        *,
        noise=None,
        clip_denoised=True,
        denoised_fn=None,
        model_kwargs=None,
        dtype=jnp.float32,
        return_attn_weights=False,
        encoder_reuse=1,
        model_fn_features=None,
    ):
        """Full ancestral sampler as one on-device ``lax.scan``.

        ``encoder_reuse=k`` (k > 1) enables training-free encoder
        propagation (arXiv:2312.09608): the U-Net's down+middle path runs
        only every k-th step and the decoder reuses the cached skip
        features (with CURRENT timestep conditioning) in between, cutting
        the encoder's FLOPs from the other steps. Requires
        ``model_fn_features(x, t, features_or_None) -> (out, features)``
        (see ``UNetVideoModel`` ``features``/``return_features``); the
        branch choice is a ``lax.cond`` on the step index so the whole
        trajectory stays one compiled scan. Approximate by design — opt-in,
        never the default path.

        Replaces the reference's host-side Python loop
        (gaussian_diffusion.py:473-522); the entire trajectory stays in HBM
        and the model is compiled exactly once.

        ``return_attn_weights=True`` reproduces the reference's per-quartile
        attention-heatmap averaging (gaussian_diffusion.py:448-469) on
        device: ``model_fn`` must then return ``(out, attns)`` with
        ``attns = {"temporal": [per-layer (B, T, T)],
        "spatial": [per-layer (B, S_l, S_l)]}`` (the video U-Net's
        ``return_attn_weights`` output), and the call returns
        ``(img, {"attn/q{q}-temporal": (B, T, T),
        "attn/q{q}-spatial": (B, S, S)})`` — layer maps summed (spatial ones
        nearest-resized to the first layer's shape and mean-renormalized,
        matching the reference), averaged over each diffusion quartile.
        """
        rng, init_rng = jax.random.split(rng)
        img = noise if noise is not None else jax.random.normal(init_rng, shape, dtype=dtype)
        B = shape[0]

        if encoder_reuse > 1:
            assert model_fn_features is not None, (
                "encoder_reuse needs model_fn_features(x, t, features) -> (out, features)"
            )
            assert not return_attn_weights, "encoder_reuse + attn logging unsupported"
            # Carry the feature pytree; structure from an abstract trace.
            _, feat_shapes = jax.eval_shape(
                lambda x, ts: model_fn_features(x, ts, None),
                jax.ShapeDtypeStruct(tuple(shape), dtype),
                jax.ShapeDtypeStruct((B,), jnp.int32),
            )
            feats0 = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), feat_shapes)

            def step(carry, si):
                img, rng, feats = carry
                i, s = si
                rng, key = jax.random.split(rng)
                t = jnp.full((B,), s, dtype=jnp.int32)
                mt = self._model_t(t)

                def full(img, mt, feats):
                    return model_fn_features(img, mt, None)

                def reuse(img, mt, feats):
                    return model_fn_features(img, mt, feats)

                out, feats = jax.lax.cond(i % encoder_reuse == 0, full, reuse,
                                          img, mt, feats)
                pmv = self.p_mean_variance_from_output(
                    out, img, t, clip_denoised=clip_denoised, denoised_fn=denoised_fn,
                )
                sample = self._ancestral_update(pmv, img, t, key)
                return (sample, rng, feats), None

            steps = jnp.arange(self.num_timesteps - 1, -1, -1)
            idx = jnp.arange(self.num_timesteps)
            (img, _, _), _ = jax.lax.scan(step, (img, rng, feats0), (idx, steps))
            return img

        if not return_attn_weights:
            def step(carry, s):
                img, rng = carry
                rng, key = jax.random.split(rng)
                t = jnp.full((B,), s, dtype=jnp.int32)
                out = self.p_sample(
                    model_fn, img, t, key, clip_denoised=clip_denoised,
                    denoised_fn=denoised_fn, model_kwargs=model_kwargs,
                )
                return (out["sample"], rng), None

            steps = jnp.arange(self.num_timesteps - 1, -1, -1)
            (img, _), _ = jax.lax.scan(step, (img, rng), steps)
            return img

        kwargs = model_kwargs or {}
        # Static attn layer shapes (to build the scan carry) via eval_shape.
        _, attn_shapes = jax.eval_shape(
            lambda x, ts: model_fn(x, ts, **kwargs),
            jax.ShapeDtypeStruct(tuple(shape), dtype),
            jax.ShapeDtypeStruct((B,), jnp.int32),
        )
        T_attn = attn_shapes["temporal"][0].shape[-1]
        s_target = attn_shapes["spatial"][0].shape[-1]  # first layer, like the reference
        quarter = self.num_timesteps / 4.0

        def combine_spatial(layers):
            acc = jnp.zeros((B, s_target, s_target), jnp.float32)
            for a in layers:
                a = a.astype(jnp.float32)
                s_l = a.shape[-1]
                if s_l != s_target:
                    assert s_target % s_l == 0, (s_target, s_l)
                    r = s_target // s_l
                    # repeat-upsampling preserves the mean exactly, so the
                    # reference's post-interpolate renormalization
                    # (up/up.mean()*a.mean()) is an identity here — omitted.
                    a = jnp.repeat(jnp.repeat(a, r, axis=-2), r, axis=-1)
                acc = acc + a
            return acc

        def step(carry, s):
            img, rng, acc_t, acc_s = carry
            rng, key = jax.random.split(rng)
            t = jnp.full((B,), s, dtype=jnp.int32)
            out, attns = model_fn(img, self._model_t(t), **kwargs)
            pmv = self.p_mean_variance_from_output(
                out, img, t, clip_denoised=clip_denoised, denoised_fn=denoised_fn,
            )
            sample = self._ancestral_update(pmv, img, t, key)

            q = (4 * s) // self.num_timesteps
            lt = sum(a.astype(jnp.float32) for a in attns["temporal"])
            ls = combine_spatial(attns["spatial"])
            acc_t = acc_t.at[q].add(lt / quarter)
            acc_s = acc_s.at[q].add(ls / quarter)
            return (sample, rng, acc_t, acc_s), None

        acc_t0 = jnp.zeros((4, B, T_attn, T_attn), jnp.float32)
        acc_s0 = jnp.zeros((4, B, s_target, s_target), jnp.float32)
        steps = jnp.arange(self.num_timesteps - 1, -1, -1)
        (img, _, acc_t, acc_s), _ = jax.lax.scan(step, (img, rng, acc_t0, acc_s0), steps)
        attns_out = {}
        for q in range(4):
            attns_out[f"attn/q{q}-temporal"] = acc_t[q]
            attns_out[f"attn/q{q}-spatial"] = acc_s[q]
        return img, attns_out

    def p_sample_loop_progressive(
        self, model_fn, shape, rng, *, noise=None, clip_denoised=True,
        denoised_fn=None, model_kwargs=None, dtype=jnp.float32,
    ):
        """Host-side generator over per-step outputs (debug / attn logging).

        Each step is individually jit-compatible; use :meth:`p_sample_loop`
        for the fused fast path.
        """
        rng, init_rng = jax.random.split(rng)
        img = noise if noise is not None else jax.random.normal(init_rng, shape, dtype=dtype)
        B = shape[0]
        for s in range(self.num_timesteps - 1, -1, -1):
            rng, key = jax.random.split(rng)
            t = jnp.full((B,), s, dtype=jnp.int32)
            out = self.p_sample(
                model_fn, img, t, key, clip_denoised=clip_denoised,
                denoised_fn=denoised_fn, model_kwargs=model_kwargs,
            )
            yield out
            img = out["sample"]

    def ddim_sample(
        self, model_fn, x, t, rng, clip_denoised=True, denoised_fn=None,
        model_kwargs=None, eta=0.0,
    ) -> dict:
        """One DDIM step (Song et al. Eq. 12)."""
        out = self.p_mean_variance(
            model_fn, x, t, clip_denoised=clip_denoised, denoised_fn=denoised_fn,
            model_kwargs=model_kwargs,
        )
        eps = self._predict_eps_from_xstart(x, t, out["pred_xstart"])
        alpha_bar = _extract(self.table("alphas_cumprod"), t, x.ndim)
        alpha_bar_prev = _extract(self.table("alphas_cumprod_prev"), t, x.ndim)
        sigma = (
            eta
            * jnp.sqrt((1 - alpha_bar_prev) / (1 - alpha_bar))
            * jnp.sqrt(1 - alpha_bar / alpha_bar_prev)
        )
        noise = jax.random.normal(rng, x.shape, dtype=x.dtype)
        mean_pred = (
            out["pred_xstart"] * jnp.sqrt(alpha_bar_prev)
            + jnp.sqrt(1 - alpha_bar_prev - sigma**2) * eps
        )
        nonzero_mask = (t != 0).astype(x.dtype).reshape((-1,) + (1,) * (x.ndim - 1))
        sample = mean_pred + nonzero_mask * sigma * noise
        return {"sample": sample, "pred_xstart": out["pred_xstart"]}

    def ddim_reverse_sample(
        self, model_fn, x, t, clip_denoised=True, denoised_fn=None, model_kwargs=None,
    ) -> dict:
        """One deterministic DDIM reverse-ODE step x_t -> x_{t+1}."""
        out = self.p_mean_variance(
            model_fn, x, t, clip_denoised=clip_denoised, denoised_fn=denoised_fn,
            model_kwargs=model_kwargs,
        )
        eps = self._predict_eps_from_xstart(x, t, out["pred_xstart"])
        alpha_bar_next = _extract(self.table("alphas_cumprod_next"), t, x.ndim)
        mean_pred = out["pred_xstart"] * jnp.sqrt(alpha_bar_next) + jnp.sqrt(1 - alpha_bar_next) * eps
        return {"sample": mean_pred, "pred_xstart": out["pred_xstart"]}

    def ddim_sample_loop(
        self,
        model_fn,
        shape,
        rng,
        *,
        noise=None,
        clip_denoised=True,
        denoised_fn=None,
        model_kwargs=None,
        eta=0.0,
        dtype=jnp.float32,
    ) -> jnp.ndarray:
        """Full DDIM sampler as one ``lax.scan`` (shares structure with p_sample_loop)."""
        rng, init_rng = jax.random.split(rng)
        img = noise if noise is not None else jax.random.normal(init_rng, shape, dtype=dtype)
        B = shape[0]

        def step(carry, s):
            img, rng = carry
            rng, key = jax.random.split(rng)
            t = jnp.full((B,), s, dtype=jnp.int32)
            out = self.ddim_sample(
                model_fn, img, t, key, clip_denoised=clip_denoised,
                denoised_fn=denoised_fn, model_kwargs=model_kwargs, eta=eta,
            )
            return (out["sample"], rng), None

        steps = jnp.arange(self.num_timesteps - 1, -1, -1)
        (img, _), _ = jax.lax.scan(step, (img, rng), steps)
        return img

    # ---- training losses ----

    def _vb_terms_bpd_from_output(
        self, model_output, x_start, x_t, t, clip_denoised=True, latent_mask=None
    ) -> dict:
        """VLB term (bits/dim) from a precomputed model output."""
        true_mean, _, true_log_var = self.q_posterior_mean_variance(x_start, x_t, t)
        out = self.p_mean_variance_from_output(model_output, x_t, t, clip_denoised=clip_denoised)
        kl = normal_kl(true_mean, true_log_var, out["mean"], out["log_variance"])
        kl = mean_flat(kl, mask=latent_mask) / np.log(2.0)
        decoder_nll = -discretized_gaussian_log_likelihood(
            x_start, means=out["mean"], log_scales=0.5 * out["log_variance"]
        )
        decoder_nll = mean_flat(decoder_nll, mask=latent_mask) / np.log(2.0)
        output = jnp.where(t == 0, decoder_nll, kl)
        return {"output": output, "pred_xstart": out["pred_xstart"]}

    def _vb_terms_bpd(
        self, model_fn, x_start, x_t, t, clip_denoised=True, model_kwargs=None, latent_mask=None
    ) -> dict:
        model_output = self.call_model(model_fn, x_t, t, model_kwargs)
        return self._vb_terms_bpd_from_output(
            model_output, x_start, x_t, t, clip_denoised=clip_denoised, latent_mask=latent_mask
        )

    def training_losses(
        self,
        model_fn,
        x_start,
        t,
        rng,
        model_kwargs=None,
        noise=None,
        latent_mask=None,
        eval_mask=None,
    ) -> dict:
        """Per-batch-element training losses (shape (B,) each).

        ``latent_mask`` masks the MSE exactly like the reference
        (gaussian_diffusion.py:787): multiply then mean over non-batch dims.
        """
        if noise is None:
            noise = jax.random.normal(rng, x_start.shape, dtype=x_start.dtype)
        x_t = self.q_sample(x_start, t, noise=noise)
        terms: dict[str, Any] = {}

        if self.loss_type.is_vb():
            terms["loss"] = self._vb_terms_bpd(
                model_fn, x_start, x_t, t, clip_denoised=False,
                model_kwargs=model_kwargs, latent_mask=latent_mask,
            )["output"]
            if self.loss_type == LossType.RESCALED_KL:
                terms["loss"] = terms["loss"] * self.num_timesteps
        elif self.loss_type in (LossType.MSE, LossType.RESCALED_MSE):
            model_output = self.call_model(model_fn, x_t, t, model_kwargs)
            if self.model_var_type in (ModelVarType.LEARNED, ModelVarType.LEARNED_RANGE):
                C = x_t.shape[-3]
                assert model_output.shape[-3] == 2 * C
                mean_out, var_out = jnp.split(model_output, 2, axis=-3)
                # Learn the variance with the VLB but freeze the mean so the
                # VB term doesn't perturb the MSE gradient.
                frozen = jnp.concatenate([jax.lax.stop_gradient(mean_out), var_out], axis=-3)
                terms["vb"] = self._vb_terms_bpd_from_output(
                    frozen, x_start, x_t, t, clip_denoised=False, latent_mask=latent_mask,
                )["output"]
                if self.loss_type == LossType.RESCALED_MSE:
                    terms["vb"] = terms["vb"] * (self.num_timesteps / 1000.0)
                model_output = mean_out

            target = {
                ModelMeanType.PREVIOUS_X: lambda: self.q_posterior_mean_variance(
                    x_start, x_t, t
                )[0],
                ModelMeanType.START_X: lambda: x_start,
                ModelMeanType.EPSILON: lambda: noise,
            }[self.model_mean_type]()
            assert model_output.shape == target.shape == x_start.shape
            sq_err = (target - model_output) ** 2
            terms["mse"] = mean_flat(sq_err, mask=latent_mask)
            if eval_mask is not None:
                terms["eval-mse"] = mean_flat(sq_err, mask=eval_mask)
            terms["loss"] = terms["mse"] + terms["vb"] if "vb" in terms else terms["mse"]
        else:
            raise NotImplementedError(self.loss_type)

        return terms

    # ---- likelihood evaluation ----

    def _prior_bpd(self, x_start, latent_mask=None):
        B = x_start.shape[0]
        t = jnp.full((B,), self.num_timesteps - 1, dtype=jnp.int32)
        qt_mean, _, qt_log_variance = self.q_mean_variance(x_start, t)
        kl_prior = normal_kl(qt_mean, qt_log_variance, 0.0, 0.0)
        return mean_flat(kl_prior, mask=latent_mask) / np.log(2.0)

    def calc_bpd_loop(
        self, model_fn, x_start, rng, clip_denoised=True, model_kwargs=None,
        latent_mask=None, t_seq=None,
    ) -> dict:
        """Full (or subsampled) VLB evaluation, scanned on device.

        Parity: gaussian_diffusion.py:817-888. ``t_seq`` may be a 1-D list of
        timesteps (shared across the batch) or a 2-D (B, S) array of
        per-element timesteps.
        """
        B = x_start.shape[0]
        if t_seq is None:
            t_seq = np.arange(self.num_timesteps)[::-1]
        t_seq = np.asarray(t_seq)
        if t_seq.ndim == 1:
            t_mat = np.tile(t_seq[None], (B, 1))
        else:
            t_mat = t_seq
        t_mat = jnp.asarray(t_mat.T, dtype=jnp.int32)  # (S, B)

        def step(rng, t_batch):
            rng, noise_key = jax.random.split(rng)
            noise = jax.random.normal(noise_key, x_start.shape, dtype=x_start.dtype)
            x_t = self.q_sample(x_start, t_batch, noise=noise)
            out = self._vb_terms_bpd(
                model_fn, x_start, x_t, t_batch, clip_denoised=clip_denoised,
                model_kwargs=model_kwargs, latent_mask=latent_mask,
            )
            xstart_mse = mean_flat((out["pred_xstart"] - x_start) ** 2, mask=latent_mask)
            eps = self._predict_eps_from_xstart(x_t, t_batch, out["pred_xstart"])
            mse = mean_flat((eps - noise) ** 2, mask=latent_mask)
            return rng, (out["output"], xstart_mse, mse)

        _, (vb, xstart_mse, mse) = jax.lax.scan(step, rng, t_mat)
        vb, xstart_mse, mse = (x.T for x in (vb, xstart_mse, mse))  # (B, S)
        prior_bpd = self._prior_bpd(x_start, latent_mask=latent_mask)
        return {
            "total_bpd": vb.sum(axis=1) + prior_bpd,
            "prior_bpd": prior_bpd,
            "vb": vb,
            "xstart_mse": xstart_mse,
            "mse": mse,
        }
