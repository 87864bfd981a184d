"""Shared flagship-sampler setup for the benchmark/attribution scripts.

Five scripts (bench_scan_minimal, profile_sampler, attribute_sampler_scan,
bench_batch_sweep, ab_envflag) previously each rebuilt the identical
inputs + model init + p_sample scan closure; any change to the sampling
regime had to be hand-synced across all of them or an A/B would silently
measure a different program than the production bench. This module is the
single definition. bench.py (the driver-run entry point) intentionally
stays standalone.

Trace-time env flags (LFVDM_SPLIT_UPPATH & co.) are read when the model is
TRACED, not here — callers that A/B a flag set the env var before each
``jax.jit(...).lower().compile()`` call, exactly as before.
"""

import _path  # noqa: F401  (repo root on sys.path)

import numpy as np


class FlagshipSetup:
    """Flagship model + deterministic inputs for the sampler-scan benches.

    Attributes: cfg, model, diffusion, params, model_kwargs
    (x0/frame_indices/obs_mask/latent_mask), noise, B/K/C/H, model_fn.
    """

    def __init__(self, B: int = 2, *, cfg: dict = None, seed: int = 0):
        import jax
        import jax.numpy as jnp

        from lfvdm_tpu.config import create_model_and_diffusion, flagship_config

        self.cfg = cfg = dict(flagship_config(), **(cfg or {}))
        self.model, self.diffusion = create_model_and_diffusion(cfg)
        self.B, self.K, self.C, self.H = B, 20, cfg["in_channels"], cfg["image_size"]
        rng = np.random.default_rng(seed)
        shape = (self.B, self.K, self.C, self.H, self.H)
        x0 = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        fi = jnp.asarray(np.tile(np.arange(self.K)[None], (B, 1)), jnp.int32)
        obs = jnp.zeros((B, self.K, 1, 1, 1), jnp.float32).at[:, : self.K // 2].set(1.0)
        self.model_kwargs = dict(x0=x0, frame_indices=fi, obs_mask=obs,
                                 latent_mask=1.0 - obs)
        self.noise = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        self.params = jax.jit(self.model.init)(
            jax.random.PRNGKey(0), x0, jnp.zeros((B,), jnp.int32),
            **self.model_kwargs)

        def model_fn(x, ts, **kw):
            return self.model.apply(self.params, x, ts, **kw)[0]

        self.model_fn = model_fn

    def make_scan(self, n_steps: int):
        """The production p_sample ancestral scan over ``n_steps`` timesteps.

        Returns ``sampler_chunk(noise, rng_key) -> final image`` — the same
        program bench.py times (one jax.random.split + p_sample per step,
        reversed jnp.arange schedule inside lax.scan).
        """
        import jax
        import jax.numpy as jnp

        n_steps = min(n_steps, self.diffusion.num_timesteps)
        B, diffusion, model_fn = self.B, self.diffusion, self.model_fn
        model_kwargs = self.model_kwargs

        def sampler_chunk(noise, rng_key):
            def step(carry, s):
                img, key = carry
                key, sub = jax.random.split(key)
                t_b = jnp.full((B,), s, jnp.int32)
                out = diffusion.p_sample(model_fn, img, t_b, sub,
                                         model_kwargs=model_kwargs)
                return (out["sample"], key), None

            steps = jnp.arange(n_steps - 1, -1, -1)
            (img, _), _ = jax.lax.scan(step, (noise, rng_key), steps)
            return img

        return sampler_chunk
