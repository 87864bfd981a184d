"""Ahead-of-time export of the sampler for production serving.

Serializes the jitted reverse-diffusion window sampler (the deployment
unit: one compiled function per (B, K) call shape) to a portable
StableHLO artifact via ``jax.export``. A serving process deserializes and
calls it without the model code, config system, or Python model tree —
only jax + the artifact + a params file.

No reference equivalent (the reference serves by loading the full torch
codebase); this is TPU-framework infrastructure for the deployment story.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jexport

from .diffusion.gaussian import GaussianDiffusion


def make_window_sampler(model, diffusion: GaussianDiffusion, *,
                        use_ddim: bool = False, eta: float = 0.0,
                        clip_denoised: bool = True):
    """The pure (params, x0, frame_indices, obs, latent, rng) -> video fn."""

    def fn(params, x0, frame_indices, obs_mask, latent_mask, rng):
        def model_fn(x, ts, **kw):
            out, _ = model.apply(params, x, ts, **kw)
            return out

        kwargs = dict(x0=x0, frame_indices=frame_indices,
                      obs_mask=obs_mask, latent_mask=latent_mask)
        if use_ddim:
            return diffusion.ddim_sample_loop(
                model_fn, x0.shape, rng, clip_denoised=clip_denoised,
                model_kwargs=kwargs, eta=eta)
        return diffusion.p_sample_loop(
            model_fn, x0.shape, rng, clip_denoised=clip_denoised,
            model_kwargs=kwargs)

    return fn


def export_window_sampler(model, diffusion, params, *, batch_size: int,
                          max_frames: int, in_channels: int, image_size: int,
                          use_ddim: bool = False, eta: float = 0.0,
                          platforms: Optional[Tuple[str, ...]] = None) -> bytes:
    """Serialize the sampler for a fixed (B, K, C, H, W) window shape.

    ``params`` stays an ARGUMENT of the exported function (weights ship
    separately and can be swapped, e.g. different EMA rates). Returns the
    serialized artifact bytes.
    """
    fn = make_window_sampler(model, diffusion, use_ddim=use_ddim, eta=eta)
    B, K, C, H = batch_size, max_frames, in_channels, image_size
    arg_specs = (
        jax.tree.map(lambda p: jax.ShapeDtypeStruct(p.shape, p.dtype), params),
        jax.ShapeDtypeStruct((B, K, C, H, H), jnp.float32),
        jax.ShapeDtypeStruct((B, K), jnp.int32),
        jax.ShapeDtypeStruct((B, K, 1, 1, 1), jnp.float32),
        jax.ShapeDtypeStruct((B, K, 1, 1, 1), jnp.float32),
        jax.ShapeDtypeStruct((2,), jnp.uint32),  # raw PRNG key
    )

    def with_key(params, x0, fi, obs, lat, key_data):
        rng = jax.random.wrap_key_data(key_data)
        return fn(params, x0, fi, obs, lat, rng)

    exported = jexport.export(
        jax.jit(with_key),
        platforms=platforms,
    )(*arg_specs)
    return exported.serialize()


def load_window_sampler(blob: bytes):
    """Deserialize an exported sampler; returns a callable
    (params, x0, frame_indices, obs_mask, latent_mask, key_data) -> video."""
    exported = jexport.deserialize(blob)
    return jax.jit(exported.call)


def save_params_npz(params, path: str):
    """Flatten a params pytree to an .npz keyed by '/'-joined paths.

    The tree must be nested str-keyed dicts with '/'-free keys (flax params
    are) so the template-free ``load_params_npz`` can invert the flattening;
    anything else raises rather than silently producing a tree the exported
    sampler would reject at serve time.
    """
    flat = {}
    for kp, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        parts = []
        for k in kp:
            if not hasattr(k, "key") or not isinstance(k.key, str) or "/" in k.key:
                raise ValueError(
                    f"save_params_npz needs nested str-keyed dicts with "
                    f"'/'-free keys; got path entry {k!r}")
            parts.append(k.key)
        flat["/".join(parts)] = np.asarray(leaf)
    np.savez(path, **flat)


def load_params_npz(path: str, like=None):
    """Inverse of save_params_npz.

    With a structure template ``like``, leaves are cast to the template's
    dtypes. Without one, the nested-dict tree is rebuilt from the '/'-joined
    npz keys — a serving process needs no model code to construct a
    template (str-keyed dict trees flatten key-sorted, matching the export
    order; ``save_params_npz`` rejects any other tree shape).
    """
    data = np.load(path)
    if like is None:
        tree: dict = {}
        for key in data.files:
            *parents, leaf_key = key.split("/")
            node = tree
            for p in parents:
                node = node.setdefault(p, {})
            node[leaf_key] = jnp.asarray(data[key])
        return tree
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(like)[0]
    treedef = jax.tree_util.tree_structure(like)
    leaves = []
    for kp, leaf in leaves_with_paths:
        key = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)
        leaves.append(jnp.asarray(data[key], leaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)
