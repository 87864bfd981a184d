"""Training runtime: one fully-jitted train step + the host driver loop.

Capability parity: /root/reference/improved_diffusion/train_util.py:35-475
(TrainLoop), re-designed for TPU:

  * The whole step — q_sample, U-Net fwd/bwd, masked loss, AdamW, LR anneal,
    multi-rate EMA, nonfinite-skip — is ONE compiled function; gradients
    all-reduce over the dp mesh axis via sharding annotations (XLA emits the
    ICI collectives; no DDP/NCCL).
  * bf16 torso compute with f32 params replaces the reference's fp16
    loss-scale machinery (fp16_util.py); the NaN-grad skip-step behavior
    (train_util.py:331-334) is preserved as a global-finite check.
  * Params may be FSDP-sharded over the second mesh axis (parallel/sharding).
  * Host side keeps the reference's cadence: mask sampling, timestep
    importance sampling, log/save/sample intervals, quartile loss KVs,
    DIFFUSION_TRAINING_TEST early-exit hook.
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..diffusion.gaussian import GaussianDiffusion
from ..diffusion.resample import LossAwareSampler, ScheduleSampler, UniformSampler
from ..parallel.mesh import make_mesh
from ..parallel.sharding import fsdp_param_sharding, put_batch_array, shard_batch
from ..utils.logger import logger
from . import checkpoint as ckpt_lib
from .masks import sample_training_batch


def global_norm(tree) -> jnp.ndarray:
    return jnp.sqrt(sum(jnp.sum(jnp.square(x)) for x in jax.tree.leaves(tree)))


def local_numpy(v, accum: bool = False):
    """Host-fetch a metric array: the full value single-process, this
    process's own batch rows on multi-host meshes.

    Per-example metrics are sharded over the GLOBAL mesh; np.asarray on a
    non-addressable array raises on pods. The local rows are exactly the
    rows this process fed (put_batch_array), so they line up with the local
    t/weights for quartile logging; the logger's process_allgather reduction
    recombines across hosts.

    ``accum=True``: the array carries a leading microbatch axis (n, mb, …)
    whose BATCH axis is axis 1 (data_sharding accum_axis rule; the train
    step deliberately does not merge the axes in-jit, because the merged
    axis's sharding would be GSPMD-chosen and the addressable rows would no
    longer line up with this process's t/weights). Fetched per-axis-1
    shards, then flattened row-major to match t_np's original order.
    """
    axis = 1 if accum else 0
    if isinstance(v, jax.Array) and not (v.is_fully_addressable or v.is_fully_replicated):
        shards = sorted(v.addressable_shards, key=lambda s: s.index[axis].start or 0)
        out = np.concatenate([np.asarray(s.data) for s in shards], axis=axis)
    else:
        out = np.asarray(v)
    if accum and out.ndim >= 2:
        out = out.reshape((out.shape[0] * out.shape[1],) + out.shape[2:])
    return out


# Hyperparameters per optimizer instance (GradientTransformation namedtuples
# of functions are hashable), so make_train_step can rebuild the SAME update
# math in its fused single-pass arm (LFVDM_FUSED_OPT) without a caller-side
# signature change.
_OPT_HYPERPARAMS: Dict[Any, tuple] = {}


def make_optimizer(lr: float, weight_decay: float, lr_anneal_steps: int = 0):
    """AdamW with the reference's linear LR decay (train_util.py:359-365)."""
    if lr_anneal_steps:
        schedule = optax.linear_schedule(lr, 0.0, lr_anneal_steps)
    else:
        schedule = lr
    tx = optax.adamw(schedule, b1=0.9, b2=0.999, eps=1e-8, weight_decay=weight_decay)
    _OPT_HYPERPARAMS[tx] = (lr, weight_decay, lr_anneal_steps)
    return tx


def init_train_state(params, tx, ema_rates) -> Dict[str, Any]:
    """State pytree: params, optimizer state, one EMA copy per rate, step.

    ``LFVDM_BF16_EMA=1`` (diagnostic, read at trace time) stores the EMA
    copies in bfloat16 — halves the EMA read+write HBM traffic in the
    optimizer tail so an A/B against f32 bounds what that traffic costs.
    NOT for production: checkpoints written from such a state carry bf16
    EMAs (≈3 decimal digits), and the reference's eval protocol scores EMA
    weights.
    """
    ema_dtype = (jnp.bfloat16 if os.environ.get("LFVDM_BF16_EMA", "0") == "1"
                 else None)

    def ema_copy(p):
        return jnp.asarray(p, ema_dtype) if ema_dtype is not None else jnp.copy(p)

    return {
        "params": params,
        "opt_state": tx.init(params),
        "ema": {str(r): jax.tree.map(ema_copy, params) for r in ema_rates},
        "step": jnp.zeros((), jnp.int32),
    }


def _fused_adamw_ema(params, safe_grads, opt_state, ema, ema_rates, hp):
    """Single-traversal AdamW + multi-rate EMA (LFVDM_FUSED_OPT=1).

    Same update math as the optax chain it replaces —
    ``scale_by_adam -> add_decayed_weights -> scale_by_learning_rate`` with
    the exact optax bias-correction/count semantics (pinned to rtol 1e-6 by
    test_fused_opt.py; the two paths reassociate float ops, so equality is
    near-ulp, not bitwise) — and the SAME opt_state
    structure, so checkpoints are interchangeable between the two paths
    (pinned by test_train_loop.py). One ``jax.tree.map`` computes new
    params, Adam moments, and every EMA copy per leaf, instead of optax's
    per-transform traversals with materialized intermediate update trees:
    the A/B arm for the optimizer/EMA HBM-tail question (BASELINE.md).
    """
    lr, wd, anneal_steps = hp
    adam_state, wd_state, sched_state = opt_state
    b1, b2, eps = 0.9, 0.999, 1e-8
    count_inc = optax.safe_int32_increment(adam_state.count)
    c1 = 1.0 - b1 ** count_inc.astype(jnp.float32)
    c2 = 1.0 - b2 ** count_inc.astype(jnp.float32)
    if anneal_steps:
        # Same schedule object/semantics as make_optimizer: evaluated at the
        # PRE-increment schedule count (optax.scale_by_schedule).
        step_size = -optax.linear_schedule(lr, 0.0, anneal_steps)(sched_state.count)
        new_sched_state = type(sched_state)(
            count=optax.safe_int32_increment(sched_state.count))
    else:
        step_size = -lr
        new_sched_state = sched_state

    rates = [float(r) for r in ema_rates]
    ema_trees = [ema[str(r)] for r in ema_rates]

    def leaf(p, g, m, v, *es):
        m2 = b1 * m + (1.0 - b1) * g
        v2 = b2 * v + (1.0 - b2) * (g * g)
        u = (m2 / c1) / (jnp.sqrt(v2 / c2) + eps) + wd * p
        p2 = p + step_size * u
        new_es = tuple(
            jnp.asarray(e.astype(p2.dtype) * r + p2 * (1.0 - r), e.dtype)
            for e, r in zip(es, rates))
        return (p2, m2, v2) + new_es

    mapped = jax.tree.map(leaf, params, safe_grads, adam_state.mu,
                          adam_state.nu, *ema_trees)
    outer = jax.tree.structure(params)
    inner = jax.tree.structure((0,) * (3 + len(rates)))
    new_params, new_mu, new_nu, *new_emas = jax.tree.transpose(outer, inner, mapped)
    new_opt_state = (
        type(adam_state)(count=count_inc, mu=new_mu, nu=new_nu),
        wd_state,
        new_sched_state,
    )
    new_ema = {str(r): t for r, t in zip(ema_rates, new_emas)}
    return new_params, new_opt_state, new_ema


def make_micro_loss(
    model,
    diffusion: GaussianDiffusion,
    *,
    pad_with_random_frames: bool = True,
    dropout: float = 0.0,
) -> Callable:
    """Loss over one (micro)batch: weighted mean of per-element losses.

    Shared by the train step's single-batch and gradient-accumulation paths
    (and by tests that pin the accumulation semantics).
    """

    def micro_loss(params, batch, t, weights, rng):
        x0 = batch["x0"]
        model_kwargs = dict(
            x0=x0,
            frame_indices=batch["frame_indices"],
            obs_mask=batch["obs_mask"],
            latent_mask=batch["latent_mask"],
        )
        # Loss covers padding frames too when padding with random frames
        # (train_util.py:305): latent_mask_for_loss = 1 - obs_mask.
        loss_mask = (1.0 - batch["obs_mask"]) if pad_with_random_frames else batch["latent_mask"]
        noise_key, drop_key = jax.random.split(rng)

        def model_fn(x, ts, **kw):
            rngs = {"dropout": drop_key} if dropout > 0 else None
            out, _ = model.apply(params, x, ts, train=True, rngs=rngs, **kw)
            return out

        terms = diffusion.training_losses(
            model_fn, x0, t, noise_key, model_kwargs=model_kwargs,
            latent_mask=loss_mask, eval_mask=batch["latent_mask"],
        )
        loss = jnp.mean(terms["loss"] * weights)
        return loss, terms

    return micro_loss


def make_train_step(
    model,
    diffusion: GaussianDiffusion,
    tx,
    ema_rates,
    *,
    pad_with_random_frames: bool = True,
    dropout: float = 0.0,
    n_microbatches: int = 1,
) -> Callable:
    """Build the pure train-step function (jit it with shardings applied).

    ``n_microbatches > 1`` enables gradient accumulation: batch/t/weights
    carry a leading microbatch axis ``(n, mb, ...)`` and the step scans over
    it, re-using one microbatch's activation memory per chunk. Matching the
    reference's accumulation semantics (train_util.py:281-328), each chunk
    contributes the gradient of its own weighted MEAN loss and chunks are
    SUMMED (not averaged) — the effective gradient scale grows with the
    number of microbatches, exactly as torch ``loss.backward()`` per chunk.
    """
    micro_loss = make_micro_loss(
        model, diffusion, pad_with_random_frames=pad_with_random_frames, dropout=dropout
    )

    def train_step(state, batch, t, weights, rng):
        if n_microbatches == 1:
            (loss, terms), grads = jax.value_and_grad(micro_loss, has_aux=True)(
                state["params"], batch, t, weights, rng
            )
        else:
            def body(grads_acc, xs):
                idx, batch_i, t_i, w_i = xs
                key = jax.random.fold_in(rng, idx)
                (loss_i, terms_i), g_i = jax.value_and_grad(micro_loss, has_aux=True)(
                    state["params"], batch_i, t_i, w_i, key
                )
                return jax.tree.map(jnp.add, grads_acc, g_i), (loss_i, terms_i)

            zero_grads = jax.tree.map(jnp.zeros_like, state["params"])
            grads, (losses, terms) = jax.lax.scan(
                body, zero_grads, (jnp.arange(n_microbatches), batch, t, weights)
            )
            loss = losses.sum()  # what the accumulated gradient is the gradient of
            # terms keep their (n, mb, ...) shape: merging the axes in-jit
            # would hand the merged axis an arbitrary GSPMD sharding, breaking
            # the local-rows contract of local_numpy(accum=True) on pods.

        grad_norm = global_norm(grads)
        finite = jnp.isfinite(grad_norm)
        # Zero non-finite grads so Adam moments stay clean on skipped steps
        # (parity with the reference's skip-step, train_util.py:331-334).
        safe_grads = jax.tree.map(lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads)
        fused_hp = (_OPT_HYPERPARAMS.get(tx)
                    if os.environ.get("LFVDM_FUSED_OPT", "0") == "1" else None)
        if os.environ.get("LFVDM_FUSED_OPT", "0") == "1" and fused_hp is None:
            # The fused arm rebuilds the update math from the hyperparameters
            # make_optimizer recorded; an optimizer constructed any other way
            # has no record — fall back LOUDLY, not silently (VERDICT r4).
            import warnings

            warnings.warn(
                "LFVDM_FUSED_OPT=1 ignored: this optimizer was not built by "
                "make_optimizer(), so its hyperparameters are unknown; "
                "running the standard optax path instead")
        if fused_hp is not None:
            new_params, new_opt_state, new_ema_raw = _fused_adamw_ema(
                state["params"], safe_grads, state["opt_state"], state["ema"],
                ema_rates, fused_hp)
        else:
            updates, new_opt_state = tx.update(safe_grads, state["opt_state"], state["params"])
            new_params = optax.apply_updates(state["params"], updates)
            new_ema_raw = {
                rate: jax.tree.map(
                    # f32 math, stored at the EMA copy's dtype (bf16 under the
                    # LFVDM_BF16_EMA diagnostic, f32 otherwise).
                    lambda e, p, r=float(rate): jnp.asarray(
                        e.astype(p.dtype) * r + p * (1 - r), e.dtype),
                    state["ema"][rate], new_params)
                for rate in (str(r) for r in ema_rates)
            }

        def select(new, old):
            return jax.tree.map(lambda n, o: jnp.where(finite, n, o), new, old)

        new_params = select(new_params, state["params"])
        new_opt_state = select(new_opt_state, state["opt_state"])
        # Keyed by ema_rates (the same str() keys init_train_state built) so
        # a state/config mismatch fails loudly here instead of being ignored.
        new_ema = {
            rate: select(new_ema_raw[rate], state["ema"][rate])
            for rate in (str(r) for r in ema_rates)
        }
        new_state = {
            "params": new_params,
            "opt_state": new_opt_state,
            "ema": new_ema,
            "step": state["step"] + 1,
        }
        metrics = {
            "loss": terms["loss"],
            "grad_norm": grad_norm,
            "skipped_nonfinite": (~finite).astype(jnp.float32),
            "weighted_loss": loss,
        }
        for k in ("mse", "vb", "eval-mse"):
            if k in terms:
                metrics[k] = terms[k]
        return new_state, metrics

    return train_step


def log_loss_dict(diffusion, ts, losses: Dict[str, np.ndarray], weights: np.ndarray):
    """Mean + per-quartile KV logging (train_util.py:530-536)."""
    for key, values in losses.items():
        values = np.asarray(values) * weights if np.asarray(values).ndim else values
        logger.logkv_mean(key, float(np.mean(values)))
        for sub_t, sub_loss in zip(np.asarray(ts), np.asarray(values).reshape(-1)):
            quartile = int(4 * sub_t / diffusion.num_timesteps)
            logger.logkv_mean(f"{key}_q{quartile}", float(sub_loss))


class TrainLoop:
    """Host driver: data -> masks -> device step; logging/ckpt/vis cadence."""

    def __init__(
        self,
        *,
        model,
        diffusion: GaussianDiffusion,
        data,
        codec=None,
        batch_size: int,
        max_frames: int,
        lr: float,
        ema_rate="0.9999",
        log_interval: int = 10,
        save_interval: int = 50_000,
        sample_interval: Optional[int] = None,
        lr_anneal_steps: int = 0,
        weight_decay: float = 0.0,
        microbatch: int = -1,
        pad_with_random_frames: bool = True,
        schedule_sampler: Optional[ScheduleSampler] = None,
        checkpoint_dir: str = "checkpoints/run",
        resume: bool = False,
        init_params=None,
        config: Optional[Dict] = None,
        mesh=None,
        fsdp: int = 1,
        fsdp_min_size: int = 2**16,
        seed: int = 0,
        sample_fn: Optional[Callable] = None,
        profile_dir: Optional[str] = None,
        profile_start_step: int = 10,
        profile_num_steps: int = 5,
    ):
        # jax.profiler trace window (SURVEY.md §5: the reference only has
        # coarse wall-clock KVs; here a device trace can be captured around
        # steps [profile_start_step, +profile_num_steps) into profile_dir).
        self.profile_dir = profile_dir
        self.profile_start_step = profile_start_step
        self.profile_num_steps = profile_num_steps
        self._profiling = False
        self.model = model
        self.diffusion = diffusion
        self.data = data
        self.codec = codec
        self.batch_size = batch_size
        self.max_frames = max_frames
        # Gradient accumulation (reference `microbatch`, train_util.py:66):
        # <=0 disables; otherwise batch_size must divide evenly.
        if microbatch > 0 and microbatch < batch_size:
            assert batch_size % microbatch == 0, (
                f"batch_size={batch_size} not divisible by microbatch={microbatch}"
            )
            self.n_microbatches = batch_size // microbatch
        else:
            self.n_microbatches = 1
        self.log_interval = log_interval
        self.save_interval = save_interval
        self.sample_interval = sample_interval
        self.lr_anneal_steps = lr_anneal_steps
        self.pad_with_random_frames = pad_with_random_frames
        self.schedule_sampler = schedule_sampler or UniformSampler(diffusion)
        self.checkpoint_dir = checkpoint_dir
        self.config = config or {}
        self.sample_fn = sample_fn
        self.ema_rates = (
            [ema_rate] if isinstance(ema_rate, float)
            else [float(x) for x in str(ema_rate).split(",")]
        )

        self.mesh = mesh if mesh is not None else make_mesh(fsdp=fsdp)
        # Each microbatch chunk must still cover the mesh's data shards
        # (checked on the RESOLVED mesh, after the make_mesh fallback).
        # batch_size is PER-PROCESS (load_data shards by process), while the
        # mesh spans all jax.devices() — so the GLOBAL chunk rows
        # (local chunk × process_count) are what the mesh divides.
        mesh_data_shards = int(np.prod(list(self.mesh.shape.values())))
        global_chunk = (batch_size // self.n_microbatches) * jax.process_count()
        if self.n_microbatches > 1 and global_chunk % mesh_data_shards:
            raise ValueError(
                f"microbatch={microbatch} leaves {global_chunk} global rows per "
                f"chunk, not divisible by the mesh's {mesh_data_shards} data "
                "shards — raise microbatch or shrink the mesh"
            )
        self.host_rng = np.random.default_rng(seed + jax.process_index())
        self.rng = jax.random.PRNGKey(seed)

        # --- build and place state ---
        batch0 = self._next_batch()
        example = self._prepare(batch0, batch0)
        init_rng, self.rng = jax.random.split(self.rng)
        params = model.init(
            init_rng, example["x0"], jnp.zeros((batch_size,), jnp.int32),
            x0=example["x0"], frame_indices=example["frame_indices"],
            obs_mask=example["obs_mask"], latent_mask=example["latent_mask"],
        )
        if init_params is not None:
            # Warm-start (fine-tune) from an externally supplied param tree —
            # e.g. a converted reference .pt checkpoint
            # (utils/torch_convert.convert_reference_checkpoint). The tree
            # must match the freshly initialized structure exactly; EMA and
            # optimizer state below start from these values (fresh moments,
            # step 0), which is the right semantics for fine-tuning.
            flat_init = jax.tree.leaves_with_path(params)
            flat_given = dict(jax.tree.leaves_with_path(init_params))
            if set(flat_given) != {p for p, _ in flat_init}:
                missing = sorted({jax.tree_util.keystr(p) for p, _ in flat_init}
                                 - {jax.tree_util.keystr(p) for p in flat_given})[:5]
                extra = sorted({jax.tree_util.keystr(p) for p in flat_given}
                               - {jax.tree_util.keystr(p) for p, _ in flat_init})[:5]
                raise ValueError(
                    f"init_params tree mismatch (missing={missing}, extra={extra}) "
                    "— wrong architecture config for this checkpoint?"
                )
            for path, leaf in flat_init:
                given = flat_given[path]
                if tuple(given.shape) != tuple(leaf.shape):
                    raise ValueError(
                        f"init_params shape mismatch at {jax.tree_util.keystr(path)}: "
                        f"{tuple(given.shape)} vs model {tuple(leaf.shape)}"
                    )
            params = jax.tree.map(
                lambda leaf, given: jnp.asarray(given, leaf.dtype), params, init_params
            )
        self.tx = make_optimizer(lr, weight_decay, lr_anneal_steps)

        # Place params per the FSDP rule; Adam moments and EMA copies inherit
        # the same shardings through XLA's sharding propagation.
        params = jax.device_put(
            params, fsdp_param_sharding(self.mesh, params, min_size=fsdp_min_size)
        )
        self.state = jax.jit(partial(init_train_state, tx=self.tx, ema_rates=self.ema_rates))(
            params
        )

        self.step = 0
        self._pending = []
        self._interrupted = False
        self._window_start = time.time()
        if resume:
            latest = ckpt_lib.find_latest_step(checkpoint_dir)
            if latest is not None:
                # Restore straight onto the training shardings (the state is
                # already placed on the mesh): orbax reads each process's
                # shards directly — no replicated host copy on pods.
                abstract = jax.tree.map(
                    lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding),
                    self.state,
                )
                self.state, self.step, _ = ckpt_lib.load_checkpoint(
                    checkpoint_dir, abstract, latest
                )
                print(f"resumed from step {self.step}")

        step_fn = make_train_step(
            model, diffusion, self.tx, self.ema_rates,
            pad_with_random_frames=pad_with_random_frames,
            dropout=getattr(model, "dropout", 0.0),
            n_microbatches=self.n_microbatches,
        )
        # Input shardings follow argument placement (state on the mesh, batch
        # data-sharded by shard_batch); jit only pins the donation.
        self.train_step = jax.jit(step_fn, donate_argnums=(0,))
        n_params = sum(p.size for p in jax.tree.leaves(params))
        logger.logkv("num_parameters", n_params, distributed=False)

    # ---- host-side plumbing ----

    def _next_batch(self) -> np.ndarray:
        return np.asarray(next(self.data))

    def _prepare(self, batch1, batch2) -> Dict[str, np.ndarray]:
        x0, fi, obs, lat = sample_training_batch(
            self.host_rng, batch1, self.max_frames,
            batch2=batch2 if self.pad_with_random_frames else None,
            pad_with_random_frames=self.pad_with_random_frames,
        )
        if self.codec is not None:
            x0 = np.asarray(self.codec.encode(x0))
        return {
            "x0": x0.astype(np.float32),
            "frame_indices": fi,
            "obs_mask": obs,
            "latent_mask": lat,
        }

    # ---- main loop ----

    def run_step(self):
        t0 = time.time()
        batch1 = self._next_batch()
        batch2 = self._next_batch() if self.pad_with_random_frames else batch1
        batch = self._prepare(batch1, batch2)
        t_np, w_np = self.schedule_sampler.sample(batch["x0"].shape[0], self.host_rng)
        self.rng, step_key = jax.random.split(self.rng)
        n = self.n_microbatches
        accum = n > 1
        if accum:
            # (B, ...) -> (n, B/n, ...): the step scans over the leading axis.
            batch = {k: v.reshape((n, v.shape[0] // n) + v.shape[1:]) for k, v in batch.items()}
            t_arr, w_arr = (a.reshape(n, -1) for a in (t_np, w_np))
        else:
            t_arr, w_arr = t_np, w_np
        sharded = shard_batch(self.mesh, batch, accum_axis=accum)
        t_dev = put_batch_array(self.mesh, t_arr, accum_axis=accum)
        w_dev = put_batch_array(self.mesh, w_arr, accum_axis=accum)
        self.state, metrics = self.train_step(self.state, sharded, t_dev, w_dev, step_key)

        if isinstance(self.schedule_sampler, LossAwareSampler):
            # Loss-aware sampling needs this step's losses on the host NOW;
            # otherwise metric fetches are deferred to the log flush so the
            # step loop never blocks on device->host transfers.
            losses_np = local_numpy(metrics["loss"], accum=accum)
            assert len(losses_np) == len(t_np), (
                f"per-example loss rows ({len(losses_np)}) do not line up with "
                f"local timesteps ({len(t_np)}) — sharding/fetch mismatch"
            )
            self.schedule_sampler.update_with_local_losses(t_np, losses_np)

        self._pending.append((self.step, t_np, w_np, metrics, time.time() - t0))
        if len(self._pending) >= self.log_interval:
            self._flush_metrics()

    def _flush_metrics(self):
        if not self._pending:
            return
        # Dispatch is async, so the per-step host time recorded above is NOT
        # the device step time; the wall time across the whole pending window
        # (which ends in the blocking np.asarray fetches below) is.
        window = time.time() - self._window_start
        logger.logkv_mean("timing/step_time", window / len(self._pending))
        accum = self.n_microbatches > 1
        for step, t_np, w_np, metrics, dispatch_time in self._pending:
            losses = {k: local_numpy(v, accum=accum) for k, v in metrics.items()
                      if k in ("loss", "mse", "vb", "eval-mse")}
            for k, v in losses.items():
                assert len(v) == len(t_np), (
                    f"metric {k!r} rows ({len(v)}) != local timesteps ({len(t_np)})"
                )
            log_loss_dict(self.diffusion, t_np, losses, w_np)
            logger.logkv_mean("grad_norm", float(local_numpy(metrics["grad_norm"])))
            if float(local_numpy(metrics["skipped_nonfinite"])):
                logger.logkv("skipped_nonfinite_step", step, distributed=False)
                print(f"non-finite gradients at step {step}; step skipped")
            logger.logkv("step", step)
            logger.logkv("samples", (step + 1) * self.batch_size * jax.process_count())
            logger.logkv_mean("timing/dispatch_time", dispatch_time)
        self._pending = []
        self._window_start = time.time()

    def run_loop(self, max_steps: Optional[int] = None):
        # Preemption-safe: SIGTERM/SIGINT request a checkpoint + clean exit
        # at the next step boundary (TPU pods are routinely preempted; the
        # reference's recovery model is restart+resume, SURVEY §5 — this
        # makes the restart resume from the preemption point, not the last
        # 50k-step save). Registered only in the main thread.
        import signal
        import threading

        prev_handlers = {}
        if threading.current_thread() is threading.main_thread():
            def _request_stop(signum, frame):
                print(f"signal {signum}: checkpointing at next step boundary")
                self._interrupted = True

            for sig in (signal.SIGTERM, signal.SIGINT):
                prev_handlers[sig] = signal.signal(sig, _request_stop)
        try:
            self._run_loop(max_steps)
        finally:
            for sig, h in prev_handlers.items():
                signal.signal(sig, h)
            if self._profiling:
                # Loop ended inside the profile window (early return, error,
                # max_steps) — finalize the trace so it is readable.
                jax.profiler.stop_trace()
                self._profiling = False

    def _run_loop(self, max_steps: Optional[int] = None):
        last_sample_time = None
        while (not self.lr_anneal_steps or self.step < self.lr_anneal_steps) and (
            max_steps is None or self.step < max_steps
        ):
            if self.profile_dir is not None and not self._profiling and (
                self.step == self.profile_start_step
            ):
                jax.profiler.start_trace(self.profile_dir)
                self._profiling = True
            self.run_step()
            if self._profiling and self.step >= (
                self.profile_start_step + self.profile_num_steps - 1
            ):
                jax.block_until_ready(self.state["params"])
                jax.profiler.stop_trace()
                self._profiling = False
            # interval 0/None = disabled (matches video_train.py's
            # `if args.sample_interval:` convention; the reference leaves
            # interval=0 undefined — it would div-zero there too).
            if self.log_interval and self.step % self.log_interval == 0:
                self._flush_metrics()
                logger.dumpkvs()
            if self.save_interval and self.step % self.save_interval == 0:
                self.save()
            if os.environ.get("DIFFUSION_TRAINING_TEST", "") and self.step > 0:
                return
            interrupted = self._interrupted
            if jax.process_count() > 1:
                # Signals land on each pod worker asynchronously; saving on a
                # per-process flag would enter the collective orbax save with
                # mismatched steps. Agree on the flag at a PROCESS-UNIFORM
                # cadence (the log boundary — the metric flush already syncs
                # there) so every process enters the allgather identically.
                if self.log_interval and self.step % self.log_interval == 0:
                    from jax.experimental import multihost_utils

                    flags = multihost_utils.process_allgather(
                        jnp.asarray(self._interrupted))
                    interrupted = bool(np.asarray(flags).any())
                else:
                    interrupted = False
            if interrupted:
                self._flush_metrics()
                self.save()
                print(f"checkpointed at step {self.step} after interrupt; exiting")
                return
            if (
                self.sample_fn is not None
                and self.sample_interval is not None
                and self.step != 0
                and (self.step % self.sample_interval == 0 or self.step == 5)
            ):
                if last_sample_time is not None:
                    logger.logkv("timing/time_between_samples", time.time() - last_sample_time)
                t0 = time.time()
                self.sample_fn(self)
                logger.logkv("timing/sampling_time", time.time() - t0, distributed=False)
                last_sample_time = time.time()
                self._window_start = time.time()  # keep step_time unpolluted
            self.step += 1
        if self.save_interval and (self.step - 1) % self.save_interval != 0:
            self.save()

    def save(self):
        # Hand orbax the live (possibly fsdp-sharded) jax.Arrays: it performs
        # the collective, per-shard multi-host save natively. A host-numpy
        # hop here would raise on any genuinely sharded (non-addressable)
        # param — the production fsdp pod path (ref semantics:
        # train_util.py:373-402).
        ckpt_lib.save_checkpoint(
            self.checkpoint_dir, self.step, self.state, config=self.config,
        )

    @property
    def ema_params(self):
        return self.state["ema"]
