"""Train a flexible video diffusion model on TPU.

Capability parity: /root/reference/scripts/video_train.py — dataset-derived
config (T, image_size, in_channels, latent norm stats), full-config
embedding in checkpoints, resume by run id, wandb-or-JSONL logging.

Examples:
  # CARLA latent debug config (BASELINE.json PR1 reference)
  python scripts/video_train.py --dataset carla_no_traffic_2x_encoded \
      --batch_size 1 --max_frames 5 --num_channels 32 --num_res_blocks 1 \
      --diffusion_steps 32

  # synthetic smoke run
  DIFFUSION_TRAINING_TEST=1 python scripts/video_train.py --dataset synthetic
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from lfvdm_tpu.config import (
    enable_compilation_cache,
    add_dict_to_argparser,
    create_model_and_diffusion,
    model_and_diffusion_defaults,
)
from lfvdm_tpu.data.datasets import (
    default_image_size_dict,
    default_T_dict,
    load_data,
    load_encoding_stats,
)
from lfvdm_tpu.diffusion.codecs import make_codec
from lfvdm_tpu.diffusion.resample import create_named_schedule_sampler
from lfvdm_tpu.parallel.mesh import setup_distributed
from lfvdm_tpu.training.train_loop import TrainLoop
from lfvdm_tpu.utils.logger import logger


def create_argparser():
    defaults = dict(
        dataset="synthetic",
        T=None,
        lr=1e-4,
        weight_decay=0.0,
        lr_anneal_steps=0,
        microbatch=-1,  # -1 disables gradient accumulation
        seed=123,
        batch_size=1,
        ema_rate="0.9999",
        log_interval=10,
        save_interval=50000,
        sample_interval=50000,
        max_frames=20,
        pad_with_random_frames=True,
        schedule_sampler="uniform",
        checkpoint_dir="checkpoints/run",
        resume=False,
        init_from_pt="",  # warm-start from a converted reference .pt checkpoint
                          # (fine-tune; fresh optimizer/EMA, step 0)
        fsdp=1,
        fsdp_min_size=65536,  # params below this many elements stay replicated
        max_steps=0,
        use_wandb=False,
        resume_id="",  # resume the run with this id (wandb run id == ckpt dir key)
        unobserve=False,  # wandb dryrun mode (reference video_train.py:25-29)
        enc_dec_chunk_size=20,  # frames per VAE encode/decode chunk (online
                                # latent mode; reference video_train.py:158)
        profile_dir="",  # capture a jax.profiler device trace around step 10
        log_attn=False,  # save per-quartile attention heatmaps at vis sampling
        compilation_cache_dir="",  # persistent XLA compile cache (big TPU win)
    )
    defaults.update(model_and_diffusion_defaults())
    parser = argparse.ArgumentParser()
    add_dict_to_argparser(parser, defaults)
    return parser


def resolve_run_identity(args) -> str:
    """Run-id-keyed checkpoint dirs + resume, the reference's workflow.

    ``--resume_id <id>`` resumes run <id> (checkpoint dir checkpoints/<id>,
    wandb resume under the same id — train_util.py:501-505,
    video_train.py:32-48). A fresh run generates an id; the DEFAULT
    checkpoint_dir is keyed by it, an explicit --checkpoint_dir wins.
    """
    import uuid

    import jax

    default_dir = create_argparser().get_default("checkpoint_dir")
    if args.resume_id:
        run_id = args.resume_id
        args.resume = True
    else:
        run_id = uuid.uuid4().hex[:8]
        if jax.process_count() > 1:
            # Every process must agree on the run id (the orbax save is a
            # collective keyed on the checkpoint path) — broadcast process
            # 0's, like the reference broadcasts its wandb id.
            from jax.experimental import multihost_utils
            import numpy as np

            raw = multihost_utils.broadcast_one_to_all(
                np.frombuffer(run_id.encode(), np.uint8))
            run_id = bytes(np.asarray(raw)).decode()
    if args.checkpoint_dir == default_dir:
        args.checkpoint_dir = os.path.join("checkpoints", run_id)
    return run_id


def main():
    from lfvdm_tpu.config import apply_platform_env

    apply_platform_env()  # $LFVDM_PLATFORM=cpu forces CPU (config-level)
    args = create_argparser().parse_args()
    enable_compilation_cache(args.compilation_cache_dir or None)
    setup_distributed()
    run_id = resolve_run_identity(args)
    if args.unobserve:
        os.environ["WANDB_MODE"] = "dryrun"

    # Dataset-derived config (video_train.py:73-91). None-default argparse
    # flags parse as strings (add_dict_to_argparser types by default value),
    # so coerce T before use.
    if args.T is None:
        args.T = default_T_dict.get(args.dataset, 100)
    args.T = int(args.T)
    args.image_size = default_image_size_dict.get(args.dataset, args.image_size)
    stats = None
    if "encoded" in args.dataset:
        args.diffusion_space = "latent"
        args.pre_encoded = True
        args.in_channels = 4
        stats = load_encoding_stats(args.dataset)
        if stats is None:
            print(f"warning: norm stats not found for {args.dataset}; "
                  "using identity stats")
            stats = {"mean": np.zeros(4, np.float32), "std": np.ones(4, np.float32)}
    elif args.diffusion_space == "pixel":
        args.in_channels = 3 if args.dataset != "synthetic" else 3
    elif args.diffusion_space == "wavelet":
        # Live wavelet-packet space (reference ships it NotImplemented): the
        # U-Net runs on C*4^L subband channels at 1/2^L spatial resolution.
        lv = int(args.wavelet_levels)
        args.in_channels = 3 * 4 ** lv
        assert args.image_size % (2 ** lv) == 0, (
            f"image_size {args.image_size} not divisible by 2^{lv}")
        args.image_size //= 2 ** lv

    if stats is not None:
        # Embed the latent norm stats in the run config so eval-time codec
        # construction (make_codec_from_config) needs only the checkpoint.
        args.enc_stats_mean = [float(v) for v in np.asarray(stats["mean"]).reshape(-1)]
        args.enc_stats_std = [float(v) for v in np.asarray(stats["std"]).reshape(-1)]

    # Warm-start from a reference .pt checkpoint (migration path: fine-tune
    # the released reference weights on TPU). The checkpoint's embedded
    # architecture config wins over CLI/dataset-derived flags — exactly like
    # eval-time reconstruction (reference video_sample.py:205-213) — so the
    # converted tree is guaranteed to fit the model being built.
    init_params = None
    if args.init_from_pt:
        from lfvdm_tpu.utils.torch_convert import convert_reference_checkpoint

        init_params, pt_config = convert_reference_checkpoint(args.init_from_pt)
        # Checkpoint config wins over CLI, exactly like eval-time
        # reconstruction (reference video_sample.py:205-213) rebuilds model
        # AND diffusion from the embedded config. Architecture keys must
        # match the weights; the diffusion-parameterization keys must match
        # the loss the weights were trained under — fine-tuning a
        # predict_xstart / KL / cosine-schedule checkpoint under mismatched
        # defaults would silently train toward the wrong target.
        adopt_keys = ("image_size", "in_channels", "num_channels", "num_res_blocks",
                      "num_heads", "num_heads_upsample", "attention_resolutions",
                      "learn_sigma", "use_scale_shift_norm", "use_rpe_net",
                      "predict_xstart", "use_kl", "noise_schedule",
                      "diffusion_steps", "sigma_small", "rescale_learned_sigmas",
                      "rescale_timesteps", "wavelet_levels")
        adopted = {k: pt_config[k] for k in adopt_keys
                   if k in pt_config and pt_config[k] != getattr(args, k)}
        for k, v in adopted.items():
            setattr(args, k, v)
        if adopted:
            print("init_from_pt: checkpoint config overrides CLI/default flags "
                  f"(checkpoint wins): {adopted}")
        # Adopted architecture must be consistent with the dataset-derived
        # codec — fail here with a clear message instead of an opaque shape
        # error at the first batch (e.g. a 3-channel pixel-space checkpoint
        # fine-tuned on an *_encoded latent dataset).
        ckpt_space = pt_config.get("diffusion_space", args.diffusion_space)
        if ckpt_space != args.diffusion_space:
            raise ValueError(
                f"--init_from_pt checkpoint was trained in "
                f"{ckpt_space!r} space but dataset {args.dataset!r} implies "
                f"{args.diffusion_space!r} space — pick a matching dataset "
                "or checkpoint"
            )
        if args.diffusion_space == "latent":
            expected_in = 4
        elif args.diffusion_space == "wavelet":
            expected_in = 3 * 4 ** int(args.wavelet_levels)
        else:
            expected_in = 3
        if args.in_channels != expected_in:
            raise ValueError(
                f"--init_from_pt checkpoint has in_channels={args.in_channels} "
                f"but {args.diffusion_space!r}-space training on "
                f"{args.dataset!r} needs in_channels={expected_in}"
            )

    config = vars(args)
    model, diffusion = create_model_and_diffusion(config)
    codec = make_codec(args.diffusion_space, pre_encoded=args.pre_encoded,
                       pre_encoded_stats=stats,
                       chunk_size=args.enc_dec_chunk_size,
                       wavelet_levels=int(args.wavelet_levels))

    logger.configure(
        log_dir=args.checkpoint_dir, use_wandb=args.use_wandb,
        wandb_kwargs=dict(
            id=run_id, resume="allow",
            entity=os.environ.get("WANDB_ENTITY"),
            project=os.environ.get("WANDB_PROJECT", "video-diffusion"),
            config={k: v for k, v in config.items()
                    if isinstance(v, (str, int, float, bool, type(None)))},
        ),
    )
    logger.logkv("num_nodes", int(os.environ.get("SLURM_JOB_NUM_NODES", 1)),
                 distributed=False)
    data = load_data(args.dataset, batch_size=args.batch_size, T=args.T, seed=args.seed)

    sample_fn = None
    if args.sample_interval:
        from lfvdm_tpu.training.vis_sampling import make_sample_fn

        # Vis batch cached up-front from the stream (train_util.py:85); the
        # in-training sampler (log_samples parity) runs every
        # sample_interval steps and at step 5.
        vis_batch = np.asarray(next(data))[: min(args.batch_size, 2)]
        sample_fn = make_sample_fn(
            vis_batch, out_dir=os.path.join(args.checkpoint_dir, "vis"),
            seed=0, log_attn=args.log_attn,
        )

    loop = TrainLoop(
        model=model,
        diffusion=diffusion,
        data=data,
        codec=codec,
        batch_size=args.batch_size,
        max_frames=args.max_frames,
        lr=args.lr,
        ema_rate=args.ema_rate,
        log_interval=args.log_interval,
        save_interval=args.save_interval,
        sample_interval=args.sample_interval,
        lr_anneal_steps=args.lr_anneal_steps,
        weight_decay=args.weight_decay,
        microbatch=args.microbatch,
        pad_with_random_frames=args.pad_with_random_frames,
        schedule_sampler=create_named_schedule_sampler(args.schedule_sampler, diffusion),
        checkpoint_dir=args.checkpoint_dir,
        resume=args.resume,
        init_params=init_params,
        config=config,
        fsdp=args.fsdp,
        fsdp_min_size=args.fsdp_min_size,
        seed=args.seed,
        profile_dir=args.profile_dir or None,
        sample_fn=sample_fn,
    )
    loop.run_loop(max_steps=args.max_steps or None)


if __name__ == "__main__":
    main()
