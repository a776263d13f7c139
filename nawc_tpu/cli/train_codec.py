"""Train the SNAC-style codec.

Usage:
  python -m nawc_tpu.cli.train_codec --audio_glob '/root/reference/dataset/LibriSpeech/*.wav' \
      --steps 20000 --batch 16 --seconds 1.3653 --out checkpoints/codec_24k.msgpack

New capability vs the reference (which ships no training loop, SURVEY.md §0);
CLI shape follows the reference's argparse-per-script convention
(``watermark_testing.py:954-1021``).
"""

from __future__ import annotations

import argparse
import glob
import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--audio_glob", default="/root/reference/dataset/LibriSpeech/*.wav")
    ap.add_argument("--steps", type=int, default=20_000)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--seconds", type=float, default=32_768 / 24_000)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="checkpoints/codec_24k.msgpack")
    ap.add_argument("--resume", default=None)
    ap.add_argument("--log_every", type=int, default=50)
    ap.add_argument("--save_every", type=int, default=500)
    ap.add_argument("--revive_every", type=int, default=250,
                    help="dead-codebook-code revival interval (0 = off)")
    ap.add_argument("--sisnr_weight", type=float, default=0.0,
                    help="negative-SI-SNR loss weight (phase-locking term)")
    ap.add_argument("--val_files", type=int, default=0,
                    help="hold out the last N files; eval si-snr/lsd/stoi every save_every")
    ap.add_argument("--size", choices=["full", "small"], default="full")
    from nawc_tpu.utils.config import CodecConfig
    from nawc_tpu.utils.flags import add_dataclass_args, dataclass_from_args

    add_dataclass_args(ap, CodecConfig, "cfg")  # --cfg.encoder_dim etc.
    args = ap.parse_args(argv)

    from nawc_tpu.train import init_codec_train, make_codec_train_step, speech_batches
    from nawc_tpu.train.codec_train import make_optimizer
    from nawc_tpu.utils.checkpoint import load_params, save_params

    if args.size == "full":
        base = CodecConfig()
    else:
        base = CodecConfig(encoder_dim=8, latent_dim=64, decoder_dim=64,
                           codebook_size=128, codebook_dim=8)
    cfg = dataclass_from_args(CodecConfig, args, "cfg", base=base)

    files = sorted(glob.glob(args.audio_glob))
    if not files:
        raise SystemExit(f"no audio files match {args.audio_glob}")
    val_files: list[str] = []
    if args.val_files:
        val_files, files = files[-args.val_files:], files[: -args.val_files]
    print(f"[train_codec] {len(files)} train / {len(val_files)} val files, "
          f"cfg hop={cfg.hop} chunk={cfg.chunk}", flush=True)

    tx = make_optimizer(lr=args.lr, total=args.steps)
    state, _ = init_codec_train(jax.random.PRNGKey(args.seed), cfg, tx=tx, example_len=int(args.seconds * cfg.sample_rate) // cfg.chunk * cfg.chunk or cfg.chunk)
    if args.resume:
        state.params = load_params(args.resume, state.params)
        print(f"[train_codec] resumed params from {args.resume}", flush=True)
    step_fn = make_codec_train_step(cfg, tx, sisnr_weight=args.sisnr_weight)

    t = int(args.seconds * cfg.sample_rate) // cfg.chunk * cfg.chunk or cfg.chunk
    batches = speech_batches(files, args.batch, t / cfg.sample_rate, cfg.sample_rate, seed=args.seed)

    eval_fn = None
    val_batch = None
    if val_files:
        from nawc_tpu.train.codec_train import make_codec_eval_fn

        eval_fn = make_codec_eval_fn(cfg)
        val_batch = jnp.asarray(next(speech_batches(
            val_files, min(4 * args.batch, 64), t / cfg.sample_rate,
            cfg.sample_rate, seed=args.seed + 1, loop=False))[:, :t])

    from nawc_tpu.train.codec_train import revive_dead_codes

    params, opt_state = state.params, state.opt_state
    out_path = Path(args.out)
    t_start = time.time()
    log_path = out_path.with_suffix(".log.jsonl")
    log_path.parent.mkdir(parents=True, exist_ok=True)
    usage = {i: np.zeros(cfg.codebook_size, np.int64) for i in range(cfg.num_levels)}
    revive_rng = np.random.default_rng(args.seed + 7)
    for step in range(1, args.steps + 1):
        wav = jnp.asarray(next(batches)[:, :t])
        params, opt_state, metrics = step_fn(params, opt_state, wav)
        # accumulate codebook usage (cheap: (4096,) int transfer per step)
        for i in range(cfg.num_levels):
            usage[i] += np.asarray(metrics[f"usage_{i}"], np.int64)
        if step % args.log_every == 0:
            # before revival: revival zeroes `usage`, which used to make
            # coinciding log steps report live_codes [0,0,0] (round-1 bug)
            m = {k: float(v) for k, v in jax.device_get(metrics).items() if not k.startswith("usage_")}
            m["live_codes"] = [int((usage[i] > 0).sum()) for i in range(cfg.num_levels)]
            if eval_fn is not None and step % args.save_every == 0:
                m.update({k: float(v) for k, v in jax.device_get(eval_fn(params, val_batch)).items()})
            m.update(step=step, wall=round(time.time() - t_start, 1))
            print(f"[train_codec] {json.dumps(m)}", flush=True)
            with open(log_path, "a") as f:
                f.write(json.dumps(m) + "\n")
        if args.revive_every and step % args.revive_every == 0:
            params, dead = revive_dead_codes(params, usage, cfg, revive_rng)
            usage = {i: np.zeros(cfg.codebook_size, np.int64) for i in range(cfg.num_levels)}
            print(f"[train_codec] revived dead codes per level: {dead} @ step {step}", flush=True)
        if step % args.save_every == 0 or step == args.steps:
            # save as bf16 to halve the checkpoint size
            save_params(out_path, jax.tree_util.tree_map(
                lambda x: np.asarray(x, np.float32), jax.device_get(params)))
            print(f"[train_codec] saved {out_path} @ step {step}", flush=True)


if __name__ == "__main__":
    main()
