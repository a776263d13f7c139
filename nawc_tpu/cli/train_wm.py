"""Train the neural additive watermarker (generator + detector jointly).

Usage:
  python -m nawc_tpu.cli.train_wm --steps 10000 --batch 16 \
      --out checkpoints/neural_wm.msgpack
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
    ap.add_argument("--steps", type=int, default=10_000)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--seconds", type=float, default=1.0)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="checkpoints/neural_wm.msgpack")
    ap.add_argument("--resume", default=None)
    ap.add_argument("--start_step", type=int, default=0,
                    help="curriculum offset added to the step counter; use on "
                         "--resume so the attack-severity ramp (wm_train.wm_loss) "
                         "does not restart from zero")
    ap.add_argument("--log_every", type=int, default=50)
    ap.add_argument("--save_every", type=int, default=500)
    ap.add_argument("--codec_ckpt", default=None,
                    help="enable the differentiable codec-roundtrip attack "
                         "branch (every 3rd step) against this codec — "
                         "targets the encodec/dac eval rows")
    args = ap.parse_args(argv)

    import optax

    from nawc_tpu.train.codec_train import speech_batches
    from nawc_tpu.train.wm_train import init_wm_train, make_wm_train_step
    from nawc_tpu.utils.checkpoint import save_params
    from nawc_tpu.utils.config import NeuralWMConfig

    cfg = NeuralWMConfig()
    files = sorted(glob.glob(args.audio_glob))
    t = int(args.seconds * cfg.sample_rate)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(args.lr, weight_decay=1e-5))
    state = init_wm_train(jax.random.PRNGKey(args.seed), cfg, tx, example_len=t)
    if args.resume:
        from nawc_tpu.utils.checkpoint import load_params

        blob = load_params(args.resume, {"gen": state.gen_params, "det": state.det_params})
        state.gen_params, state.det_params = blob["gen"], blob["det"]
        print(f"[train_wm] resumed from {args.resume}", flush=True)
    step_fn = make_wm_train_step(cfg, tx)
    step_fn_codec = None
    if args.codec_ckpt:
        from .common import load_codec

        step_fn_codec = make_wm_train_step(cfg, tx, codec=load_codec(args.codec_ckpt))
    batches = speech_batches(files, args.batch, args.seconds, cfg.sample_rate, seed=args.seed)

    gen, det, opt = state.gen_params, state.det_params, state.opt_state
    key = jax.random.PRNGKey(args.seed + 1)
    out_path = Path(args.out)
    log_path = out_path.with_suffix(".log.jsonl")
    log_path.parent.mkdir(parents=True, exist_ok=True)
    t_start = time.time()
    for step in range(1, args.steps + 1):
        wav = jnp.asarray(next(batches)[:, :t])
        key, km, kk = jax.random.split(key, 3)
        msg = jax.random.bernoulli(km, 0.5, (args.batch, cfg.n_bits)).astype(jnp.int32)
        fn = step_fn_codec if (step_fn_codec is not None and step % 3 == 0) else step_fn
        gen, det, opt, metrics = fn(
            gen, det, opt, wav, msg, kk, jnp.asarray(step + args.start_step))
        if step % args.log_every == 0:
            m = {k: float(v) for k, v in jax.device_get(metrics).items()}
            m.update(step=step, wall=round(time.time() - t_start, 1))
            print(f"[train_wm] {json.dumps(m)}", flush=True)
            with open(log_path, "a") as f:
                f.write(json.dumps(m) + "\n")
        if step % args.save_every == 0 or step == args.steps:
            save_params(out_path, {
                "gen": jax.device_get(gen), "det": jax.device_get(det)})
            print(f"[train_wm] saved {out_path} @ {step}", flush=True)


if __name__ == "__main__":
    main()
