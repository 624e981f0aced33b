#!/usr/bin/env python
"""LoRA fine-tuning driver.

  python examples/train_lora.py -m <model_dir> -d data.txt \
      [--rank 8] [--steps 100] [--lr 1e-4] [--seq 256] [--batch 4] \
      [--out adapters_merged] [--ckpt ckpt_dir] [--resume]

Fine-tunes rank-r adapters on next-token prediction over a plain-text
file, checkpointing optimizer state (resumable), and saves the MERGED
model as safetensors — loadable by `auto_model` / every demo like any HF
checkpoint.  Beyond the reference (inference-only).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp


def batches(ids: np.ndarray, seq: int, bsz: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    n = len(ids) - seq - 1
    while True:
        starts = rng.integers(0, max(n, 1), bsz)
        x = np.stack([ids[s : s + seq] for s in starts])
        y = np.stack([ids[s + 1 : s + seq + 1] for s in starts])
        yield jnp.asarray(x, jnp.int32), jnp.asarray(y, jnp.int32)


def main():
    import optax

    from mllm_tpu.models.registry import auto_model
    from mllm_tpu.training import (TrainState, add_lora, lora_params_filter,
                                   make_train_step, merge_lora,
                                   restore_checkpoint, save_checkpoint)

    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-d", "--data", required=True, help="plain-text training file")
    ap.add_argument("--rank", type=int, default=8)
    ap.add_argument("--alpha", type=float, default=16.0)
    ap.add_argument("--targets", default=r"(q_proj|k_proj|v_proj|o_proj)")
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--seq", type=int, default=256)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--out", default=None, help="save merged model here")
    ap.add_argument("--ckpt", default=None, help="checkpoint dir (with --resume)")
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args()

    model, tok, cfg = auto_model(args.model, dtype=jnp.float32)
    with open(args.data) as f:
        ids = np.asarray(tok.encode(f.read(), bos=True), np.int64)
    print(f"data: {len(ids)} tokens; adding rank-{args.rank} adapters to {args.targets}")

    lora = add_lora(model, jax.random.PRNGKey(0), args.rank, args.alpha, args.targets)
    tx = optax.adamw(args.lr)
    state = TrainState.create(lora, tx, trainable=lora_params_filter)
    if args.resume and args.ckpt and os.path.exists(args.ckpt):
        state = restore_checkpoint(args.ckpt, state)
        print(f"resumed from {args.ckpt} at step {int(state.step)}")
    step = make_train_step(tx, trainable=lora_params_filter)

    t0 = time.perf_counter()
    for (x, y), _ in zip(batches(ids, args.seq, args.batch), range(args.steps)):
        state, loss = step(state, x, y)
        i = int(state.step)
        if i % 10 == 0 or i == 1:
            print(f"step {i:5d}  loss {float(loss):.4f}  "
                  f"{(time.perf_counter() - t0) / i:.2f} s/step", flush=True)

    if args.ckpt:
        save_checkpoint(args.ckpt, state)
        print(f"checkpoint -> {args.ckpt}")
    if args.out:
        from mllm_tpu.core.param_loader import save_safetensors_model

        merged = merge_lora(state.model)
        save_safetensors_model(args.out, merged, args.model)
        print(f"merged model -> {args.out}")


if __name__ == "__main__":
    main()
