"""Training CLI: the equivalent of the reference's train/main.py.

Usage (mirrors scripts/train/stage1.sh):
  python -m infinisst_tpu.train.main \
      --data_path /data/en-de --data_split_train train_traj \
      --stage 1 --trajectory 4 --trajectory_max_multiplier 4 \
      --llm_path /path/llama-3.1-8b-instruct-hf \
      --w2v2_path /path/wav2_vec_vox_960h_pl.pt \
      --save_dir runs/stage1 --n_data 8 --n_model 1

Model weights come from the converters (convert/from_torch.py); stage 2
resumes from stage 1's orbax checkpoint or a converted bin
(--sllm_weight_path, ref: model/model.py:142-145).
"""

from __future__ import annotations

import argparse
import dataclasses
import os

import numpy as np


def parse_args() -> argparse.Namespace:
    from infinisst_tpu.train.trainer import TrainerArgs

    p = argparse.ArgumentParser()
    for f in dataclasses.fields(TrainerArgs):
        name = "--" + f.name
        if f.type == "bool" or isinstance(f.default, bool):
            p.add_argument(name, type=lambda x: str(x).lower() == "true",
                           default=f.default)
        elif f.default is None:
            p.add_argument(name, type=int, default=None)
        elif isinstance(f.default, tuple):
            p.add_argument(name, type=str, default=",".join(map(str, f.default)))
        else:
            p.add_argument(name, type=type(f.default), default=f.default)
    p.add_argument("--llm_path", type=str, default=None,
                   help="HF Llama checkpoint dir (or .bin/.safetensors)")
    p.add_argument("--w2v2_path", type=str, default=None,
                   help="fairseq wav2vec2 .pt")
    p.add_argument("--sllm_weight_path", type=str, default=None,
                   help="stage-1 consolidated bin (stage 2)")
    p.add_argument("--tokenizer_path", type=str, default=None)
    p.add_argument("--model_preset", type=str, default="flagship",
                   choices=["flagship", "bench", "dryrun"])
    return p.parse_args()


def build_params(args, model_cfg):
    """Load/convert initial weights; random init where no path is given."""
    import jax
    import jax.numpy as jnp

    from infinisst_tpu.convert import from_torch as C
    from infinisst_tpu.models import adapter as A
    from infinisst_tpu.models import llama as L
    from infinisst_tpu.models import wav2vec2 as W

    k = jax.random.PRNGKey(0)
    params = {
        "w2v2": W.init_params(jax.random.fold_in(k, 0), model_cfg.w2v2),
        "adapter": A.init_params(jax.random.fold_in(k, 1), model_cfg.adapter),
        "llama": L.init_params(jax.random.fold_in(k, 2), model_cfg.llama),
    }
    if args.sllm_weight_path:
        sd = C.load_torch_state(args.sllm_weight_path)
        params = C.to_jax(C.convert_reference_bin(sd, model_cfg))
        return params
    if args.w2v2_path:
        # fairseq .pt files carry omegaconf config objects -> the restricted
        # fallback unpickler is required (allowlisted modules only)
        sd = C.load_torch_state(args.w2v2_path, allow_pickle=True)
        params["w2v2"] = C.to_jax(C.convert_w2v2(sd, model_cfg.w2v2))
    if args.llm_path:
        path = args.llm_path
        if os.path.isdir(path):
            import glob

            sd = {}
            for f in sorted(
                glob.glob(os.path.join(path, "pytorch_model*.bin"))
            ) or sorted(glob.glob(os.path.join(path, "*.safetensors"))):
                if f.endswith(".safetensors"):
                    from safetensors.numpy import load_file

                    sd.update(load_file(f))
                else:
                    sd.update(C.load_torch_state(f))
        else:
            sd = C.load_torch_state(path)
        params["llama"] = C.to_jax(C.convert_llama(sd, model_cfg.llama))
    return params


def main():
    args = parse_args()

    from infinisst_tpu.core.presets import (
        bench_1chip_config,
        dryrun_config,
        flagship_config,
    )
    from infinisst_tpu.data.template import (
        HFTokenizerAdapter,
        PromptBuilder,
        StubTokenizer,
    )
    from infinisst_tpu.train.trainer import Trainer, TrainerArgs

    cfg = {
        "flagship": flagship_config,
        "bench": bench_1chip_config,
        "dryrun": dryrun_config,
    }[args.model_preset]()

    ta_fields = {f.name for f in dataclasses.fields(TrainerArgs)}
    kw = {k: v for k, v in vars(args).items() if k in ta_fields}
    if isinstance(kw.get("trajectory_perturb"), str):
        kw["trajectory_perturb"] = tuple(
            float(x) for x in kw["trajectory_perturb"].split(",")
        )
    targs = TrainerArgs(**kw)

    if args.tokenizer_path:
        from transformers import AutoTokenizer

        from infinisst_tpu.data.template import register_special_tokens

        tok = AutoTokenizer.from_pretrained(args.tokenizer_path, use_fast=False)
        register_special_tokens(tok, cfg)
        tokenizer = HFTokenizerAdapter(tok)
    else:
        tokenizer = StubTokenizer(cfg.llama.vocab_size)

    builder = PromptBuilder(
        tokenizer, cfg.tokens, targs.source_lang, targs.target_lang
    )
    params = build_params(args, cfg)
    trainer = Trainer(targs, cfg, builder, params)
    final_step = trainer.fit()
    print(f"training done at step {final_step}; checkpoints in "
          f"{os.path.join(targs.save_dir, 'ckpt')}")


if __name__ == "__main__":
    main()
