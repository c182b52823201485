"""Checkpoint converter CLI.

Capability parity with /root/reference/mlx_audio/tts/convert.py:1-100 and
tts/utils.py:326-421: cast dtype, (de)quantize with group size / bits /
mixed recipes, and write a native checkpoint (pytree-path safetensors +
config.json) that utils.loader.load_model reads back without sanitize.

Upload (--upload-repo) is accepted for CLI parity but requires network
access; it raises a clear error in air-gapped environments.
"""

from __future__ import annotations

import argparse
import json

import jax.numpy as jnp

from mlx_audio_tpu.nn.quantize import (
    QUANT_RECIPES,
    dequantize_model,
    mixed_quant_predicate_builder,
    quantize_model,
)
from mlx_audio_tpu.utils.loader import load_config, load_model, save_checkpoint

DTYPES = {"float16": jnp.float16, "bfloat16": jnp.bfloat16,
          "float32": jnp.float32}


def convert(hf_path: str, out_path: str = "tpu_model", quantize: bool = False,
            q_group_size: int = 64, q_bits: int = 4, dtype: str = "float16",
            quant_predicate=None, dequantize: bool = False,
            domain: str = "tts", upload_repo=None):
    model = load_model(hf_path, domain=domain)
    config = dict(load_config(hf_path))

    if dequantize:
        model = dequantize_model(model)
        config.pop("quantization", None)
    elif quantize:
        if isinstance(quant_predicate, str):
            quant_predicate = mixed_quant_predicate_builder(
                quant_predicate, model)
        model = quantize_model(model, group_size=q_group_size, bits=q_bits,
                               quant_predicate=quant_predicate)
        config["quantization"] = {"group_size": q_group_size, "bits": q_bits}
    else:
        model = model.astype(DTYPES[dtype])
        config["dtype"] = dtype

    out = save_checkpoint(model, out_path, config)
    if upload_repo:
        raise RuntimeError(
            "--upload-repo needs network access (huggingface_hub upload); "
            "push the written folder manually: " + str(out)
        )
    return out


def configure_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Convert a HF/torch checkpoint to native TPU format")
    parser.add_argument("--hf-path", type=str, required=True)
    parser.add_argument("--out-path", "--mlx-path", dest="out_path",
                        type=str, default="tpu_model")
    parser.add_argument("-q", "--quantize", action="store_true")
    parser.add_argument("--q-group-size", type=int, default=64)
    parser.add_argument("--q-bits", type=int, default=4)
    parser.add_argument("--quant-predicate", choices=QUANT_RECIPES,
                        type=str, required=False)
    parser.add_argument("--dtype", type=str, default="float16",
                        choices=list(DTYPES))
    parser.add_argument("-d", "--dequantize", action="store_true")
    parser.add_argument("--domain", type=str, default="tts",
                        choices=["tts", "stt"])
    parser.add_argument("--upload-repo", type=str, default=None)
    return parser


def main():
    args = configure_parser().parse_args()
    out = convert(
        args.hf_path, args.out_path, quantize=args.quantize,
        q_group_size=args.q_group_size, q_bits=args.q_bits,
        dtype=args.dtype, quant_predicate=args.quant_predicate,
        dequantize=args.dequantize, domain=args.domain,
        upload_repo=args.upload_repo,
    )
    print(json.dumps({"written": str(out)}))


if __name__ == "__main__":
    main()
