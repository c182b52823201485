"""Checkpoint converter CLI.

Capability parity with /root/reference/mlx_audio/tts/convert.py:1-100 and
tts/utils.py:326-421: cast dtype, (de)quantize with group size / bits /
mixed recipes, and write a native checkpoint (pytree-path safetensors +
config.json) that utils.loader.load_model reads back without sanitize.

Upload (--upload-repo) pushes the written folder to the Hugging Face hub
with a generated model card (reference tts/utils.py:279-323); it needs
network access and huggingface_hub, and raises a clear error without them.
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
        upload_to_hub(str(out), upload_repo, hf_path)
    return out


def upload_to_hub(path: str, upload_repo: str, hf_path: str) -> None:
    """Push a converted checkpoint folder to the HF hub with a generated
    model card (reference tts/utils.py:279-323).  Gated on huggingface_hub
    being importable and the network being reachable; failures surface as a
    RuntimeError naming the folder so the user can push manually."""
    try:
        from huggingface_hub import HfApi, ModelCard
    except ImportError as exc:
        raise RuntimeError(
            "--upload-repo requires huggingface_hub; push the written "
            f"folder manually: {path}"
        ) from exc

    import os
    from textwrap import dedent

    try:
        card = ModelCard.load(hf_path)
    except Exception:  # offline or local-only source: start a fresh card
        card = ModelCard("")
    tags = list(getattr(card.data, "tags", None) or [])
    card.data.tags = tags + ["tpu", "jax", "mlx-audio-tpu"]
    card.text = dedent(
        f"""
        # {upload_repo}
        This model was converted to mlx-audio-tpu native format from
        [`{hf_path}`](https://huggingface.co/{hf_path}).
        Refer to the original model card for details on the model.

        ## Use with mlx-audio-tpu

        ```bash
        pip install -U mlx-audio-tpu
        python -m mlx_audio_tpu.tts.generate --model {upload_repo} --text "Hello"
        ```
        """
    )
    card.save(os.path.join(path, "README.md"))

    try:
        api = HfApi()
        api.create_repo(repo_id=upload_repo, exist_ok=True)
        api.upload_folder(folder_path=path, repo_id=upload_repo,
                          repo_type="model")
    except Exception as exc:
        raise RuntimeError(
            f"upload to {upload_repo} failed ({exc}); push the written "
            f"folder manually: {path}"
        ) from exc
    print(f"Upload successful: https://huggingface.co/{upload_repo}")


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
