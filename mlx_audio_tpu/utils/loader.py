"""Model registry / loader: HF-or-local path -> constructed model with
weights (capability parity with /root/reference/mlx_audio/tts/utils.py:
18-268 and stt/utils.py:111-193).

Model discovery is directory-scan based with a remapping table; checkpoints
are safetensors mapped through each model's `sanitize` into the pytree.
"""

from __future__ import annotations

import glob
import importlib
import json
import logging
from pathlib import Path
from typing import List, Optional, Union

import numpy as np

MODEL_REMAPPING = {"outetts": "outetts", "spark": "spark", "csm": "sesame",
                   "styletts2": "kokoro", "wav2vec2": "wav2vec",
                   "parakeet_ctc": "parakeet"}


def get_model_path(path_or_hf_repo: str, revision: Optional[str] = None) -> Path:
    """Resolve a local path, else download the repo snapshot from HF
    (reference tts/utils.py:23-55)."""
    model_path = Path(path_or_hf_repo)
    if not model_path.exists():
        from huggingface_hub import snapshot_download

        model_path = Path(
            snapshot_download(
                path_or_hf_repo,
                revision=revision,
                allow_patterns=["*.json", "*.safetensors", "*.py", "*.model",
                                "*.tiktoken", "*.txt", "*.jsonl", "*.yaml",
                                "*.pt", "*.npz", "*.wav"],
            )
        )
    return model_path


def get_available_models(domain: str = "tts") -> List[str]:
    models_dir = Path(__file__).parent.parent / "models" / domain
    out = []
    if models_dir.is_dir():
        for item in models_dir.iterdir():
            if item.is_dir() and not item.name.startswith("__"):
                out.append(item.name)
    return out


def get_model_and_args(model_type: str, model_name: Optional[List[str]],
                       domain: str = "tts"):
    """Resolve a model module from its type and repo-name segments
    (reference tts/utils.py:77-121)."""
    model_type = MODEL_REMAPPING.get(model_type, model_type)
    models = get_available_models(domain)
    if model_name is not None:
        for part in model_name:
            if part in models:
                model_type = part
            if part in MODEL_REMAPPING:
                model_type = MODEL_REMAPPING[part]
                break
    try:
        arch = importlib.import_module(f"mlx_audio_tpu.models.{domain}.{model_type}")
    except ImportError as e:
        raise ValueError(f"Model type {model_type} not supported ({e})")
    return arch, model_type


def load_config(model_path: Union[str, Path], **kwargs) -> dict:
    if isinstance(model_path, str):
        model_path = get_model_path(model_path)
    cfg = Path(model_path) / "config.json"
    if cfg.exists():
        with open(cfg, encoding="utf-8") as f:
            return json.load(f)
    try:
        from transformers import AutoConfig

        return AutoConfig.from_pretrained(model_path, **kwargs).to_dict()
    except Exception as exc:
        raise FileNotFoundError(f"Config not found at {model_path}") from exc


def load_weights_files(model_path: Path) -> dict:
    weight_files = glob.glob(str(model_path / "*.safetensors"))
    if not weight_files:
        weight_files = glob.glob(str(model_path / "LLM" / "*.safetensors"))
    if not weight_files:
        raise FileNotFoundError(f"No safetensors found in {model_path}")
    from safetensors.numpy import load_file

    weights = {}
    for wf in weight_files:
        weights.update(load_file(wf))
    return weights


def load_model(path_or_repo: Union[str, Path], domain: str = "tts",
               strict: bool = False, dtype=None, **kwargs):
    """Load and initialize a model (reference tts/utils.py:150-268)."""
    from mlx_audio_tpu.nn.module import update_arrays

    model_name = None
    if isinstance(path_or_repo, str):
        model_name = path_or_repo.lower().split("/")[-1].split("-")
        model_path = get_model_path(path_or_repo)
    else:
        model_path = Path(path_or_repo)
        try:
            index = model_path.parts.index("hub")
            model_name = model_path.parts[index + 1].lower().split("--")[-1].split("-")
        except ValueError:
            model_name = model_path.name.lower().split("-")

    config = load_config(model_path, **kwargs)
    config.setdefault("tokenizer_name", str(model_path))
    model_type = config.get("model_type") or (model_name[0] if model_name else None)

    arch, model_type = get_model_and_args(model_type, model_name, domain)

    if hasattr(arch, "ModelConfig"):
        model_config = arch.ModelConfig.from_dict(config)
    else:
        model_config = config
    model = arch.Model(model_config)

    # quantized native checkpoints need the quantized module structure in
    # place before path-based weight loading (reference re-applies
    # nn.quantize from config, tts/utils.py:250-260)
    if config.get("native_format") and config.get("quantization"):
        from mlx_audio_tpu.nn.quantize import quantize_model

        qcfg = config["quantization"]
        model = quantize_model(model, group_size=qcfg.get("group_size", 64),
                               bits=qcfg.get("bits", 4))

    weights = load_weights_files(model_path)
    # native checkpoints (written by save_checkpoint) already use our pytree
    # paths and layouts; foreign (torch/MLX) checkpoints go through sanitize
    if not config.get("native_format") and hasattr(model, "sanitize"):
        weights = model.sanitize(weights)
    model = update_arrays(model, weights, strict=strict)
    if dtype is not None:
        model = model.astype(dtype)
    model._asset_dir = str(model_path)
    logging.info(f"Loaded {model_type} from {model_path}")
    return model


def save_checkpoint(model, out_dir: Union[str, Path], config: dict):
    """Write a model in native format: safetensors keyed by pytree paths +
    config.json (the converter's output side; reference tts/utils.py:326-421
    writes MLX-format checkpoints analogously)."""
    from safetensors.numpy import save_file

    from mlx_audio_tpu.nn.module import named_arrays

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    weights = {p: np.asarray(x) for p, x in named_arrays(model)}
    save_file(weights, str(out_dir / "weights.safetensors"))
    config = {**config, "native_format": True}
    with open(out_dir / "config.json", "w") as f:
        json.dump(config, f, indent=2, default=str)
    return out_dir
