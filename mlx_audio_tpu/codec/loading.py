"""Shared codec checkpoint loading (reference: per-codec `from_pretrained`
+ `fetch_from_hub`, e.g. descript/dac.py:252-285, encodec.py:711-738,
snac.py:127-155, mimi.py:252-261, s3/model_v2.py:355-370).

Each codec exposes `from_pretrained(path_or_repo)`; this module holds the
common path/HF-snapshot resolution and safetensors collection.  Works
offline with local checkpoint directories; HF downloads are attempted only
for non-local names.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional


def fetch_from_hub(path_or_repo: str,
                   allow_patterns=("*.json", "*.safetensors", "*.model")) -> Path:
    path = Path(path_or_repo)
    if path.exists():
        return path
    from huggingface_hub import snapshot_download

    return Path(snapshot_download(repo_id=path_or_repo,
                                  allow_patterns=list(allow_patterns)))


def load_config(path: Path) -> dict:
    with open(path / "config.json") as f:
        return json.load(f)


def load_safetensors(path: Path, filename: Optional[str] = None) -> dict:
    """Collect numpy weights from `filename`, or every *.safetensors in the
    directory (handles HF shard layouts) via the shared loader helper."""
    from safetensors.numpy import load_file

    if filename is not None:
        return load_file(str(path / filename))
    from mlx_audio_tpu.utils.loader import load_weights_files

    return load_weights_files(Path(path))
