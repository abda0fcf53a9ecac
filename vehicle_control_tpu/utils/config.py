"""Config loading utilities.

YAML schema is kept compatible with the reference repo's ``config/`` tree
(reference: vehicle_control/utils/common_utils.py:16-19 loads YAML, the
scripts wrap it in OmegaConf for attribute access).  We provide a tiny
attribute-access dict instead of depending on OmegaConf.
"""

from __future__ import annotations

import os
from enum import Enum
from typing import Any, Mapping

import yaml


class TrackType(Enum):
    """Known track names (reference: utils/common_utils.py:8-12)."""

    S = "shoe"
    I = "ippodromo"  # noqa: E741
    B = "bean"
    G = "gokart"


class ConfigDict(dict):
    """A dict with recursive attribute access, mimicking OmegaConf usage."""

    def __init__(self, data: Mapping[str, Any] | None = None, **kwargs):
        super().__init__()
        merged = dict(data or {})
        merged.update(kwargs)
        for key, value in merged.items():
            self[key] = _wrap(value)

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as exc:  # pragma: no cover - error path
            raise AttributeError(name) from exc

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = _wrap(value)

    def get(self, name: str, default: Any = None) -> Any:
        return super().get(name, default)

    def to_dict(self) -> dict:
        return {
            k: (v.to_dict() if isinstance(v, ConfigDict) else v) for k, v in self.items()
        }


def _wrap(value: Any) -> Any:
    if isinstance(value, Mapping) and not isinstance(value, ConfigDict):
        return ConfigDict(value)
    if isinstance(value, list):
        return [_wrap(v) for v in value]
    return value


def load_config(file_path: str) -> ConfigDict:
    """Load a YAML config file (reference: utils/common_utils.py:16-19)."""
    with open(file_path, "r") as fh:
        return ConfigDict(yaml.safe_load(fh))


def save_config(config: Mapping[str, Any], file_path: str) -> None:
    data = config.to_dict() if isinstance(config, ConfigDict) else dict(config)
    with open(file_path, "w") as fh:
        yaml.safe_dump(data, fh, sort_keys=False)


def project_root() -> str:
    """Walk up from this file until a repo marker is found
    (reference: utils/common_utils.py:34-47)."""
    current = os.path.dirname(os.path.abspath(__file__))
    for _ in range(100):
        entries = os.listdir(current)
        if (
            "pyproject.toml" in entries
            or "setup.py" in entries
            or "requirements.txt" in entries
            or ".git" in entries
        ):
            return current
        parent = os.path.dirname(current)
        if parent == current:
            break
        current = parent
    raise FileNotFoundError("project root marker not found")
