"""Config base: pydantic dataclasses with JSON round-trip and a name registry.

Mirrors the role of pythae's ``BaseConfig`` used by every reference config
(reference ``src/multivae/models/base/base_config.py``): ``to_dict`` embeds a
``"name"`` field (the config class name) which ``AutoConfig``/``AutoModel``
dispatch on when reloading from a folder (reference
``src/multivae/models/auto_model/auto_config.py:5-40``).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Type

import pydantic
from pydantic.dataclasses import dataclass

_CONFIG_REGISTRY: Dict[str, Type] = {}


def register_config(cls):
    """Register a config class under its own name for AutoConfig dispatch."""
    _CONFIG_REGISTRY[cls.__name__] = cls
    return cls


def get_config_class(name: str):
    if name not in _CONFIG_REGISTRY:
        raise NameError(
            f"Config class '{name}' is not registered. Known configs: "
            f"{sorted(_CONFIG_REGISTRY)}"
        )
    return _CONFIG_REGISTRY[name]


def _jsonable(obj: Any) -> Any:
    """Recursively convert to JSON-serializable structures."""
    if isinstance(obj, dict):
        return {str(k): _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if hasattr(obj, "item") and getattr(obj, "ndim", None) == 0:
        return obj.item()
    if hasattr(obj, "tolist"):
        return obj.tolist()
    return obj


@dataclass(config=pydantic.ConfigDict(extra="allow", validate_assignment=False))
class BaseConfig:
    """Base class for all model / trainer / sampler / metric configs.

    Provides ``to_dict`` / ``to_json_string`` / ``save_json`` and the
    classmethods ``from_dict`` / ``from_json_file``.
    """

    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)
        register_config(cls)

    @property
    def name(self) -> str:
        return self.__class__.__name__

    def to_dict(self) -> dict:
        d = {"name": self.__class__.__name__}
        for field_name in self.__dataclass_fields__:
            d[field_name] = _jsonable(getattr(self, field_name))
        # pydantic(extra="allow") stores unknown init kwargs here
        extra = getattr(self, "__pydantic_extra__", None)
        if extra:
            for k, v in extra.items():
                d[k] = _jsonable(v)
        return d

    def to_json_string(self) -> str:
        return json.dumps(self.to_dict(), indent=2, sort_keys=True)

    def save_json(self, dir_path: str, filename: str) -> None:
        os.makedirs(dir_path, exist_ok=True)
        if not filename.endswith(".json"):
            filename = filename + ".json"
        with open(os.path.join(dir_path, filename), "w") as f:
            f.write(self.to_json_string())

    @classmethod
    def from_dict(cls, config_dict: dict) -> "BaseConfig":
        d = dict(config_dict)
        d.pop("name", None)
        return cls(**d)

    @classmethod
    def from_json_file(cls, json_path: str) -> "BaseConfig":
        with open(json_path) as f:
            d = json.load(f)
        name = d.get("name", cls.__name__)
        target = _CONFIG_REGISTRY.get(name, cls)
        return target.from_dict(d)


register_config(BaseConfig)


@dataclass
class EnvironmentConfig(BaseConfig):
    """Records the python version used when saving a model.

    Reference: ``src/multivae/models/base/base_config.py:44-48``.
    """

    python_version: str = "3.12"
