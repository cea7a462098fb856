"""AutoConfig: reload any config from its JSON "name" field.

Reference: ``src/multivae/models/auto_model/auto_config.py`` (a hard-coded
if/elif dispatch there; a registry lookup here — every BaseConfig subclass
self-registers on definition).
"""

from __future__ import annotations

import json

from ...utils.config import get_config_class


class AutoConfig:
    """Dispatches config reloading on the JSON ``name`` field."""

    @classmethod
    def from_json_file(cls, json_path: str):
        with open(json_path) as f:
            name = json.load(f)["name"]
        # make sure all model config classes are registered
        import multivae_tpu.models  # noqa: F401

        config_cls = get_config_class(name)
        return config_cls.from_json_file(json_path)
