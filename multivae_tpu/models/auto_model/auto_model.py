"""AutoModel: reload any model from a folder by its config name.

Reference: ``src/multivae/models/auto_model/auto_model.py:15-232`` (a
hard-coded dispatch there; registry-driven here — every BaseModel subclass
self-registers on definition, and the model class name is the config class
name minus the "Config" suffix).
"""

from __future__ import annotations

import json
import logging
import os

from ..base.base_model import get_model_class

logger = logging.getLogger(__name__)


class AutoModel:
    """Automatically reload any multivae_tpu model from a save folder."""

    @classmethod
    def load_from_folder(cls, dir_path: str):
        """Reload the model saved in ``dir_path``.

        The folder must contain ``model_config.json`` + ``model.msgpack``
        (+ ``<group>.pkl`` files for custom architectures).
        """
        config_path = os.path.join(dir_path, "model_config.json")
        with open(config_path) as f:
            config_name = json.load(f)["name"]

        # make sure all model classes are registered
        import multivae_tpu.models  # noqa: F401

        if not config_name.endswith("Config"):
            raise NameError(
                f"Cannot infer the model class from config name "
                f"'{config_name}'."
            )
        model_name = config_name[: -len("Config")]
        try:
            model_cls = get_model_class(model_name)
        except NameError as e:
            raise NameError(
                f"Unknown model name '{model_name}' read from "
                f"{config_path}. Check that the folder was saved with a "
                "multivae_tpu model."
            ) from e
        return model_cls.load_from_folder(dir_path)

    @classmethod
    def load_from_hf_hub(cls, hf_hub_path: str,
                         allow_pickle: bool = False):
        """Reload any model from the Hugging Face hub
        (reference ``auto_model.py:116-232``)."""
        import tempfile

        from huggingface_hub import hf_hub_download

        tempdir = tempfile.mkdtemp()
        config_path = hf_hub_download(repo_id=hf_hub_path,
                                      filename="model_config.json",
                                      local_dir=tempdir)
        with open(config_path) as f:
            config_name = json.load(f)["name"]
        import multivae_tpu.models  # noqa: F401

        model_cls = get_model_class(config_name[: -len("Config")])
        return model_cls.load_from_hf_hub(hf_hub_path,
                                          allow_pickle=allow_pickle)
