"""BaseModel: config plumbing, parameter save/load, model registry.

TPU-native counterpart of reference ``src/multivae/models/base/base_model.py``.
Parameters are a plain nested dict pytree serialized with flax msgpack
(replacing ``model.pt``); custom architectures are cloudpickled like the
reference (``base_model.py:78-117``); ``model_config.json`` keeps the same
name/"name"-field convention so AutoModel dispatch works the same way
(``auto_model.py:15-232``).
"""

from __future__ import annotations

import logging
import os
import sys
from typing import Dict, Type

import cloudpickle
import numpy as np

import jax
import jax.numpy as jnp
from flax import serialization

from ...utils.config import EnvironmentConfig

logger = logging.getLogger(__name__)

_MODEL_REGISTRY: Dict[str, Type["BaseModel"]] = {}


def get_model_class(name: str) -> Type["BaseModel"]:
    if name not in _MODEL_REGISTRY:
        raise NameError(
            f"Model class '{name}' is unknown. Registered: {sorted(_MODEL_REGISTRY)}"
        )
    return _MODEL_REGISTRY[name]


def model_registry() -> Dict[str, Type["BaseModel"]]:
    return dict(_MODEL_REGISTRY)


class BaseModel:
    """Root class of all models.

    Holds the config, the Flax modules, and the parameter pytree
    ``self.params``. All compute methods are pure functions of
    ``(params, batch, rng)`` so they can be jitted/sharded; stateful
    convenience wrappers manage an internal RNG key.
    """

    model_name = "BaseModel"

    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)
        _MODEL_REGISTRY[cls.__name__] = cls

    def __init__(self, model_config, seed: int = 0):
        self.model_config = model_config
        self.params = None
        self._jit_cache = {}
        self._rng = jax.random.key(seed)

    # ------------------------------------------------------------------ rng
    def next_rng(self):
        self._rng, sub = jax.random.split(self._rng)
        return sub

    def set_seed(self, seed: int):
        self._rng = jax.random.key(seed)

    # ---------------------------------------------------------------- dtype
    @staticmethod
    def param_dtype(params):
        """dtype of the parameter tree (for dtype-following constants so
        that bf16 mixed-precision does not mix with f32 constants)."""
        leaves = jax.tree_util.tree_leaves(params)
        return leaves[0].dtype if leaves else jnp.float32

    # ------------------------------------------------------------------ jit
    def _jit(self, key, fn, **jit_kwargs):
        """Cache a jitted closure keyed by (method, static args)."""
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(fn, **jit_kwargs)
        return self._jit_cache[key]

    # ---------------------------------------------------------------- hooks
    def update(self):
        """Epoch-end model self-update hook (reference ``base_ae_model.py``)."""

    # ------------------------------------------------------------ save/load
    def save(self, dir_path: str):
        """Save config + params (+ cloudpickled custom architectures).

        Layout matches the reference (``base_model.py:78-117``):
        ``model_config.json``, ``environment.json``, params in
        ``model.msgpack`` (instead of ``model.pt``), and one ``<name>.pkl``
        per entry of ``model_config.custom_architectures``.
        """
        os.makedirs(dir_path, exist_ok=True)
        env = EnvironmentConfig(
            python_version=f"{sys.version_info[0]}.{sys.version_info[1]}"
        )
        env.save_json(dir_path, "environment")
        self.model_config.save_json(dir_path, "model_config")

        if self.params is None:
            raise RuntimeError("Model parameters are not initialized; cannot save.")
        host_params = jax.tree.map(np.asarray, self.params)
        with open(os.path.join(dir_path, "model.msgpack"), "wb") as f:
            f.write(serialization.msgpack_serialize(host_params))

        for arch_name in set(self.model_config.custom_architectures):
            obj = getattr(self, arch_name)
            with open(os.path.join(dir_path, f"{arch_name}.pkl"), "wb") as f:
                cloudpickle.dump(obj, f)

    @classmethod
    def _load_custom_architectures(cls, dir_path: str, config) -> dict:
        kwargs = {}
        for arch_name in set(getattr(config, "custom_architectures", [])):
            path = os.path.join(dir_path, f"{arch_name}.pkl")
            if not os.path.exists(path):
                raise FileNotFoundError(
                    f"Missing custom architecture file {path} referenced by the "
                    "model config."
                )
            with open(path, "rb") as f:
                kwargs[arch_name] = cloudpickle.load(f)
        return kwargs

    @classmethod
    def _load_params(cls, dir_path: str):
        path = os.path.join(dir_path, "model.msgpack")
        if not os.path.exists(path):
            raise FileNotFoundError(f"Missing model weights file {path}")
        with open(path, "rb") as f:
            return serialization.msgpack_restore(f.read())

    # -------------------------------------------------------- HF hub (opt.)
    MODEL_CARD_TEMPLATE = """---
language: en
tags:
- multivae_tpu
license: apache-2.0
---

### Downloading this model from the Hub
This model was trained with multivae_tpu. It can be downloaded or reloaded
using the method `load_from_hf_hub`
```python
>>> from multivae_tpu.models import AutoModel
>>> model = AutoModel.load_from_hf_hub(hf_hub_path="your_hf_username/repo_name")
```
"""

    @staticmethod
    def _hf_hub_is_available() -> bool:
        import importlib

        return importlib.util.find_spec("huggingface_hub") is not None

    def push_to_hf_hub(self, hf_hub_path: str):
        """Save the model directly to the Hugging Face hub.

        Reference: ``base_model.py:213-299``. Requires the optional
        ``huggingface_hub`` package and a logged-in account.
        """
        if not self._hf_hub_is_available():
            raise ModuleNotFoundError(
                "`huggingface_hub` package must be installed to push your "
                "model to the HF hub. Run `python -m pip install "
                "huggingface_hub` and log in with `huggingface-cli login`."
            )
        import shutil
        import tempfile

        from huggingface_hub import CommitOperationAdd, HfApi

        logger.info("Uploading %s model to %s repo in HF hub...",
                    self.model_name, hf_hub_path)
        tempdir = tempfile.mkdtemp()
        self.save(tempdir)
        model_files = os.listdir(tempdir)

        api = HfApi()
        hf_operations = [
            CommitOperationAdd(
                path_in_repo=file,
                path_or_fileobj=str(os.path.join(tempdir, file)),
            )
            for file in model_files
        ]
        with open(os.path.join(tempdir, "model_card.md"), "w") as f:
            f.write(self.MODEL_CARD_TEMPLATE)
        hf_operations.append(
            CommitOperationAdd(
                path_in_repo="README.md",
                path_or_fileobj=os.path.join(tempdir, "model_card.md"),
            )
        )
        try:
            api.create_commit(
                commit_message=f"Uploading {self.model_name} in "
                f"{hf_hub_path}",
                repo_id=hf_hub_path, operations=hf_operations,
            )
        except Exception:
            from huggingface_hub import create_repo

            repo_name = os.path.basename(os.path.normpath(hf_hub_path))
            logger.info("Creating %s in the HF hub since it does not "
                        "exist...", repo_name)
            create_repo(repo_id=repo_name)
            api.create_commit(
                commit_message=f"Uploading {self.model_name} in "
                f"{hf_hub_path}",
                repo_id=hf_hub_path, operations=hf_operations,
            )
        shutil.rmtree(tempdir)

    @classmethod
    def load_from_hf_hub(cls, hf_hub_path: str,
                         allow_pickle: bool = False):
        """Load a pretrained model from the Hugging Face hub.

        Reference: ``base_model.py:301-375``.
        """
        if not cls._hf_hub_is_available():
            raise ModuleNotFoundError(
                "`huggingface_hub` package must be installed to load models "
                "from the HF hub. Run `python -m pip install "
                "huggingface_hub`."
            )
        import json
        import tempfile

        from huggingface_hub import hf_hub_download

        logger.info("Downloading %s files for rebuilding...", hf_hub_path)
        tempdir = tempfile.mkdtemp()
        config_path = hf_hub_download(repo_id=hf_hub_path,
                                      filename="model_config.json",
                                      local_dir=tempdir)
        with open(config_path) as f:
            config_dict = json.load(f)
        hf_hub_download(repo_id=hf_hub_path, filename="model.msgpack",
                        local_dir=tempdir)
        custom = config_dict.get("custom_architectures", [])
        if custom and not allow_pickle:
            raise RuntimeError(
                "The model on the hub contains cloudpickled custom "
                "architectures. Loading them executes arbitrary code; pass "
                "allow_pickle=True only if you trust the source."
            )
        for arch in set(custom):
            hf_hub_download(repo_id=hf_hub_path, filename=f"{arch}.pkl",
                            local_dir=tempdir)
        return cls.load_from_folder(os.path.dirname(config_path))

    @classmethod
    def config_class(cls):
        """The config class paired with this model (override or inferred)."""
        from ...utils.config import get_config_class

        return get_config_class(cls.__name__ + "Config")

    @classmethod
    def load_from_folder(cls, dir_path: str) -> "BaseModel":
        """Reload a model saved with ``save``.

        Reference: ``base_model.py:183-211``.
        """
        config_path = os.path.join(dir_path, "model_config.json")
        if not os.path.exists(config_path):
            raise FileNotFoundError(f"Missing model config at {config_path}")
        config = cls.config_class().from_json_file(config_path)
        # Custom architecture names were appended by __init__; reset so the
        # rebuilt model does not duplicate them.
        custom = cls._load_custom_architectures(dir_path, config)
        config.custom_architectures = []
        model = cls(config, **custom)
        params = cls._load_params(dir_path)
        model.params = jax.tree.map(jnp.asarray, params)
        return model
