"""IAF sampler config (reference
``src/multivae/samplers/iaf_sampler/iaf_sampler_config.py``)."""

from __future__ import annotations

from pydantic.dataclasses import dataclass

from ..maf_sampler.maf_sampler_config import MAFSamplerConfig


@dataclass
class IAFSamplerConfig(MAFSamplerConfig):
    """IAF sampler configuration (same knobs as the MAF sampler)."""
