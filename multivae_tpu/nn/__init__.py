from .base_architectures import (
    BaseConditionalDecoder,
    BaseDecoder,
    BaseEncoder,
    BaseJointEncoder,
    BaseMultilatentEncoder,
)
from .default_architectures import (
    BaseAEConfig,
    BaseDictDecoders,
    BaseDictDecodersMultiLatents,
    BaseDictEncoders,
    BaseDictEncoders_MultiLatents,
    ConditionalDecoderMLP,
    Decoder_AE_MLP,
    Encoder_VAE_MLP,
    Encoder_VAE_MLP_Style,
    MultipleHeadJointEncoder,
)

__all__ = [
    "BaseAEConfig",
    "BaseConditionalDecoder",
    "BaseDecoder",
    "BaseDictDecoders",
    "BaseDictDecodersMultiLatents",
    "BaseDictEncoders",
    "BaseDictEncoders_MultiLatents",
    "BaseEncoder",
    "BaseJointEncoder",
    "BaseMultilatentEncoder",
    "ConditionalDecoderMLP",
    "Decoder_AE_MLP",
    "Encoder_VAE_MLP",
    "Encoder_VAE_MLP_Style",
    "MultipleHeadJointEncoder",
]
