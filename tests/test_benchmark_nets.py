"""Benchmark architectures: shape contracts + model integration."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multivae_tpu.nn.default_architectures import BaseAEConfig


def test_mmnist_conv_nets_in_model():
    """Reference quickstart-style: MoPoE with PolyMNIST conv nets."""
    from multivae_tpu.data import MultimodalBaseDataset
    from multivae_tpu.models import MoPoE, MoPoEConfig
    from multivae_tpu.nn.mmnist import (
        DecoderConvMMNIST,
        EncoderConvMMNIST_adapted,
    )

    dims = {f"m{i}": (3, 28, 28) for i in range(2)}
    cfg = BaseAEConfig(input_dim=(3, 28, 28), latent_dim=8)
    encoders = {m: EncoderConvMMNIST_adapted(cfg) for m in dims}
    decoders = {m: DecoderConvMMNIST(cfg) for m in dims}
    model = MoPoE(
        MoPoEConfig(n_modalities=2, latent_dim=8, input_dims=dims),
        encoders=encoders, decoders=decoders,
    )
    rng = np.random.default_rng(0)
    ds = MultimodalBaseDataset(
        {m: rng.uniform(size=(6, 3, 28, 28)).astype(np.float32)
         for m in dims})
    out = model.forward(ds[:])
    assert np.isfinite(float(out.loss))
    pred = model.predict(ds[:], cond_mod="m0")
    assert pred.m1.shape == (6, 3, 28, 28)


def test_resnet_nets_multilatent_model():
    """MMVAE+-style resnet encoder/decoder with private latents."""
    from multivae_tpu.data import MultimodalBaseDataset
    from multivae_tpu.models import MMVAEPlus, MMVAEPlusConfig
    from multivae_tpu.nn.mmnist import DecoderResnetMMNIST, EncoderResnetMMNIST

    dims = {f"m{i}": (3, 28, 28) for i in range(2)}
    encoders = {m: EncoderResnetMMNIST(private_latent_dim=4,
                                       shared_latent_dim=8,
                                       nf=8, nf_max=16) for m in dims}
    decoders = {m: DecoderResnetMMNIST(latent_dim=12, nf=8, nf_max=16)
                for m in dims}
    model = MMVAEPlus(
        MMVAEPlusConfig(n_modalities=2, latent_dim=8, input_dims=dims,
                        K=2, modalities_specific_dim=4),
        encoders=encoders, decoders=decoders,
    )
    rng = np.random.default_rng(1)
    ds = MultimodalBaseDataset(
        {m: rng.uniform(size=(4, 3, 28, 28)).astype(np.float32)
         for m in dims})
    out = model.forward(ds[:])
    assert np.isfinite(float(out.loss))


def test_svhn_nets_mvtcae():
    from multivae_tpu.data import MultimodalBaseDataset
    from multivae_tpu.models import MVTCAE, MVTCAEConfig
    from multivae_tpu.nn.svhn import Decoder_VAE_SVHN, Encoder_VAE_SVHN

    cfg = BaseAEConfig(input_dim=(3, 32, 32), latent_dim=8)
    model = MVTCAE(
        MVTCAEConfig(n_modalities=2, latent_dim=8,
                     input_dims={"svhn": (3, 32, 32), "mnist": (3, 32, 32)}),
        encoders={"svhn": Encoder_VAE_SVHN(cfg),
                  "mnist": Encoder_VAE_SVHN(cfg)},
        decoders={"svhn": Decoder_VAE_SVHN(cfg),
                  "mnist": Decoder_VAE_SVHN(cfg)},
    )
    rng = np.random.default_rng(2)
    ds = MultimodalBaseDataset(
        {"svhn": rng.uniform(size=(4, 3, 32, 32)).astype(np.float32),
         "mnist": rng.uniform(size=(4, 3, 32, 32)).astype(np.float32)})
    out = model.forward(ds[:])
    assert np.isfinite(float(out.loss))
    nll = model.compute_joint_nll(ds[:2], K=8, batch_size_K=4)
    assert np.isfinite(float(nll))


def test_cub_text_encoder_masks_padding():
    """The transformer must ignore padded positions via the padding mask."""
    from multivae_tpu.nn.cub import CubTextEncoder

    enc = CubTextEncoder(latent_dim=8, max_sentence_length=6, ntokens=20,
                         embed_size=16, nhead=2, ff_size=32, n_layers=1)
    tokens = jnp.asarray([[3, 4, 5, 0, 0, 0]], jnp.int32)
    mask = jnp.asarray([[1, 1, 1, 0, 0, 0]], jnp.float32)
    params = enc.init(jax.random.key(0), {"tokens": tokens,
                                          "padding_mask": mask})
    out1 = enc.apply(params, {"tokens": tokens, "padding_mask": mask})
    # changing a PADDED token must not affect valid-position outputs
    tokens2 = tokens.at[0, 4].set(7)
    out2 = enc.apply(params, {"tokens": tokens2, "padding_mask": mask})
    np.testing.assert_allclose(
        np.asarray(out1.transformer_output[0, :3]),
        np.asarray(out2.transformer_output[0, :3]), atol=1e-5,
    )


def test_cub_resnet_model_roundtrip():
    from multivae_tpu.nn.cub import CUB_Resnet_Decoder, CUB_Resnet_Encoder

    enc = CUB_Resnet_Encoder(latent_dim=8, s0=16, nfilter=8, nfilter_max=16)
    dec = CUB_Resnet_Decoder(latent_dim=8, s0=16, nfilter=8, nfilter_max=16)
    x = jnp.zeros((2, 3, 64, 64))
    pe = enc.init(jax.random.key(0), x)
    z = enc.apply(pe, x)["embedding"]
    pd = dec.init(jax.random.key(1), z)
    recon = dec.apply(pd, z)["reconstruction"]
    assert recon.shape == (2, 3, 64, 64)
