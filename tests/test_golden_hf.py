"""Golden numerical-parity tests against HF transformers' torch models.

The reference repo never tests numerics against its upstream sources
(SURVEY.md §4); these tests close that gap offline: build a tiny random-init
torch model from `transformers` (the same implementations the published
checkpoints are distributed in), convert its weights through our `sanitize`
path, and require allclose outputs / identical codes.  Passing here means a
real HF-format checkpoint loads and reproduces bit-comparable audio.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

# XLA:CPU's default matmul path (oneDNN fastmath) carries ~0.3% relative
# error vs torch's f32 GEMMs — force true f32 so allclose tolerances mean
# what they say.  (On TPU the bf16/f32 policy is chosen per-model instead.)
jax.config.update("jax_default_matmul_precision", "highest")

from mlx_audio_tpu.nn.module import update_arrays

RATIOS = [8, 6, 5, 4]


def build_mimi_pair(layer_scale=1.0):
    from transformers import MimiConfig as HFMimiConfig, MimiModel

    from mlx_audio_tpu.codec.mimi.mimi import Mimi, MimiConfig
    from mlx_audio_tpu.codec.mimi.seanet import SeanetConfig
    from mlx_audio_tpu.codec.mimi.transformer import TransformerConfig

    torch.manual_seed(0)
    hf = MimiModel(
        HFMimiConfig(
            sampling_rate=24000, frame_rate=12.5, audio_channels=1,
            hidden_size=32, num_filters=4, num_residual_layers=1,
            upsampling_ratios=RATIOS, codebook_size=16, codebook_dim=8,
            num_quantizers=4, intermediate_size=64, upsample_groups=32,
            num_hidden_layers=2, num_attention_heads=2,
            num_key_value_heads=2, head_dim=16, sliding_window=25,
            layer_scale_initial_scale=layer_scale,
            vector_quantization_hidden_dimension=8,
            num_semantic_quantizers=1,
        )
    ).eval()

    seanet = SeanetConfig(
        dimension=32, channels=1, causal=True, nfilters=4,
        nresidual_layers=1, ratios=RATIOS, ksize=7, residual_ksize=3,
        last_ksize=3, dilation_base=2, pad_mode="constant", true_skip=True,
        compress=2,
    )
    tf_cfg = TransformerConfig(
        d_model=32, num_heads=2, num_layers=2, causal=True, norm_first=True,
        bias_ff=False, bias_attn=False, layer_scale=layer_scale,
        positional_embedding="rope", use_conv_bias=True, gating=False,
        norm="layer_norm", context=25, max_period=10000, max_seq_len=8192,
        kv_repeat=1, dim_feedforward=64, conv_layout=True,
    )
    ours = Mimi(
        MimiConfig(
            channels=1, sample_rate=24000, frame_rate=12.5,
            renormalize=False, seanet=seanet, transformer=tf_cfg,
            quantizer_nq=4, quantizer_bins=16, quantizer_dim=8,
        )
    )
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    ours = update_arrays(ours, ours.sanitize(sd), strict=True)
    return hf, ours


def test_mimi_matches_hf_transformers():
    """Encode codes identical, decoded waveform allclose, stagewise parity
    (validates SEANet layouts, windowed-causal attention, the interleaved
    RoPE un-permutation, and split-RVQ semantics against the
    implementation the `kyutai/mimi` checkpoint ships in)."""
    hf, ours = build_mimi_pair()
    rng = np.random.default_rng(0)
    audio = rng.standard_normal((1, 1, 1920 * 12)).astype(np.float32) * 0.1

    with torch.no_grad():
        h_hf = hf.encoder(torch.from_numpy(audio)).numpy()  # [B, C, L]
        t_hf = hf.encoder_transformer(
            torch.from_numpy(h_hf).transpose(1, 2)
        )[0].numpy()
        codes_hf = hf.encode(torch.from_numpy(audio)).audio_codes.numpy()
        wav_hf = hf.decode(torch.from_numpy(codes_hf)).audio_values.numpy()

    h_ours = np.asarray(ours.encoder(jnp.asarray(audio.transpose(0, 2, 1))))
    np.testing.assert_allclose(
        h_ours, h_hf.transpose(0, 2, 1), atol=1e-4, rtol=1e-4
    )
    t_ours = np.asarray(ours.encoder_transformer(jnp.asarray(h_ours))[0])
    np.testing.assert_allclose(t_ours, t_hf, atol=1e-4, rtol=1e-4)

    codes_ours = np.asarray(ours.encode(jnp.asarray(audio)))
    assert codes_ours.shape == codes_hf.shape
    assert (codes_ours == codes_hf).all()

    wav_ours = np.asarray(ours.decode(jnp.asarray(codes_hf)))
    np.testing.assert_allclose(
        wav_ours[..., : wav_hf.shape[-1]], wav_hf, atol=1e-4, rtol=1e-4
    )


def test_encodec_matches_hf_transformers():
    """Codes identical + waveform allclose vs a torch transformers
    EncodecModel (validates weight-norm folding, the custom-LSTM gate
    packing, causal conv padding, and RVQ bandwidth selection against the
    implementation facebook/encodec_24khz ships in)."""
    from transformers import EncodecConfig as HFEncodecConfig, EncodecModel

    from mlx_audio_tpu.codec.encodec import (
        Encodec,
        EncodecConfig,
        preprocess_audio,
    )

    torch.manual_seed(0)
    common = dict(
        target_bandwidths=[1.5, 3.0], sampling_rate=24000, audio_channels=1,
        num_filters=4, num_residual_layers=1, upsampling_ratios=[8, 5, 4, 2],
        codebook_size=1024, codebook_dim=8, hidden_size=8, num_lstm_layers=2,
        kernel_size=7, last_kernel_size=7, residual_kernel_size=3,
        dilation_growth_rate=2, use_causal_conv=True, normalize=False,
    )
    hf = EncodecModel(HFEncodecConfig(**common)).eval()
    ours = Encodec(
        EncodecConfig(**common, pad_mode="reflect", norm_type="weight_norm",
                      trim_right_ratio=1.0, compress=2)
    )
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    ours = update_arrays(ours, ours.sanitize(sd), strict=True)

    rng = np.random.default_rng(2)
    wav = (rng.standard_normal(9600) * 0.1).astype(np.float32)

    with torch.no_grad():
        t_in = torch.from_numpy(wav)[None, None]
        enc = hf.encode(t_in, bandwidth=3.0)
        codes_hf = enc.audio_codes.numpy()
        wav_hf = hf.decode(enc.audio_codes, enc.audio_scales).audio_values.numpy()

    audio, mask = preprocess_audio(wav)
    codes, scales = ours.encode(audio, mask, bandwidth=3.0)
    codes = np.asarray(codes)
    assert codes.shape == codes_hf.shape
    assert (codes == codes_hf).all()

    wav_ours = np.asarray(ours.decode(jnp.asarray(codes), scales, mask))
    n = min(wav_ours.shape[-1], wav_hf.shape[-1])
    np.testing.assert_allclose(
        wav_ours.reshape(-1)[:n], wav_hf.reshape(-1)[:n], atol=1e-4, rtol=1e-4
    )


def test_dac_matches_hf_transformers():
    """Codes identical + waveform allclose vs a torch transformers DacModel
    (validates the weight-norm re-split g=||w||, v=w, snake activation, and
    L2-normalized factorized VQ against the implementation descript/dac_*
    checkpoints ship in)."""
    from transformers import DacConfig as HFDacConfig, DacModel

    from mlx_audio_tpu.codec.dac import DAC, DACConfig

    torch.manual_seed(0)
    rates = [2, 4, 5, 8]
    hf = DacModel(
        HFDacConfig(
            encoder_hidden_size=16, downsampling_ratios=rates,
            decoder_hidden_size=128, upsampling_ratios=rates[::-1],
            n_codebooks=4, codebook_size=64, codebook_dim=8,
            sampling_rate=16000,
        )
    ).eval()
    ours = DAC(
        DACConfig(
            encoder_dim=16, encoder_rates=rates, decoder_dim=128,
            decoder_rates=rates[::-1], n_codebooks=4, codebook_size=64,
            codebook_dim=8, sample_rate=16000,
        )
    )
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    ours = update_arrays(ours, ours.sanitize(sd), strict=True)

    rng = np.random.default_rng(3)
    hop = int(np.prod(rates))
    wav = (rng.standard_normal(hop * 30) * 0.1).astype(np.float32)

    with torch.no_grad():
        enc = hf.encode(torch.from_numpy(wav)[None, None])
        codes_hf = enc.audio_codes.numpy()
        wav_hf = hf.decode(enc.quantized_representation).audio_values.numpy()

    z, codes, _ = ours.encode(jnp.asarray(wav)[None, None, :])
    codes = np.asarray(codes)
    assert codes.shape == codes_hf.shape
    assert (codes == codes_hf).all()

    wav_ours = np.asarray(ours.decode(z))
    n = min(wav_ours.shape[-1], wav_hf.shape[-1])
    np.testing.assert_allclose(
        wav_ours.reshape(-1)[:n], wav_hf.reshape(-1)[:n], atol=1e-4, rtol=1e-4
    )


def test_whisper_matches_hf_transformers():
    """Encoder features + decoder logits allclose vs a torch transformers
    WhisperForConditionalGeneration (the openai/whisper-* hub format):
    validates conv frontend, sinusoidal/learned positions, attention and
    the tied output head through our sanitize remap."""
    from transformers import WhisperConfig as HFWhisperConfig
    from transformers import WhisperForConditionalGeneration

    from mlx_audio_tpu.models.stt.whisper.model import (
        ModelDimensions,
        WhisperModel,
    )

    torch.manual_seed(0)
    hf = WhisperForConditionalGeneration(
        HFWhisperConfig(
            vocab_size=100, num_mel_bins=8, d_model=16,
            encoder_layers=2, encoder_attention_heads=2,
            decoder_layers=2, decoder_attention_heads=2,
            encoder_ffn_dim=64, decoder_ffn_dim=64,
            max_source_positions=16, max_target_positions=16,
            pad_token_id=0, bos_token_id=1, eos_token_id=2,
            decoder_start_token_id=1,
        )
    ).eval()
    ours = WhisperModel(
        ModelDimensions(
            n_mels=8, n_audio_ctx=16, n_audio_state=16, n_audio_head=2,
            n_audio_layer=2, n_vocab=100, n_text_ctx=16, n_text_state=16,
            n_text_head=2, n_text_layer=2,
        )
    )
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    ours = update_arrays(ours, ours.sanitize(sd), strict=False)

    rng = np.random.default_rng(4)
    mel = (rng.standard_normal((1, 8, 32)) * 0.5).astype(np.float32)
    tokens = rng.integers(0, 100, size=(1, 10))

    with torch.no_grad():
        enc_hf = hf.model.encoder(torch.from_numpy(mel)).last_hidden_state.numpy()
        logits_hf = hf(
            input_features=torch.from_numpy(mel),
            decoder_input_ids=torch.from_numpy(tokens),
        ).logits.numpy()

    enc_ours = np.asarray(ours.encoder(jnp.asarray(mel.transpose(0, 2, 1))))
    np.testing.assert_allclose(enc_ours, enc_hf, atol=1e-4, rtol=1e-4)

    logits_ours = np.asarray(
        ours.decoder.full_forward(jnp.asarray(tokens), jnp.asarray(enc_ours))
    )
    np.testing.assert_allclose(logits_ours, logits_hf, atol=1e-3, rtol=1e-3)


def test_albert_matches_hf_transformers():
    """Kokoro's PLBERT text encoder vs torch transformers AlbertModel:
    identical key naming (loads a hub AlbertModel state_dict unchanged),
    last_hidden_state and pooled output allclose, with a padding mask."""
    from transformers import AlbertConfig, AlbertModel

    from mlx_audio_tpu.models.tts.kokoro.albert import (
        AlbertModelArgs,
        CustomAlbert,
    )

    torch.manual_seed(0)
    kw = dict(vocab_size=50, hidden_size=16, num_attention_heads=2,
              num_hidden_layers=2, intermediate_size=32, embedding_size=8,
              max_position_embeddings=32)
    hf = AlbertModel(AlbertConfig(pad_token_id=0, **kw)).eval()
    ours = CustomAlbert(AlbertModelArgs(**kw))
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    ours = update_arrays(ours, sd, strict=True)

    rng = np.random.default_rng(5)
    ids = rng.integers(1, 50, size=(2, 12))
    mask = np.ones((2, 12), dtype=np.int64)
    mask[1, 8:] = 0

    with torch.no_grad():
        out_hf = hf(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
        )
    seq, pooled = ours(jnp.asarray(ids), jnp.asarray(mask))
    # compare only unmasked positions (masked ones are unconstrained)
    valid = mask.astype(bool)
    np.testing.assert_allclose(
        np.asarray(seq)[valid], out_hf.last_hidden_state.numpy()[valid],
        atol=1e-4, rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(pooled), out_hf.pooler_output.numpy(), atol=1e-4, rtol=1e-4
    )


def test_wav2vec2_matches_hf_transformers():
    """Spark's feature tower vs torch transformers Wav2Vec2Model:
    hidden states allclose through conv feature encoder, grouped pos-conv
    (weight-norm), and transformer encoder."""
    from transformers import Wav2Vec2Config, Wav2Vec2Model as HFWav2Vec2

    from mlx_audio_tpu.models.stt.wav2vec.wav2vec import (
        ModelConfig,
        Wav2Vec2Model,
    )

    torch.manual_seed(0)
    kw = dict(
        hidden_size=16, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=32, conv_dim=(4, 4), conv_stride=(5, 2),
        conv_kernel=(10, 3), num_feat_extract_layers=2,
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=2,
        do_stable_layer_norm=False, feat_extract_norm="group",
    )
    hf = HFWav2Vec2(Wav2Vec2Config(**kw)).eval()
    ours = Wav2Vec2Model(ModelConfig.from_dict(kw))
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()
          if "masked_spec_embed" not in k}
    ours = update_arrays(ours, ours.sanitize(sd), strict=False)

    rng = np.random.default_rng(6)
    wav = (rng.standard_normal((1, 400)) * 0.1).astype(np.float32)
    with torch.no_grad():
        out_hf = hf(torch.from_numpy(wav)).last_hidden_state.numpy()
    out_ours = np.asarray(ours(jnp.asarray(wav))[0])
    np.testing.assert_allclose(out_ours, out_hf, atol=1e-4, rtol=1e-4)


def test_llama_matches_hf_transformers():
    """The shared LM backbone (CSM/Sesame, Orpheus, OuteTTS) vs a torch
    transformers LlamaModel: final hidden states allclose over a full
    causal forward (validates GQA, rotate-half RoPE tables, RMSNorm and
    SwiGLU against the hub checkpoint implementation)."""
    from transformers import LlamaConfig as HFLlamaConfig, LlamaModel

    from mlx_audio_tpu.models.lm.llama import (
        LlamaConfig,
        LlamaModel as OurLlama,
    )

    torch.manual_seed(0)
    hf = LlamaModel(
        HFLlamaConfig(
            vocab_size=100, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, head_dim=8, max_position_embeddings=64,
            rope_theta=10000.0, rms_norm_eps=1e-5,
            attention_bias=False, mlp_bias=False,
        )
    ).eval()
    ours = OurLlama(
        LlamaConfig(
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            head_dim=8, hidden_size=32, intermediate_size=64,
            rms_norm_eps=1e-5, vocab_size=100, max_position_embeddings=64,
            rope_theta=10000.0,
        )
    )
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()
          if "rotary_emb" not in k}
    ours = update_arrays(ours, sd, strict=False)

    rng = np.random.default_rng(7)
    ids = rng.integers(0, 100, size=(2, 11))
    with torch.no_grad():
        out_hf = hf(torch.from_numpy(ids)).last_hidden_state.numpy()
    out_ours = np.asarray(ours(jnp.asarray(ids)))
    np.testing.assert_allclose(out_ours, out_hf, atol=1e-4, rtol=1e-4)


def test_qwen2_matches_hf_transformers():
    """Spark-TTS's Qwen2 backbone flavor (qkv biases) vs a torch
    transformers Qwen2Model."""
    from transformers import Qwen2Config as HFQwen2Config, Qwen2Model

    from mlx_audio_tpu.models.lm.llama import (
        LlamaConfig,
        LlamaModel as OurLlama,
    )

    torch.manual_seed(0)
    hf = Qwen2Model(
        HFQwen2Config(
            vocab_size=100, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=64,
            rope_theta=10000.0, rms_norm_eps=1e-5,
        )
    ).eval()
    ours = OurLlama(
        LlamaConfig(
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            head_dim=8, hidden_size=32, intermediate_size=64,
            rms_norm_eps=1e-5, vocab_size=100, max_position_embeddings=64,
            rope_theta=10000.0, qkv_bias=True,
        )
    )
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()
          if "rotary_emb" not in k}
    ours = update_arrays(ours, sd, strict=False)

    rng = np.random.default_rng(8)
    ids = rng.integers(0, 100, size=(2, 9))
    with torch.no_grad():
        out_hf = hf(torch.from_numpy(ids)).last_hidden_state.numpy()
    out_ours = np.asarray(ours(jnp.asarray(ids)))
    np.testing.assert_allclose(out_ours, out_hf, atol=1e-4, rtol=1e-4)


def _csm_pair():
    from transformers import CsmConfig, CsmForConditionalGeneration
    from transformers.models.csm.configuration_csm import (
        CsmDepthDecoderConfig,
    )

    from mlx_audio_tpu.models.tts.sesame.model import SesameModel

    torch.manual_seed(0)
    rope = {"rope_type": "llama3", "factor": 32.0, "low_freq_factor": 1.0,
            "high_freq_factor": 4.0,
            "original_max_position_embeddings": 16}
    nc, v = 4, 66
    depth = CsmDepthDecoderConfig(
        num_codebooks=nc, backbone_hidden_size=64, vocab_size=v,
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, num_key_value_heads=1, head_dim=16,
        max_position_embeddings=33, rope_theta=500000.0, rope_scaling=rope,
        rms_norm_eps=1e-5,
    )
    # tiny codec config keeps construction cheap; the codec is not used in
    # the logits comparisons
    codec = dict(
        model_type="mimi", sampling_rate=24000, frame_rate=12.5,
        audio_channels=1, hidden_size=32, num_filters=4,
        num_residual_layers=1, upsampling_ratios=[8, 6, 5, 4],
        codebook_size=16, codebook_dim=8, num_quantizers=nc,
        intermediate_size=64, upsample_groups=32, num_hidden_layers=1,
        num_attention_heads=2, num_key_value_heads=2, head_dim=16,
        sliding_window=25, vector_quantization_hidden_dimension=8,
        num_semantic_quantizers=1,
    )
    hf = CsmForConditionalGeneration(
        CsmConfig(
            num_codebooks=nc, vocab_size=v, text_vocab_size=128,
            hidden_size=64, intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, head_dim=16,
            max_position_embeddings=64, rope_theta=500000.0,
            rope_scaling=rope, rms_norm_eps=1e-5,
            depth_decoder_config=depth.to_dict(), codec_config=codec,
            pad_token_id=2, bos_token_id=1,
        )
    ).eval()
    # the original CSM shares one audio-embedding table between backbone and
    # depth decoder (reference sesame.py:397-415); HF duplicates it — tie
    # for a faithful comparison
    with torch.no_grad():
        hf.depth_decoder.model.embed_tokens.weight.copy_(
            hf.backbone_model.embed_tokens.embed_audio_tokens.weight
        )

    ours = SesameModel(
        {
            "text_vocab_size": 128, "audio_vocab_size": v,
            "audio_num_codebooks": nc,
            "num_hidden_layers": 2, "num_attention_heads": 4,
            "num_key_value_heads": 2, "head_dim": 16, "hidden_size": 64,
            "intermediate_size": 128, "rms_norm_eps": 1e-5, "vocab_size": 128,
            "max_position_embeddings": 64, "rope_theta": 500000.0,
            "rope_scaling": rope,
            "depth_decoder_config": {
                "num_hidden_layers": 2, "num_attention_heads": 2,
                "num_key_value_heads": 1, "head_dim": 16, "hidden_size": 32,
                "intermediate_size": 64, "rms_norm_eps": 1e-5,
                "vocab_size": v, "max_position_embeddings": 33,
                "rope_theta": 500000.0, "rope_scaling": rope,
            },
        }
    )
    from mlx_audio_tpu.models.tts.sesame.model import sanitize_hf_csm

    sd = {k: w.detach().numpy() for k, w in hf.state_dict().items()}
    mapping = {k.removeprefix("model."): w
               for k, w in sanitize_hf_csm(sd).items()}
    ours = update_arrays(ours, mapping, strict=False)
    return hf, ours, nc, v


def test_csm_matches_hf_transformers():
    """The CSM-1B flagship vs torch transformers CsmForConditionalGeneration
    (the sesame/csm-1b hub format): fused audio-frame embeddings, backbone
    hidden states, codebook-0 logits, and depth-decoder logits at every
    codebook position all allclose — validates the embedding offset scheme,
    llama3 RoPE scaling, the projection placement, and the per-position
    depth heads against the official implementation."""
    import jax

    hf, ours, nc, v = _csm_pair()
    rng = np.random.default_rng(9)
    b, t = 2, 6
    audio_ids = rng.integers(0, v, size=(b, t, nc))

    with torch.no_grad():
        e_hf = hf.backbone_model.embed_tokens(
            torch.from_numpy(audio_ids)
        ).numpy()
        h_hf = hf.backbone_model(
            inputs_embeds=torch.from_numpy(e_hf)
        ).last_hidden_state.numpy()
        c0_logits_hf = (hf.lm_head(torch.from_numpy(h_hf[:, -1]))).numpy()

    # ours: audio-only frames = tokens with text col masked out
    tokens = np.concatenate(
        [audio_ids, np.zeros((b, t, 1), dtype=audio_ids.dtype)], axis=-1
    )
    mask = np.ones((b, t, nc + 1), dtype=bool)
    mask[..., -1] = False
    e_ours = np.asarray(
        ours.embed_tokens(jnp.asarray(tokens), jnp.asarray(mask))
    )
    np.testing.assert_allclose(e_ours, e_hf, atol=1e-4, rtol=1e-4)

    h_ours = np.asarray(ours.backbone(jnp.asarray(e_ours)))
    np.testing.assert_allclose(h_ours, h_hf, atol=1e-4, rtol=1e-4)

    c0_logits = np.asarray(ours.codebook0_head(jnp.asarray(h_ours[:, -1])))
    np.testing.assert_allclose(c0_logits, c0_logits_hf, atol=1e-4, rtol=1e-4)

    # depth decoder: logits for predicting c_S given [last_h, c0..c_{S-1}]
    last_h = h_hf[:, -1]
    codes = rng.integers(0, v, size=(b, nc - 1))
    for s in range(1, nc):
        with torch.no_grad():
            # HF replaces position 0's embedding with the backbone hidden
            # state, so input_ids = [placeholder, c0, ..., c_{s-1}]
            ids = np.concatenate(
                [np.zeros((b, 1), dtype=codes.dtype), codes[:, :s]], axis=1
            )
            out = hf.depth_decoder(
                input_ids=torch.from_numpy(ids),
                backbone_last_hidden_state=torch.from_numpy(last_h),
            )
            d_logits_hf = out.logits[:, -1].numpy()

        dec_caches = ours.decoder.init_cache(b, max_len=nc + 1)
        pad0 = jnp.zeros((b,), dtype=jnp.int32)
        offsets = (jnp.arange(s - 1) + 1) * v if s > 1 else None
        emb0 = ours.embed_audio(0, jnp.asarray(codes[:, :1]))
        embeds = [jnp.asarray(last_h)[:, None, :], emb0]
        if s > 1:
            embeds.append(
                ours.audio_embeddings(jnp.asarray(codes[:, 1:s]) + offsets)
            )
        seq = jnp.concatenate(embeds, axis=1)
        h, _ = ours.decoder.step(dec_caches, ours.projection(seq), pad0)
        d_logits = np.asarray(
            jnp.einsum("bd,dv->bv", h[:, -1], ours.audio_head[s - 1])
        )
        np.testing.assert_allclose(d_logits, d_logits_hf, atol=1e-4,
                                   rtol=1e-4)


def _dia_pair():
    from transformers import DiaConfig as HFDiaConfig
    from transformers import DiaForConditionalGeneration
    from transformers.models.dia.configuration_dia import (
        DiaDecoderConfig as HFDec,
        DiaEncoderConfig as HFEnc,
    )

    from mlx_audio_tpu.models.tts.dia.config import (
        DataConfig,
        DecoderConfig,
        DiaConfig,
        DiaModelConfig,
        EncoderConfig,
    )
    from mlx_audio_tpu.models.tts.dia.model import Model

    torch.manual_seed(0)
    C, V, SV = 3, 36, 64
    hf = DiaForConditionalGeneration(
        HFDiaConfig(
            encoder_config=HFEnc(
                max_position_embeddings=64, num_hidden_layers=2,
                hidden_size=32, num_attention_heads=2,
                num_key_value_heads=2, head_dim=16, intermediate_size=64,
                vocab_size=SV, norm_eps=1e-5, rope_theta=10000.0,
            ).to_dict(),
            decoder_config=HFDec(
                max_position_embeddings=128, num_hidden_layers=2,
                hidden_size=32, intermediate_size=64,
                num_attention_heads=4, num_key_value_heads=2, head_dim=8,
                cross_num_attention_heads=2, cross_head_dim=16,
                cross_num_key_value_heads=2, cross_hidden_size=32,
                vocab_size=V, num_channels=C, norm_eps=1e-5,
                rope_theta=10000.0,
            ).to_dict(),
            delay_pattern=[0, 1, 2],
        )
    ).eval()
    ours = Model(
        DiaConfig(
            data=DataConfig(text_length=16, audio_length=128, channels=C,
                            delay_pattern=[0, 1, 2]),
            model=DiaModelConfig(
                encoder=EncoderConfig(n_layer=2, n_embd=32, n_hidden=64,
                                      n_head=2, head_dim=16),
                decoder=DecoderConfig(n_layer=2, n_embd=32, n_hidden=64,
                                      gqa_query_heads=4, kv_heads=2,
                                      gqa_head_dim=8, cross_query_heads=2,
                                      cross_head_dim=16),
                src_vocab_size=SV, tgt_vocab_size=V, sample_rate=16000,
                cross_attn_rope=False,
            ),
        )
    )
    sd = {k: w.detach().numpy() for k, w in hf.state_dict().items()}
    ours = update_arrays(ours, ours.sanitize(sd), strict=True)
    return hf, ours, (1, 12, 7, C, V, SV)


def test_dia_matches_hf_transformers():
    """Dia-1.6B vs torch transformers DiaForConditionalGeneration (the
    nari-labs/Dia-1.6B hub format): encoder hidden states and full-sequence
    decoder audio logits allclose — validates the DenseGeneral reshapes
    (q/k/v [D,H,hd], o [H,hd,D]), fused gate_up→wi_fused split, per-channel
    embedding de-fusing, timescale RoPE, unscaled attention scores, and the
    channel-major logits head through `sanitize`."""
    hf, ours, (b, s, t, C, V, SV) = _dia_pair()
    rng = np.random.default_rng(10)
    src = rng.integers(1, SV, size=(b, s))
    codes = rng.integers(0, V, size=(b, t, C))

    with torch.no_grad():
        enc_hf = hf.model.encoder(
            input_ids=torch.from_numpy(src)
        ).last_hidden_state.numpy()
        logits_hf = hf(
            input_ids=torch.from_numpy(src),
            decoder_input_ids=torch.from_numpy(codes),
        ).logits.numpy()  # [B*C, T, V]

    pos = jnp.arange(s)[None]
    enc_ours = np.asarray(
        ours.model.encoder(jnp.asarray(src), pos, None)
    )
    np.testing.assert_allclose(enc_ours, enc_hf, atol=1e-4, rtol=1e-4)

    caches = ours.model.decoder.init_cache(b, t)
    cross_kvs = ours.model.decoder.precompute_cross_kv(
        jnp.asarray(enc_ours), pos
    )
    i = jnp.arange(t)[:, None]
    j = jnp.arange(t)[None, :]
    sa_mask = (j <= i)[None, None]
    logits_ours, _ = ours.model.decoder.step(
        jnp.asarray(codes), jnp.arange(t)[None], caches, cross_kvs,
        sa_mask, None,
    )  # [B, T, C, V]
    logits_ours = np.asarray(logits_ours).transpose(0, 2, 1, 3).reshape(
        b * C, t, V
    )
    np.testing.assert_allclose(logits_ours, logits_hf, atol=1e-3, rtol=1e-3)


def test_mimi_hf_rope_convention_is_discriminated():
    """The q/k un-permutation must matter: mapping HF weights without it
    diverges in attention (guards against a silently non-discriminating
    parity test)."""
    from mlx_audio_tpu.codec.mimi.mimi import sanitize_hf_mimi

    hf, ours = build_mimi_pair()
    rng = np.random.default_rng(1)
    x = (rng.standard_normal((1, 24, 32)) * 4.0).astype(np.float32)
    with torch.no_grad():
        t_hf = hf.encoder_transformer(torch.from_numpy(x))[0].numpy()
    t_ours = np.asarray(ours.encoder_transformer(jnp.asarray(x))[0])
    assert np.abs(t_hf - t_ours).max() < 1e-5

    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    mapped = sanitize_hf_mimi(sd, n_heads=2, n_ratios=len(RATIOS))
    # undo the un-permutation on q/k (simulate the naive mapping)
    naive = dict(mapped)
    for k in list(naive):
        if k.endswith("self_attn.in_proj.weight"):
            pre = k[: -len("in_proj.weight")]
            q = sd[pre + "q_proj.weight"]
            kk = sd[pre + "k_proj.weight"]
            vv = sd[pre + "v_proj.weight"]
            naive[k] = np.concatenate([q, kk, vv], axis=0)
    wrong = update_arrays(ours, naive, strict=False)
    t_wrong = np.asarray(wrong.encoder_transformer(jnp.asarray(x))[0])
    assert np.abs(t_hf - t_wrong).max() > 1e-4


def test_bark_matches_hf_transformers():
    """All three Bark GPT stages vs HF transformers (modeling_bark.py):
    semantic/coarse causal stacks match position-by-position through our
    prefill+step KV-cache path, and the non-causal fine stage matches
    per-codebook logits — loading a combined BarkModel-format state dict
    through Model.sanitize (validates the suno/bark checkpoint path)."""
    from transformers.models.bark import (
        BarkCoarseConfig,
        BarkFineConfig,
        BarkSemanticConfig,
    )
    from transformers.models.bark.modeling_bark import (
        BarkCoarseModel,
        BarkFineModel,
        BarkSemanticModel,
    )

    from mlx_audio_tpu.models.tts.bark.bark import Model, ModelConfig

    V = 200
    stage = dict(
        block_size=64, input_vocab_size=V, output_vocab_size=V,
        num_layers=2, num_heads=2, hidden_size=32, dropout=0.0, bias=True,
    )
    torch.manual_seed(0)
    sem_hf = BarkSemanticModel(BarkSemanticConfig(**stage)).eval()
    coa_hf = BarkCoarseModel(BarkCoarseConfig(**stage)).eval()
    fin_hf = BarkFineModel(
        BarkFineConfig(**stage, n_codes_total=8, n_codes_given=1)
    ).eval()

    ours = Model(
        ModelConfig(
            semantic_config=dict(stage),
            coarse_acoustics_config=dict(stage),
            fine_acoustics_config={**stage, "n_codes_total": 8,
                                   "n_codes_given": 1},
        )
    )
    sd = {}
    for prefix, hf in (("semantic", sem_hf), ("coarse_acoustics", coa_hf),
                       ("fine_acoustics", fin_hf)):
        for k, v in hf.state_dict().items():
            sd[f"{prefix}.{k}"] = v.detach().numpy()
    ours = update_arrays(ours, ours.sanitize(sd), strict=True)

    rng = np.random.default_rng(0)
    T = 12
    for hf, gpt in ((sem_hf, ours.semantic), (coa_hf, ours.coarse_acoustics)):
        ids = rng.integers(0, V, (1, T))
        with torch.no_grad():
            logits_hf = hf(input_ids=torch.from_numpy(ids)).logits.numpy()

        x = jnp.asarray(ids, dtype=jnp.int32)
        caches = gpt.init_cache(1, 32)
        # prefill over the first 4 tokens, then single-token steps: every
        # position's logits must match HF's full forward
        embeds = gpt.input_embeds_layer(x[:, :4])
        logits_p, caches = gpt.prefill(caches, embeds, jnp.array(4))
        np.testing.assert_allclose(
            np.asarray(logits_p)[0], logits_hf[0, 3], atol=1e-4, rtol=1e-4
        )
        for t in range(4, T):
            logits_s, caches = gpt.step(caches, x[:, t : t + 1])
            np.testing.assert_allclose(
                np.asarray(logits_s)[0], logits_hf[0, t], atol=1e-4,
                rtol=1e-4,
            )

    codes = rng.integers(0, V, (1, T, 8))
    for pred_idx in (1, 4):
        with torch.no_grad():
            logits_hf = fin_hf(
                codebook_idx=pred_idx, input_ids=torch.from_numpy(codes)
            ).logits.numpy()
        logits_ours = np.asarray(
            ours.fine_acoustics(pred_idx, jnp.asarray(codes, dtype=jnp.int32))
        )
        np.testing.assert_allclose(
            logits_ours, logits_hf, atol=1e-4, rtol=1e-4
        )


def test_indextts_gpt2_matches_hf_transformers():
    """IndexTTS's embedding-level GPT-2 decoder stack vs HF transformers
    GPT2Model (the implementation IndexTTS checkpoints ship in): hidden
    states match position-by-position through our prefill+step KV-cache
    path, with weights routed through Model.sanitize's HF-GPT2 rules
    (Conv1D [in,out] -> Linear [out,in] transposes)."""
    from transformers import GPT2Config, GPT2Model as HFGPT2Model

    from mlx_audio_tpu.models.tts.indextts.gpt import GPT2Args, GPT2Model
    from mlx_audio_tpu.models.tts.indextts.indextts import Model as IndexTTS
    from mlx_audio_tpu.nn import Module

    D, H, L, T = 32, 2, 2, 12
    torch.manual_seed(0)
    hf = HFGPT2Model(
        GPT2Config(
            vocab_size=64, n_positions=64, n_embd=D, n_layer=L, n_head=H,
            resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
        )
    ).eval()
    with torch.no_grad():
        hf.wpe.weight.zero_()  # ours is embedding-level: caller adds positions

    class Holder(Module):
        def __init__(self, gpt):
            self.gpt = gpt

    holder = Holder(GPT2Model(GPT2Args(n_embd=D, n_head=H, n_layer=L)))
    sd = {
        f"gpt.{k}": v.detach().numpy()
        for k, v in hf.state_dict().items()
        if not k.startswith(("wte.", "wpe."))
    }
    holder = update_arrays(holder, IndexTTS.sanitize(None, sd), strict=True)
    gpt = holder.gpt

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, T, D)).astype(np.float32)
    with torch.no_grad():
        h_hf = hf(inputs_embeds=torch.from_numpy(x)).last_hidden_state.numpy()

    xj = jnp.asarray(x)
    caches = gpt.init_cache(1, 32)
    h_p, caches = gpt.prefill(caches, xj[:, :4], jnp.array(4))
    np.testing.assert_allclose(
        np.asarray(h_p)[0], h_hf[0, 3], atol=1e-4, rtol=1e-4
    )
    for t in range(4, T):
        h_s, caches = gpt.step(caches, xj[:, t : t + 1])
        np.testing.assert_allclose(
            np.asarray(h_s)[0], h_hf[0, t], atol=1e-4, rtol=1e-4
        )


def test_parakeet_ctc_matches_hf_transformers():
    """Conformer encoder + CTC head vs HF transformers ParakeetForCTC (the
    implementation nvidia/parakeet-* HF checkpoints ship in): encoder
    hidden states and CTC log-probs allclose, with weights routed through
    sanitize_hf_parakeet (validates dw-striding subsampling indexing,
    rel-pos attention bias_u/bias_v + relative projection mapping, and the
    conv-module batch-norm layout)."""
    from transformers.models.parakeet import (
        ParakeetCTCConfig,
        ParakeetEncoderConfig,
    )
    from transformers.models.parakeet.modeling_parakeet import ParakeetForCTC

    from mlx_audio_tpu.models.stt.parakeet import (
        ParakeetCTC,
        sanitize_hf_parakeet,
    )
    from mlx_audio_tpu.models.stt.parakeet.conformer import ConformerArgs
    from mlx_audio_tpu.models.stt.parakeet.ctc import ConvASRDecoderArgs

    enc = ParakeetEncoderConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, conv_kernel_size=9, num_mel_bins=16,
        subsampling_factor=8, subsampling_conv_channels=8, dropout=0.0,
        attention_dropout=0.0, dropout_positions=0.0, scale_input=False,
    )
    torch.manual_seed(0)
    hf = ParakeetForCTC(
        ParakeetCTCConfig(encoder_config=enc.to_dict(), vocab_size=33)
    ).eval()

    ours = ParakeetCTC(
        None,
        ConformerArgs(
            feat_in=16, n_layers=2, d_model=32, n_heads=2,
            ff_expansion_factor=2, subsampling_factor=8,
            self_attention_model="rel_pos", subsampling="dw_striding",
            conv_kernel_size=9, subsampling_conv_channels=8,
            pos_emb_max_len=5000,
        ),
        ConvASRDecoderArgs(feat_in=32, num_classes=-1,
                           vocabulary=[str(i) for i in range(32)]),
    )
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    ours = update_arrays(ours, sanitize_hf_parakeet(sd), strict=True)

    rng = np.random.default_rng(0)
    mel = rng.standard_normal((1, 64, 16)).astype(np.float32)

    with torch.no_grad():
        t_in = torch.from_numpy(mel)
        enc_hf = hf.encoder(input_features=t_in).last_hidden_state.numpy()
        logp_hf = torch.log_softmax(
            hf(input_features=t_in).logits, dim=-1
        ).numpy()

    enc_ours, lengths = ours.encoder(jnp.asarray(mel))
    enc_ours = np.asarray(enc_ours)
    assert enc_ours.shape == enc_hf.shape
    np.testing.assert_allclose(enc_ours, enc_hf, atol=1e-4, rtol=1e-4)

    logp_ours = np.asarray(ours.decoder(jnp.asarray(enc_ours)))
    np.testing.assert_allclose(logp_ours, logp_hf, atol=1e-4, rtol=1e-4)


def test_voxtral_matches_hf_transformers():
    """Audio tower + multimodal projector + spliced-LM forward vs HF
    transformers VoxtralForConditionalGeneration (the implementation
    mistralai/Voxtral-* checkpoints ship in): audio embeddings and full
    causal-LM logits over a prompt with audio placeholders allclose
    (validates the Whisper-style conv frontend layout, the frame-grouping
    reshape before projection, the cumsum embed splice vs masked_scatter,
    and the lm_head key routing in sanitize)."""
    from transformers import LlamaConfig as HFLlamaConfig
    from transformers.models.voxtral import VoxtralConfig
    from transformers.models.voxtral.configuration_voxtral import (
        VoxtralEncoderConfig,
    )
    from transformers.models.voxtral.modeling_voxtral import (
        VoxtralForConditionalGeneration,
    )

    from mlx_audio_tpu.models.stt.voxtral.voxtral import Model

    ac = VoxtralEncoderConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, num_mel_bins=16,
        max_source_positions=64, dropout=0.0, attention_dropout=0.0,
        activation_dropout=0.0,
    )
    tc = HFLlamaConfig(
        vocab_size=96, hidden_size=16, intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=1,
        head_dim=8, max_position_embeddings=128, rope_theta=1e4,
        rms_norm_eps=1e-5, attention_bias=False, mlp_bias=False,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    hf = VoxtralForConditionalGeneration(
        VoxtralConfig(audio_config=ac.to_dict(), text_config=tc.to_dict(),
                      audio_token_id=90)
    ).eval()

    ours = Model({
        "audio_config": {
            "num_mel_bins": 16, "d_model": 32, "encoder_layers": 2,
            "encoder_attention_heads": 2, "encoder_ffn_dim": 64,
            "intermediate_size": 64, "max_source_positions": 64,
        },
        "text_config": {
            "vocab_size": 96, "hidden_size": 16, "intermediate_size": 32,
            "num_hidden_layers": 2, "num_attention_heads": 2,
            "num_key_value_heads": 1, "head_dim": 8,
            "max_position_embeddings": 128, "rope_theta": 1e4,
            "rms_norm_eps": 1e-5, "tie_word_embeddings": False,
        },
        "audio_token_id": 90,
    })
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()
          if "rotary_emb" not in k}
    ours = update_arrays(ours, ours.sanitize(sd), strict=True)

    rng = np.random.default_rng(3)
    # HF requires the full padded mel window: max_source_positions * 2 frames
    mel = rng.standard_normal((1, 16, 128)).astype(np.float32)

    with torch.no_grad():
        ae_hf = hf.get_audio_features(torch.from_numpy(mel)).numpy()
    ae_ours = np.asarray(
        ours.get_audio_embeds(jnp.asarray(mel.transpose(0, 2, 1)))
    )
    assert ae_ours.shape == ae_hf.shape  # 128 frames -> 64 -> 32 groups
    np.testing.assert_allclose(ae_ours, ae_hf, atol=1e-4, rtol=1e-4)

    # full forward: text tokens around 32 audio placeholders
    n_audio = ae_hf.shape[0]
    ids = np.concatenate([
        np.array([1, 5, 7]), np.full(n_audio, 90), np.array([9, 11, 2]),
    ]).astype(np.int64)[None]
    with torch.no_grad():
        logits_hf = hf(
            input_ids=torch.from_numpy(ids),
            input_features=torch.from_numpy(mel),
        ).logits.numpy()

    embeds = ours.merge_input_embeddings(
        jnp.asarray(ids), jnp.asarray(mel.transpose(0, 2, 1))
    )
    h = ours.language_model(embeds)
    logits_ours = np.asarray(ours.lm_logits(h))
    np.testing.assert_allclose(logits_ours, logits_hf, atol=1e-4, rtol=1e-4)


def _tiny_whisper_pair():
    from transformers import WhisperConfig as HFWhisperConfig
    from transformers import WhisperForConditionalGeneration

    from mlx_audio_tpu.models.stt.whisper.model import (
        ModelDimensions,
        WhisperModel,
    )

    torch.manual_seed(0)
    hf = WhisperForConditionalGeneration(
        HFWhisperConfig(
            vocab_size=100, num_mel_bins=8, d_model=16,
            encoder_layers=2, encoder_attention_heads=2,
            decoder_layers=2, decoder_attention_heads=2,
            encoder_ffn_dim=64, decoder_ffn_dim=64,
            max_source_positions=16, max_target_positions=32,
            pad_token_id=0, bos_token_id=1, eos_token_id=2,
            decoder_start_token_id=1,
        )
    ).eval()
    ours = WhisperModel(
        ModelDimensions(
            n_mels=8, n_audio_ctx=16, n_audio_state=16, n_audio_head=2,
            n_audio_layer=2, n_vocab=100, n_text_ctx=32, n_text_state=16,
            n_text_head=2, n_text_layer=2,
        )
    )
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    ours = update_arrays(ours, ours.sanitize(sd), strict=False)
    return hf, ours


def test_whisper_beam_search_matches_hf_generate():
    """Our jitted batched beam search (a capability the reference declares
    NotImplemented, decoding.py:436) vs HF transformers' reference beam
    search on the same tiny Whisper: identical best sequences and
    sum-logprob scores per audio.  This test caught a real off-by-one in
    the KV-cache prefill rewind (the decode loops re-feed the last prompt
    token; the cache must overwrite its slot, not append a duplicate)."""
    from transformers.generation import GenerationConfig, GenerationMixin

    from mlx_audio_tpu.models.stt.whisper.api import _prefill_jit
    from mlx_audio_tpu.models.stt.whisper.decoding import (
        FilterConfig,
        beam_search_loop,
    )

    hf, ours = _tiny_whisper_pair()
    rng = np.random.default_rng(11)
    n_audio, beam, sample_len = 3, 4, 10
    mel = (rng.standard_normal((n_audio, 8, 32)) * 0.5).astype(np.float32)

    gc = GenerationConfig(
        num_beams=beam, do_sample=False, max_new_tokens=sample_len,
        length_penalty=0.0, early_stopping=True, output_scores=True,
        return_dict_in_generate=True, pad_token_id=0, bos_token_id=1,
        eos_token_id=2, decoder_start_token_id=1,
    )
    with torch.no_grad():
        # plain GenerationMixin.generate: bypasses Whisper's long-form
        # orchestration (irrelevant to the tiny config) but runs the
        # canonical HF beam scorer
        out = GenerationMixin.generate(
            hf, input_features=torch.from_numpy(mel),
            decoder_input_ids=torch.full((n_audio, 1), 1, dtype=torch.long),
            generation_config=gc,
        )
    seqs_hf = out.sequences.numpy()
    scores_hf = out.sequences_scores.numpy()

    features = ours.encoder(jnp.asarray(mel.transpose(0, 2, 1)))
    buf_len = 1 + sample_len + 1
    tokens0 = np.full((n_audio, buf_len), 2, dtype=np.int32)
    tokens0[:, 0] = 1
    tokens0 = jnp.asarray(tokens0)
    cross_kv = ours.decoder.compute_cross_kv(features)
    caches = ours.decoder.init_cache(n_audio, buf_len, dtype=features.dtype)
    _, caches = _prefill_jit(ours, caches, cross_kv, tokens0[:, :1],
                             jnp.asarray(1, jnp.int32), 0)
    tile = lambda x: jnp.repeat(x, beam, axis=0)
    caches = [c._replace(k=tile(c.k), v=tile(c.v)) for c in caches]
    cross_kv = [(tile(ck), tile(cv)) for ck, cv in cross_kv]
    cfg = FilterConfig(eot=2, timestamp_begin=100, no_timestamps=99,
                       max_initial_timestamp_index=-1,
                       apply_timestamp_rules=False)
    zeros = jnp.zeros((100,), jnp.float32)
    fin_tokens, fin_len, fin_scores = beam_search_loop(
        ours, caches, cross_kv, tile(tokens0), jnp.asarray(1, jnp.int32),
        jnp.asarray(1, jnp.int32), zeros, zeros, sample_len=sample_len,
        beam_size=beam, params=cfg,
    )
    fin_tokens = np.asarray(fin_tokens)
    fin_len = np.asarray(fin_len)
    fin_scores = np.asarray(fin_scores)

    for i in range(n_audio):
        g = int(fin_scores[i].argmax())
        seq = fin_tokens[i, g, : fin_len[i, g]].tolist()
        if 2 in seq:  # strip our forced/natural EOT for comparison
            seq = seq[: seq.index(2)]
        ref = seqs_hf[i].tolist()
        if 2 in ref:
            ref = ref[: ref.index(2)]
        assert seq == ref
        np.testing.assert_allclose(fin_scores[i, g], scores_hf[i], atol=1e-4)


def test_whisper_greedy_cached_decode_matches_full_forward():
    """The cached greedy decode loop must reproduce the teacher-forced
    full_forward distributions exactly (guards the prefill idx-rewind
    contract under the loops' re-feed-last-token convention)."""
    from mlx_audio_tpu.models.stt.whisper.api import _prefill_jit

    _, ours = _tiny_whisper_pair()
    rng = np.random.default_rng(11)
    mel = (rng.standard_normal((1, 8, 32)) * 0.5).astype(np.float32)
    features = ours.encoder(jnp.asarray(mel.transpose(0, 2, 1)))

    seq = [1, 35, 47, 12, 80]
    t0 = 2
    ids = jnp.asarray(np.array([seq], dtype=np.int32))
    ff = np.asarray(ours.decoder.full_forward(ids, features).astype(jnp.float32))
    cross_kv = ours.decoder.compute_cross_kv(features)
    caches = ours.decoder.init_cache(1, 16, dtype=features.dtype)
    _, caches = _prefill_jit(ours, caches, cross_kv, ids[:, :t0],
                             jnp.asarray(t0, jnp.int32), 0)
    for t in range(t0, len(seq)):
        lg, caches = ours.decoder.step(caches, ids[:, t - 1: t], cross_kv)
        np.testing.assert_allclose(
            np.asarray(lg.astype(jnp.float32))[0], ff[0, t - 1],
            atol=1e-5, rtol=1e-5,
        )


def test_csm_greedy_frame_loop_matches_hf_generate():
    """Full integrated generation loop (backbone prefill + cached frame
    steps + 31-step depth-decoder scan + greedy sampling) vs HF
    transformers CsmForConditionalGeneration.generate: identical codebook
    frames for multi-frame greedy decodes on different prompts.  Guards
    the cache/positions/pad bookkeeping of the flagship AR path end to
    end, not just per-stage logits."""
    from transformers.generation import GenerationConfig

    from mlx_audio_tpu.models.tts.sesame.model import (
        _frame_chunk,
        _prefill_and_first_frame,
    )

    hf, ours, nc, v = _csm_pair()

    for prompt in ([1, 5, 9, 12, 3], [1, 40, 100, 3]):
        ids = np.asarray(prompt, dtype=np.int64)[None]
        n_frames = 4
        gc = GenerationConfig(do_sample=False, max_new_tokens=n_frames,
                              min_new_tokens=n_frames, pad_token_id=2,
                              bos_token_id=1)
        with torch.no_grad():
            frames_hf = hf.generate(
                input_ids=torch.from_numpy(ids), generation_config=gc,
                output_audio=False,
            ).numpy()  # [1, n_frames, nc]

        b, t = ids.shape
        tokens = np.zeros((b, t, nc + 1), dtype=np.int32)
        mask = np.zeros((b, t, nc + 1), dtype=bool)
        tokens[:, :, -1] = ids
        mask[:, :, -1] = True
        pad_len = jnp.zeros((b,), dtype=jnp.int32)
        caches = ours.backbone.init_cache(b, max_len=t + n_frames + 4)
        key = jax.random.PRNGKey(0)
        frame, caches = _prefill_and_first_frame(
            ours, caches, pad_len, jnp.asarray(tokens), jnp.asarray(mask),
            key, 0.0, 50,
        )
        frames = [np.asarray(frame)]
        out, caches = _frame_chunk(
            ours, caches, pad_len, jnp.asarray(frames[0]), key, 0.0, 50,
            jnp.zeros((n_frames - 1,), dtype=jnp.int32),
        )
        frames.extend(list(np.asarray(out)))
        frames_ours = np.stack(frames, axis=1)  # [1, n_frames, nc]
        assert (frames_ours == frames_hf).all()


def test_dia_incremental_decode_matches_hf_transformers():
    """The one-token-at-a-time cached decode path (the convention the real
    generate loop `_dia_chunk` uses) vs HF teacher-forced logits at every
    position — guards the KV-cache write/position bookkeeping that a
    full-sequence pass cannot (cf. the Whisper prefill off-by-one this
    golden suite caught)."""
    hf, ours, (b, s, t, C, V, SV) = _dia_pair()
    rng = np.random.default_rng(12)
    src = rng.integers(1, SV, size=(b, s))
    codes = rng.integers(0, V, size=(b, t, C))

    with torch.no_grad():
        logits_hf = hf(
            input_ids=torch.from_numpy(src),
            decoder_input_ids=torch.from_numpy(codes),
        ).logits.numpy()  # [B*C, T, V]

    pos = jnp.arange(s)[None]
    enc = ours.model.encoder(jnp.asarray(src), pos, None)
    cross_kvs = ours.model.decoder.precompute_cross_kv(enc, pos)
    caches = ours.model.decoder.init_cache(b, t)
    for step in range(t):
        logits_s, caches = ours.model.decoder.step(
            jnp.asarray(codes[:, step: step + 1]),
            jnp.asarray([[step]]), caches, cross_kvs, None, None,
        )
        got = np.asarray(logits_s)[0, -1]  # [C, V]
        np.testing.assert_allclose(
            got, logits_hf[:, step], atol=1e-3, rtol=1e-3
        )


def test_causal_lm_greedy_loop_matches_hf_generate():
    """The shared batched decode loop (Orpheus/OuteTTS/Spark backbone,
    models/lm/causal.py) vs HF transformers LlamaForCausalLM.generate:
    greedy continuations identical for a ragged batch of prompts —
    exercises left-padded prefill buckets, the lax.scan chunk loop, and
    per-row stop handling end to end against the reference generator."""
    from transformers import LlamaConfig as HFLlamaConfig
    from transformers import LlamaForCausalLM as HFLlamaForCausalLM

    from mlx_audio_tpu.models.lm.causal import (
        LlamaForCausalLM,
        generate_tokens_batch,
    )
    from mlx_audio_tpu.models.lm.llama import LlamaConfig

    torch.manual_seed(0)
    eos = 2
    hf = HFLlamaForCausalLM(
        HFLlamaConfig(
            vocab_size=100, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, head_dim=8, max_position_embeddings=256,
            rope_theta=10000.0, rms_norm_eps=1e-5, attention_bias=False,
            mlp_bias=False, tie_word_embeddings=False,
            bos_token_id=1, eos_token_id=eos, pad_token_id=0,
        )
    ).eval()
    ours = LlamaForCausalLM(
        LlamaConfig(
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            head_dim=8, hidden_size=32, intermediate_size=64,
            rms_norm_eps=1e-5, vocab_size=100, max_position_embeddings=256,
            rope_theta=10000.0, tie_word_embeddings=False,
        )
    )
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()
          if "rotary_emb" not in k}
    sd = {k.replace("model.", "model.", 1): v for k, v in sd.items()}
    ours = update_arrays(ours, sd, strict=False)

    rng = np.random.default_rng(21)
    prompts = [rng.integers(3, 100, size=n) for n in (5, 9, 3)]
    max_new = 20

    ref = []
    with torch.no_grad():
        for p in prompts:
            out = hf.generate(
                torch.from_numpy(p[None]), do_sample=False,
                max_new_tokens=max_new, eos_token_id=eos, pad_token_id=0,
            )[0, len(p):].tolist()
            if eos in out:
                out = out[: out.index(eos)]
            ref.append(out)

    got = generate_tokens_batch(
        ours, prompts, max_tokens=max_new, temperature=0.0,
        stop_tokens=(eos,), chunk=8,
    )
    got = [list(map(int, g)) for g in got]
    assert got == ref


def test_whisper_timestamp_filter_matches_hf_processor():
    """Our in-graph timestamp-rules logit filter vs HF transformers'
    WhisperTimeStampLogitsProcessor on rule-consistent token histories:
    identical masked-out sets and identical surviving logits (validates the
    pair rule, the non-decreasing floor incl. the repeat-allowed second
    timestamp, the initial-timestamp window, and the
    timestamp-probability-forcing rule)."""
    from transformers.generation.logits_process import (
        WhisperTimeStampLogitsProcessor,
    )

    from mlx_audio_tpu.models.stt.whisper.decoding import (
        FilterConfig,
        apply_filters,
    )

    V, ts_begin, eot, no_ts = 60, 40, 38, 39
    begin = 3

    class _GC:  # minimal generate-config shim
        eos_token_id = eot
        no_timestamps_token_id = no_ts
        max_initial_timestamp_index = 10
        is_multilingual = False

    proc = WhisperTimeStampLogitsProcessor(
        _GC(), begin_index=begin, _detect_timestamp_from_logprob=True
    )

    cfg = FilterConfig(eot=eot, timestamp_begin=ts_begin, no_timestamps=no_ts,
                       max_initial_timestamp_index=10,
                       apply_timestamp_rules=True)
    zeros = jnp.zeros((V,), jnp.float32)

    rng = np.random.default_rng(30)
    # rule-consistent histories after a 3-token prompt: pairs of timestamps
    # around text runs, non-decreasing
    histories = [
        [],                              # at sample start
        [41],                            # single (open) timestamp
        [41, 41],                        # closed pair (repeat allowed)
        [41, 5, 7],                      # text after a pair boundary
        [41, 5, 7, 44],                  # open timestamp later
        [41, 5, 44, 44, 9, 12],          # two closed segments + text
    ]
    prompt = [50, 51, 52]
    for seq in histories:
        ids = np.asarray([prompt + seq], dtype=np.int64)
        logits = rng.standard_normal((1, V)).astype(np.float32) * 2.0

        with torch.no_grad():
            want = proc(torch.from_numpy(ids),
                        torch.from_numpy(logits.copy())).numpy()[0]

        t = ids.shape[1]
        buf = np.full((1, t + 8), eot, dtype=np.int32)
        buf[0, :t] = ids[0]
        got = np.asarray(apply_filters(
            jnp.asarray(logits), jnp.asarray(buf),
            jnp.asarray(t, jnp.int32), jnp.asarray(begin, jnp.int32),
            cfg, zeros, zeros,
        ))[0]

        inf_w = ~np.isfinite(want)
        inf_g = ~np.isfinite(got)
        assert (inf_w == inf_g).all(), (seq, np.nonzero(inf_w ^ inf_g))
        np.testing.assert_allclose(got[~inf_g], want[~inf_w], atol=1e-5)


def test_wav2vec2_feature_extractor_matches_hf():
    """Our Wav2Vec2FeatureExtractor vs HF transformers' on ragged batches
    across padding modes: identical input_values and attention_mask
    (zero-mean/unit-var normalization over the unpadded region, padding
    value placement, max_length truncation, pad_to_multiple_of)."""
    from transformers import Wav2Vec2FeatureExtractor as HFExtractor

    from mlx_audio_tpu.models.stt.wav2vec import Wav2Vec2FeatureExtractor

    rng = np.random.default_rng(31)
    speech = [rng.standard_normal(n).astype(np.float32) * 0.3
              for n in (1600, 2400, 800)]

    for kwargs in (
        dict(padding="longest"),
        dict(padding="max_length", max_length=3000),
        dict(padding="longest", pad_to_multiple_of=512),
        dict(padding="max_length", max_length=1000, truncation=True),
    ):
        hf = HFExtractor(do_normalize=True, return_attention_mask=True)
        ours = Wav2Vec2FeatureExtractor(do_normalize=True,
                                        return_attention_mask=True)
        want = hf(speech, sampling_rate=16000, return_tensors="np", **kwargs)
        got = ours(speech, sampling_rate=16000, **kwargs)
        np.testing.assert_allclose(
            np.asarray(got["input_values"]), want["input_values"],
            atol=1e-5, rtol=1e-5,
        )
        assert (np.asarray(got["attention_mask"])
                == want["attention_mask"]).all()


def test_whisper_dtw_matches_hf():
    """Our pure-numpy DTW (word-timestamp alignment) vs HF transformers'
    _dynamic_time_warping on random cost matrices: identical alignment
    paths."""
    from transformers.models.whisper.generation_whisper import (
        _dynamic_time_warping,
    )

    from mlx_audio_tpu.models.stt.whisper.timing import dtw

    rng = np.random.default_rng(32)
    for shape in ((7, 13), (20, 20), (3, 40)):
        m = rng.standard_normal(shape).astype(np.float32)
        want_text, want_time = _dynamic_time_warping(m.astype(np.float64))
        got_text, got_time = dtw(m)
        assert np.asarray(got_text).tolist() == np.asarray(want_text).tolist()
        assert np.asarray(got_time).tolist() == np.asarray(want_time).tolist()


def test_whisper_loads_hf_checkpoint_directory(tmp_path):
    """A raw HF-transformers Whisper checkpoint directory (config.json with
    HF field names + model.safetensors, as `openai/whisper-*` ships) loads
    directly through our Model.from_pretrained and reproduces HF encoder
    features — the reference requires pre-converted mlx-community repos."""
    hf, _ = _tiny_whisper_pair()
    ckpt = tmp_path / "whisper-hf"
    hf.save_pretrained(str(ckpt), safe_serialization=True)

    from mlx_audio_tpu.models.stt.whisper.transcribe import Model

    ours = Model.from_pretrained(str(ckpt))
    assert ours.dims.n_audio_state == 16 and ours.dims.n_text_layer == 2

    rng = np.random.default_rng(6)
    mel = (rng.standard_normal((1, 8, 32)) * 0.5).astype(np.float32)
    with torch.no_grad():
        enc_hf = hf.model.encoder(torch.from_numpy(mel)).last_hidden_state.numpy()
    enc_ours = np.asarray(ours.encoder(jnp.asarray(mel.transpose(0, 2, 1))))
    np.testing.assert_allclose(enc_ours, enc_hf, atol=1e-4, rtol=1e-4)


def test_csm_loads_hf_checkpoint_directory(tmp_path):
    """A raw HF-transformers CSM checkpoint directory (CsmConfig field
    names, deduped tied audio-embedding table, embedded codec_model Mimi
    weights) loads through the generic load_model() and reproduces HF
    greedy frames exactly; the embedded Mimi decodes allclose to HF's
    codec_model."""
    from transformers.generation import GenerationConfig

    from mlx_audio_tpu.models.tts.sesame.model import (
        _frame_chunk,
        _prefill_and_first_frame,
    )
    from mlx_audio_tpu.utils.loader import load_model

    hf, _, nc, v = _csm_pair()
    ckpt = tmp_path / "csm-hf"
    hf.save_pretrained(str(ckpt), safe_serialization=True)
    m = load_model(str(ckpt), domain="tts")

    ids = np.array([[1, 5, 9, 12, 3]], dtype=np.int64)
    gc = GenerationConfig(do_sample=False, max_new_tokens=3, min_new_tokens=3,
                          pad_token_id=2, bos_token_id=1)
    with torch.no_grad():
        frames_hf = hf.generate(input_ids=torch.from_numpy(ids),
                                generation_config=gc,
                                output_audio=False).numpy()

    b, t = ids.shape
    tokens = np.zeros((b, t, nc + 1), dtype=np.int32)
    mask = np.zeros((b, t, nc + 1), dtype=bool)
    tokens[:, :, -1] = ids
    mask[:, :, -1] = True
    pad_len = jnp.zeros((b,), jnp.int32)
    caches = m.model.backbone.init_cache(b, max_len=t + 8)
    key = jax.random.PRNGKey(0)
    frame, caches = _prefill_and_first_frame(
        m.model, caches, pad_len, jnp.asarray(tokens), jnp.asarray(mask),
        key, 0.0, 50,
    )
    frames = [np.asarray(frame)]
    out, _ = _frame_chunk(m.model, caches, pad_len, jnp.asarray(frames[0]),
                          key, 0.0, 50, jnp.zeros((2,), jnp.int32))
    frames.extend(list(np.asarray(out)))
    assert (np.stack(frames, axis=1) == frames_hf).all()

    codes = np.random.default_rng(0).integers(0, 16, size=(1, nc, 13))
    with torch.no_grad():
        wav_hf = hf.codec_model.decode(
            torch.from_numpy(codes)
        ).audio_values.numpy()
    wav_ours = np.asarray(m._mimi.decode(jnp.asarray(codes)))
    n = min(wav_ours.shape[-1], wav_hf.shape[-1])
    np.testing.assert_allclose(
        wav_ours.reshape(-1)[:n], wav_hf.reshape(-1)[:n], atol=1e-4
    )


def test_codec_from_pretrained_hf_directories(tmp_path):
    """Mimi / EnCodec / DAC `from_pretrained` on raw HF-transformers
    checkpoint directories (kyutai/mimi, facebook/encodec_*, descript/dac_*
    layouts): identical codes vs the HF models (reference exposes
    from_pretrained per codec, e.g. dac.py:252, encodec.py:711,
    mimi.py:252)."""
    from transformers import (
        DacConfig as HFDacConfig,
        DacModel,
        EncodecConfig as HFEncodecConfig,
        EncodecModel,
    )

    from mlx_audio_tpu.codec.dac import DAC
    from mlx_audio_tpu.codec.encodec import Encodec
    from mlx_audio_tpu.codec.mimi import Mimi

    rng = np.random.default_rng(0)

    hf, _ = build_mimi_pair()
    hf.save_pretrained(str(tmp_path / "mimi"), safe_serialization=True)
    m = Mimi.from_pretrained(str(tmp_path / "mimi"))
    audio = (rng.standard_normal((1, 1, 1920 * 4)) * 0.1).astype(np.float32)
    with torch.no_grad():
        codes_hf = hf.encode(torch.from_numpy(audio)).audio_codes.numpy()
    assert (np.asarray(m.encode(jnp.asarray(audio))) == codes_hf).all()

    torch.manual_seed(0)
    ehf = EncodecModel(HFEncodecConfig(
        target_bandwidths=[1.5, 3.0], sampling_rate=24000, audio_channels=1,
        num_filters=4, num_residual_layers=1, upsampling_ratios=[8, 5, 4, 2],
        codebook_size=1024, codebook_dim=8, hidden_size=8, num_lstm_layers=2,
        use_causal_conv=True, normalize=False,
    )).eval()
    ehf.save_pretrained(str(tmp_path / "encodec"), safe_serialization=True)
    enc, proc = Encodec.from_pretrained(str(tmp_path / "encodec"))
    wav = (rng.standard_normal(9600) * 0.1).astype(np.float32)
    with torch.no_grad():
        ec_hf = ehf.encode(torch.from_numpy(wav)[None, None],
                           bandwidth=3.0).audio_codes.numpy()
    a, mask = proc(wav)
    ec, _ = enc.encode(a, mask, bandwidth=3.0)
    assert (np.asarray(ec) == ec_hf).all()

    torch.manual_seed(0)
    dhf = DacModel(HFDacConfig(
        encoder_hidden_size=16, downsampling_ratios=[2, 4, 5, 8],
        decoder_hidden_size=128, upsampling_ratios=[8, 5, 4, 2],
        n_codebooks=4, codebook_size=64, codebook_dim=8, sampling_rate=16000,
    )).eval()
    dhf.save_pretrained(str(tmp_path / "dac"), safe_serialization=True)
    d = DAC.from_pretrained(str(tmp_path / "dac"))
    wav = (rng.standard_normal((1, 3200, 1)) * 0.1).astype(np.float32)
    with torch.no_grad():
        dc_hf = dhf.encode(
            torch.from_numpy(wav.transpose(0, 2, 1))
        ).audio_codes.numpy()
    assert (np.asarray(d.encode(jnp.asarray(wav))[1]) == dc_hf).all()


def test_stt_families_load_hf_checkpoint_directories(tmp_path):
    """Parakeet and Wav2Vec2 raw HF-transformers checkpoint directories
    load through the generic load_model() (model-type remapping + HF
    config translation + sanitize) and reproduce HF outputs.  (Voxtral and
    Bark dir loading is exercised by their own goldens + the loader
    remapping tests.)"""
    from mlx_audio_tpu.utils.loader import load_model

    rng = np.random.default_rng(40)

    # --- Parakeet CTC
    from transformers.models.parakeet import (
        ParakeetCTCConfig,
        ParakeetEncoderConfig,
    )
    from transformers.models.parakeet.modeling_parakeet import ParakeetForCTC

    enc = ParakeetEncoderConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, conv_kernel_size=9, num_mel_bins=16,
        subsampling_factor=8, subsampling_conv_channels=8, dropout=0.0,
        attention_dropout=0.0, dropout_positions=0.0, scale_input=False,
    )
    torch.manual_seed(0)
    phf = ParakeetForCTC(
        ParakeetCTCConfig(encoder_config=enc.to_dict(), vocab_size=33)
    ).eval()
    phf.save_pretrained(str(tmp_path / "parakeet"), safe_serialization=True)
    # checkpoint tokenizer -> vocabulary (Unigram-style tokenizer.json)
    import json as _json

    vocab33 = [[("▁tok%d" % i), -float(i)] for i in range(33)]
    with open(tmp_path / "parakeet" / "tokenizer.json", "w") as f:
        _json.dump({"model": {"type": "Unigram", "vocab": vocab33}}, f)
    pk = load_model(str(tmp_path / "parakeet"), domain="stt")
    assert pk.vocabulary[:2] == ["▁tok0", "▁tok1"]
    assert len(pk.vocabulary) == 32  # vocab_size - 1 (blank excluded)
    mel = rng.standard_normal((1, 64, 16)).astype(np.float32)
    with torch.no_grad():
        logp_hf = torch.log_softmax(
            phf(input_features=torch.from_numpy(mel)).logits, dim=-1
        ).numpy()
    feats, _ = pk.encoder(jnp.asarray(mel))
    logp = np.asarray(pk.decoder(feats))
    np.testing.assert_allclose(logp, logp_hf, atol=1e-4, rtol=1e-4)

    # --- Wav2Vec2
    from transformers import Wav2Vec2Config, Wav2Vec2Model

    torch.manual_seed(0)
    whf = Wav2Vec2Model(Wav2Vec2Config(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, conv_dim=[16, 16], conv_stride=[5, 2],
        conv_kernel=[10, 3], num_feat_extract_layers=2,
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=2,
    )).eval()
    whf.save_pretrained(str(tmp_path / "w2v"), safe_serialization=True)
    w2v = load_model(str(tmp_path / "w2v"), domain="stt")
    wav = (rng.standard_normal((1, 800)) * 0.1).astype(np.float32)
    with torch.no_grad():
        h_hf = whf(torch.from_numpy(wav)).last_hidden_state.numpy()
    h = np.asarray(w2v(jnp.asarray(wav))[0])
    np.testing.assert_allclose(h, h_hf, atol=1e-4, rtol=1e-4)


def test_bark_hf_checkpoint_embedded_codec_loads(tmp_path):
    """A full HF BarkModel checkpoint dir (suno/bark layout, EnCodec
    embedded as codec_model.*) loads through load_model with the codec
    weights routed in: decode parity vs the HF codec."""
    from transformers import BarkConfig, BarkModel
    from transformers.models.bark import (
        BarkCoarseConfig,
        BarkFineConfig,
        BarkSemanticConfig,
    )

    from mlx_audio_tpu.utils.loader import load_model

    stage = dict(block_size=64, input_vocab_size=200, output_vocab_size=200,
                 num_layers=2, num_heads=2, hidden_size=32, dropout=0.0,
                 bias=True)
    codec = dict(model_type="encodec", target_bandwidths=[1.5],
                 sampling_rate=24000, audio_channels=1, num_filters=4,
                 num_residual_layers=1, upsampling_ratios=[8, 5, 4, 2],
                 codebook_size=256, codebook_dim=8, hidden_size=8,
                 num_lstm_layers=2)
    torch.manual_seed(0)
    hf = BarkModel(BarkConfig(
        semantic_config=BarkSemanticConfig(**stage).to_dict(),
        coarse_acoustics_config=BarkCoarseConfig(**stage).to_dict(),
        fine_acoustics_config=BarkFineConfig(
            **stage, n_codes_total=8, n_codes_given=1
        ).to_dict(),
        codec_config=codec,
    )).eval()
    hf.save_pretrained(str(tmp_path / "bark"), safe_serialization=True)
    m = load_model(str(tmp_path / "bark"), domain="tts")

    nq = len(m._codec.quantizer.layers)
    codes = np.random.default_rng(0).integers(0, 256, size=(1, 1, nq, 25))
    with torch.no_grad():
        wav_hf = hf.codec_model.decode(
            torch.from_numpy(codes), [None]
        ).audio_values.numpy()
    wav_ours = np.asarray(m.codec_decode(codes[0, 0]))
    n = min(wav_ours.reshape(-1).shape[0], wav_hf.reshape(-1).shape[0])
    np.testing.assert_allclose(
        wav_ours.reshape(-1)[:n], wav_hf.reshape(-1)[:n], atol=1e-4
    )


def test_whisper_mel_frontend_matches_hf_feature_extractor():
    """Our Whisper log-mel frontend vs HF's WhisperFeatureExtractor on raw
    audio: allclose (pins the PERIODIC hann window — the symmetric variant
    the reference uses deviates by up to 3.4e-2 in normalized log-mels,
    a systematic input distortion for every real Whisper checkpoint)."""
    from transformers import WhisperFeatureExtractor

    from mlx_audio_tpu.models.stt.whisper.audio import log_mel_spectrogram

    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(16000 * 3) * 0.1).astype(np.float32)
    fe = WhisperFeatureExtractor(feature_size=80)
    want = fe(audio, sampling_rate=16000, return_tensors="np",
              padding="max_length").input_features[0]  # [80, 3000]
    got = np.asarray(
        log_mel_spectrogram(audio, n_mels=80, padding=480000)
    )[:3000].T
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_encodec_48khz_stereo_chunked_matches_hf():
    """The facebook/encodec_48khz configuration — stereo, normalize=True,
    time_group_norm, non-causal convs, chunked encode with a SHORT tail
    chunk (HF last_frame_pad_length semantics) and linear overlap-add
    decode: codes and scales identical, waveform allclose."""
    from transformers import EncodecConfig as HFEncodecConfig, EncodecModel

    from mlx_audio_tpu.codec.encodec import Encodec, EncodecConfig

    torch.manual_seed(0)
    common = dict(
        target_bandwidths=[3.0, 6.0], sampling_rate=48000, audio_channels=2,
        num_filters=4, num_residual_layers=1, upsampling_ratios=[8, 5, 4, 2],
        codebook_size=1024, codebook_dim=8, hidden_size=8, num_lstm_layers=2,
        use_causal_conv=False, normalize=True, chunk_length_s=0.1,
        overlap=0.01, norm_type="time_group_norm",
    )
    hf = EncodecModel(HFEncodecConfig(**common)).eval()
    ours = Encodec(EncodecConfig.from_dict(
        {**common, "pad_mode": "reflect", "trim_right_ratio": 1.0,
         "compress": 2}
    ))
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    ours = update_arrays(ours, ours.sanitize(sd), strict=True)

    rng = np.random.default_rng(3)
    wav = (rng.standard_normal((2, 9600)) * 0.1).astype(np.float32)
    with torch.no_grad():
        enc = hf.encode(torch.from_numpy(wav)[None], bandwidth=6.0)
        wav_hf = hf.decode(
            enc.audio_codes, enc.audio_scales,
            padding_mask=torch.ones(1, 2, 9600, dtype=torch.bool),
            last_frame_pad_length=enc.last_frame_pad_length,
        ).audio_values.numpy()

    audio = jnp.asarray(wav.T[None])  # unpadded [B, T, C], HF-style
    mask = jnp.ones(audio.shape[:2], dtype=bool)
    codes, scales = ours.encode(audio, mask, bandwidth=6.0)
    assert (np.asarray(codes) == enc.audio_codes.numpy()).all()
    for s_ours, s_hf in zip(scales, enc.audio_scales):
        np.testing.assert_allclose(np.asarray(s_ours).reshape(-1),
                                   s_hf.numpy().reshape(-1), atol=1e-6)

    wav_ours = np.asarray(ours.decode(jnp.asarray(np.asarray(codes)),
                                      scales, mask)).transpose(0, 2, 1)
    n = min(wav_ours.shape[-1], wav_hf.shape[-1])
    np.testing.assert_allclose(wav_ours[..., :n], wav_hf[..., :n], atol=1e-4)
