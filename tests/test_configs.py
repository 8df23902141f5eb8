"""Upstream config.json compatibility + config validation."""

import json

import numpy as np
import pytest

from neuralcodecs_tpu.core.validation import validate_config
from neuralcodecs_tpu.core.exceptions import ValidationError


def test_snac_hf_config_json(tmp_path):
    """Field names match the hubertsiuzdak/snac config.json schema."""
    from neuralcodecs_tpu.models.snac import SNACConfig

    upstream = {
        "sampling_rate": 24000, "encoder_dim": 48,
        "encoder_rates": [2, 4, 8, 8], "decoder_dim": 1024,
        "decoder_rates": [8, 8, 4, 2], "attn_window_size": None,
        "codebook_size": 4096, "codebook_dim": 8, "vq_strides": [4, 2, 1],
        "noise": True, "depthwise": True, "latent_dim": None,
    }
    p = tmp_path / "config.json"
    p.write_text(json.dumps(upstream))
    cfg = SNACConfig.from_json(p)
    assert cfg.sample_rate == 24000
    assert cfg.hop_length == 512
    assert cfg.vq_strides == [4, 2, 1]
    validate_config(cfg)


def test_encodec_hf_config_json(tmp_path):
    """Field names match the facebook/encodec_24khz transformers config."""
    from neuralcodecs_tpu.models.encodec import EncodecConfig

    upstream = {
        "architectures": ["EncodecModel"], "chunk_length_s": None,
        "codebook_dim": 128, "codebook_size": 1024, "compress": 2,
        "dilation_growth_rate": 2, "hidden_size": 128, "kernel_size": 7,
        "last_kernel_size": 7, "model_type": "encodec",
        "norm_type": "weight_norm", "normalize": False, "num_filters": 32,
        "num_lstm_layers": 2, "num_residual_layers": 1, "overlap": None,
        "pad_mode": "reflect", "residual_kernel_size": 3,
        "sampling_rate": 24000,
        "target_bandwidths": [1.5, 3.0, 6.0, 12.0, 24.0],
        "trim_right_ratio": 1.0, "upsampling_ratios": [8, 5, 4, 2],
        "use_causal_conv": True,
    }
    p = tmp_path / "config.json"
    p.write_text(json.dumps(upstream))
    cfg = EncodecConfig.from_json(p)
    assert cfg.hop_length == 320
    assert cfg.frame_rate == 75
    validate_config(cfg)


def test_dia_nested_config():
    from neuralcodecs_tpu.models.dia import DiaConfig

    upstream = {
        "version": "1.0",
        "model": {
            "encoder": {"n_layer": 12, "n_embd": 1024, "n_hidden": 4096,
                        "n_head": 16, "head_dim": 128},
            "decoder": {"n_layer": 18, "n_embd": 2048, "n_hidden": 8192,
                        "gqa_query_heads": 16, "kv_heads": 4,
                        "gqa_head_dim": 128, "cross_query_heads": 16,
                        "cross_head_dim": 128},
            "dropout": 0.0,
        },
        "data": {"text_length": 1024, "audio_length": 3072, "channels": 9,
                 "delay_pattern": [0, 8, 9, 10, 11, 12, 13, 14, 15]},
    }
    cfg = DiaConfig.from_dict(upstream)
    assert cfg.encoder.n_layer == 12
    assert cfg.decoder.kv_heads == 4
    assert cfg.data.delay_pattern[-1] == 15


def test_validate_config_rejects_bad():
    from neuralcodecs_tpu.models.snac import SNACConfig

    with pytest.raises(ValidationError):
        validate_config(SNACConfig(sampling_rate=100))
    with pytest.raises(ValidationError):
        validate_config(SNACConfig(codebook_size=-1))
