"""Checkpoint importer tests: pickle reader, safetensors, weight-norm folding."""

import numpy as np
import pytest
import torch

from neuralcodecs_tpu.core.importer import (
    fold_weight_norm,
    import_checkpoint,
    load_state_dict,
    normalize_state_dict,
    strip_prefix,
)
from neuralcodecs_tpu.core.safetensors_io import load_safetensors, save_safetensors
from neuralcodecs_tpu.core.files import ModelFileType, detect_file_type


def test_torch_zip_checkpoint_roundtrip(tmp_path, rng):
    sd = {
        "encoder.weight": torch.randn(8, 4, 7),
        "encoder.bias": torch.randn(8),
        "codebook.weight": torch.randn(64, 8).to(torch.float16),
        "alpha": torch.randn(1, 8, 1).to(torch.bfloat16),
        "step": torch.tensor(3, dtype=torch.int64),
    }
    path = tmp_path / "model.pt"
    torch.save(sd, path)

    got = load_state_dict(path)
    assert set(got) == set(sd)
    np.testing.assert_allclose(got["encoder.weight"], sd["encoder.weight"].numpy())
    np.testing.assert_allclose(got["codebook.weight"],
                               sd["codebook.weight"].numpy())
    np.testing.assert_allclose(got["alpha"], sd["alpha"].float().numpy())
    assert got["step"] == 3


def test_torch_checkpoint_nested_state_dict(tmp_path):
    inner = {"layer.weight": torch.randn(4, 4)}
    torch.save({"metadata": {"kbps": 8.0}, "state_dict": inner}, tmp_path / "m.pth")
    got = load_state_dict(tmp_path / "m.pth")
    assert "layer.weight" in got
    np.testing.assert_allclose(got["layer.weight"], inner["layer.weight"].numpy())


def test_torch_checkpoint_noncontiguous_tensor(tmp_path):
    t = torch.randn(6, 8).t()  # transposed => non-trivial strides
    torch.save({"w": t}, tmp_path / "m.pt")
    got = load_state_dict(tmp_path / "m.pt")
    np.testing.assert_allclose(got["w"], t.numpy())


def test_safetensors_roundtrip(tmp_path, rng):
    tensors = {
        "a": rng.standard_normal((3, 5)).astype(np.float32),
        "b": (rng.standard_normal(7) * 10).astype(np.int64),
        "c": rng.standard_normal((2, 2)).astype(np.float16),
    }
    path = tmp_path / "m.safetensors"
    save_safetensors(path, tensors, metadata={"format": "pt"})
    assert detect_file_type(path) == ModelFileType.SAFETENSORS
    got = load_safetensors(path)
    for k in tensors:
        np.testing.assert_array_equal(got[k], tensors[k])


def test_fold_weight_norm_matches_torch_parametrization():
    torch.manual_seed(1)
    conv = torch.nn.Conv1d(6, 12, 5, bias=True)
    wn = torch.nn.utils.parametrizations.weight_norm(conv)
    sd = {f"conv.{k}": v.detach().numpy() for k, v in wn.state_dict().items()}
    folded = fold_weight_norm(sd)
    assert "conv.weight" in folded
    assert not any("parametrizations" in k for k in folded)
    np.testing.assert_allclose(folded["conv.weight"], wn.weight.detach().numpy(),
                               rtol=1e-6, atol=1e-7)


def test_fold_weight_norm_legacy_names():
    torch.manual_seed(2)
    v = torch.randn(8, 4, 3)
    g = torch.randn(8, 1, 1).abs()
    sd = {"c.weight_v": v.numpy(), "c.weight_g": g.numpy(), "c.bias": np.zeros(8, np.float32)}
    folded = fold_weight_norm(sd)
    expected = (g * v / v.pow(2).sum((1, 2), keepdim=True).sqrt()).numpy()
    np.testing.assert_allclose(folded["c.weight"], expected, rtol=1e-6)
    assert "c.bias" in folded


def test_fold_weight_norm_transpose_conv():
    """ConvTranspose1d weight_norm (dim 0 = Cin) must fold identically."""
    torch.manual_seed(3)
    conv = torch.nn.ConvTranspose1d(6, 12, 4, stride=2)
    wn = torch.nn.utils.parametrizations.weight_norm(conv)
    sd = {f"ct.{k}": v.detach().numpy() for k, v in wn.state_dict().items()}
    folded = fold_weight_norm(sd)
    np.testing.assert_allclose(folded["ct.weight"], wn.weight.detach().numpy(),
                               rtol=1e-6, atol=1e-7)


def test_strip_prefix():
    sd = {"module.a.w": np.zeros(1), "module.b.w": np.ones(1)}
    got = strip_prefix(sd)
    assert set(got) == {"a.w", "b.w"}


def test_normalize_rejects_empty():
    from neuralcodecs_tpu.core.exceptions import LoadError

    with pytest.raises(LoadError):
        normalize_state_dict({"not_a_tensor": "hello"})


def test_import_checkpoint_end_to_end(tmp_path):
    """Full pipeline: torch.save with weight-norm params -> folded numpy dict."""
    torch.manual_seed(4)
    conv = torch.nn.utils.parametrizations.weight_norm(torch.nn.Conv1d(2, 4, 3))
    sd = {f"enc.{k}": v for k, v in conv.state_dict().items()}
    torch.save(sd, tmp_path / "ckpt.pt")
    got = import_checkpoint(tmp_path / "ckpt.pt")
    np.testing.assert_allclose(got["enc.weight"], conv.weight.detach().numpy(),
                               rtol=1e-6, atol=1e-7)


def test_sharded_checkpoint_merge(tmp_path, rng):
    """HF sharded checkpoints (index.json + N shards) load as one state
    dict through the normal import pipeline."""
    import json

    from neuralcodecs_tpu.core.importer import import_checkpoint
    from neuralcodecs_tpu.core.safetensors_io import save_safetensors

    a = rng.standard_normal((4, 3)).astype(np.float32)
    b = rng.standard_normal((5,)).astype(np.float32)
    c = rng.standard_normal((2, 2)).astype(np.float32)
    save_safetensors(tmp_path / "model-00001-of-00002.safetensors",
                     {"enc.weight": a, "enc.bias": b})
    save_safetensors(tmp_path / "model-00002-of-00002.safetensors",
                     {"dec.weight": c})
    index = {
        "metadata": {"total_size": int(a.nbytes + b.nbytes + c.nbytes)},
        "weight_map": {
            "enc.weight": "model-00001-of-00002.safetensors",
            "enc.bias": "model-00001-of-00002.safetensors",
            "dec.weight": "model-00002-of-00002.safetensors",
        },
    }
    idx = tmp_path / "model.safetensors.index.json"
    idx.write_text(json.dumps(index))

    sd = import_checkpoint(idx)
    assert set(sd) == {"enc.weight", "enc.bias", "dec.weight"}
    np.testing.assert_array_equal(sd["enc.weight"], a)
    np.testing.assert_array_equal(sd["dec.weight"], c)


def test_sharded_checkpoint_resolve_prefers_index(tmp_path, rng):
    """Directory resolve must pick the shard index over individual shards."""
    from neuralcodecs_tpu.core.loader import LoadOptions, ModelLoader
    from neuralcodecs_tpu.core.safetensors_io import save_safetensors

    save_safetensors(tmp_path / "model-00001-of-00001.safetensors",
                     {"w": np.zeros((2, 2), np.float32)})
    import json
    (tmp_path / "model.safetensors.index.json").write_text(json.dumps(
        {"weight_map": {"w": "model-00001-of-00001.safetensors"}}))
    got = ModelLoader().resolve(str(tmp_path), LoadOptions())
    assert got.name == "model.safetensors.index.json"


def test_sharded_checkpoint_errors(tmp_path, rng):
    import json

    from neuralcodecs_tpu.core.exceptions import LoadError
    from neuralcodecs_tpu.core.importer import import_checkpoint
    from neuralcodecs_tpu.core.safetensors_io import save_safetensors

    # missing shard
    idx = tmp_path / "m.safetensors.index.json"
    idx.write_text(json.dumps({"weight_map": {"w": "gone.safetensors"}}))
    with pytest.raises(LoadError, match="missing"):
        import_checkpoint(idx)
    # traversal in shard name
    idx.write_text(json.dumps({"weight_map": {"w": "../evil.safetensors"}}))
    with pytest.raises(LoadError, match="Unsafe"):
        import_checkpoint(idx)
    # tensor named in index but absent from shards
    save_safetensors(tmp_path / "s.safetensors", {"w": np.zeros(2, np.float32)})
    idx.write_text(json.dumps(
        {"weight_map": {"w": "s.safetensors", "extra": "s.safetensors"}}))
    with pytest.raises(LoadError, match="absent"):
        import_checkpoint(idx)


def test_pick_model_file_prefers_shard_index():
    from neuralcodecs_tpu.core.repos import pick_model_file

    names = ["model-00001-of-00002.safetensors",
             "model-00002-of-00002.safetensors",
             "model.safetensors.index.json", "config.json"]
    assert pick_model_file(names) == "model.safetensors.index.json"
    assert pick_model_file(["a.safetensors"]) == "a.safetensors"
    # Safety ordering (ADVICE r2): a complete single safetensors file beats
    # a pickle-based shard index; a safetensors index beats both.
    assert pick_model_file(
        ["model.safetensors", "pytorch_model.bin.index.json",
         "pytorch_model-00001-of-00002.bin"]) == "model.safetensors"
    assert pick_model_file(
        ["model.safetensors", "model.safetensors.index.json",
         "pytorch_model.bin.index.json"]) == "model.safetensors.index.json"
    # With no safe-format alternative, the pickle shard index still wins
    # over a loose pickle (the sharded checkpoint is the complete one).
    assert pick_model_file(
        ["pytorch_model.bin.index.json", "other.bin"]
    ) == "pytorch_model.bin.index.json"
    # A safetensors shard PIECE without its index is not a complete
    # checkpoint: the complete pickle shard index must win (ADVICE r3).
    assert pick_model_file(
        ["model-00001-of-00002.safetensors", "model-00002-of-00002.safetensors",
         "pytorch_model.bin.index.json"]) == "pytorch_model.bin.index.json"
    # ...but an -of-00001 "shard" IS the complete checkpoint: an index-less
    # single-shard upload must still resolve (review r3).
    assert pick_model_file(
        ["model-00001-of-00001.safetensors", "config.json"]
    ) == "model-00001-of-00001.safetensors"


def test_sharded_find_config_skips_index(tmp_path):
    """find_config must not return the shard index itself as the config."""
    import json

    from neuralcodecs_tpu.core.loader import ModelLoader

    idx = tmp_path / "model.safetensors.index.json"
    idx.write_text(json.dumps({"weight_map": {}}))
    (tmp_path / "config.json").write_text(json.dumps({"sampling_rate": 16000}))
    got = ModelLoader.find_config(idx)
    assert got is not None and got.name == "config.json"
    # and without a config.json there is simply no config
    (tmp_path / "config.json").unlink()
    assert ModelLoader.find_config(idx) is None


def test_sharded_native_export_loads_via_model_loader(tmp_path):
    """A sharded save_pretrained export must load bit-exact through the
    generic ModelLoader path (the CLI --model route), not just
    load_pretrained."""
    from neuralcodecs_tpu.core.export import save_pretrained
    from neuralcodecs_tpu.core.loader import load_model
    from neuralcodecs_tpu.models.snac import SNAC, SNACConfig

    cfg = SNACConfig(sampling_rate=16000, encoder_dim=8, encoder_rates=[2, 4],
                     decoder_dim=32, decoder_rates=[4, 2],
                     attn_window_size=None, codebook_size=32, codebook_dim=4,
                     vq_strides=[2, 1], noise=False, depthwise=False)
    model = SNAC(cfg, seed=5)
    out = tmp_path / "export"
    save_pretrained(model, out, max_shard_bytes=64 * 1024)
    loaded = load_model("snac", str(out))
    assert loaded.config.sampling_rate == 16000  # config.json was honored
    for k in model.params:
        np.testing.assert_array_equal(np.asarray(loaded.params[k]),
                                      np.asarray(model.params[k]))


def test_save_pretrained_removes_stale_layout(tmp_path):
    """Re-saving unsharded into a previously-sharded directory must not
    leave a stale index that wins at load time."""
    from neuralcodecs_tpu.core.export import load_pretrained, save_pretrained
    from neuralcodecs_tpu.models.snac import SNAC, SNACConfig

    cfg = SNACConfig(sampling_rate=16000, encoder_dim=8, encoder_rates=[2, 4],
                     decoder_dim=32, decoder_rates=[4, 2],
                     attn_window_size=None, codebook_size=32, codebook_dim=4,
                     vq_strides=[2, 1], noise=False, depthwise=False)
    v1 = SNAC(cfg, seed=1)
    v2 = SNAC(cfg, seed=2)
    d = tmp_path / "m"
    save_pretrained(v1, d, max_shard_bytes=64 * 1024)
    save_pretrained(v2, d)  # unsharded re-save
    assert not (d / "model.safetensors.index.json").exists()
    assert not list(d.glob("model-*-of-*.safetensors"))
    loaded = load_pretrained(d)
    k = "encoder.block.0.weight"
    np.testing.assert_array_equal(np.asarray(loaded.params[k]),
                                  np.asarray(v2.params[k]))
