"""Time-axis sequence parallelism for long-audio encode (the CP story).

The reference scales long audio algorithmically (Encodec 1 s chunks, SNAC
local attention windows — SURVEY §5); multi-chip, the TPU-native equivalent
is sharding the TIME axis over an ``sp`` mesh axis with halo exchange: each
device encodes its slice plus `halo` samples of neighbor context
(`lax.ppermute` over ICI), then crops to its own frames. With halo ≥ the
encoder's receptive field, interior codes are bit-identical to the
unsharded computation.

Windowed-attention configs (SNAC 32k/44.1k) are supported via
window-aligned shard boundaries: LocalMHA windows are block-local with
per-window RoPE positions (Modules/SNAC/LocalMHA.cs:87-96), so as long as
every shard boundary and halo is a multiple of ``attn_window_size · hop``
samples, the shard's window grid coincides with the global one and interior
codes stay bit-identical. Because attention mixes the *whole* window, the
conv halo is rounded up to whole windows and one extra window is added to
cover the post-attention depthwise conv taps.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import Mesh, PartitionSpec as P


def receptive_field(encoder_rates, kernel: int = 7, dilations=(1, 3, 9)) -> int:
    """Conservative one-sided receptive field of a SNAC/DAC-style encoder
    in input samples."""
    rf = kernel  # stem conv
    stride_total = 1
    for rate in encoder_rates:
        # 3 residual units (two convs each) + strided conv, at current rate
        block = sum((kernel - 1) * d for d in dilations) + 2 * rate
        rf += block * stride_total
        stride_total *= rate
    return rf


def sharded_encode(model, mesh: Mesh, audio: jax.Array,
                   halo: int | None = None) -> list[jax.Array]:
    """SNAC-style encode with the time axis sharded over mesh axis 'sp'.

    audio: [B, T] (host or device). Returns the per-stage code arrays
    [B, frames_i], identical to ``model.encode`` for halo ≥ receptive field.
    """
    cfg = model.config
    sp = mesh.shape["sp"]
    a = jnp.asarray(audio, jnp.float32)
    if a.ndim == 1:
        a = a[None, :]
    b, t = a.shape

    # per-shard length: multiple of the code alignment unit (pad_to is a
    # multiple of attn_window_size · hop when attention is present, so the
    # shard boundaries land on the global window grid)
    unit = cfg.pad_to
    shard_len = -(-t // (sp * unit)) * unit
    a = jnp.pad(a, ((0, 0), (0, sp * shard_len - t)))[..., None]  # [B, T', 1]

    if halo is None:
        halo = receptive_field(cfg.encoder_rates)
        attn_w = getattr(cfg, "attn_window_size", None)
        if attn_w:
            # attention contaminates whole windows: frames whose conv inputs
            # reach past the shard edge poison their entire window via
            # softmax, and the post-attention depthwise k7 then reads ±3
            # frames across the first clean window boundary. Round the conv
            # halo up to whole windows and add one more window span.
            span = attn_w * cfg.hop_length
            halo = (-(-halo // span) + 1) * span
    halo = -(-halo // unit) * unit  # align halo to the frame unit
    if halo > shard_len:
        raise ValueError(
            f"audio too short to time-shard over sp={sp}: per-shard length "
            f"{shard_len} < halo {halo} (the ppermute exchange sends one "
            f"neighbor's edge, so shards must cover the receptive field)")
    hop = cfg.hop_length
    halo_frames = halo // hop

    params = model.params
    n_stages = len(model.quantizers)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(None, "sp", None)),
             out_specs=tuple(P(None, "sp") for _ in range(n_stages)),
             check_vma=False)
    def encode_shard(params, chunk):
        idx = lax.axis_index("sp")
        # halo exchange: receive the left neighbor's tail and the right
        # neighbor's head over ICI
        right_perm = [(i, (i + 1) % sp) for i in range(sp)]
        left_perm = [(i, (i - 1) % sp) for i in range(sp)]
        from_left = lax.ppermute(chunk[:, -halo:], "sp", right_perm)
        from_right = lax.ppermute(chunk[:, :halo], "sp", left_perm)
        # global edges see zeros (same as the unsharded zero padding)
        from_left = jnp.where(idx == 0, 0.0, from_left)
        from_right = jnp.where(idx == sp - 1, 0.0, from_right)
        ext = jnp.concatenate([from_left, chunk, from_right], axis=1)

        codes = model._encode_fn(params, ext)
        out = []
        for stage, stage_codes in enumerate(codes):
            stride = model.quantizers[stage].stride
            lo = halo_frames // stride
            n = (shard_len // hop) // stride
            out.append(lax.dynamic_slice_in_dim(stage_codes, lo, n, axis=1))
        return tuple(out)

    codes = encode_shard(params, a)
    # crop the (sp·shard_len)-padded code streams to what the unsharded
    # encode of a ceil(t/unit)·unit padded signal would produce
    t_pad = -(-t // unit) * unit
    return [stage_codes[:, : t_pad // (hop * vq.stride)]
            for stage_codes, vq in zip(codes, model.quantizers)]
