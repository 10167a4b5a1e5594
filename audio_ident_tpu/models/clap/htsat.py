"""HTSAT (hierarchical Swin audio transformer) forward pass in pure JAX.

Numerically mirrors the HuggingFace CLAP audio tower
(``ClapAudioModelWithProjection``) at inference: batch-norm over mel bins,
bicubic time interpolation + the freq-ratio channel reshape, 4x4 patch
embedding, 4 Swin stages (window attention with relative position bias,
cyclic-shift masks, patch merging), final norm + grouped pooling, and the
2-layer projection head with L2 normalization.  Everything branchy in the
torch code (window/shift selection, masks, interpolation) is precomputed
host-side per config, so the device program is pure static-shape
matmul/reshape — MXU-friendly by construction.

Params are nested dicts converted 1:1 from a torch ``state_dict`` (see
port.py); parity is asserted in tests against randomly-initialized torch
models (cosine ~ 1.0).

Replaces reference: app/audio/embedding.py:62-98 (torch inference path).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

HIGHEST = jax.lax.Precision.HIGHEST


@dataclass(frozen=True)
class ClapAudioConfig:
    spec_size: int = 256
    patch_size: int = 4
    patch_stride: int = 4
    num_mel_bins: int = 64
    window_size: int = 8
    depths: tuple[int, ...] = (2, 2, 6, 2)
    num_heads: tuple[int, ...] = (4, 8, 16, 32)
    patch_embeds_hidden_size: int = 96
    hidden_size: int = 768  # == patch_embeds_hidden_size * 2**(n_stages-1)
    projection_dim: int = 512
    layer_norm_eps: float = 1e-5
    bn_eps: float = 1e-5
    # fast=True runs the tower in bf16 (native MXU pass; layernorm/softmax
    # kept in f32).  f32 inputs with Precision.HIGHEST were measured ~20x
    # slower on v5e (multi-pass emulation).  Parity tests use fast=False;
    # production embedding uses fast=True (cosine shift ~1e-3, far below
    # the 0.60 vibe threshold's sensitivity).
    fast: bool = False

    @property
    def freq_ratio(self) -> int:
        return self.spec_size // self.num_mel_bins

    @property
    def grid(self) -> int:
        return self.spec_size // self.patch_stride

    def resolution(self, stage: int) -> int:
        return self.grid // (2**stage)


def config_from_hf(hf_audio_config) -> ClapAudioConfig:
    """Build from a transformers ClapAudioConfig (non-fusion only)."""
    if getattr(hf_audio_config, "enable_fusion", False):
        raise NotImplementedError(
            "fusion CLAP variants are not supported; the reference's model "
            "(larger_clap_music_and_speech) is non-fusion"
        )
    return ClapAudioConfig(
        spec_size=hf_audio_config.spec_size,
        patch_size=hf_audio_config.patch_size,
        patch_stride=hf_audio_config.patch_stride[0]
        if isinstance(hf_audio_config.patch_stride, (list, tuple))
        else hf_audio_config.patch_stride,
        num_mel_bins=hf_audio_config.num_mel_bins,
        window_size=hf_audio_config.window_size,
        depths=tuple(hf_audio_config.depths),
        num_heads=tuple(hf_audio_config.num_attention_heads),
        patch_embeds_hidden_size=hf_audio_config.patch_embeds_hidden_size,
        hidden_size=hf_audio_config.hidden_size,
        projection_dim=hf_audio_config.projection_dim,
        layer_norm_eps=hf_audio_config.layer_norm_eps,
    )


# ---------------------------------------------------------------------------
# Host-side precomputed constants
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=8)
def _bicubic_matrix(in_len: int, out_len: int) -> np.ndarray:
    """[out_len, in_len] matrix for 1-D bicubic align_corners=True interp
    (torch's cubic kernel, A=-0.75, replicate-clamped borders) — turns the
    torch ``F.interpolate`` call into one MXU matmul."""
    a = -0.75
    m = np.zeros((out_len, in_len), dtype=np.float64)
    if out_len == 1:
        m[0, 0] = 1.0
        return m.astype(np.float32)
    scale = (in_len - 1) / (out_len - 1)
    for j in range(out_len):
        src = j * scale
        f = int(np.floor(src))
        t = src - f

        def w(x):  # Keys cubic kernel
            x = abs(x)
            if x <= 1:
                return (a + 2) * x**3 - (a + 3) * x**2 + 1
            if x < 2:
                return a * x**3 - 5 * a * x**2 + 8 * a * x - 4 * a
            return 0.0

        for k in range(-1, 3):
            idx = min(max(f + k, 0), in_len - 1)
            m[j, idx] += w(t - k)
    return m.astype(np.float32)


@functools.lru_cache(maxsize=8)
def _relative_position_index(window: int) -> np.ndarray:
    """[window^2, window^2] gather indices into the rel-pos bias table."""
    coords = np.stack(
        np.meshgrid(np.arange(window), np.arange(window), indexing="ij")
    ).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += window - 1
    rel[:, :, 1] += window - 1
    rel[:, :, 0] *= 2 * window - 1
    return rel.sum(-1).astype(np.int32)


@functools.lru_cache(maxsize=32)
def _shift_attn_mask(resolution: int, window: int, shift: int) -> np.ndarray | None:
    """[n_windows, window^2, window^2] additive mask (0 / -100) for SW-MSA."""
    if shift <= 0:
        return None
    img = np.zeros((resolution, resolution), dtype=np.int32)
    slices = (
        slice(0, -window),
        slice(-window, -shift),
        slice(-shift, None),
    )
    count = 0
    for hs in slices:
        for ws in slices:
            img[hs, ws] = count
            count += 1
    nw = resolution // window
    wins = (
        img.reshape(nw, window, nw, window).transpose(0, 2, 1, 3).reshape(-1, window * window)
    )
    diff = wins[:, None, :] - wins[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------


def _linear(p, x):
    return jnp.dot(x, p["w"], precision=HIGHEST) + p["b"]


def _layernorm(p, x, eps):
    dt = x.dtype
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = ((x32 - mu) ** 2).mean(-1, keepdims=True)
    out = (x32 - mu) / jnp.sqrt(var + eps) * p["w"].astype(jnp.float32) + p[
        "b"
    ].astype(jnp.float32)
    return out.astype(dt)


def _window_partition(x, window):
    b, h, w, c = x.shape
    x = x.reshape(b, h // window, window, w // window, window, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window * window, c)


def _window_reverse(wins, window, h, w):
    b = wins.shape[0] // ((h // window) * (w // window))
    x = wins.reshape(b, h // window, w // window, window, window, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


def _window_attention(p, x, num_heads, window, mask, eps):
    """x: [nB, N, C] windows; mask: [n_windows, N, N] or None."""
    nb, n, c = x.shape
    head = c // num_heads

    def proj(name):
        return (
            _linear(p["self"][name], x).reshape(nb, n, num_heads, head).transpose(0, 2, 1, 3)
        )

    q, k, v = proj("query"), proj("key"), proj("value")
    scores = jnp.einsum(
        "bhnd,bhmd->bhnm", q, k, precision=HIGHEST,
        preferred_element_type=jnp.float32,
    ) / jnp.sqrt(jnp.float32(head))
    idx = jnp.asarray(_relative_position_index(window).reshape(-1))
    bias = p["self"]["relative_position_bias_table"][idx].reshape(n, n, num_heads)
    scores = scores + bias.transpose(2, 0, 1)[None].astype(jnp.float32)
    if mask is not None:
        nw = mask.shape[0]
        scores = scores.reshape(nb // nw, nw, num_heads, n, n) + mask[None, :, None]
        scores = scores.reshape(nb, num_heads, n, n)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    ctx = jnp.einsum("bhnm,bhmd->bhnd", probs, v, precision=HIGHEST)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(nb, n, c)
    return _linear(p["output"]["dense"], ctx)


def _swin_block(p, x, resolution, num_heads, window, shift, eps):
    """x: [B, H*W, C] -> same shape.  Static window/shift per call site."""
    b, hw, c = x.shape
    shortcut = x
    x = _layernorm(p["layernorm_before"], x, eps)
    x = x.reshape(b, resolution, resolution, c)
    if shift > 0:
        x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
    wins = _window_partition(x, window)
    mask_np = _shift_attn_mask(resolution, window, shift)
    mask = jnp.asarray(mask_np) if mask_np is not None else None
    wins = _window_attention(p["attention"], wins, num_heads, window, mask, eps)
    x = _window_reverse(wins.reshape(-1, window, window, c), window, resolution, resolution)
    if shift > 0:
        x = jnp.roll(x, (shift, shift), axis=(1, 2))
    x = shortcut + x.reshape(b, hw, c)

    y = _layernorm(p["layernorm_after"], x, eps)
    y = jax.nn.gelu(_linear(p["intermediate"]["dense"], y), approximate=False)
    return x + _linear(p["output2"]["dense"], y)


def _patch_merge(p, x, resolution, eps):
    b, _, c = x.shape
    x = x.reshape(b, resolution, resolution, c)
    x = jnp.concatenate(
        [x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2], x[:, 1::2, 1::2]],
        axis=-1,
    ).reshape(b, -1, 4 * c)
    x = _layernorm(p["norm"], x, eps)
    return jnp.dot(x, p["reduction"]["w"], precision=HIGHEST)  # no bias


# ---------------------------------------------------------------------------
# Full forward
# ---------------------------------------------------------------------------


def audio_embed(params, config: ClapAudioConfig, mel: jnp.ndarray) -> jnp.ndarray:
    """[B, T, num_mel_bins] log-mel dB -> [B, projection_dim] unit-norm.

    Mirrors ClapModel.get_audio_features for non-fusion inputs.
    """
    enc = params["audio_encoder"]
    eps = config.layer_norm_eps
    b, t_in, n_mel = mel.shape
    assert n_mel == config.num_mel_bins

    # batch_norm over mel bins (inference: running stats)
    bn = enc["batch_norm"]
    x = (mel - bn["mean"]) / jnp.sqrt(bn["var"] + config.bn_eps) * bn["w"] + bn["b"]

    # reshape_mel2img: bicubic time interp (align_corners) as one matmul,
    # then the freq-ratio channel trick
    r = config.freq_ratio
    spec_width = config.spec_size * r  # target time length
    if t_in != spec_width:
        interp = jnp.asarray(_bicubic_matrix(t_in, spec_width))
        x = jnp.einsum("ot,btf->bof", interp, x, precision=HIGHEST)
    # [B, T, F] -> [B, r, T//r, F] -> [B, r, F, T//r] -> [B, F*r, T//r]
    x = x.reshape(b, r, spec_width // r, config.num_mel_bins)
    x = x.transpose(0, 1, 3, 2)
    x = x.reshape(b, config.spec_size, spec_width // r)

    if config.fast:  # bf16 tower: native single-pass MXU
        x = x.astype(jnp.bfloat16)
        enc = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if hasattr(a, "dtype") and a.dtype == jnp.float32
            else a,
            enc,
        )

    # patch embed: conv k=4 s=4 (NHWC/HWIO), flatten, LN
    pe = enc["patch_embed"]
    x = jax.lax.conv_general_dilated(
        x[..., None],
        pe["proj"]["w"],
        window_strides=(config.patch_stride, config.patch_stride),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=HIGHEST,
    ) + pe["proj"]["b"]
    g = config.grid
    x = x.reshape(b, g * g, config.patch_embeds_hidden_size)
    x = _layernorm(pe["norm"], x, eps)

    # Swin stages
    n_stages = len(config.depths)
    for s in range(n_stages):
        stage = enc["layers"][s]
        res = config.resolution(s)
        window = min(config.window_size, res)
        heads = config.num_heads[s]
        for blk_i in range(config.depths[s]):
            shift = 0 if blk_i % 2 == 0 else config.window_size // 2
            if res <= config.window_size:
                shift = 0  # torch: no partition when window >= resolution
            x = _swin_block(
                stage["blocks"][blk_i], x, res, heads, window, shift, eps
            )
        if s < n_stages - 1:
            x = _patch_merge(stage["downsample"], x, res, eps)

    x = _layernorm(enc["norm"], x, eps)  # [B, tokens, C]

    # grouped pooling (freq-bin regroup then global average = plain mean)
    latent = x.astype(jnp.float32).mean(axis=1)

    # projection head + L2 normalize (f32 for a stable unit norm)
    proj = params["audio_projection"]
    y = _linear(proj["linear1"], latent)
    y = jax.nn.relu(y)
    y = _linear(proj["linear2"], y)
    return y / jnp.linalg.norm(y, axis=-1, keepdims=True)
