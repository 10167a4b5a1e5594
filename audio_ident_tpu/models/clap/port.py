"""Torch CLAP checkpoint -> JAX params conversion.

Mechanical, auditable mapping from a HuggingFace
``ClapAudioModelWithProjection`` (or full ``ClapModel``) ``state_dict`` to
the nested dict tree ``htsat.audio_embed`` consumes:
- Linear weights transpose [out,in] -> [in,out];
- the patch-embed Conv2d transposes OIHW -> HWIO;
- batch-norm running stats ride along for inference;
- buffers (relative_position_index) are dropped — precomputed host-side.

Reference lineage: the torch model this ports from is the reference's
in-process CLAP (reference: app/audio/embedding.py:40-59, model
``laion/larger_clap_music_and_speech``).  No checkpoint download exists in
this environment, so ``init_random_params`` builds a randomly-initialized
torch twin for parity tests and benches.
"""

from __future__ import annotations

import numpy as np

from audio_ident_tpu.models.clap.htsat import ClapAudioConfig


def _lin(sd, prefix) -> dict:
    return {
        "w": np.ascontiguousarray(sd[f"{prefix}.weight"].T),
        "b": np.asarray(sd[f"{prefix}.bias"]),
    }


def _ln(sd, prefix) -> dict:
    return {"w": np.asarray(sd[f"{prefix}.weight"]), "b": np.asarray(sd[f"{prefix}.bias"])}


def convert_torch_state_dict(state_dict, config: ClapAudioConfig) -> dict:
    """state_dict (tensors or ndarrays) -> nested JAX params dict."""
    sd = {k: np.asarray(getattr(v, "detach", lambda: v)().cpu() if hasattr(v, "cpu") else v)
          for k, v in state_dict.items()}
    # tolerate both ClapModel ("audio_model.audio_encoder.") and
    # ClapAudioModelWithProjection ("audio_model.audio_encoder.") prefixes
    enc_p = "audio_model.audio_encoder"

    encoder: dict = {
        "batch_norm": {
            "w": sd[f"{enc_p}.batch_norm.weight"],
            "b": sd[f"{enc_p}.batch_norm.bias"],
            "mean": sd[f"{enc_p}.batch_norm.running_mean"],
            "var": sd[f"{enc_p}.batch_norm.running_var"],
        },
        "patch_embed": {
            "proj": {
                # OIHW -> HWIO
                "w": np.ascontiguousarray(
                    sd[f"{enc_p}.patch_embed.proj.weight"].transpose(2, 3, 1, 0)
                ),
                "b": sd[f"{enc_p}.patch_embed.proj.bias"],
            },
            "norm": _ln(sd, f"{enc_p}.patch_embed.norm"),
        },
        "norm": _ln(sd, f"{enc_p}.norm"),
        "layers": [],
    }

    for s in range(len(config.depths)):
        sp = f"{enc_p}.layers.{s}"
        blocks = []
        for b in range(config.depths[s]):
            bp = f"{sp}.blocks.{b}"
            blocks.append(
                {
                    "layernorm_before": _ln(sd, f"{bp}.layernorm_before"),
                    "layernorm_after": _ln(sd, f"{bp}.layernorm_after"),
                    "attention": {
                        "self": {
                            "query": _lin(sd, f"{bp}.attention.self.query"),
                            "key": _lin(sd, f"{bp}.attention.self.key"),
                            "value": _lin(sd, f"{bp}.attention.self.value"),
                            "relative_position_bias_table": sd[
                                f"{bp}.attention.self.relative_position_bias_table"
                            ],
                        },
                        "output": {"dense": _lin(sd, f"{bp}.attention.output.dense")},
                    },
                    "intermediate": {"dense": _lin(sd, f"{bp}.intermediate.dense")},
                    "output2": {"dense": _lin(sd, f"{bp}.output.dense")},
                }
            )
        stage: dict = {"blocks": blocks}
        if f"{sp}.downsample.reduction.weight" in sd:
            stage["downsample"] = {
                "norm": _ln(sd, f"{sp}.downsample.norm"),
                "reduction": {
                    "w": np.ascontiguousarray(sd[f"{sp}.downsample.reduction.weight"].T)
                },
            }
        encoder["layers"].append(stage)

    return {
        "audio_encoder": encoder,
        "audio_projection": {
            "linear1": _lin(sd, "audio_projection.linear1"),
            "linear2": _lin(sd, "audio_projection.linear2"),
        },
    }


def load_checkpoint(path: str, config: ClapAudioConfig) -> dict:
    """Load a torch checkpoint file (.pt/.bin) and convert."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    return convert_torch_state_dict(sd, config)


def init_random_params(config: ClapAudioConfig, seed: int = 0):
    """(params, torch_model) — randomly-initialized twin pair for tests."""
    import torch
    from transformers import ClapAudioConfig as HFAudioConfig
    from transformers.models.clap.modeling_clap import ClapAudioModelWithProjection

    hf = HFAudioConfig(
        spec_size=config.spec_size,
        patch_size=config.patch_size,
        patch_stride=[config.patch_stride, config.patch_stride],
        num_mel_bins=config.num_mel_bins,
        window_size=config.window_size,
        depths=list(config.depths),
        num_attention_heads=list(config.num_heads),
        patch_embeds_hidden_size=config.patch_embeds_hidden_size,
        hidden_size=config.hidden_size,
        projection_dim=config.projection_dim,
        enable_fusion=False,
    )
    torch.manual_seed(seed)
    model = ClapAudioModelWithProjection(hf).eval()
    # randomize batch-norm stats so parity covers them
    with torch.no_grad():
        bn = model.audio_model.audio_encoder.batch_norm
        bn.running_mean.normal_(0, 1)
        bn.running_var.uniform_(0.5, 2.0)
    params = convert_torch_state_dict(model.state_dict(), config)
    return params, model
