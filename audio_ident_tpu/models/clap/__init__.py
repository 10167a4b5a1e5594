"""CLAP audio tower (HTSAT Swin encoder) in pure functional JAX.

Replaces the reference's in-process PyTorch CLAP inference (reference:
audio-ident-service/app/audio/embedding.py:62-194; model loaded at startup,
app/main.py:93-122) with a JAX/XLA implementation built for batched
device execution: the reference embeds chunks ONE AT A TIME in a thread
executor (its ingest bottleneck, SURVEY.md §3.2); here all chunks of a
track embed in one batched forward on the MXU.

Weights port mechanically from any HuggingFace CLAP checkpoint
(non-fusion HTSAT variants, e.g. laion/larger_clap_music_and_speech) via
``port.convert_torch_state_dict``; parity vs the torch implementation is
tested on randomly-initialized small configs (no checkpoint download is
possible in this environment).
"""

from audio_ident_tpu.models.clap.features import log_mel_features
from audio_ident_tpu.models.clap.htsat import (
    ClapAudioConfig,
    audio_embed,
    config_from_hf,
)
from audio_ident_tpu.models.clap.port import (
    convert_torch_state_dict,
    init_random_params,
)

__all__ = [
    "ClapAudioConfig",
    "audio_embed",
    "config_from_hf",
    "convert_torch_state_dict",
    "init_random_params",
    "log_mel_features",
]
