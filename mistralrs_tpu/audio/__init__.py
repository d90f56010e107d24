"""Audio utilities — the analog of the reference's `speech_models/dac.rs`
vocoder and `speech_models/utils.rs` WAV output."""

from .dac import DacDecoderConfig, dac_decode_codes, dac_params_from_state_dict  # noqa: F401
from .wav import write_wav  # noqa: F401
