from .stft import stft, istft, spectrogram, frame, overlap_add, hann, num_frames
from .mel import mel_spectrogram, mel_matrix, hz_to_mel, mel_to_hz
from .resample import resample, resample_length

__all__ = [
    "stft", "istft", "spectrogram", "frame", "overlap_add", "hann", "num_frames",
    "mel_spectrogram", "mel_matrix", "hz_to_mel", "mel_to_hz",
    "resample", "resample_length",
]
