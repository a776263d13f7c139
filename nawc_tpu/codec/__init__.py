from .model import SnacCodec, Encoder, Decoder, ResidualVQ, VQLevel
from .api import CodecState, make_codec, codec_apply

__all__ = [
    "SnacCodec", "Encoder", "Decoder", "ResidualVQ", "VQLevel",
    "CodecState", "make_codec", "codec_apply",
]
