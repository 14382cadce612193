from .encdec import CodecEncoderDecoder, EncoderDecoder

__all__ = ["EncoderDecoder", "CodecEncoderDecoder"]
