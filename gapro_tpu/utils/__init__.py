from .rle import rle_decode, rle_encode, rle_encode_batch

__all__ = ["rle_encode", "rle_decode", "rle_encode_batch"]
