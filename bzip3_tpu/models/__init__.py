"""Block codec pipelines ("models" of the framework).

The flagship model is the BZ3v1 block codec: RLE -> LZP -> BWT -> CM,
with stage selection bits recorded in the block header.
"""

from .block_codec import Bz3Codec, encode_block, decode_block

__all__ = ["Bz3Codec", "encode_block", "decode_block"]
