"""Bitstream container helpers.

Format parity with reference cbench/utils/bytes_ops.py: length-prefixed
segment concatenation (little-endian struct codes B/H/I/L), with the final
segment's length omitted when the segment count is known; 8/16-bit shape
headers.
"""

from __future__ import annotations

import struct
from typing import List, Sequence, Tuple

_LEN_FORMAT = {1: "B", 2: "H", 4: "I", 8: "L"}


def merge_bytes(data: List[bytes], num_bytes_length: int = 4,
                num_segments: int | None = None) -> bytes:
    fmt = _LEN_FORMAT[num_bytes_length]
    parts = []
    for i, bs in enumerate(data):
        if num_segments is not None:
            if i >= num_segments:
                raise ValueError(f"more than {num_segments} segments")
            if i < num_segments - 1:
                parts.append(struct.pack(fmt, len(bs)))
        else:
            parts.append(struct.pack(fmt, len(bs)))
        parts.append(bs)
    return b"".join(parts)


def split_merged_bytes(data: bytes, num_bytes_length: int = 4,
                       num_segments: int | None = None) -> List[bytes]:
    fmt = _LEN_FORMAT[num_bytes_length]
    out: List[bytes] = []
    pos = 0
    n = len(data)
    while pos < n:
        if num_segments is not None and len(out) >= num_segments - 1:
            out.append(data[pos:])
            pos = n
        else:
            (length,) = struct.unpack(fmt, data[pos:pos + num_bytes_length])
            pos += num_bytes_length
            out.append(data[pos:pos + length])
            pos += length
    if num_segments is not None:
        out.extend(b"" for _ in range(num_segments - len(out)))
    return out


def encode_shape(shape: Sequence[int]) -> bytes:
    if len(shape) >= (1 << 8):
        raise ValueError("too many dims")
    parts = [struct.pack("B", len(shape))]
    for dim in shape:
        if dim >= (1 << 16):
            raise ValueError("dim too large for u16 shape header")
        parts.append(struct.pack("<H", dim))
    return b"".join(parts)


def decode_shape(byte_string: bytes) -> Tuple[List[int], int]:
    ndim = struct.unpack("B", byte_string[:1])[0]
    shape = []
    ptr = 1
    for _ in range(ndim):
        shape.append(struct.unpack("<H", byte_string[ptr:ptr + 2])[0])
        ptr += 2
    return shape, ptr
