"""Minimal TFRecord + tf.train.Example codec (no TensorFlow dependency).

Reads and writes the reference's per-task gzip tfrecord shards
(/root/reference/data/fss_1000_image_to_tfrecord.py writes Examples with
'image' and 'mask' raw-uint8 bytes features; data/input_fn.py:28-65 parses
them). Implemented directly against the TFRecord framing format
(length-delimited records with masked CRC32C) and the protobuf wire format
for Example/Features/Feature/BytesList, so converted datasets remain
bit-compatible with the reference pipeline.
"""
import gzip
import struct
from typing import Dict, Iterator, List, Sequence, Tuple

import numpy as np

# ---------------------------------------------------------------------------
# CRC32C (Castagnoli), required by the TFRecord framing format.
# ---------------------------------------------------------------------------

_CRC_TABLE = None


def _crc32c_table():
    global _CRC_TABLE
    if _CRC_TABLE is None:
        poly = 0x82F63B78
        table = []
        for i in range(256):
            crc = i
            for _ in range(8):
                crc = (crc >> 1) ^ poly if crc & 1 else crc >> 1
            table.append(crc)
        _CRC_TABLE = table
    return _CRC_TABLE


def crc32c(data: bytes) -> int:
    table = _crc32c_table()
    crc = 0xFFFFFFFF
    for b in data:
        crc = table[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = crc32c(data)
    return ((((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF)


# ---------------------------------------------------------------------------
# Protobuf wire-format primitives (just what Example needs).
# ---------------------------------------------------------------------------

def _encode_varint(value: int) -> bytes:
    out = bytearray()
    while True:
        byte = value & 0x7F
        value >>= 7
        if value:
            out.append(byte | 0x80)
        else:
            out.append(byte)
            return bytes(out)


def _decode_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _tag(field_number: int, wire_type: int) -> bytes:
    return _encode_varint((field_number << 3) | wire_type)


def _length_delimited(field_number: int, payload: bytes) -> bytes:
    return _tag(field_number, 2) + _encode_varint(len(payload)) + payload


def _iter_fields(buf: bytes) -> Iterator[Tuple[int, int, bytes]]:
    """Yield (field_number, wire_type, payload) over a serialized message.
    Only wire types 0 (varint) and 2 (length-delimited) occur in Example."""
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _decode_varint(buf, pos)
        field_number, wire_type = key >> 3, key & 7
        if wire_type == 2:
            length, pos = _decode_varint(buf, pos)
            yield field_number, wire_type, buf[pos:pos + length]
            pos += length
        elif wire_type == 0:
            value, pos = _decode_varint(buf, pos)
            yield field_number, wire_type, value
        elif wire_type == 5:  # 32-bit
            yield field_number, wire_type, buf[pos:pos + 4]
            pos += 4
        elif wire_type == 1:  # 64-bit
            yield field_number, wire_type, buf[pos:pos + 8]
            pos += 8
        else:
            raise ValueError("Unsupported wire type {}".format(wire_type))


def encode_example(features: Dict[str, bytes]) -> bytes:
    """Serialize {name: raw_bytes} into a tf.train.Example with BytesList
    features (the only feature kind the reference shards use)."""
    feature_entries = b""
    for name, value in features.items():
        bytes_list = _length_delimited(1, value)              # BytesList.value
        feature_msg = _length_delimited(1, bytes_list)        # Feature.bytes_list
        entry = (_length_delimited(1, name.encode("utf-8"))   # map key
                 + _length_delimited(2, feature_msg))         # map value
        feature_entries += _length_delimited(1, entry)        # Features.feature
    features_msg = feature_entries
    return _length_delimited(1, features_msg)                 # Example.features


def decode_example(buf: bytes) -> Dict[str, List[bytes]]:
    """Parse a serialized Example into {feature_name: [bytes, ...]}."""
    out: Dict[str, List[bytes]] = {}
    for fnum, wtype, features_msg in _iter_fields(buf):
        if fnum != 1 or wtype != 2:
            continue
        for fnum2, wtype2, entry in _iter_fields(features_msg):
            if fnum2 != 1 or wtype2 != 2:
                continue
            key = None
            values: List[bytes] = []
            for fnum3, wtype3, payload in _iter_fields(entry):
                if fnum3 == 1 and wtype3 == 2:
                    key = payload.decode("utf-8")
                elif fnum3 == 2 and wtype3 == 2:
                    for fnum4, wtype4, feat_payload in _iter_fields(payload):
                        if fnum4 == 1 and wtype4 == 2:  # bytes_list
                            for fnum5, wtype5, val in _iter_fields(feat_payload):
                                if fnum5 == 1 and wtype5 == 2:
                                    values.append(val)
            if key is not None:
                out[key] = values
    return out


# ---------------------------------------------------------------------------
# TFRecord framing.
# ---------------------------------------------------------------------------

def read_tfrecord_file(path: str, gzipped: bool = True) -> List[bytes]:
    """Read all records from a (possibly gzip-compressed) TFRecord file."""
    opener = gzip.open if gzipped else open
    records = []
    with opener(path, "rb") as f:
        data = f.read()
    pos = 0
    n = len(data)
    while pos < n:
        (length,) = struct.unpack("<Q", data[pos:pos + 8])
        pos += 12  # skip length crc
        records.append(data[pos:pos + length])
        pos += length + 4  # skip data crc
    return records


def write_tfrecord_file(path: str, records: Sequence[bytes],
                        gzipped: bool = True) -> None:
    opener = gzip.open if gzipped else open
    with opener(path, "wb") as f:
        for record in records:
            length_bytes = struct.pack("<Q", len(record))
            f.write(length_bytes)
            f.write(struct.pack("<I", _masked_crc(length_bytes)))
            f.write(record)
            f.write(struct.pack("<I", _masked_crc(record)))


# ---------------------------------------------------------------------------
# Segmentation-shard convenience API.
# ---------------------------------------------------------------------------

def read_segmentation_shard(path: str, image_width: int = 224,
                            mask_channels: int = 1
                            ) -> Tuple[np.ndarray, np.ndarray]:
    """Read one reference-format shard -> (images [N,W,W,3] u8, masks u8).

    Masks are [N, W, W] when mask_channels == 1 (per-task meta shards, fg
    encoded as 255) else [N, W, W, mask_channels] (joint shards).
    """
    images, masks = [], []
    for record in read_tfrecord_file(path, gzipped=path.endswith("gzip")):
        feats = decode_example(record)
        img = np.frombuffer(feats["image"][0], np.uint8).reshape(
            image_width, image_width, 3)
        if mask_channels == 1:
            buf = feats["mask"][0]
            # Joint class-index shards store uint16 (little-endian); the
            # per-task meta shards store uint8 — width from byte length.
            dtype = "<u2" if len(buf) == 2 * image_width * image_width \
                else np.uint8
            mask = np.frombuffer(buf, dtype).reshape(
                image_width, image_width)
        else:
            mask = np.frombuffer(feats["mask"][0], np.uint8).reshape(
                image_width, image_width, mask_channels)
        images.append(img)
        masks.append(mask)
    if not images:
        # Zero-record shard: return empty arrays like the native loader
        # (count 0) instead of crashing in np.stack.
        mask_shape = ((0, image_width, image_width) if mask_channels == 1
                      else (0, image_width, image_width, mask_channels))
        return (np.zeros((0, image_width, image_width, 3), np.uint8),
                np.zeros(mask_shape, np.uint8))
    return np.stack(images), np.stack(masks)


def write_segmentation_shard(path: str, images: np.ndarray,
                             masks: np.ndarray) -> None:
    """Write (images u8, masks u8/u16) in the reference shard format.

    uint16 masks are the joint-shard class-index maps: FSS-1000 has 1000
    classes, so ids do not fit uint8 (and numpy>=2 raises OverflowError on
    the cast rather than wrapping). Little-endian on-disk; the reader
    infers the width from the byte length."""
    mask_dtype = np.uint16 if masks.dtype == np.uint16 else np.uint8
    records = []
    for img, mask in zip(images, masks):
        records.append(encode_example({
            "image": np.ascontiguousarray(img, np.uint8).tobytes(),
            "mask": np.ascontiguousarray(
                mask.astype("<u2") if mask_dtype == np.uint16
                else mask, mask_dtype).tobytes(),
        }))
    write_tfrecord_file(path, records, gzipped=True)


def count_examples_in_tfrecords(paths: Sequence[str]) -> int:
    """Parity with utils/util.py:24-32 (but no per-shard session startup)."""
    total = 0
    for path in paths:
        total += len(read_tfrecord_file(path, gzipped=path.endswith("gzip")))
    return total
