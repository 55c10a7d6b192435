// Native shard loader for the episodic data path.
//
// Decodes the reference-format gzip TFRecord shards (length-delimited
// records with masked CRC32C framing; tf.train.Example protos holding
// 'image'/'mask' raw-uint8 BytesList features) directly into caller-provided
// buffers, with a thread pool across shards. This is the framework's native
// runtime component for dataset ingest: loading all 1000 FSS-1000 shards
// through the pure-Python codec costs tens of seconds of gzip+proto work;
// this path does it in C++ with one memcpy per example.
//
// Exposed as a C ABI for ctypes (no pybind11 in this environment):
//   tl_count_examples(path)                    -> number of records, or < 0
//   tl_read_shard(path, img_buf, msk_buf, ...) -> examples written, or < 0
//   tl_read_shards_parallel(...)               -> shards read, or < 0
//
// Error codes: -1 open/read failure, -2 gzip failure, -3 malformed framing,
// -4 malformed proto, -5 example larger than provided buffer stride.

#include <zlib.h>

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// Gzip whole-file inflation.
// ---------------------------------------------------------------------------

bool InflateFile(const char* path, std::vector<uint8_t>* out) {
  gzFile f = gzopen(path, "rb");
  if (f == nullptr) return false;
  out->clear();
  uint8_t chunk[1 << 16];
  int n;
  while ((n = gzread(f, chunk, sizeof(chunk))) > 0) {
    out->insert(out->end(), chunk, chunk + n);
  }
  bool ok = (n == 0);
  gzclose(f);
  return ok;
}

bool LooksGzipped(const std::string& path) {
  FILE* f = fopen(path.c_str(), "rb");
  if (f == nullptr) return false;
  unsigned char magic[2] = {0, 0};
  size_t got = fread(magic, 1, 2, f);
  fclose(f);
  return got == 2 && magic[0] == 0x1f && magic[1] == 0x8b;
}

bool ReadRawFile(const char* path, std::vector<uint8_t>* out) {
  FILE* f = fopen(path, "rb");
  if (f == nullptr) return false;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  out->resize(size);
  bool ok = fread(out->data(), 1, size, f) == static_cast<size_t>(size);
  fclose(f);
  return ok;
}

// ---------------------------------------------------------------------------
// TFRecord framing: [u64 length][u32 len_crc][payload][u32 data_crc].
// CRCs are not verified (the Python codec is the strict path).
// ---------------------------------------------------------------------------

struct Record {
  const uint8_t* data;
  size_t size;
};

bool SplitRecords(const std::vector<uint8_t>& buf,
                  std::vector<Record>* records) {
  size_t pos = 0;
  const size_t n = buf.size();
  while (pos < n) {
    if (pos + 12 > n) return false;
    uint64_t length;
    std::memcpy(&length, buf.data() + pos, 8);
    pos += 12;
    // Overflow-safe bound: a corrupt length near UINT64_MAX must fail the
    // framing check, not wrap `pos + length + 4` around size_t and read
    // out of bounds.
    if (length > n - pos || n - pos - length < 4) return false;
    records->push_back({buf.data() + pos, static_cast<size_t>(length)});
    pos += length + 4;
  }
  return true;
}

// ---------------------------------------------------------------------------
// Minimal protobuf wire parsing for Example{Features{feature map}}.
// ---------------------------------------------------------------------------

bool ReadVarint(const uint8_t* buf, size_t size, size_t* pos, uint64_t* out) {
  uint64_t result = 0;
  int shift = 0;
  while (*pos < size) {
    uint8_t b = buf[(*pos)++];
    result |= static_cast<uint64_t>(b & 0x7F) << shift;
    if (!(b & 0x80)) {
      *out = result;
      return true;
    }
    shift += 7;
    if (shift > 63) return false;
  }
  return false;
}

struct Field {
  uint32_t number;
  uint32_t wire_type;
  const uint8_t* data;  // for wire type 2
  size_t size;
  uint64_t varint;  // for wire type 0
};

bool NextField(const uint8_t* buf, size_t size, size_t* pos, Field* field) {
  uint64_t key;
  if (!ReadVarint(buf, size, pos, &key)) return false;
  field->number = static_cast<uint32_t>(key >> 3);
  field->wire_type = static_cast<uint32_t>(key & 7);
  switch (field->wire_type) {
    case 0:
      return ReadVarint(buf, size, pos, &field->varint);
    case 2: {
      uint64_t length;
      if (!ReadVarint(buf, size, pos, &length)) return false;
      if (*pos + length > size) return false;
      field->data = buf + *pos;
      field->size = length;
      *pos += length;
      return true;
    }
    case 5:
      if (*pos + 4 > size) return false;
      *pos += 4;
      return true;
    case 1:
      if (*pos + 8 > size) return false;
      *pos += 8;
      return true;
    default:
      return false;
  }
}

// Extract the first BytesList value of features named "image" and "mask".
bool ParseExample(const Record& record, Record* image, Record* mask) {
  image->data = mask->data = nullptr;
  size_t pos = 0;
  Field f;
  while (pos < record.size) {
    if (!NextField(record.data, record.size, &pos, &f)) return false;
    if (f.number != 1 || f.wire_type != 2) continue;  // Example.features
    size_t fpos = 0;
    Field entry;
    while (fpos < f.size) {
      if (!NextField(f.data, f.size, &fpos, &entry)) return false;
      if (entry.number != 1 || entry.wire_type != 2) continue;  // map entry
      size_t epos = 0;
      Field kv;
      std::string key;
      Record value{nullptr, 0};
      while (epos < entry.size) {
        if (!NextField(entry.data, entry.size, &epos, &kv)) return false;
        if (kv.number == 1 && kv.wire_type == 2) {
          key.assign(reinterpret_cast<const char*>(kv.data), kv.size);
        } else if (kv.number == 2 && kv.wire_type == 2) {
          // Feature -> bytes_list (field 1) -> value (field 1)
          size_t vpos = 0;
          Field feat;
          while (vpos < kv.size) {
            if (!NextField(kv.data, kv.size, &vpos, &feat)) return false;
            if (feat.number != 1 || feat.wire_type != 2) continue;
            size_t bpos = 0;
            Field bytes_val;
            while (bpos < feat.size) {
              if (!NextField(feat.data, feat.size, &bpos, &bytes_val)) {
                return false;
              }
              if (bytes_val.number == 1 && bytes_val.wire_type == 2 &&
                  value.data == nullptr) {
                value = {bytes_val.data, bytes_val.size};
              }
            }
          }
        }
      }
      if (key == "image") {
        *image = value;
      } else if (key == "mask") {
        *mask = value;
      }
    }
  }
  return image->data != nullptr && mask->data != nullptr;
}

int ReadShardInternal(const char* path, uint8_t* image_out, uint8_t* mask_out,
                      int64_t max_examples, int64_t image_bytes,
                      int64_t mask_bytes) {
  std::vector<uint8_t> buf;
  if (LooksGzipped(path)) {
    if (!InflateFile(path, &buf)) return -2;
  } else {
    if (!ReadRawFile(path, &buf)) return -1;
  }
  std::vector<Record> records;
  if (!SplitRecords(buf, &records)) return -3;
  int64_t count = 0;
  for (const Record& record : records) {
    if (count >= max_examples) break;
    Record image, mask;
    if (!ParseExample(record, &image, &mask)) return -4;
    if (static_cast<int64_t>(image.size) != image_bytes ||
        static_cast<int64_t>(mask.size) != mask_bytes) {
      return -5;
    }
    std::memcpy(image_out + count * image_bytes, image.data, image.size);
    std::memcpy(mask_out + count * mask_bytes, mask.data, mask.size);
    ++count;
  }
  return static_cast<int>(count);
}

// ---------------------------------------------------------------------------
// Shard WRITER: tf.train.Example encoding + TFRecord framing with masked
// CRC32C (the reference's TF readers verify CRCs, so the writer computes
// them even though this library's reader skips verification).
// ---------------------------------------------------------------------------

uint32_t Crc32c(const uint8_t* data, size_t size) {
  static uint32_t table[256];
  static bool init = false;
  if (!init) {
    for (uint32_t i = 0; i < 256; ++i) {
      uint32_t crc = i;
      for (int k = 0; k < 8; ++k) {
        crc = (crc & 1) ? (crc >> 1) ^ 0x82F63B78u : crc >> 1;
      }
      table[i] = crc;
    }
    init = true;
  }
  uint32_t crc = 0xFFFFFFFFu;
  for (size_t i = 0; i < size; ++i) {
    crc = table[(crc ^ data[i]) & 0xFF] ^ (crc >> 8);
  }
  return crc ^ 0xFFFFFFFFu;
}

uint32_t MaskedCrc(const uint8_t* data, size_t size) {
  uint32_t crc = Crc32c(data, size);
  return ((crc >> 15) | (crc << 17)) + 0xA282EAD8u;
}

void AppendVarint(std::vector<uint8_t>* out, uint64_t value) {
  while (true) {
    uint8_t byte = value & 0x7F;
    value >>= 7;
    if (value) {
      out->push_back(byte | 0x80);
    } else {
      out->push_back(byte);
      return;
    }
  }
}

void AppendTag(std::vector<uint8_t>* out, uint32_t field, uint32_t wire) {
  AppendVarint(out, (field << 3) | wire);
}

void AppendLengthDelimited(std::vector<uint8_t>* out, uint32_t field,
                           const uint8_t* data, size_t size) {
  AppendTag(out, field, 2);
  AppendVarint(out, size);
  out->insert(out->end(), data, data + size);
}

size_t VarintSize(uint64_t value) {
  size_t n = 1;
  while (value >= 0x80) {
    value >>= 7;
    ++n;
  }
  return n;
}

// One named BytesList feature map entry: Features.feature { key, value }.
void AppendFeatureEntry(std::vector<uint8_t>* out, const char* name,
                        const uint8_t* data, size_t size) {
  size_t name_len = std::strlen(name);
  // Sizes inside-out: BytesList.value -> Feature.bytes_list -> map value.
  size_t bytes_list = 1 + VarintSize(size) + size;
  size_t feature = 1 + VarintSize(bytes_list) + bytes_list;
  size_t entry = (1 + VarintSize(name_len) + name_len) +
                 (1 + VarintSize(feature) + feature);
  AppendTag(out, 1, 2);  // Features.feature (map entry)
  AppendVarint(out, entry);
  AppendLengthDelimited(out, 1, reinterpret_cast<const uint8_t*>(name),
                        name_len);                       // key
  AppendTag(out, 2, 2);                                  // value: Feature
  AppendVarint(out, feature);
  AppendTag(out, 1, 2);                                  // Feature.bytes_list
  AppendVarint(out, bytes_list);
  AppendLengthDelimited(out, 1, data, size);             // BytesList.value
}

// Example{features{image, mask}} in the Python codec's field order.
void EncodeExample(const uint8_t* image, size_t image_bytes,
                   const uint8_t* mask, size_t mask_bytes,
                   std::vector<uint8_t>* out) {
  std::vector<uint8_t> features;
  AppendFeatureEntry(&features, "image", image, image_bytes);
  AppendFeatureEntry(&features, "mask", mask, mask_bytes);
  out->clear();
  AppendLengthDelimited(out, 1, features.data(), features.size());
}

int WriteShardInternal(const char* path, const uint8_t* image_in,
                       const uint8_t* mask_in, int64_t count,
                       int64_t image_bytes, int64_t mask_bytes) {
  std::vector<uint8_t> framed;
  std::vector<uint8_t> record;
  for (int64_t i = 0; i < count; ++i) {
    EncodeExample(image_in + i * image_bytes, image_bytes,
                  mask_in + i * mask_bytes, mask_bytes, &record);
    uint8_t header[12];
    uint64_t length = record.size();
    std::memcpy(header, &length, 8);
    uint32_t len_crc = MaskedCrc(header, 8);
    std::memcpy(header + 8, &len_crc, 4);
    framed.insert(framed.end(), header, header + 12);
    framed.insert(framed.end(), record.begin(), record.end());
    uint32_t data_crc = MaskedCrc(record.data(), record.size());
    uint8_t footer[4];
    std::memcpy(footer, &data_crc, 4);
    framed.insert(framed.end(), footer, footer + 4);
  }
  gzFile f = gzopen(path, "wb");
  if (f == nullptr) return -1;
  size_t written = 0;
  while (written < framed.size()) {
    unsigned chunk = static_cast<unsigned>(
        std::min<size_t>(framed.size() - written, 1u << 28));
    int n = gzwrite(f, framed.data() + written, chunk);
    if (n <= 0) {
      gzclose(f);
      return -2;
    }
    written += n;
  }
  return gzclose(f) == Z_OK ? static_cast<int>(count) : -2;
}

}  // namespace

extern "C" {

int tl_count_examples(const char* path) {
  std::vector<uint8_t> buf;
  if (LooksGzipped(path)) {
    if (!InflateFile(path, &buf)) return -2;
  } else {
    if (!ReadRawFile(path, &buf)) return -1;
  }
  std::vector<Record> records;
  if (!SplitRecords(buf, &records)) return -3;
  return static_cast<int>(records.size());
}

int tl_read_shard(const char* path, uint8_t* image_out, uint8_t* mask_out,
                  int64_t max_examples, int64_t image_bytes,
                  int64_t mask_bytes) {
  return ReadShardInternal(path, image_out, mask_out, max_examples,
                           image_bytes, mask_bytes);
}

// Reads shard i into image_out + i*max_examples*image_bytes (same for
// masks); counts_out[i] receives the per-shard example count or an error
// code. Returns the number of shards successfully read.
int tl_read_shards_parallel(const char** paths, int num_shards,
                            uint8_t* image_out, uint8_t* mask_out,
                            int32_t* counts_out, int64_t max_examples,
                            int64_t image_bytes, int64_t mask_bytes,
                            int num_threads) {
  if (num_threads < 1) num_threads = 1;
  std::vector<std::thread> workers;
  std::vector<int> results(num_shards, 0);
  int per_thread = (num_shards + num_threads - 1) / num_threads;
  for (int t = 0; t < num_threads; ++t) {
    int begin = t * per_thread;
    int end = begin + per_thread < num_shards ? begin + per_thread
                                              : num_shards;
    if (begin >= end) break;
    workers.emplace_back([=, &results]() {
      for (int i = begin; i < end; ++i) {
        results[i] = ReadShardInternal(
            paths[i], image_out + static_cast<int64_t>(i) * max_examples *
                                      image_bytes,
            mask_out + static_cast<int64_t>(i) * max_examples * mask_bytes,
            max_examples, image_bytes, mask_bytes);
      }
    });
  }
  for (std::thread& w : workers) w.join();
  int ok = 0;
  for (int i = 0; i < num_shards; ++i) {
    counts_out[i] = results[i];
    if (results[i] >= 0) ++ok;
  }
  return ok;
}

// Writes `count` (image, mask) pairs as a gzip TFRecord shard of
// tf.train.Examples. Returns examples written, or < 0 on error.
int tl_write_shard(const char* path, const uint8_t* image_in,
                   const uint8_t* mask_in, int64_t count,
                   int64_t image_bytes, int64_t mask_bytes) {
  return WriteShardInternal(path, image_in, mask_in, count, image_bytes,
                            mask_bytes);
}

// Writes shard i from image_in + offsets_in[i]*image_bytes with
// counts_in[i] examples; results_out[i] receives the per-shard result.
// Returns the number of shards successfully written.
int tl_write_shards_parallel(const char** paths, int num_shards,
                             const uint8_t* image_in, const uint8_t* mask_in,
                             const int64_t* offsets_in,
                             const int32_t* counts_in, int64_t image_bytes,
                             int64_t mask_bytes, int32_t* results_out,
                             int num_threads) {
  if (num_threads < 1) num_threads = 1;
  std::vector<std::thread> workers;
  std::vector<int> results(num_shards, 0);
  int per_thread = (num_shards + num_threads - 1) / num_threads;
  for (int t = 0; t < num_threads; ++t) {
    int begin = t * per_thread;
    int end = begin + per_thread < num_shards ? begin + per_thread
                                              : num_shards;
    if (begin >= end) break;
    workers.emplace_back([=, &results]() {
      for (int i = begin; i < end; ++i) {
        results[i] = WriteShardInternal(
            paths[i], image_in + offsets_in[i] * image_bytes,
            mask_in + offsets_in[i] * mask_bytes, counts_in[i], image_bytes,
            mask_bytes);
      }
    });
  }
  for (std::thread& w : workers) w.join();
  int ok = 0;
  for (int i = 0; i < num_shards; ++i) {
    results_out[i] = results[i];
    if (results[i] >= 0) ++ok;
  }
  return ok;
}

}  // extern "C"
