// mrijax native IO runtime: parallel NIfTI decode into pinned host buffers.
//
// The reference delegates its data-loader hot path to torch DataLoader
// workers + nibabel's C zlib (SURVEY.md L0/L1). Here the equivalent native
// layer is a small C++ library driven through ctypes
// (mrijax/data/cnifti.py):
//
//   * nifti_probe(path)            -> header fields (shape, dtype, offsets)
//   * nifti_decode(path, out, n)   -> gunzip + parse + cast to float32 with
//                                     scl_slope/inter applied, Fortran order
//                                     preserved (matches the Python reader)
//   * nifti_decode_batch(...)      -> a thread pool decodes many volumes
//                                     concurrently OUTSIDE the GIL — the
//                                     role of torch's worker processes,
//                                     without process boundaries or IPC.
//
// Error handling: functions return 0 on success, negative codes otherwise;
// the Python wrapper maps codes to exceptions. No exceptions cross the ABI.

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#include <zlib.h>

extern "C" {

struct NiftiInfo {
  int32_t ndim;
  int64_t shape[7];
  int32_t datatype;     // NIfTI-1 code
  int32_t bitpix;
  double  scl_slope;
  double  scl_inter;
  int64_t vox_offset;
  int32_t little_endian;
};

enum {
  MRIJAX_OK = 0,
  MRIJAX_EOPEN = -1,
  MRIJAX_EGZIP = -2,
  MRIJAX_EHDR = -3,
  MRIJAX_EDTYPE = -4,
  MRIJAX_ESIZE = -5,
};

}  // extern "C"

namespace {

constexpr size_t kHeaderSize = 348;

// Read a file; transparently gunzip if it has the gzip magic. With
// max_bytes > 0, stop once that many decompressed bytes are available
// (cheap header probe — the whole point of the native probe/decode split).
static int read_payload(const char* path, std::vector<uint8_t>& out,
                        size_t max_bytes = 0) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return MRIJAX_EOPEN;
  std::fseek(f, 0, SEEK_END);
  long fsize = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  size_t to_read = static_cast<size_t>(fsize);
  if (max_bytes > 0) {
    // compressed header bytes never exceed the decompressed size + gzip
    // framing; 64 KiB covers any NIfTI header comfortably
    to_read = std::min<size_t>(to_read, std::max<size_t>(max_bytes * 2, 1 << 16));
  }
  std::vector<uint8_t> raw(to_read);
  size_t got = std::fread(raw.data(), 1, raw.size(), f);
  std::fclose(f);
  if (got != raw.size()) return MRIJAX_EOPEN;

  if (raw.size() >= 2 && raw[0] == 0x1f && raw[1] == 0x8b) {
    // gzip: stream-inflate with growing output (final size unknown upfront)
    z_stream zs;
    std::memset(&zs, 0, sizeof(zs));
    if (inflateInit2(&zs, 16 + MAX_WBITS) != Z_OK) return MRIJAX_EGZIP;
    out.clear();
    out.resize(raw.size() * 4 + (1 << 20));
    zs.next_in = raw.data();
    zs.avail_in = static_cast<uInt>(raw.size());
    size_t written = 0;
    int ret = Z_OK;
    while (ret != Z_STREAM_END) {
      if (max_bytes > 0 && written >= max_bytes) break;  // header probe done
      if (written == out.size()) out.resize(out.size() * 2);
      zs.next_out = out.data() + written;
      zs.avail_out = static_cast<uInt>(out.size() - written);
      ret = inflate(&zs, Z_NO_FLUSH);
      if (ret != Z_OK && ret != Z_STREAM_END) {
        inflateEnd(&zs);
        return MRIJAX_EGZIP;
      }
      written = zs.total_out;
      if (ret == Z_OK && zs.avail_in == 0 && zs.avail_out != 0) {
        // truncated read (header probe of a large file): stop with what we have
        break;
      }
    }
    inflateEnd(&zs);
    out.resize(written);
  } else {
    out = std::move(raw);
  }
  return MRIJAX_OK;
}

static int parse_header(const std::vector<uint8_t>& buf, NiftiInfo* info) {
  if (buf.size() < kHeaderSize) return MRIJAX_EHDR;
  int32_t sizeof_hdr;
  std::memcpy(&sizeof_hdr, buf.data(), 4);
  bool little = (sizeof_hdr == 348);
  bool big = false;
  if (!little) {
    int32_t swapped = __builtin_bswap32(sizeof_hdr);
    if (swapped != 348) return MRIJAX_EHDR;
    big = true;
  }
  const uint8_t* magic = buf.data() + 344;
  if (!((magic[0] == 'n' && (magic[1] == '+' || magic[1] == 'i')))) {
    return MRIJAX_EHDR;
  }
  auto rd16 = [&](size_t off) -> int16_t {
    int16_t v;
    std::memcpy(&v, buf.data() + off, 2);
    return big ? static_cast<int16_t>(__builtin_bswap16(static_cast<uint16_t>(v))) : v;
  };
  auto rd32f = [&](size_t off) -> float {
    uint32_t v;
    std::memcpy(&v, buf.data() + off, 4);
    if (big) v = __builtin_bswap32(v);
    float out;
    std::memcpy(&out, &v, 4);
    return out;
  };
  int16_t dim0 = rd16(40);
  if (dim0 < 1 || dim0 > 7) return MRIJAX_EHDR;
  info->ndim = dim0;
  for (int i = 0; i < 7; ++i) {
    int64_t d = (i < dim0) ? rd16(42 + 2 * i) : 1;
    if (d < 1) return MRIJAX_EHDR;  // corrupt/negative extent
    info->shape[i] = d;
  }
  info->datatype = rd16(70);
  info->bitpix = rd16(72);
  float vox_offset = rd32f(108);
  info->vox_offset = static_cast<int64_t>(vox_offset);
  if (info->vox_offset < static_cast<int64_t>(kHeaderSize)) {
    info->vox_offset = static_cast<int64_t>(kHeaderSize) + 4;
  }
  info->scl_slope = rd32f(112);
  info->scl_inter = rd32f(116);
  info->little_endian = big ? 0 : 1;
  return MRIJAX_OK;
}

template <typename T>
static void cast_to_f32(const uint8_t* src, float* dst, int64_t n, bool swap,
                        float slope, float inter) {
  const T* s = reinterpret_cast<const T*>(src);
  for (int64_t i = 0; i < n; ++i) {
    T v = s[i];
    if (swap && sizeof(T) > 1) {
      if (sizeof(T) == 2) {
        uint16_t u;
        std::memcpy(&u, &v, 2);
        u = __builtin_bswap16(u);
        std::memcpy(&v, &u, 2);
      } else if (sizeof(T) == 4) {
        uint32_t u;
        std::memcpy(&u, &v, 4);
        u = __builtin_bswap32(u);
        std::memcpy(&v, &u, 4);
      } else {
        uint64_t u;
        std::memcpy(&u, &v, 8);
        u = __builtin_bswap64(u);
        std::memcpy(&v, &u, 8);
      }
    }
    dst[i] = static_cast<float>(v) * slope + inter;
  }
}

static int decode_into(const char* path, float* out, int64_t out_elems,
                       NiftiInfo* info_out) {
  std::vector<uint8_t> payload;
  // probe-only calls decompress just past the header
  size_t max_bytes = (out == nullptr) ? kHeaderSize + 8 : 0;
  int rc = read_payload(path, payload, max_bytes);
  if (rc != MRIJAX_OK) return rc;
  NiftiInfo info;
  rc = parse_header(payload, &info);
  if (rc != MRIJAX_OK) return rc;
  int64_t n = 1;
  for (int i = 0; i < info.ndim; ++i) {
    if (info.shape[i] > 0 && n > (INT64_MAX / 2) / info.shape[i]) {
      return MRIJAX_EHDR;  // element-count overflow from corrupt extents
    }
    n *= info.shape[i];
  }
  if (info_out) *info_out = info;
  if (out == nullptr) return MRIJAX_OK;  // probe only
  if (n <= 0 || n != out_elems) return MRIJAX_ESIZE;
  // Bound the voxel region with the DATATYPE's width, not the header's
  // bitpix field — the cast below reads sizeof(T) per element, and a
  // corrupt header with bitpix < width would otherwise pass the size check
  // and overread the payload buffer.
  int64_t elem_size;
  switch (info.datatype) {
    case 2: case 256:             elem_size = 1; break;
    case 4: case 512:             elem_size = 2; break;
    case 8: case 16: case 768:    elem_size = 4; break;
    case 64: case 1024: case 1280: elem_size = 8; break;
    default:                      return MRIJAX_EDTYPE;
  }
  if (info.vox_offset < 0 ||
      static_cast<uint64_t>(info.vox_offset) > payload.size()) {
    return MRIJAX_ESIZE;  // corrupt vox_offset would index out of bounds
  }
  int64_t avail = static_cast<int64_t>(payload.size()) - info.vox_offset;
  if (avail / elem_size < n) return MRIJAX_ESIZE;

  const uint8_t* src = payload.data() + info.vox_offset;
  bool swap = !info.little_endian;
  float slope = (info.scl_slope == 0.0 || info.scl_slope == 1.0)
                    ? 1.0f : static_cast<float>(info.scl_slope);
  float inter = static_cast<float>(info.scl_inter);
  // identity transform fast path keeps the formula v*1+0 == v exactly
  switch (info.datatype) {
    case 2:    cast_to_f32<uint8_t>(src, out, n, swap, slope, inter); break;
    case 4:    cast_to_f32<int16_t>(src, out, n, swap, slope, inter); break;
    case 8:    cast_to_f32<int32_t>(src, out, n, swap, slope, inter); break;
    case 16:   cast_to_f32<float>(src, out, n, swap, slope, inter); break;
    case 64:   cast_to_f32<double>(src, out, n, swap, slope, inter); break;
    case 256:  cast_to_f32<int8_t>(src, out, n, swap, slope, inter); break;
    case 512:  cast_to_f32<uint16_t>(src, out, n, swap, slope, inter); break;
    case 768:  cast_to_f32<uint32_t>(src, out, n, swap, slope, inter); break;
    case 1024: cast_to_f32<int64_t>(src, out, n, swap, slope, inter); break;
    case 1280: cast_to_f32<uint64_t>(src, out, n, swap, slope, inter); break;
    default:   return MRIJAX_EDTYPE;
  }
  return MRIJAX_OK;
}

}  // namespace

extern "C" {

// Header probe: fills *info without decoding voxels.
int nifti_probe(const char* path, NiftiInfo* info) {
  return decode_into(path, nullptr, 0, info);
}

// Decode one volume into out[out_elems] (float32, disk/Fortran element order).
int nifti_decode(const char* path, float* out, int64_t out_elems) {
  return decode_into(path, out, out_elems, nullptr);
}

// Decode `count` volumes concurrently with `num_threads` workers.
// paths: array of C strings; outs: per-volume output pointers;
// elems: per-volume element counts; rcs: per-volume return codes.
// Returns 0 if every decode succeeded, else the first nonzero code.
int nifti_decode_batch(const char** paths, float** outs, const int64_t* elems,
                       int64_t count, int32_t num_threads, int32_t* rcs) {
  if (num_threads < 1) num_threads = 1;
  std::atomic<int64_t> next(0);
  auto worker = [&]() {
    for (;;) {
      int64_t i = next.fetch_add(1);
      if (i >= count) break;
      rcs[i] = nifti_decode(paths[i], outs[i], elems[i]);
    }
  };
  std::vector<std::thread> threads;
  int32_t nt = static_cast<int32_t>(
      std::min<int64_t>(num_threads, count));
  threads.reserve(nt);
  for (int32_t t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  for (int64_t i = 0; i < count; ++i) {
    if (rcs[i] != MRIJAX_OK) return rcs[i];
  }
  return MRIJAX_OK;
}

}  // extern "C"
