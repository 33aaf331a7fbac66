// trajstore — native trajectory / demonstration dataset engine.
//
// Host-side runtime component of quadruped_springs_tpu: an append-only
// binary store for fixed-width float32 rows (demo trajectories recorded by
// the demo wrappers, golden traces for the verification CLI, metric
// streams), with CRC-checked headers and zero-copy mmap reads. Replaces the
// reference's ad-hoc .npy demo files (save_demo_wrapper.py,
// get_demonstration_wrapper.py:29-33) with a runtime that can stream
// appends during rollouts and read back without copying.
//
// C ABI, consumed from Python via ctypes (see
// quadruped_springs_tpu/runtime/trajstore.py).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr uint32_t kMagic = 0x51535453;  // "QSTS"
constexpr uint32_t kVersion = 1;

struct Header {
  uint32_t magic;
  uint32_t version;
  uint32_t cols;
  uint32_t reserved;
  uint64_t rows;
  uint64_t crc;  // FNV-1a over payload, updated on close
};

uint64_t fnv1a(const uint8_t* data, size_t n, uint64_t h = 1469598103934665603ULL) {
  for (size_t i = 0; i < n; ++i) {
    h ^= data[i];
    h *= 1099511628211ULL;
  }
  return h;
}

struct Writer {
  FILE* f = nullptr;
  Header hdr{};
  uint64_t crc = 1469598103934665603ULL;
};

struct Reader {
  int fd = -1;
  size_t map_len = 0;
  void* map = nullptr;
  Header hdr{};
};

}  // namespace

extern "C" {

void* ts_writer_open(const char* path, uint32_t cols) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return nullptr;
  auto* w = new Writer();
  w->f = f;
  w->hdr = Header{kMagic, kVersion, cols, 0, 0, 0};
  if (std::fwrite(&w->hdr, sizeof(Header), 1, f) != 1) {
    std::fclose(f);
    delete w;
    return nullptr;
  }
  return w;
}

int ts_writer_append(void* handle, const float* row) {
  auto* w = static_cast<Writer*>(handle);
  if (!w || !w->f) return -1;
  size_t n = w->hdr.cols;
  if (std::fwrite(row, sizeof(float), n, w->f) != n) return -1;
  w->crc = fnv1a(reinterpret_cast<const uint8_t*>(row), n * sizeof(float), w->crc);
  w->hdr.rows += 1;
  return 0;
}

int ts_writer_append_batch(void* handle, const float* rows, uint64_t n_rows) {
  auto* w = static_cast<Writer*>(handle);
  if (!w || !w->f) return -1;
  size_t n = static_cast<size_t>(w->hdr.cols) * n_rows;
  if (std::fwrite(rows, sizeof(float), n, w->f) != n) return -1;
  w->crc = fnv1a(reinterpret_cast<const uint8_t*>(rows), n * sizeof(float), w->crc);
  w->hdr.rows += n_rows;
  return 0;
}

int ts_writer_close(void* handle) {
  auto* w = static_cast<Writer*>(handle);
  if (!w) return -1;
  int rc = 0;
  if (w->f) {
    w->hdr.crc = w->crc;
    if (std::fseek(w->f, 0, SEEK_SET) != 0 ||
        std::fwrite(&w->hdr, sizeof(Header), 1, w->f) != 1) {
      rc = -1;
    }
    std::fclose(w->f);
  }
  delete w;
  return rc;
}

void* ts_reader_open(const char* path) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0 || static_cast<size_t>(st.st_size) < sizeof(Header)) {
    ::close(fd);
    return nullptr;
  }
  void* map = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  if (map == MAP_FAILED) {
    ::close(fd);
    return nullptr;
  }
  auto* r = new Reader();
  r->fd = fd;
  r->map = map;
  r->map_len = st.st_size;
  std::memcpy(&r->hdr, map, sizeof(Header));
  if (r->hdr.magic != kMagic || r->hdr.version != kVersion) {
    munmap(map, st.st_size);
    ::close(fd);
    delete r;
    return nullptr;
  }
  size_t want = sizeof(Header) +
      sizeof(float) * static_cast<size_t>(r->hdr.cols) * r->hdr.rows;
  if (r->map_len < want) {
    munmap(map, st.st_size);
    ::close(fd);
    delete r;
    return nullptr;
  }
  return r;
}

uint64_t ts_reader_rows(void* handle) {
  return handle ? static_cast<Reader*>(handle)->hdr.rows : 0;
}

uint32_t ts_reader_cols(void* handle) {
  return handle ? static_cast<Reader*>(handle)->hdr.cols : 0;
}

const float* ts_reader_data(void* handle) {
  if (!handle) return nullptr;
  auto* r = static_cast<Reader*>(handle);
  return reinterpret_cast<const float*>(
      static_cast<const uint8_t*>(r->map) + sizeof(Header));
}

// 1 if CRC matches, 0 mismatch, -1 error.
int ts_reader_verify(void* handle) {
  if (!handle) return -1;
  auto* r = static_cast<Reader*>(handle);
  size_t n = sizeof(float) * static_cast<size_t>(r->hdr.cols) * r->hdr.rows;
  uint64_t crc = fnv1a(
      static_cast<const uint8_t*>(r->map) + sizeof(Header), n);
  return crc == r->hdr.crc ? 1 : 0;
}

int ts_reader_close(void* handle) {
  auto* r = static_cast<Reader*>(handle);
  if (!r) return -1;
  if (r->map) munmap(r->map, r->map_len);
  if (r->fd >= 0) ::close(r->fd);
  delete r;
  return 0;
}

}  // extern "C"
