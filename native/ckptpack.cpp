// Native checkpoint pack for object_intrinsics_tpu.
//
// The reference checkpoints through torch.save (C++ pickling under the
// hood, src/utils/checkpoint.py:36-48). This is the TPU-framework analog:
// a flat tensor pack with a JSON index, written atomically (tmp + fsync +
// rename) streaming tensors straight from their buffers (no Python-side
// payload assembly),
// and read back zero-copy via mmap. Exposed through a C ABI and loaded from
// Python with ctypes (object_intrinsics_tpu/utils/ckpt_native.py); the
// portable .npz path remains the default format.
//
// Layout:  "OIPK1\n" | u64 header_len | header JSON | payload
// Each tensor's payload slice starts at a 64-byte-aligned offset recorded
// in the header (offsets are relative to payload start).
//
// Build: make -C native   (part of libdataio target set)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {
constexpr char kMagic[6] = {'O', 'I', 'P', 'K', '1', '\n'};
constexpr size_t kAlign = 64;

bool write_all(int fd, const void* buf, size_t n) {
  const char* p = static_cast<const char*>(buf);
  while (n > 0) {
    ssize_t w = ::write(fd, p, n);
    if (w < 0) return false;
    p += w;
    n -= static_cast<size_t>(w);
  }
  return true;
}
}  // namespace

extern "C" {

// Atomically write a checkpoint pack.
//   path:     destination file
//   header:   JSON index bytes (offsets must match the alignment rule below)
//   tensors:  n pointers; sizes: n byte counts. Tensor i is padded so that
//             its payload offset is 64-aligned (same rule the Python side
//             uses to precompute offsets).
// Returns 0 on success, negative errno-style codes on failure.
int ckptpack_write(const char* path, const char* header, uint64_t header_len,
                   int n, const void** tensors, const uint64_t* sizes) {
  std::string tmp = std::string(path) + ".tmp";
  int fd = ::open(tmp.c_str(), O_WRONLY | O_CREAT | O_TRUNC, 0644);
  if (fd < 0) return -1;

  static const char zeros[kAlign] = {0};
  bool ok = write_all(fd, kMagic, sizeof(kMagic)) &&
            write_all(fd, &header_len, sizeof(header_len)) &&
            write_all(fd, header, header_len);
  uint64_t off = 0;  // within payload
  for (int i = 0; ok && i < n; ++i) {
    uint64_t aligned = (off + kAlign - 1) / kAlign * kAlign;
    if (aligned > off) ok = write_all(fd, zeros, aligned - off);
    off = aligned;
    ok = ok && write_all(fd, tensors[i], sizes[i]);
    off += sizes[i];
  }
  ok = ok && ::fsync(fd) == 0;
  ok = (::close(fd) == 0) && ok;
  if (!ok) {
    ::unlink(tmp.c_str());
    return -2;
  }
  if (::rename(tmp.c_str(), path) != 0) {
    ::unlink(tmp.c_str());
    return -3;
  }
  return 0;
}

// Map a pack read-only. Outputs the mapping base/length, the header's
// offset/length within it, and the payload offset. Returns 0 on success.
int ckptpack_map(const char* path, void** base, uint64_t* map_len,
                 uint64_t* header_off, uint64_t* header_len, uint64_t* payload_off) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return -1;
  struct stat st;
  if (::fstat(fd, &st) != 0 || st.st_size < (off_t)(sizeof(kMagic) + 8)) {
    ::close(fd);
    return -2;
  }
  void* p = ::mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  ::close(fd);  // mapping keeps the file alive
  if (p == MAP_FAILED) return -3;
  const char* c = static_cast<const char*>(p);
  if (std::memcmp(c, kMagic, sizeof(kMagic)) != 0) {
    ::munmap(p, st.st_size);
    return -4;
  }
  uint64_t hlen;
  std::memcpy(&hlen, c + sizeof(kMagic), sizeof(hlen));
  if (sizeof(kMagic) + 8 + hlen > (uint64_t)st.st_size) {
    ::munmap(p, st.st_size);
    return -5;
  }
  *base = p;
  *map_len = st.st_size;
  *header_off = sizeof(kMagic) + 8;
  *header_len = hlen;
  *payload_off = sizeof(kMagic) + 8 + hlen;
  return 0;
}

void ckptpack_unmap(void* base, uint64_t map_len) { ::munmap(base, map_len); }

}  // extern "C"
