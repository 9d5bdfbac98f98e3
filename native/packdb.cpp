// packdb — memory-mapped packed patch database + threaded batch sampler.
//
// Native replacement for the reference's LMDB patch pipeline
// (datasets/DenoisingDatasets.py:21-99): fixed-size paired (noisy, gt)
// uint8 records in one mmap'd file, sampled by a C++ thread pool that
// performs the random crop + dihedral augmentation and writes directly
// into caller-provided NHWC buffers.  No per-item Python, no pickling,
// no worker processes — the host side of the input pipeline becomes a
// single ctypes call per batch.
//
// File layout (little endian):
//   magic   "VPK1"            (4 bytes)
//   u32     num_records
//   u32     rec_h, rec_w, rec_c
//   u32     paired            (1 = noisy+gt pairs, 0 = single images)
//   payload: records, each (paired+1) * h*w*c bytes, noisy first.

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct PackDB {
  int fd = -1;
  const uint8_t* base = nullptr;
  size_t mapped_size = 0;
  uint32_t num_records = 0;
  uint32_t h = 0, w = 0, c = 0;
  uint32_t paired = 0;
  const uint8_t* payload = nullptr;
};

constexpr char kMagic[4] = {'V', 'P', 'K', '1'};

// splitmix64 — deterministic per-(seed, index) stream
static inline uint64_t splitmix64(uint64_t x) {
  x += 0x9E3779B97F4A7C15ull;
  x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9ull;
  x = (x ^ (x >> 27)) * 0x94D049BB133111EBull;
  return x ^ (x >> 31);
}

struct Rng {
  uint64_t state;
  explicit Rng(uint64_t seed) : state(seed) {}
  uint64_t next() {
    state = splitmix64(state);
    return state;
  }
  // unbiased-enough bounded draw for dataset sampling
  uint32_t below(uint32_t n) { return static_cast<uint32_t>(next() % n); }
};

// Dihedral modes matching the python host convention (ops/augment.py
// dihedral_np): np.rot90 is counter-clockwise; modes 1/3/5/7 add flipud.
// For a crop of size p x p: out(i, j) = in(si, sj) per mode.
static inline void aug_index(int mode, int p, int i, int j, int* si,
                             int* sj) {
  int r = mode / 2;          // 0: none, 1: rot90ccw, 2: rot180, 3: rot270ccw
  bool flip = mode % 2;      // flip up-down AFTER rotation
  int ii = flip ? (p - 1 - i) : i;
  switch (r) {
    case 0: *si = ii;          *sj = j;           break;
    case 1: *si = j;           *sj = p - 1 - ii;  break;  // rot90 ccw
    case 2: *si = p - 1 - ii;  *sj = p - 1 - j;   break;  // rot180
    default: *si = p - 1 - j;  *sj = ii;          break;  // rot270 ccw
  }
}

static void crop_aug(const uint8_t* src, int src_h, int src_w, int c,
                     int i0, int j0, int p, int mode, uint8_t* dst) {
  for (int i = 0; i < p; ++i) {
    for (int j = 0; j < p; ++j) {
      int si, sj;
      aug_index(mode, p, i, j, &si, &sj);
      const uint8_t* s = src + (static_cast<size_t>(i0 + si) * src_w +
                                (j0 + sj)) * c;
      uint8_t* d = dst + (static_cast<size_t>(i) * p + j) * c;
      std::memcpy(d, s, c);
    }
  }
}

}  // namespace

extern "C" {

void* packdb_open(const char* path) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0 || st.st_size < 24) {
    ::close(fd);
    return nullptr;
  }
  void* mapped = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  if (mapped == MAP_FAILED) {
    ::close(fd);
    return nullptr;
  }
  const uint8_t* base = static_cast<const uint8_t*>(mapped);
  if (std::memcmp(base, kMagic, 4) != 0) {
    munmap(mapped, st.st_size);
    ::close(fd);
    return nullptr;
  }
  auto* db = new PackDB();
  db->fd = fd;
  db->base = base;
  db->mapped_size = st.st_size;
  uint32_t header[5];
  std::memcpy(header, base + 4, sizeof(header));
  db->num_records = header[0];
  db->h = header[1];
  db->w = header[2];
  db->c = header[3];
  db->paired = header[4];
  db->payload = base + 24;
  size_t rec_bytes = static_cast<size_t>(db->h) * db->w * db->c *
                     (db->paired ? 2 : 1);
  if (24 + rec_bytes * db->num_records > static_cast<size_t>(st.st_size)) {
    munmap(mapped, st.st_size);
    ::close(fd);
    delete db;
    return nullptr;
  }
  return db;
}

void packdb_close(void* handle) {
  auto* db = static_cast<PackDB*>(handle);
  if (db == nullptr) return;
  munmap(const_cast<uint8_t*>(db->base), db->mapped_size);
  ::close(db->fd);
  delete db;
}

int packdb_num_records(void* handle) {
  return static_cast<PackDB*>(handle)->num_records;
}

void packdb_shape(void* handle, int* h, int* w, int* c, int* paired) {
  auto* db = static_cast<PackDB*>(handle);
  *h = db->h;
  *w = db->w;
  *c = db->c;
  *paired = db->paired;
}

// Sample `count` random patches of size p x p with dihedral augmentation.
// out_a receives the first plane (noisy), out_b the second (gt) when the
// db is paired (may be null otherwise).  Deterministic in (seed).
int packdb_sample(void* handle, int count, int p, uint64_t seed,
                  uint8_t* out_a, uint8_t* out_b, int num_threads) {
  auto* db = static_cast<PackDB*>(handle);
  if (db == nullptr || p > static_cast<int>(db->h) ||
      p > static_cast<int>(db->w))
    return -1;
  if (db->paired && out_b == nullptr) return -2;

  const size_t plane = static_cast<size_t>(db->h) * db->w * db->c;
  const size_t rec_bytes = plane * (db->paired ? 2 : 1);
  const size_t patch_bytes = static_cast<size_t>(p) * p * db->c;

  if (num_threads <= 0)
    num_threads = std::min<unsigned>(std::thread::hardware_concurrency(), 16);
  num_threads = std::max(1, std::min(num_threads, count));

  std::atomic<int> next(0);
  auto worker = [&]() {
    for (int b = next.fetch_add(1); b < count; b = next.fetch_add(1)) {
      Rng rng(splitmix64(seed ^ (0xA5A5A5A5ull + b)));
      uint32_t rec = rng.below(db->num_records);
      int i0 = rng.below(db->h - p + 1);
      int j0 = rng.below(db->w - p + 1);
      int mode = rng.below(8);
      const uint8_t* rec_ptr = db->payload + rec_bytes * rec;
      crop_aug(rec_ptr, db->h, db->w, db->c, i0, j0, p, mode,
               out_a + patch_bytes * b);
      if (db->paired) {
        crop_aug(rec_ptr + plane, db->h, db->w, db->c, i0, j0, p, mode,
                 out_b + patch_bytes * b);
      }
    }
  };
  std::vector<std::thread> threads;
  for (int t = 0; t < num_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return 0;
}

}  // extern "C"
