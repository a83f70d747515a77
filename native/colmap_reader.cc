// Native COLMAP binary sparse-model parser.
//
// The framework's data layer parses COLMAP's cameras.bin / images.bin /
// points3D.bin. The pure-Python reader (data/colmap.py) walks the records
// with struct.unpack — fine for test fixtures, seconds-slow on real scenes
// (T&T truck: ~130k points with full tracks). This parser mmaps the file and
// walks it in one pass; the Python side wraps it with ctypes and copies the
// results into numpy arrays (data/native_loader.py).
//
// Capability parity target: /root/reference/gsplat/read_write_model.py
// (read_cameras_binary :99, read_images_binary :134, read_points3D 184-233);
// format per the public COLMAP binary spec. Independent implementation.
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct Cursor {
  const uint8_t* p;
  const uint8_t* end;
  bool ok = true;

  template <typename T>
  T read() {
    if (p + sizeof(T) > end) {
      ok = false;
      return T{};
    }
    T v;
    std::memcpy(&v, p, sizeof(T));  // unaligned-safe
    p += sizeof(T);
    return v;
  }
  void skip(int64_t n) {
    if (p + n > end) {
      ok = false;
      return;
    }
    p += n;
  }
};

struct Mapped {
  const uint8_t* data = nullptr;
  size_t size = 0;
  int fd = -1;

  bool open(const char* path) {
    fd = ::open(path, O_RDONLY);
    if (fd < 0) return false;
    struct stat st;
    if (fstat(fd, &st) != 0) return false;
    size = static_cast<size_t>(st.st_size);
    data = static_cast<const uint8_t*>(
        mmap(nullptr, size, PROT_READ, MAP_PRIVATE, fd, 0));
    return data != MAP_FAILED;
  }
  ~Mapped() {
    if (data && data != MAP_FAILED) munmap(const_cast<uint8_t*>(data), size);
    if (fd >= 0) close(fd);
  }
};

// camera model id -> parameter count (COLMAP's model table)
int model_params(int model_id) {
  static const int kParams[] = {3, 4, 4, 5, 8, 8, 12, 5, 4, 5, 12};
  if (model_id < 0 || model_id > 10) return -1;
  return kParams[model_id];
}

// Sanity-bound a record count read from the file: a corrupt/truncated header
// must not drive multi-TB allocations. Every record occupies at least
// `min_record` bytes, so n > payload/min_record is provably bogus.
bool count_plausible(uint64_t n, size_t file_size, size_t min_record) {
  return n <= (file_size / min_record) + 1;
}

}  // namespace

extern "C" {

// points3D.bin -> xyz [n,3] f64, rgb [n,3] u8, error [n] f64.
// Caller provides no buffers; we allocate with new[] and the caller frees
// via egs_free. Returns n, or -1 on error.
int64_t egs_read_points3d(const char* path, double** xyz_out, uint8_t** rgb_out,
                          double** err_out) {
  Mapped m;
  if (!m.open(path)) return -1;
  Cursor c{m.data, m.data + m.size};
  const uint64_t n = c.read<uint64_t>();
  // min record: 8 id + 24 xyz + 3 rgb + 8 err + 8 track_len = 51 bytes
  if (!c.ok || !count_plausible(n, m.size, 51)) return -1;

  double* xyz = static_cast<double*>(malloc((n * 3) * sizeof(double)));
  uint8_t* rgb = static_cast<uint8_t*>(malloc(n * 3));
  double* err = static_cast<double*>(malloc((n) * sizeof(double)));
  if (!xyz || !rgb || !err) {
    free(xyz);
    free(rgb);
    free(err);
    return -1;
  }
  for (uint64_t i = 0; i < n; ++i) {
    c.skip(8);  // point3D_id
    xyz[i * 3 + 0] = c.read<double>();
    xyz[i * 3 + 1] = c.read<double>();
    xyz[i * 3 + 2] = c.read<double>();
    rgb[i * 3 + 0] = c.read<uint8_t>();
    rgb[i * 3 + 1] = c.read<uint8_t>();
    rgb[i * 3 + 2] = c.read<uint8_t>();
    err[i] = c.read<double>();
    const uint64_t track = c.read<uint64_t>();
    c.skip(static_cast<int64_t>(track) * 8);
    if (!c.ok) {
      free(xyz);
      free(rgb);
      free(err);
      return -1;
    }
  }
  *xyz_out = xyz;
  *rgb_out = rgb;
  *err_out = err;
  return static_cast<int64_t>(n);
}

// images.bin -> ids [n], camera_ids [n], qvecs [n,4], tvecs [n,3],
// names (nul-separated blob of total length *names_len).
int64_t egs_read_images(const char* path, int32_t** ids_out,
                        int32_t** cam_ids_out, double** qvecs_out,
                        double** tvecs_out, char** names_out,
                        int64_t* names_len_out) {
  Mapped m;
  if (!m.open(path)) return -1;
  Cursor c{m.data, m.data + m.size};
  const uint64_t n = c.read<uint64_t>();
  // min record: 4 id + 32 qvec + 24 tvec + 4 cam + 1 nul + 8 npoints = 73
  if (!c.ok || !count_plausible(n, m.size, 73)) return -1;

  int32_t* ids = static_cast<int32_t*>(malloc((n) * sizeof(int32_t)));
  int32_t* cams = static_cast<int32_t*>(malloc((n) * sizeof(int32_t)));
  double* qvecs = static_cast<double*>(malloc((n * 4) * sizeof(double)));
  double* tvecs = static_cast<double*>(malloc((n * 3) * sizeof(double)));
  // name chars + per-record nul both come out of the file's bytes, so
  // m.size + n bounds the blob even for adversarial inputs
  char* names = static_cast<char*>(malloc(m.size + n));
  if (!ids || !cams || !qvecs || !tvecs || !names) {
    free(ids);
    free(cams);
    free(qvecs);
    free(tvecs);
    free(names);
    return -1;
  }
  int64_t npos = 0;

  for (uint64_t i = 0; i < n; ++i) {
    ids[i] = c.read<int32_t>();
    for (int j = 0; j < 4; ++j) qvecs[i * 4 + j] = c.read<double>();
    for (int j = 0; j < 3; ++j) tvecs[i * 3 + j] = c.read<double>();
    cams[i] = c.read<int32_t>();
    while (c.ok && c.p < c.end && *c.p != 0) names[npos++] = *c.p++;
    c.skip(1);  // nul
    names[npos++] = '\0';
    const uint64_t np2d = c.read<uint64_t>();
    c.skip(static_cast<int64_t>(np2d) * 24);  // x f8, y f8, p3d id i8
    if (!c.ok) {
      free(ids);
      free(cams);
      free(qvecs);
      free(tvecs);
      free(names);
      return -1;
    }
  }
  *ids_out = ids;
  *cam_ids_out = cams;
  *qvecs_out = qvecs;
  *tvecs_out = tvecs;
  *names_out = names;
  *names_len_out = npos;
  return static_cast<int64_t>(n);
}

// cameras.bin -> ids [n], model_ids [n], widths [n], heights [n],
// params [n,12] (zero-padded), param_counts [n].
int64_t egs_read_cameras(const char* path, int32_t** ids_out,
                         int32_t** models_out, int64_t** widths_out,
                         int64_t** heights_out, double** params_out,
                         int32_t** n_params_out) {
  Mapped m;
  if (!m.open(path)) return -1;
  Cursor c{m.data, m.data + m.size};
  const uint64_t n = c.read<uint64_t>();
  // min record: 4 id + 4 model + 8 w + 8 h + 3*8 params = 48 bytes
  if (!c.ok || !count_plausible(n, m.size, 48)) return -1;

  int32_t* ids = static_cast<int32_t*>(malloc((n) * sizeof(int32_t)));
  int32_t* models = static_cast<int32_t*>(malloc((n) * sizeof(int32_t)));
  int64_t* widths = static_cast<int64_t*>(malloc((n) * sizeof(int64_t)));
  int64_t* heights = static_cast<int64_t*>(malloc((n) * sizeof(int64_t)));
  double* params = static_cast<double*>(calloc(n * 12, sizeof(double)));
  int32_t* counts = static_cast<int32_t*>(malloc((n) * sizeof(int32_t)));
  if (!ids || !models || !widths || !heights || !params || !counts) {
    free(ids);
    free(models);
    free(widths);
    free(heights);
    free(params);
    free(counts);
    return -1;
  }

  for (uint64_t i = 0; i < n; ++i) {
    ids[i] = c.read<int32_t>();
    models[i] = c.read<int32_t>();
    widths[i] = static_cast<int64_t>(c.read<uint64_t>());
    heights[i] = static_cast<int64_t>(c.read<uint64_t>());
    const int np = model_params(models[i]);
    if (np < 0 || !c.ok) {
      free(ids);
      free(models);
      free(widths);
      free(heights);
      free(params);
      free(counts);
      return -1;
    }
    counts[i] = np;
    for (int j = 0; j < np; ++j) params[i * 12 + j] = c.read<double>();
  }
  *ids_out = ids;
  *models_out = models;
  *widths_out = widths;
  *heights_out = heights;
  *params_out = params;
  *n_params_out = counts;
  return static_cast<int64_t>(n);
}

void egs_free(void* p) { free(p); }

}  // extern "C"
