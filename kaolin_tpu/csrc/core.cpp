// Native host-side preprocessing for kaolin_tpu.
//
// TPU-native counterpart of the reference's C++/Cython host layer: the
// compute path is JAX/XLA/Pallas, but scene preprocessing (parsing large
// OBJ files, building octree byte streams from morton codes) is
// CPU-bound, so it runs natively. Exposed as a plain C ABI consumed via
// ctypes (kaolin_tpu/native.py), with pure-Python fallbacks when the
// library is unavailable.

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// OBJ parsing: two-pass (count, then fill). Handles 'v x y z' and
// 'f a[/..] b[/..] c[/..] ...' lines; faces are triangulated with a fan,
// negative indices resolved relative to the current vertex count.
// Returns 0 on success.
// ---------------------------------------------------------------------------

int obj_count(const char* path, int64_t* num_vertices, int64_t* num_tris) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;
  char line[8192];
  int64_t nv = 0, nt = 0;
  while (fgets(line, sizeof(line), f)) {
    if (line[0] == 'v' && (line[1] == ' ' || line[1] == '\t')) {
      nv++;
    } else if (line[0] == 'f' && (line[1] == ' ' || line[1] == '\t')) {
      // count face corners
      int corners = 0;
      char* p = line + 1;
      while (*p) {
        while (*p == ' ' || *p == '\t') p++;
        if (*p == '\0' || *p == '\n' || *p == '\r') break;
        corners++;
        while (*p && *p != ' ' && *p != '\t' && *p != '\n' && *p != '\r')
          p++;
      }
      if (corners >= 3) nt += corners - 2;
    }
  }
  fclose(f);
  *num_vertices = nv;
  *num_tris = nt;
  return 0;
}

int obj_parse(const char* path, float* vertices, int64_t* faces,
              int64_t* face_sizes_homogeneous) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;
  char line[8192];
  int64_t vi = 0, fi = 0;
  int64_t seen_vertices = 0;
  int homogeneous = 1;
  int first_size = -1;
  std::vector<int64_t> corner_buf;
  while (fgets(line, sizeof(line), f)) {
    if (line[0] == 'v' && (line[1] == ' ' || line[1] == '\t')) {
      float x, y, z;
      if (sscanf(line + 1, "%f %f %f", &x, &y, &z) == 3) {
        vertices[vi * 3 + 0] = x;
        vertices[vi * 3 + 1] = y;
        vertices[vi * 3 + 2] = z;
        vi++;
        seen_vertices++;
      }
    } else if (line[0] == 'f' && (line[1] == ' ' || line[1] == '\t')) {
      corner_buf.clear();
      char* p = line + 1;
      while (*p) {
        while (*p == ' ' || *p == '\t') p++;
        if (*p == '\0' || *p == '\n' || *p == '\r') break;
        long idx = strtol(p, &p, 10);
        if (idx < 0) idx = seen_vertices + idx + 1;
        corner_buf.push_back(idx - 1);
        while (*p && *p != ' ' && *p != '\t' && *p != '\n' && *p != '\r')
          p++;
      }
      int sz = (int)corner_buf.size();
      if (sz >= 3) {
        if (first_size < 0) first_size = sz;
        else if (sz != first_size) homogeneous = 0;
        for (int c = 1; c + 1 < sz; c++) {
          faces[fi * 3 + 0] = corner_buf[0];
          faces[fi * 3 + 1] = corner_buf[c];
          faces[fi * 3 + 2] = corner_buf[c + 1];
          fi++;
        }
      }
    }
  }
  fclose(f);
  *face_sizes_homogeneous = homogeneous ? first_size : -1;
  return 0;
}

// ---------------------------------------------------------------------------
// Morton codes (x<<2 | y<<1 | z interleave, matching spc_math.h)
// ---------------------------------------------------------------------------

static inline uint64_t spread3(uint64_t v) {
  v &= 0xFFFF;
  v = (v | (v << 16)) & 0x0000FF0000FFull;
  v = (v | (v << 8)) & 0x00F00F00F00Full;
  v = (v | (v << 4)) & 0x0C30C30C30C3ull;
  v = (v | (v << 2)) & 0x249249249249ull;
  return v;
}

static inline uint64_t compact3(uint64_t v) {
  v &= 0x249249249249ull;
  v = (v | (v >> 2)) & 0x0C30C30C30C3ull;
  v = (v | (v >> 4)) & 0x00F00F00F00Full;
  v = (v | (v >> 8)) & 0x0000FF0000FFull;
  v = (v | (v >> 16)) & 0xFFFFull;
  return v;
}

void points_to_morton(const int16_t* points, int64_t n, int64_t* morton) {
  for (int64_t i = 0; i < n; i++) {
    morton[i] = (int64_t)((spread3((uint64_t)(uint16_t)points[i * 3]) << 2)
                          | (spread3((uint64_t)(uint16_t)points[i * 3 + 1])
                             << 1)
                          | spread3((uint64_t)(uint16_t)points[i * 3 + 2]));
  }
}

void morton_to_points(const int64_t* morton, int64_t n, int16_t* points) {
  for (int64_t i = 0; i < n; i++) {
    uint64_t m = (uint64_t)morton[i];
    points[i * 3] = (int16_t)compact3(m >> 2);
    points[i * 3 + 1] = (int16_t)compact3(m >> 1);
    points[i * 3 + 2] = (int16_t)compact3(m);
  }
}

// ---------------------------------------------------------------------------
// Octree build: sorts + dedups morton codes, then builds the
// breadth-first byte stream bottom-up (matching
// kaolin/csrc/ops/spc/point_utils_cuda.cu points_to_octree semantics).
// Returns the total byte count, or -1 if out_capacity is too small.
// ---------------------------------------------------------------------------

int64_t points_to_octree(const int16_t* points, int64_t n, int level,
                         uint8_t* out, int64_t out_capacity) {
  std::vector<uint64_t> morton(n);
  for (int64_t i = 0; i < n; i++) {
    morton[i] = (spread3((uint64_t)(uint16_t)points[i * 3]) << 2)
        | (spread3((uint64_t)(uint16_t)points[i * 3 + 1]) << 1)
        | spread3((uint64_t)(uint16_t)points[i * 3 + 2]);
  }
  std::sort(morton.begin(), morton.end());
  morton.erase(std::unique(morton.begin(), morton.end()), morton.end());

  std::vector<std::vector<uint8_t>> levels(level);
  std::vector<uint64_t> cur(morton);
  for (int l = level; l > 0; l--) {
    std::vector<uint8_t>& bytes = levels[l - 1];
    std::vector<uint64_t> parents;
    parents.reserve(cur.size());
    uint64_t prev_parent = ~0ull;
    for (uint64_t m : cur) {
      uint64_t parent = m >> 3;
      int child = (int)(m & 7);
      if (parent != prev_parent) {
        parents.push_back(parent);
        bytes.push_back(0);
        prev_parent = parent;
      }
      bytes.back() |= (uint8_t)(1 << child);
    }
    cur.swap(parents);
  }
  int64_t total = 0;
  for (int l = 0; l < level; l++) total += (int64_t)levels[l].size();
  if (total > out_capacity) return -1;
  int64_t off = 0;
  for (int l = 0; l < level; l++) {
    memcpy(out + off, levels[l].data(), levels[l].size());
    off += (int64_t)levels[l].size();
  }
  return total;
}

}  // extern "C"
