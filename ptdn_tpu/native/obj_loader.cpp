// Native OBJ loader — the tinyobjloader role (reference
// src/tinyobjloader/*, used by Scene::loadMesh, scene.cpp:241) as a small
// C++ parser with the same subset semantics as the Python loader
// (scene/objloader.py): v/vn/vt/f records, n-gon fan triangulation,
// 1-based and missing indices. Byte-identical output to the Python loader
// (tests assert this). C ABI for ctypes; two-phase (parse+query, fill).

#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Mesh {
  std::vector<float> positions;   // 3 per vertex
  std::vector<float> normals;
  std::vector<float> texcoords;   // 2 per vertex
  std::vector<int32_t> pos_idx;   // 3 per triangle
  std::vector<int32_t> nrm_idx;
  std::vector<int32_t> uv_idx;
};

Mesh *g_mesh = nullptr;

void parse_corner(const char *tok, int32_t out[3]) {
  // "v", "v/vt", "v//vn", "v/vt/vn" -> 0-based, -1 where absent
  int32_t vals[3] = {0, 0, 0};
  int field = 0;
  const char *p = tok;
  bool any = false;
  while (*p && field < 3) {
    if (*p == '/') {
      field++;
      p++;
      continue;
    }
    char *end;
    vals[field] = int32_t(strtol(p, &end, 10));
    p = end;
    any = true;
  }
  (void)any;
  out[0] = vals[0] - 1;
  out[1] = vals[1] - 1;
  out[2] = vals[2] - 1;
}

}  // namespace

extern "C" {

// Parse the file; returns 0 on success. Query sizes with ptdn_obj_counts,
// copy out with ptdn_obj_fill, release with ptdn_obj_free.
int ptdn_obj_parse(const char *path) {
  FILE *f = fopen(path, "r");
  if (!f) return 1;
  delete g_mesh;
  g_mesh = new Mesh();
  Mesh &m = *g_mesh;

  char line[8192];
  std::vector<int32_t> corners;  // 3 ints per corner for current face
  while (fgets(line, sizeof(line), f)) {
    char *s = line;
    while (*s == ' ' || *s == '\t') s++;
    if (s[0] == '#' || s[0] == '\0' || s[0] == '\n') continue;
    if (s[0] == 'v' && (s[1] == ' ' || s[1] == '\t')) {
      double x, y, z;
      if (sscanf(s + 1, "%lf %lf %lf", &x, &y, &z) == 3) {
        m.positions.push_back(float(x));
        m.positions.push_back(float(y));
        m.positions.push_back(float(z));
      }
    } else if (s[0] == 'v' && s[1] == 'n') {
      double x, y, z;
      if (sscanf(s + 2, "%lf %lf %lf", &x, &y, &z) == 3) {
        m.normals.push_back(float(x));
        m.normals.push_back(float(y));
        m.normals.push_back(float(z));
      }
    } else if (s[0] == 'v' && s[1] == 't') {
      double u, v;
      if (sscanf(s + 2, "%lf %lf", &u, &v) == 2) {
        m.texcoords.push_back(float(u));
        m.texcoords.push_back(float(v));
      }
    } else if (s[0] == 'f' && (s[1] == ' ' || s[1] == '\t')) {
      corners.clear();
      char *save = nullptr;
      for (char *tok = strtok_r(s + 1, " \t\r\n", &save); tok;
           tok = strtok_r(nullptr, " \t\r\n", &save)) {
        int32_t c[3];
        parse_corner(tok, c);
        corners.push_back(c[0]);
        corners.push_back(c[1]);
        corners.push_back(c[2]);
      }
      size_t nc = corners.size() / 3;
      for (size_t k = 1; k + 1 < nc; k++) {  // fan triangulation
        const size_t tri[3] = {0, k, k + 1};
        for (int j = 0; j < 3; j++) {
          size_t c = tri[j];
          m.pos_idx.push_back(corners[3 * c]);
          m.uv_idx.push_back(corners[3 * c + 1]);
          m.nrm_idx.push_back(corners[3 * c + 2]);
        }
      }
    }
    // g / o / s / mtllib / usemtl ignored (materials come from the .txt)
  }
  fclose(f);
  return 0;
}

void ptdn_obj_counts(int64_t *n_pos, int64_t *n_nrm, int64_t *n_uv,
                     int64_t *n_tri) {
  Mesh &m = *g_mesh;
  *n_pos = int64_t(m.positions.size() / 3);
  *n_nrm = int64_t(m.normals.size() / 3);
  *n_uv = int64_t(m.texcoords.size() / 2);
  *n_tri = int64_t(m.pos_idx.size() / 3);
}

void ptdn_obj_fill(float *pos, float *nrm, float *uv, int32_t *pos_idx,
                   int32_t *nrm_idx, int32_t *uv_idx) {
  Mesh &m = *g_mesh;
  std::memcpy(pos, m.positions.data(), m.positions.size() * sizeof(float));
  std::memcpy(nrm, m.normals.data(), m.normals.size() * sizeof(float));
  std::memcpy(uv, m.texcoords.data(), m.texcoords.size() * sizeof(float));
  std::memcpy(pos_idx, m.pos_idx.data(), m.pos_idx.size() * sizeof(int32_t));
  std::memcpy(nrm_idx, m.nrm_idx.data(), m.nrm_idx.size() * sizeof(int32_t));
  std::memcpy(uv_idx, m.uv_idx.data(), m.uv_idx.size() * sizeof(int32_t));
}

void ptdn_obj_free() {
  delete g_mesh;
  g_mesh = nullptr;
}
}
