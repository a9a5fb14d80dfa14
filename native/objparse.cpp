// Native Wavefront OBJ parser for physically_based_renderer_tpu.
//
// TPU-native replacement for the reference's vendored tinyobjloader
// (Source/3rdParty/tinyobjloader/tiny_obj_loader.h, used by
// PBRApp::LoadOBJModel at PBRApp.cpp:1479). Same responsibilities:
// v/vt/vn attribute pools, face triangulation (fan), per-face material ids
// from usemtl, and (v,vt,vn)-triple vertex deduplication — the dedup the
// app re-did by hashing Vertex structs (PBRApp.cpp:1572-1580) happens here
// once. Exposed as a C ABI consumed through ctypes (no pybind11 in the
// image); Python keeps a pure fallback with identical outputs.
//
// Build: g++ -O2 -shared -fPIC -o libobjparse.so objparse.cpp

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Key {
  int32_t v, t, n;
  bool operator==(const Key& o) const { return v == o.v && t == o.t && n == o.n; }
};

struct KeyHash {
  size_t operator()(const Key& k) const {
    size_t h = static_cast<uint32_t>(k.v) * 73856093u;
    h ^= static_cast<uint32_t>(k.t) * 19349663u;
    h ^= static_cast<uint32_t>(k.n) * 83492791u;
    return h;
  }
};

}  // namespace

struct ObjMesh {
  std::vector<float> positions;  // V*3 (deduped)
  std::vector<float> normals;    // V*3 (0 where absent)
  std::vector<float> uvs;        // V*2 (0 where absent)
  std::vector<int32_t> tris;     // T*3
  std::vector<int32_t> face_material;  // T (index into material_names, -1 none)
  std::vector<std::string> material_names;  // usemtl order of first use
  std::vector<std::string> mtllibs;
  std::string error;
  bool has_normals = false;
  bool has_uvs = false;
};

namespace {

// Resolve a 1-based (or negative relative) OBJ index to 0-based; -1 if absent.
inline int32_t resolve(long idx, size_t count) {
  if (idx > 0) return static_cast<int32_t>(idx - 1);
  if (idx < 0) return static_cast<int32_t>(count + idx);
  return -1;
}

bool parse(ObjMesh* m, FILE* f) {
  std::vector<float> vs, vts, vns;  // raw pools
  std::unordered_map<std::string, int32_t> mat_index;
  std::unordered_map<Key, int32_t, KeyHash> dedup;
  int32_t current_mat = -1;

  char line[4096];
  while (fgets(line, sizeof(line), f)) {
    char* s = line;
    while (*s == ' ' || *s == '\t') s++;
    if (*s == '#' || *s == '\n' || *s == '\r' || *s == '\0') continue;

    if (s[0] == 'v' && (s[1] == ' ' || s[1] == '\t')) {
      float x = 0, y = 0, z = 0;
      if (sscanf(s + 2, "%f %f %f", &x, &y, &z) >= 3) {
        vs.push_back(x);
        vs.push_back(y);
        vs.push_back(z);
      }
    } else if (s[0] == 'v' && s[1] == 't') {
      float u = 0, v = 0;
      sscanf(s + 2, "%f %f", &u, &v);
      vts.push_back(u);
      vts.push_back(v);
    } else if (s[0] == 'v' && s[1] == 'n') {
      float x = 0, y = 0, z = 0;
      sscanf(s + 2, "%f %f %f", &x, &y, &z);
      vns.push_back(x);
      vns.push_back(y);
      vns.push_back(z);
    } else if (s[0] == 'f' && (s[1] == ' ' || s[1] == '\t')) {
      // Collect the polygon's corner indices, then fan-triangulate.
      std::vector<int32_t> corners;
      char* p = s + 1;
      while (*p) {
        while (*p == ' ' || *p == '\t') p++;
        if (*p == '\n' || *p == '\r' || *p == '\0') break;
        long vi = 0, ti = 0, ni = 0;
        vi = strtol(p, &p, 10);
        if (*p == '/') {
          p++;
          if (*p != '/') ti = strtol(p, &p, 10);
          if (*p == '/') {
            p++;
            ni = strtol(p, &p, 10);
          }
        }
        Key key{resolve(vi, vs.size() / 3), resolve(ti, vts.size() / 2),
                resolve(ni, vns.size() / 3)};
        if (key.v < 0 || static_cast<size_t>(key.v) >= vs.size() / 3) {
          m->error = "face references invalid vertex index";
          return false;
        }
        auto it = dedup.find(key);
        int32_t out_idx;
        if (it != dedup.end()) {
          out_idx = it->second;
        } else {
          out_idx = static_cast<int32_t>(m->positions.size() / 3);
          dedup.emplace(key, out_idx);
          m->positions.push_back(vs[3 * key.v + 0]);
          m->positions.push_back(vs[3 * key.v + 1]);
          m->positions.push_back(vs[3 * key.v + 2]);
          if (key.n >= 0 && static_cast<size_t>(key.n) < vns.size() / 3) {
            m->normals.push_back(vns[3 * key.n + 0]);
            m->normals.push_back(vns[3 * key.n + 1]);
            m->normals.push_back(vns[3 * key.n + 2]);
            m->has_normals = true;
          } else {
            m->normals.push_back(0);
            m->normals.push_back(0);
            m->normals.push_back(0);
          }
          if (key.t >= 0 && static_cast<size_t>(key.t) < vts.size() / 2) {
            // OBJ v runs bottom-up; DirectX-style v runs top-down (the
            // reference flips at PBRApp.cpp texcoord load: 1 - v).
            m->uvs.push_back(vts[2 * key.t + 0]);
            m->uvs.push_back(1.0f - vts[2 * key.t + 1]);
            m->has_uvs = true;
          } else {
            m->uvs.push_back(0);
            m->uvs.push_back(0);
          }
        }
        corners.push_back(out_idx);
      }
      for (size_t i = 2; i < corners.size(); i++) {
        m->tris.push_back(corners[0]);
        m->tris.push_back(corners[i - 1]);
        m->tris.push_back(corners[i]);
        m->face_material.push_back(current_mat);
      }
    } else if (strncmp(s, "usemtl", 6) == 0) {
      std::string name(s + 6);
      // trim
      size_t a = name.find_first_not_of(" \t\r\n");
      size_t b = name.find_last_not_of(" \t\r\n");
      name = (a == std::string::npos) ? "" : name.substr(a, b - a + 1);
      auto it = mat_index.find(name);
      if (it == mat_index.end()) {
        current_mat = static_cast<int32_t>(m->material_names.size());
        mat_index.emplace(name, current_mat);
        m->material_names.push_back(name);
      } else {
        current_mat = it->second;
      }
    } else if (strncmp(s, "mtllib", 6) == 0) {
      std::string name(s + 6);
      size_t a = name.find_first_not_of(" \t\r\n");
      size_t b = name.find_last_not_of(" \t\r\n");
      if (a != std::string::npos) m->mtllibs.push_back(name.substr(a, b - a + 1));
    }
    // o/g/s lines: grouping is carried by material ids; ignored like the
    // reference's per-shape loop collapsing into one vertex/index buffer.
  }
  return true;
}

}  // namespace

extern "C" {

ObjMesh* obj_parse_file(const char* path) {
  auto* m = new ObjMesh();
  FILE* f = fopen(path, "rb");
  if (!f) {
    m->error = "cannot open file";
    return m;
  }
  parse(m, f);
  fclose(f);
  return m;
}

int32_t obj_vertex_count(ObjMesh* m) { return (int32_t)(m->positions.size() / 3); }
int32_t obj_tri_count(ObjMesh* m) { return (int32_t)(m->tris.size() / 3); }
int32_t obj_material_count(ObjMesh* m) { return (int32_t)m->material_names.size(); }
int32_t obj_mtllib_count(ObjMesh* m) { return (int32_t)m->mtllibs.size(); }
int32_t obj_has_normals(ObjMesh* m) { return m->has_normals ? 1 : 0; }
int32_t obj_has_uvs(ObjMesh* m) { return m->has_uvs ? 1 : 0; }

void obj_copy_positions(ObjMesh* m, float* out) {
  memcpy(out, m->positions.data(), m->positions.size() * sizeof(float));
}
void obj_copy_normals(ObjMesh* m, float* out) {
  memcpy(out, m->normals.data(), m->normals.size() * sizeof(float));
}
void obj_copy_uvs(ObjMesh* m, float* out) {
  memcpy(out, m->uvs.data(), m->uvs.size() * sizeof(float));
}
void obj_copy_tris(ObjMesh* m, int32_t* out) {
  memcpy(out, m->tris.data(), m->tris.size() * sizeof(int32_t));
}
void obj_copy_face_material(ObjMesh* m, int32_t* out) {
  memcpy(out, m->face_material.data(), m->face_material.size() * sizeof(int32_t));
}
const char* obj_material_name(ObjMesh* m, int32_t i) {
  return (i >= 0 && i < (int32_t)m->material_names.size())
             ? m->material_names[i].c_str()
             : "";
}
const char* obj_mtllib_name(ObjMesh* m, int32_t i) {
  return (i >= 0 && i < (int32_t)m->mtllibs.size()) ? m->mtllibs[i].c_str() : "";
}
const char* obj_error(ObjMesh* m) { return m->error.c_str(); }
void obj_free(ObjMesh* m) { delete m; }

}  // extern "C"
