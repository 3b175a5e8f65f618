// Native SwiftMHC HDF5 entry decoder.
//
// Why this exists: the training chip consumes ~20k examples/s, but
// decoding one entry through h5py costs ~4.4 ms single-thread, ~80% of it
// in h5py's Python object layer (group/dataset wrappers, not libhdf5 I/O
// — profiled in tools/bench_loader.py / round-2 notes). This decoder
// walks the same schema through the HDF5 C API directly and replicates
// pmhc_tpu.data.dataset.PmhcDataset.get_entry BIT-EXACTLY (padding
// policy, torsion-mask policy, branchless Shepperd rot->quat with
// canonical w >= 0) into caller-provided packed buffers.
//
// Build (no HDF5 dev headers needed — the API below is declared here and
// resolved with dlopen from h5py's bundled libhdf5, so file format and
// library version always match what wrote the files):
//   g++ -O2 -shared -fPIC -o libpmhc_decoder.so hdf5_decoder.cc -ldl
//
// Python binding: pmhc_tpu/data/native.py (ctypes).
//
// Reference behavior being replicated: /root/reference/diffusion/data.py
// lines 35-119 (via our dataset.py twin).

#include <dlfcn.h>

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

// ---------------------------------------------------------------------------
// Minimal HDF5 C API surface (1.10/1.14-compatible signatures)
// ---------------------------------------------------------------------------

typedef int64_t hid_t;
typedef uint64_t hsize_t;
typedef int herr_t;
typedef int H5T_class_t;  // H5T_INTEGER=0, H5T_FLOAT=1, ... H5T_ENUM=8

static const unsigned H5F_ACC_RDONLY = 0u;
static const hid_t H5P_DEFAULT = 0;
static const hid_t H5S_ALL = 0;
static const H5T_class_t H5T_INTEGER = 0;
static const H5T_class_t H5T_FLOAT = 1;

struct Api {
  herr_t (*H5open)();
  hid_t (*H5Fopen)(const char*, unsigned, hid_t);
  herr_t (*H5Fclose)(hid_t);
  hid_t (*H5Dopen2)(hid_t, const char*, hid_t);
  herr_t (*H5Dclose)(hid_t);
  hid_t (*H5Dget_space)(hid_t);
  hid_t (*H5Dget_type)(hid_t);
  herr_t (*H5Tclose)(hid_t);
  H5T_class_t (*H5Tget_class)(hid_t);
  size_t (*H5Tget_size)(hid_t);
  int (*H5Sget_simple_extent_ndims)(hid_t);
  int (*H5Sget_simple_extent_dims)(hid_t, hsize_t*, hsize_t*);
  herr_t (*H5Sclose)(hid_t);
  herr_t (*H5Dread)(hid_t, hid_t, hid_t, hid_t, hid_t, void*);
  hid_t nat_float;   // H5T_NATIVE_FLOAT
  hid_t nat_double;  // H5T_NATIVE_DOUBLE
  hid_t nat_i64;     // H5T_NATIVE_INT64 (= LLONG on LP64)
  hid_t nat_i8;      // H5T_NATIVE_INT8 (bool enums read as their base int8)
  bool ok;
  char err[512];
};

static Api g_api = {};

template <typename T>
static bool sym(void* lib, const char* name, T* out, Api* api) {
  *out = reinterpret_cast<T>(dlsym(lib, name));
  if (!*out) {
    snprintf(api->err, sizeof(api->err), "missing symbol %s", name);
    return false;
  }
  return true;
}

extern "C" int pmhc_init(const char* libhdf5_path) {
  if (g_api.ok) return 0;
  void* lib = dlopen(libhdf5_path, RTLD_NOW | RTLD_GLOBAL);
  if (!lib) {
    snprintf(g_api.err, sizeof(g_api.err), "dlopen failed: %s", dlerror());
    return -1;
  }
  Api* a = &g_api;
  if (!sym(lib, "H5open", &a->H5open, a)) return -1;
  if (!sym(lib, "H5Fopen", &a->H5Fopen, a)) return -1;
  if (!sym(lib, "H5Fclose", &a->H5Fclose, a)) return -1;
  if (!sym(lib, "H5Dopen2", &a->H5Dopen2, a)) return -1;
  if (!sym(lib, "H5Dclose", &a->H5Dclose, a)) return -1;
  if (!sym(lib, "H5Dget_space", &a->H5Dget_space, a)) return -1;
  if (!sym(lib, "H5Dget_type", &a->H5Dget_type, a)) return -1;
  if (!sym(lib, "H5Tclose", &a->H5Tclose, a)) return -1;
  if (!sym(lib, "H5Tget_class", &a->H5Tget_class, a)) return -1;
  if (!sym(lib, "H5Tget_size", &a->H5Tget_size, a)) return -1;
  if (!sym(lib, "H5Sget_simple_extent_ndims", &a->H5Sget_simple_extent_ndims, a))
    return -1;
  if (!sym(lib, "H5Sget_simple_extent_dims", &a->H5Sget_simple_extent_dims, a))
    return -1;
  if (!sym(lib, "H5Sclose", &a->H5Sclose, a)) return -1;
  if (!sym(lib, "H5Dread", &a->H5Dread, a)) return -1;
  if (a->H5open() < 0) {
    snprintf(a->err, sizeof(a->err), "H5open failed");
    return -1;
  }
  // native type ids live in exported globals, initialized by H5open
  hid_t* p;
  if (!sym(lib, "H5T_NATIVE_FLOAT_g", &p, a)) return -1;
  a->nat_float = *p;
  if (!sym(lib, "H5T_NATIVE_DOUBLE_g", &p, a)) return -1;
  a->nat_double = *p;
  if (!sym(lib, "H5T_NATIVE_LLONG_g", &p, a)) return -1;
  a->nat_i64 = *p;
  if (!sym(lib, "H5T_NATIVE_INT8_g", &p, a)) return -1;
  a->nat_i8 = *p;
  a->ok = true;
  return 0;
}

extern "C" const char* pmhc_last_error() { return g_api.err; }

// ---------------------------------------------------------------------------
// Dataset reading: every value lands in a float64 vector (exactness: all
// stored types — f32, i64, bool/enum-i8 — embed losslessly in f64)
// ---------------------------------------------------------------------------

static bool read_f64(hid_t file, const std::string& path,
                     std::vector<double>* out, std::vector<hsize_t>* dims) {
  Api* a = &g_api;
  hid_t d = a->H5Dopen2(file, path.c_str(), H5P_DEFAULT);
  if (d < 0) {
    snprintf(a->err, sizeof(a->err), "H5Dopen2 failed: %s", path.c_str());
    return false;
  }
  hid_t space = a->H5Dget_space(d);
  int nd = a->H5Sget_simple_extent_ndims(space);
  dims->assign(nd, 0);
  a->H5Sget_simple_extent_dims(space, dims->data(), nullptr);
  size_t n = 1;
  for (int i = 0; i < nd; i++) n *= (*dims)[i];
  out->assign(n, 0.0);

  hid_t t = a->H5Dget_type(d);
  H5T_class_t cls = a->H5Tget_class(t);
  herr_t rc;
  if (cls == H5T_FLOAT || cls == H5T_INTEGER) {
    rc = a->H5Dread(d, a->nat_double, H5S_ALL, H5S_ALL, H5P_DEFAULT,
                    out->data());
  } else {
    // h5py bools are 1-byte enums; read as the int8 base type
    std::vector<int8_t> tmp(n);
    rc = a->H5Dread(d, a->nat_i8, H5S_ALL, H5S_ALL, H5P_DEFAULT, tmp.data());
    for (size_t i = 0; i < n; i++) (*out)[i] = double(tmp[i]);
  }
  a->H5Tclose(t);
  a->H5Sclose(space);
  a->H5Dclose(d);
  if (rc < 0) {
    snprintf(a->err, sizeof(a->err), "H5Dread failed: %s", path.c_str());
    return false;
  }
  return true;
}

// ---------------------------------------------------------------------------
// Geometry: branchless Shepperd rot->quat, canonical w >= 0 — the exact
// float64 computation of dataset.rot_to_quat_np (same candidate order,
// first-max argmax, same summation order), cast to f32 at the end.
// ---------------------------------------------------------------------------

static void rot_to_quat(const double m[9], float q_out[4]) {
  const double m00 = m[0], m01 = m[1], m02 = m[2];
  const double m10 = m[3], m11 = m[4], m12 = m[5];
  const double m20 = m[6], m21 = m[7], m22 = m[8];
  const double tr = m00 + m11 + m22;
  const double cands[4] = {1.0 + tr, 1.0 + m00 - m11 - m22,
                           1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22};
  int best = 0;
  for (int i = 1; i < 4; i++)
    if (cands[i] > cands[best]) best = i;  // first max wins, like np.argmax
  double q[4];
  switch (best) {
    case 0:
      q[0] = 1.0 + tr; q[1] = m21 - m12; q[2] = m02 - m20; q[3] = m10 - m01;
      break;
    case 1:
      q[0] = m21 - m12; q[1] = 1.0 + m00 - m11 - m22; q[2] = m01 + m10;
      q[3] = m02 + m20;
      break;
    case 2:
      q[0] = m02 - m20; q[1] = m01 + m10; q[2] = 1.0 - m00 + m11 - m22;
      q[3] = m12 + m21;
      break;
    default:
      q[0] = m10 - m01; q[1] = m02 + m20; q[2] = m12 + m21;
      q[3] = 1.0 - m00 - m11 + m22;
  }
  const double norm =
      std::sqrt(q[0] * q[0] + q[1] * q[1] + q[2] * q[2] + q[3] * q[3]);
  for (int i = 0; i < 4; i++) q[i] /= norm;
  if (q[0] < 0.0)
    for (int i = 0; i < 4; i++) q[i] = -q[i];
  for (int i = 0; i < 4; i++) q_out[i] = float(q[i]);
}

// frames [L, 4, 4] (f64) -> tensor-7 rows at out[0..L), identity rows
// (1,0,0,0, 0,0,0) for [L, maxlen)
static void frames_to_t7(const std::vector<double>& frames, int L, int maxlen,
                         float* out) {
  for (int i = 0; i < maxlen; i++) {
    float* row = out + i * 7;
    if (i < L) {
      const double* f = frames.data() + i * 16;
      const double rot[9] = {f[0], f[1], f[2], f[4], f[5], f[6],
                             f[8], f[9], f[10]};
      rot_to_quat(rot, row);
      row[4] = float(f[3]);
      row[5] = float(f[7]);
      row[6] = float(f[11]);
    } else {
      row[0] = 1.0f;
      for (int j = 1; j < 7; j++) row[j] = 0.0f;
    }
  }
}

// ---------------------------------------------------------------------------
// Entry decode into packed (stacked) output buffers
// ---------------------------------------------------------------------------

static const int PEP_MAX = 16;
static const int POCKET_MAX = 80;
static const int NT = 7;
static const int OH = 22;

struct Out {
  // per-entry strides are the fixed padded shapes
  uint8_t* mask;                 // [B, 16]
  float* frames;                 // [B, 16, 7]
  float* features;               // [B, 16, 22]
  int32_t* aatype;               // [B, 16]
  float* torsions;               // [B, 16, 7, 2]
  uint8_t* torsions_mask;        // [B, 16, 7]
  int32_t* pocket_aatype;        // [B, 80]
  float* pocket_features;        // [B, 80, 22]
  uint8_t* pocket_mask;          // [B, 80]
  float* pocket_frames;          // [B, 80, 7]
  float* pocket_atom14_positions;  // [B, 80, 14, 3]
  uint8_t* pocket_atom14_exists;   // [B, 80, 14]
};

static bool decode_one(hid_t file, const char* name, int b, const Out& o) {
  const std::string base = std::string("/") + name;
  std::vector<double> buf;
  std::vector<hsize_t> dims;

  // ---- peptide ----------------------------------------------------------
  if (!read_f64(file, base + "/peptide/backbone_rigid_tensor", &buf, &dims))
    return false;
  const int L = int(dims[0]);
  if (L > PEP_MAX) {
    snprintf(g_api.err, sizeof(g_api.err), "%s: peptide %d > %d", name, L,
             PEP_MAX);
    return false;
  }
  frames_to_t7(buf, L, PEP_MAX, o.frames + size_t(b) * PEP_MAX * 7);

  uint8_t* mask = o.mask + size_t(b) * PEP_MAX;
  for (int i = 0; i < PEP_MAX; i++) mask[i] = i < L;

  if (!read_f64(file, base + "/peptide/aatype", &buf, &dims)) return false;
  int32_t* aatype = o.aatype + size_t(b) * PEP_MAX;
  for (int i = 0; i < PEP_MAX; i++)
    aatype[i] = i < L ? int32_t(buf[i]) : 0;

  if (!read_f64(file, base + "/peptide/sequence_onehot", &buf, &dims))
    return false;
  float* feat = o.features + size_t(b) * PEP_MAX * OH;
  memset(feat, 0, sizeof(float) * PEP_MAX * OH);
  for (int i = 0; i < L; i++)
    for (int j = 0; j < OH; j++) feat[i * OH + j] = float(buf[i * OH + j]);

  if (!read_f64(file, base + "/peptide/torsion_angles_sin_cos", &buf, &dims))
    return false;
  float* tors = o.torsions + size_t(b) * PEP_MAX * NT * 2;
  memset(tors, 0, sizeof(float) * PEP_MAX * NT * 2);
  for (int i = 0; i < L * NT * 2; i++) tors[i] = float(buf[i]);

  if (!read_f64(file, base + "/peptide/torsion_angles_mask", &buf, &dims))
    return false;
  uint8_t* tmask = o.torsions_mask + size_t(b) * PEP_MAX * NT;
  memset(tmask, 0, PEP_MAX * NT);
  for (int i = 0; i < L * NT; i++) tmask[i] = buf[i] != 0.0;
  // torsion policy (data.py:92-102): backbone torsions off, psi back on
  // for the LAST residue; masked slots get (sin, cos) = (0, 1)
  for (int i = 0; i < PEP_MAX; i++)
    for (int j = 0; j < 3; j++) tmask[i * NT + j] = 0;
  if (L > 0) tmask[(L - 1) * NT + 2] = 1;
  for (int i = 0; i < PEP_MAX; i++)
    for (int j = 0; j < NT; j++)
      if (!tmask[i * NT + j]) {
        tors[(i * NT + j) * 2] = 0.0f;
        tors[(i * NT + j) * 2 + 1] = 1.0f;
      }

  // ---- pocket (rows of the MHC where cross_residues_mask) ---------------
  std::vector<double> cross;
  if (!read_f64(file, base + "/protein/cross_residues_mask", &cross, &dims))
    return false;
  const int plen = int(dims[0]);
  std::vector<int> sel;
  sel.reserve(POCKET_MAX);
  for (int i = 0; i < plen; i++)
    if (cross[i] != 0.0) sel.push_back(i);
  if (int(sel.size()) > POCKET_MAX) {
    snprintf(g_api.err, sizeof(g_api.err), "%s: pocket %zu > %d", name,
             sel.size(), POCKET_MAX);
    return false;
  }
  const int np = int(sel.size());

  uint8_t* pmask = o.pocket_mask + size_t(b) * POCKET_MAX;
  for (int i = 0; i < POCKET_MAX; i++) pmask[i] = i < np;

  if (!read_f64(file, base + "/protein/backbone_rigid_tensor", &buf, &dims))
    return false;
  std::vector<double> packed(size_t(np) * 16);
  for (int i = 0; i < np; i++)
    memcpy(packed.data() + size_t(i) * 16, buf.data() + size_t(sel[i]) * 16,
           16 * sizeof(double));
  frames_to_t7(packed, np, POCKET_MAX,
               o.pocket_frames + size_t(b) * POCKET_MAX * 7);

  if (!read_f64(file, base + "/protein/aatype", &buf, &dims)) return false;
  int32_t* paat = o.pocket_aatype + size_t(b) * POCKET_MAX;
  memset(paat, 0, sizeof(int32_t) * POCKET_MAX);
  for (int i = 0; i < np; i++) paat[i] = int32_t(buf[sel[i]]);

  if (!read_f64(file, base + "/protein/sequence_onehot", &buf, &dims))
    return false;
  float* pfeat = o.pocket_features + size_t(b) * POCKET_MAX * OH;
  memset(pfeat, 0, sizeof(float) * POCKET_MAX * OH);
  for (int i = 0; i < np; i++)
    for (int j = 0; j < OH; j++)
      pfeat[i * OH + j] = float(buf[size_t(sel[i]) * OH + j]);

  if (!read_f64(file, base + "/protein/atom14_gt_positions", &buf, &dims))
    return false;
  float* patoms = o.pocket_atom14_positions + size_t(b) * POCKET_MAX * 14 * 3;
  memset(patoms, 0, sizeof(float) * POCKET_MAX * 14 * 3);
  for (int i = 0; i < np; i++)
    for (int j = 0; j < 42; j++)
      patoms[i * 42 + j] = float(buf[size_t(sel[i]) * 42 + j]);

  if (!read_f64(file, base + "/protein/atom14_gt_exists", &buf, &dims))
    return false;
  uint8_t* pex = o.pocket_atom14_exists + size_t(b) * POCKET_MAX * 14;
  memset(pex, 0, POCKET_MAX * 14);
  for (int i = 0; i < np; i++)
    for (int j = 0; j < 14; j++)
      pex[i * 14 + j] = buf[size_t(sel[i]) * 14 + j] != 0.0;

  return true;
}

extern "C" int pmhc_decode(
    const char* hdf5_path, const char** names, int n_entries,
    uint8_t* mask, float* frames, float* features, int32_t* aatype,
    float* torsions, uint8_t* torsions_mask, int32_t* pocket_aatype,
    float* pocket_features, uint8_t* pocket_mask, float* pocket_frames,
    float* pocket_atom14_positions, uint8_t* pocket_atom14_exists) {
  if (!g_api.ok) {
    snprintf(g_api.err, sizeof(g_api.err), "pmhc_init not called");
    return -1;
  }
  hid_t file = g_api.H5Fopen(hdf5_path, H5F_ACC_RDONLY, H5P_DEFAULT);
  if (file < 0) {
    snprintf(g_api.err, sizeof(g_api.err), "H5Fopen failed: %s", hdf5_path);
    return -1;
  }
  Out o = {mask, frames, features, aatype, torsions, torsions_mask,
           pocket_aatype, pocket_features, pocket_mask, pocket_frames,
           pocket_atom14_positions, pocket_atom14_exists};
  int rc = 0;
  for (int b = 0; b < n_entries; b++) {
    if (!decode_one(file, names[b], b, o)) {
      rc = -(b + 1);
      break;
    }
  }
  g_api.H5Fclose(file);
  return rc;
}
