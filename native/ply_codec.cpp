// Native 3DGS PLY payload codec.
//
// The hot part of scene I/O at production scale (10^7..10^8 Gaussians) is
// the payload shuffle between the on-disk interleaved 62-float vertex
// layout (header.3dgs.ply; see /root/reference/src/scene/gaussian_3d/
// import.rs:15-89 and export.rs:11-71 for the semantics being reproduced)
// and the five training tensors:
//
//   colors_sh [P,48]  (f_dc + f_rest with channel-major -> coeff-major
//                      transpose), opacities [P,1], positions [P,3],
//   rotations [P,4]   (disk scalar-first wxyz -> tensor scalar-last xyzw),
//   scalings  [P,3]
//
// This extension performs the shuffle in one multithreaded pass per
// direction. Python falls back to NumPy when the extension is not built.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr int kProps = 62;
constexpr int kShRest = 15;  // higher-order SH coefficients per channel

// Decode one vertex: interleaved 62 floats -> the five tensor rows.
inline void decode_vertex(const float* v, float* colors_sh, float* opacities,
                          float* positions, float* rotations, float* scalings) {
  positions[0] = v[0];
  positions[1] = v[1];
  positions[2] = v[2];
  // v[3..6) are unused normals.
  colors_sh[0] = v[6];
  colors_sh[1] = v[7];
  colors_sh[2] = v[8];
  // f_rest on disk is channel-major [3][15]; tensor is coeff-major [15][3].
  const float* rest = v + 9;
  for (int m = 0; m < kShRest; ++m) {
    colors_sh[3 + m * 3 + 0] = rest[0 * kShRest + m];
    colors_sh[3 + m * 3 + 1] = rest[1 * kShRest + m];
    colors_sh[3 + m * 3 + 2] = rest[2 * kShRest + m];
  }
  opacities[0] = v[54];
  scalings[0] = v[55];
  scalings[1] = v[56];
  scalings[2] = v[57];
  // Disk is scalar-first (w, x, y, z); tensor is scalar-last (x, y, z, w).
  rotations[0] = v[59];
  rotations[1] = v[60];
  rotations[2] = v[61];
  rotations[3] = v[58];
}

inline void encode_vertex(float* v, const float* colors_sh,
                          const float* opacities, const float* positions,
                          const float* rotations, const float* scalings) {
  v[0] = positions[0];
  v[1] = positions[1];
  v[2] = positions[2];
  v[3] = v[4] = v[5] = 0.0f;  // normals are unused
  v[6] = colors_sh[0];
  v[7] = colors_sh[1];
  v[8] = colors_sh[2];
  float* rest = v + 9;
  for (int m = 0; m < kShRest; ++m) {
    rest[0 * kShRest + m] = colors_sh[3 + m * 3 + 0];
    rest[1 * kShRest + m] = colors_sh[3 + m * 3 + 1];
    rest[2 * kShRest + m] = colors_sh[3 + m * 3 + 2];
  }
  v[54] = opacities[0];
  v[55] = scalings[0];
  v[56] = scalings[1];
  v[57] = scalings[2];
  v[58] = rotations[3];
  v[59] = rotations[0];
  v[60] = rotations[1];
  v[61] = rotations[2];
}

template <typename Fn>
void parallel_for(int64_t count, Fn fn) {
  unsigned hw = std::thread::hardware_concurrency();
  int64_t n_threads = hw ? hw : 4;
  if (count < 1 << 14) n_threads = 1;
  if (n_threads > count) n_threads = count > 0 ? count : 1;
  std::vector<std::thread> threads;
  int64_t chunk = (count + n_threads - 1) / n_threads;
  for (int64_t t = 0; t < n_threads; ++t) {
    int64_t begin = t * chunk;
    int64_t end = begin + chunk < count ? begin + chunk : count;
    if (begin >= end) break;
    threads.emplace_back([=] { fn(begin, end); });
  }
  for (auto& th : threads) th.join();
}

// decode_payload(payload: bytes, point_count: int,
//                colors_sh, opacities, positions, rotations, scalings:
//                writable f32 buffers) -> None
PyObject* decode_payload(PyObject*, PyObject* args) {
  Py_buffer payload;
  Py_ssize_t point_count;
  Py_buffer out[5];
  if (!PyArg_ParseTuple(args, "y*nw*w*w*w*w*", &payload, &point_count, &out[0],
                        &out[1], &out[2], &out[3], &out[4])) {
    return nullptr;
  }
  const Py_ssize_t widths[5] = {48, 1, 3, 4, 3};
  bool ok = payload.len >= point_count * kProps * (Py_ssize_t)sizeof(float);
  for (int i = 0; i < 5; ++i) {
    ok = ok && out[i].len >=
                   point_count * widths[i] * (Py_ssize_t)sizeof(float);
  }
  if (!ok) {
    for (int i = 0; i < 5; ++i) PyBuffer_Release(&out[i]);
    PyBuffer_Release(&payload);
    PyErr_SetString(PyExc_ValueError, "buffer sizes do not match point count");
    return nullptr;
  }
  const float* src = static_cast<const float*>(payload.buf);
  float* csh = static_cast<float*>(out[0].buf);
  float* opa = static_cast<float*>(out[1].buf);
  float* pos = static_cast<float*>(out[2].buf);
  float* rot = static_cast<float*>(out[3].buf);
  float* sca = static_cast<float*>(out[4].buf);

  Py_BEGIN_ALLOW_THREADS;
  parallel_for(point_count, [&](int64_t begin, int64_t end) {
    for (int64_t p = begin; p < end; ++p) {
      decode_vertex(src + p * kProps, csh + p * 48, opa + p, pos + p * 3,
                    rot + p * 4, sca + p * 3);
    }
  });
  Py_END_ALLOW_THREADS;

  for (int i = 0; i < 5; ++i) PyBuffer_Release(&out[i]);
  PyBuffer_Release(&payload);
  Py_RETURN_NONE;
}

// encode_payload(colors_sh, opacities, positions, rotations, scalings:
//                f32 buffers, point_count: int, out: writable buffer) -> None
PyObject* encode_payload(PyObject*, PyObject* args) {
  Py_buffer in[5];
  Py_ssize_t point_count;
  Py_buffer outbuf;
  if (!PyArg_ParseTuple(args, "y*y*y*y*y*nw*", &in[0], &in[1], &in[2], &in[3],
                        &in[4], &point_count, &outbuf)) {
    return nullptr;
  }
  const Py_ssize_t widths[5] = {48, 1, 3, 4, 3};
  bool ok = outbuf.len >= point_count * kProps * (Py_ssize_t)sizeof(float);
  for (int i = 0; i < 5; ++i) {
    ok = ok &&
         in[i].len >= point_count * widths[i] * (Py_ssize_t)sizeof(float);
  }
  if (!ok) {
    for (int i = 0; i < 5; ++i) PyBuffer_Release(&in[i]);
    PyBuffer_Release(&outbuf);
    PyErr_SetString(PyExc_ValueError, "buffer sizes do not match point count");
    return nullptr;
  }
  const float* csh = static_cast<const float*>(in[0].buf);
  const float* opa = static_cast<const float*>(in[1].buf);
  const float* pos = static_cast<const float*>(in[2].buf);
  const float* rot = static_cast<const float*>(in[3].buf);
  const float* sca = static_cast<const float*>(in[4].buf);
  float* dst = static_cast<float*>(outbuf.buf);

  Py_BEGIN_ALLOW_THREADS;
  parallel_for(point_count, [&](int64_t begin, int64_t end) {
    for (int64_t p = begin; p < end; ++p) {
      encode_vertex(dst + p * kProps, csh + p * 48, opa + p, pos + p * 3,
                    rot + p * 4, sca + p * 3);
    }
  });
  Py_END_ALLOW_THREADS;

  for (int i = 0; i < 5; ++i) PyBuffer_Release(&in[i]);
  PyBuffer_Release(&outbuf);
  Py_RETURN_NONE;
}

PyMethodDef kMethods[] = {
    {"decode_payload", decode_payload, METH_VARARGS,
     "Deinterleave a 3DGS PLY payload into the five tensor buffers."},
    {"encode_payload", encode_payload, METH_VARARGS,
     "Interleave the five tensor buffers into a 3DGS PLY payload."},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef kModule = {
    PyModuleDef_HEAD_INIT, "_gausplat_native",
    "Native 3DGS PLY payload codec.", -1, kMethods,
};

}  // namespace

PyMODINIT_FUNC PyInit__gausplat_native(void) {
  return PyModule_Create(&kModule);
}
