// Native data-pipeline kernels for human_pose_tpu (CPython C API, no pybind11).
//
// The host-side per-sample hot loops of the input pipeline — windowed Gaussian
// heatmap splatting (reference HeatmapGenerator, coco.py:77-121) and COCO RLE
// mask decoding — are pure-Python loops in the fallback path. At training
// batch sizes (36 images x 2 scales x 30 people x 17 joints per step) they
// can starve the TPU; these C++ implementations run them at memcpy-like speed
// inside the data-loader worker threads (the GIL is released around the
// compute).
//
// Exposed functions (see human_pose_tpu/data/native.py for the wrappers):
//   splat_heatmaps(joints_bytes, num_people, num_kpts, size, sigma) -> bytes
//       joints: int32 [num_people, num_kpts, 3] (x, y, vis), returns
//       float32 [size, size, num_kpts] channel-last heatmaps
//   rle_decode(counts_bytes, n_counts, h, w) -> bytes
//       counts: int32 run lengths (column-major, starting with zeros),
//       returns uint8 [h, w] mask

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// Windowed 2-D gaussian splat with max-combine, matching the reference
// semantics exactly: window length L = len(arange(0, 6*sigma+3)), center
// x0 = y0 = 3*sigma+1, bounds from round(x +- (3*sigma+1/2)).
void splat(const int32_t* joints, int num_people, int num_kpts, int size,
           double sigma, float* out /* [size, size, num_kpts] */) {
  const int L = static_cast<int>(std::ceil(6.0 * sigma + 3.0));
  std::vector<float> gauss(static_cast<size_t>(L) * L);
  const double c = 3.0 * sigma + 1.0;
  for (int y = 0; y < L; ++y) {
    for (int x = 0; x < L; ++x) {
      const double dx = x - c, dy = y - c;
      gauss[static_cast<size_t>(y) * L + x] =
          static_cast<float>(std::exp(-(dx * dx + dy * dy) / (2.0 * sigma * sigma)));
    }
  }
  std::memset(out, 0, sizeof(float) * size * size * num_kpts);
  for (int p = 0; p < num_people; ++p) {
    for (int k = 0; k < num_kpts; ++k) {
      const int32_t* j = joints + (static_cast<size_t>(p) * num_kpts + k) * 3;
      const int x = j[0], y = j[1], vis = j[2];
      if (vis <= 0 || x < 0 || y < 0 || x >= size || y >= size) continue;
      const int xmin = static_cast<int>(std::lround(x - 3.0 * sigma - 1.0));
      const int ymin = static_cast<int>(std::lround(y - 3.0 * sigma - 1.0));
      const int xmax = static_cast<int>(std::lround(x + 3.0 * sigma + 2.0));
      const int ymax = static_cast<int>(std::lround(y + 3.0 * sigma + 2.0));
      const int mx0 = std::max(0, xmin), mx1 = std::min(xmax, size);
      const int my0 = std::max(0, ymin), my1 = std::min(ymax, size);
      for (int yy = my0; yy < my1; ++yy) {
        const float* grow = &gauss[static_cast<size_t>(yy - ymin) * L];
        float* orow = out + (static_cast<size_t>(yy) * size) * num_kpts + k;
        for (int xx = mx0; xx < mx1; ++xx) {
          float& dst = orow[static_cast<size_t>(xx) * num_kpts];
          const float g = grow[xx - xmin];
          if (g > dst) dst = g;
        }
      }
    }
  }
}

PyObject* py_splat_heatmaps(PyObject*, PyObject* args) {
  Py_buffer joints_buf;
  int num_people, num_kpts, size;
  double sigma;
  if (!PyArg_ParseTuple(args, "y*iiid", &joints_buf, &num_people, &num_kpts,
                        &size, &sigma))
    return nullptr;
  const Py_ssize_t need =
      static_cast<Py_ssize_t>(num_people) * num_kpts * 3 * sizeof(int32_t);
  if (joints_buf.len < need) {
    PyBuffer_Release(&joints_buf);
    PyErr_SetString(PyExc_ValueError, "joints buffer too small");
    return nullptr;
  }
  PyObject* out_bytes =
      PyBytes_FromStringAndSize(nullptr, static_cast<Py_ssize_t>(sizeof(float)) *
                                              size * size * num_kpts);
  if (!out_bytes) {
    PyBuffer_Release(&joints_buf);
    return nullptr;
  }
  float* out = reinterpret_cast<float*>(PyBytes_AS_STRING(out_bytes));
  const int32_t* joints = reinterpret_cast<const int32_t*>(joints_buf.buf);
  Py_BEGIN_ALLOW_THREADS;
  splat(joints, num_people, num_kpts, size, sigma, out);
  Py_END_ALLOW_THREADS;
  PyBuffer_Release(&joints_buf);
  return out_bytes;
}

PyObject* py_rle_decode(PyObject*, PyObject* args) {
  Py_buffer counts_buf;
  int n_counts, h, w;
  if (!PyArg_ParseTuple(args, "y*iii", &counts_buf, &n_counts, &h, &w))
    return nullptr;
  if (counts_buf.len < static_cast<Py_ssize_t>(n_counts) * 4) {
    PyBuffer_Release(&counts_buf);
    PyErr_SetString(PyExc_ValueError, "counts buffer too small");
    return nullptr;
  }
  PyObject* out_bytes = PyBytes_FromStringAndSize(
      nullptr, static_cast<Py_ssize_t>(h) * w);
  if (!out_bytes) {
    PyBuffer_Release(&counts_buf);
    return nullptr;
  }
  uint8_t* out = reinterpret_cast<uint8_t*>(PyBytes_AS_STRING(out_bytes));
  const int32_t* counts = reinterpret_cast<const int32_t*>(counts_buf.buf);
  Py_BEGIN_ALLOW_THREADS;
  // column-major runs -> row-major [h, w] mask
  std::vector<uint8_t> flat(static_cast<size_t>(h) * w, 0);
  size_t pos = 0;
  uint8_t val = 0;
  const size_t total = static_cast<size_t>(h) * w;
  for (int i = 0; i < n_counts && pos < total; ++i) {
    size_t run = std::min<size_t>(counts[i] > 0 ? counts[i] : 0, total - pos);
    if (val) std::memset(flat.data() + pos, 1, run);
    pos += run;
    val = 1 - val;
  }
  for (int col = 0; col < w; ++col)
    for (int row = 0; row < h; ++row)
      out[static_cast<size_t>(row) * w + col] =
          flat[static_cast<size_t>(col) * h + row];
  Py_END_ALLOW_THREADS;
  PyBuffer_Release(&counts_buf);
  return out_bytes;
}

PyMethodDef methods[] = {
    {"splat_heatmaps", py_splat_heatmaps, METH_VARARGS,
     "Gaussian heatmap splat: (joints_i32_bytes, P, K, size, sigma) -> f32 bytes [size,size,K]"},
    {"rle_decode", py_rle_decode, METH_VARARGS,
     "COCO RLE decode: (counts_i32_bytes, n, h, w) -> u8 bytes [h,w]"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "hp_native",
    "Native data-pipeline kernels for human_pose_tpu", -1, methods,
};

}  // namespace

PyMODINIT_FUNC PyInit_hp_native(void) { return PyModule_Create(&moduledef); }
