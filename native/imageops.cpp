// Native image/runtime ops for the snipper_tpu host data path.
//
// The reference delegates its host-side hot loops to native code through
// cv2 (warpAffine in datasets/transforms.py:142) and scipy; this extension
// provides the TPU framework's own native equivalents via the CPython C API
// (no pybind11 in the image):
//
//   warp_affine(src_u8 [H, W, 3], M [2, 3], out_h, out_w,
//               flip, r_scale, g_scale, b_scale) -> float32 [out_h, out_w, 3]
//     fused horizontal-flip + inverse-mapped bilinear warp (zero border,
//     cv2.warpAffine INTER_LINEAR semantics) + /255 + per-channel color
//     scale with clip to [0, 1] — one pass, no intermediates.
//
//   lsa(cost [n, m] float64) -> int64 [m]
//     Jonker-Volgenant shortest-augmenting-path linear sum assignment
//     (row->col on the transposed problem), for host-side eval matching.
//
// Built by native/setup.py; snipper_tpu.data.native_ops falls back to the
// pure-numpy implementations when the extension is absent.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

namespace {

struct BufferGuard {
    Py_buffer view{};
    bool held = false;
    ~BufferGuard() {
        if (held) PyBuffer_Release(&view);
    }
};

bool get_buffer(PyObject* obj, Py_buffer* view, const char* fmt_expect,
                int ndim_expect, const char* name) {
    if (PyObject_GetBuffer(obj, view, PyBUF_C_CONTIGUOUS | PyBUF_FORMAT) < 0) {
        return false;
    }
    if (view->ndim != ndim_expect ||
        (fmt_expect && view->format && strcmp(view->format, fmt_expect) != 0)) {
        PyErr_Format(PyExc_ValueError,
                     "%s: expected %d-d contiguous '%s' buffer, got %d-d '%s'",
                     name, ndim_expect, fmt_expect, view->ndim,
                     view->format ? view->format : "?");
        PyBuffer_Release(view);
        return false;
    }
    return true;
}

// ------------------------------------------------------------------ warp
PyObject* warp_affine(PyObject*, PyObject* args) {
    PyObject *src_obj, *m_obj;
    int out_h, out_w, flip;
    double cs_r, cs_g, cs_b;
    if (!PyArg_ParseTuple(args, "OOiiiddd", &src_obj, &m_obj, &out_h, &out_w,
                          &flip, &cs_r, &cs_g, &cs_b)) {
        return nullptr;
    }
    BufferGuard src_g, m_g;
    if (!get_buffer(src_obj, &src_g.view, "B", 3, "src")) return nullptr;
    src_g.held = true;
    if (!get_buffer(m_obj, &m_g.view, "d", 2, "M")) return nullptr;
    m_g.held = true;

    const int h = (int)src_g.view.shape[0];
    const int w = (int)src_g.view.shape[1];
    const int c = (int)src_g.view.shape[2];
    if (c != 3 || m_g.view.shape[0] != 2 || m_g.view.shape[1] != 3) {
        PyErr_SetString(PyExc_ValueError, "src must be [H,W,3], M [2,3]");
        return nullptr;
    }
    const uint8_t* src = (const uint8_t*)src_g.view.buf;
    const double* M = (const double*)m_g.view.buf;

    // invert the forward affine (dst = M @ src  =>  src = Minv @ dst)
    const double a = M[0], b = M[1], tx = M[2];
    const double d = M[3], e = M[4], ty = M[5];
    const double det = a * e - b * d;
    if (std::fabs(det) < 1e-12) {
        PyErr_SetString(PyExc_ValueError, "singular affine matrix");
        return nullptr;
    }
    const double ia = e / det, ib = -b / det;
    const double id = -d / det, ie = a / det;
    const double itx = -(ia * tx + ib * ty);
    const double ity = -(id * tx + ie * ty);

    PyObject* out_bytes = PyByteArray_FromStringAndSize(
        nullptr, (Py_ssize_t)out_h * out_w * 3 * sizeof(float));
    if (!out_bytes) return nullptr;
    float* out = (float*)PyByteArray_AsString(out_bytes);

    const float scale[3] = {(float)cs_r, (float)cs_g, (float)cs_b};
    const double inv255 = 1.0 / 255.0;

    Py_BEGIN_ALLOW_THREADS
    for (int y = 0; y < out_h; ++y) {
        for (int x = 0; x < out_w; ++x) {
            // flip is applied via the source column index below
            double sx = ia * x + ib * y + itx;
            double sy = id * x + ie * y + ity;
            const double fx0 = std::floor(sx);
            const double fy0 = std::floor(sy);
            const int x0 = (int)fx0, y0 = (int)fy0;
            const float wx1 = (float)(sx - fx0), wx0 = 1.0f - wx1;
            const float wy1 = (float)(sy - fy0), wy0 = 1.0f - wy1;
            float acc[3] = {0.f, 0.f, 0.f};
            for (int dy = 0; dy < 2; ++dy) {
                const int yy = y0 + dy;
                if (yy < 0 || yy >= h) continue;
                const float wy = dy ? wy1 : wy0;
                for (int dx = 0; dx < 2; ++dx) {
                    int xx = x0 + dx;
                    if (xx < 0 || xx >= w) continue;
                    const float wgt = wy * (dx ? wx1 : wx0);
                    const int sx_i = flip ? (w - 1 - xx) : xx;
                    const uint8_t* px = src + ((size_t)yy * w + sx_i) * 3;
                    acc[0] += wgt * px[0];
                    acc[1] += wgt * px[1];
                    acc[2] += wgt * px[2];
                }
            }
            float* o = out + ((size_t)y * out_w + x) * 3;
            for (int ch = 0; ch < 3; ++ch) {
                float v = (float)(acc[ch] * inv255) * scale[ch];
                o[ch] = v < 0.f ? 0.f : (v > 1.f ? 1.f : v);
            }
        }
    }
    Py_END_ALLOW_THREADS
    return out_bytes;
}

// ------------------------------------------------------------------- lsa
PyObject* lsa(PyObject*, PyObject* args) {
    PyObject* cost_obj;
    if (!PyArg_ParseTuple(args, "O", &cost_obj)) return nullptr;
    BufferGuard g;
    if (!get_buffer(cost_obj, &g.view, "d", 2, "cost")) return nullptr;
    g.held = true;
    const int M = (int)g.view.shape[0];  // rows (targets), M <= N
    const int N = (int)g.view.shape[1];  // cols (queries)
    if (M > N) {
        PyErr_SetString(PyExc_ValueError, "lsa: need rows <= cols");
        return nullptr;
    }
    const double* C = (const double*)g.view.buf;
    const double INF = std::numeric_limits<double>::infinity();

    std::vector<double> u(M, 0.0), v(N, 0.0);
    std::vector<int> col4row(M, -1), row4col(N, -1), path(N, -1);
    std::vector<double> sp(N);
    std::vector<char> SR(M), SC(N);

    for (int cur = 0; cur < M; ++cur) {
        std::fill(sp.begin(), sp.end(), INF);
        std::fill(SR.begin(), SR.end(), 0);
        std::fill(SC.begin(), SC.end(), 0);
        int i = cur, sink = -1;
        double minval = 0.0;
        while (sink < 0) {
            SR[i] = 1;
            for (int j = 0; j < N; ++j) {
                if (SC[j]) continue;
                const double r = minval + C[(size_t)i * N + j] - u[i] - v[j];
                if (r < sp[j]) { sp[j] = r; path[j] = i; }
            }
            int jmin = -1;
            double best = INF;
            for (int j = 0; j < N; ++j) {
                if (!SC[j] && sp[j] < best) { best = sp[j]; jmin = j; }
            }
            if (jmin < 0) { sink = -2; break; }  // disconnected
            minval = best;
            SC[jmin] = 1;
            if (row4col[jmin] < 0) sink = jmin;
            else i = row4col[jmin];
        }
        if (sink < 0) continue;
        u[cur] += minval;
        for (int r = 0; r < M; ++r) {
            if (SR[r] && r != cur) u[r] += minval - sp[col4row[r]];
        }
        for (int j = 0; j < N; ++j) {
            if (SC[j]) v[j] -= minval - sp[j];
        }
        int j = sink;
        while (true) {
            const int r = path[j];
            row4col[j] = r;
            std::swap(col4row[r], j);
            if (r == cur) break;
        }
    }
    PyObject* out = PyList_New(M);
    for (int r = 0; r < M; ++r) {
        PyList_SET_ITEM(out, r, PyLong_FromLong(col4row[r]));
    }
    return out;
}

PyMethodDef methods[] = {
    {"warp_affine", warp_affine, METH_VARARGS,
     "fused flip + bilinear affine warp + /255 + color scale"},
    {"lsa", lsa, METH_VARARGS, "Jonker-Volgenant linear sum assignment"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef module = {PyModuleDef_HEAD_INIT, "_snipper_imageops",
                      "native host ops for snipper_tpu", -1, methods};

}  // namespace

PyMODINIT_FUNC PyInit__snipper_imageops(void) {
    return PyModule_Create(&module);
}
