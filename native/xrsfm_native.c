/* Native I/O runtime for xrsfm_tpu.
 *
 * C-extension fast path for the reference-compatible binary formats
 * (layouts documented in xrsfm_tpu/utils/io_features.py; reference:
 * src/utility/io_feature.hpp, io_base.hpp).  The Python struct parser is
 * the host-side bottleneck for internet-scale scenes (thousands of frames
 * x 8192 features); this parser is a single pass over a mmap-able buffer.
 *
 * Exposed functions:
 *   read_features(path, with_descs=True)
 *       -> list[(name: str, keypoints: f32[N,4], descriptors: u8[N,128])]
 *   read_frame_pairs(path)
 *       -> list[(id1, id2, matches i32[M,2], distances f64[M],
 *                E f64[3,3], inlier_num, inlier_mask bool[M])]
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <numpy/arrayobject.h>

#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

typedef struct {
    char *data;
    size_t size;
    size_t pos;
} Buf;

static int buf_read_file(Buf *b, const char *path) {
    FILE *f = fopen(path, "rb");
    if (!f) return -1;
    fseek(f, 0, SEEK_END);
    long sz = ftell(f);
    fseek(f, 0, SEEK_SET);
    b->data = (char *)malloc((size_t)sz);
    if (!b->data) {
        fclose(f);
        return -1;
    }
    if (fread(b->data, 1, (size_t)sz, f) != (size_t)sz) {
        free(b->data);
        fclose(f);
        return -1;
    }
    fclose(f);
    b->size = (size_t)sz;
    b->pos = 0;
    return 0;
}

static int buf_need(Buf *b, size_t n) { return b->pos + n <= b->size; }

static int32_t rd_i32(Buf *b) {
    int32_t v;
    memcpy(&v, b->data + b->pos, 4);
    b->pos += 4;
    return v;
}

static uint64_t rd_u64(Buf *b) {
    uint64_t v;
    memcpy(&v, b->data + b->pos, 8);
    b->pos += 8;
    return v;
}

static PyObject *read_features(PyObject *self, PyObject *args, PyObject *kw) {
    const char *path;
    int with_descs = 1;
    static char *kwlist[] = {"path", "with_descs", NULL};
    if (!PyArg_ParseTupleAndKeywords(args, kw, "s|p", kwlist, &path,
                                     &with_descs))
        return NULL;

    Buf b;
    if (buf_read_file(&b, path) != 0) {
        PyErr_Format(PyExc_IOError, "cannot read %s", path);
        return NULL;
    }

    PyObject *out = NULL;
    if (!buf_need(&b, 4)) goto corrupt;
    int32_t num_frames = rd_i32(&b);
    if (num_frames < 0) goto corrupt;
    out = PyList_New(num_frames);
    if (!out) goto fail;

    for (int32_t i = 0; i < num_frames; ++i) {
        /* null-terminated name */
        size_t start = b.pos;
        while (b.pos < b.size && b.data[b.pos] != '\0') b.pos++;
        if (b.pos >= b.size) goto corrupt;
        PyObject *name =
            PyUnicode_FromStringAndSize(b.data + start, (Py_ssize_t)(b.pos - start));
        b.pos++; /* skip nul */
        if (!name) goto fail;

        if (!buf_need(&b, 4)) { Py_DECREF(name); goto corrupt; }
        int32_t n = rd_i32(&b);
        if (n < 0 || !buf_need(&b, (size_t)n * 16)) { Py_DECREF(name); goto corrupt; }

        npy_intp kp_dims[2] = {n, 4};
        PyObject *kps = PyArray_SimpleNew(2, kp_dims, NPY_FLOAT32);
        if (!kps) { Py_DECREF(name); goto fail; }
        memcpy(PyArray_DATA((PyArrayObject *)kps), b.data + b.pos,
               (size_t)n * 16);
        b.pos += (size_t)n * 16;

        npy_intp d_dims[2] = {n, 128};
        PyObject *descs = PyArray_SimpleNew(2, d_dims, NPY_UINT8);
        if (!descs) { Py_DECREF(name); Py_DECREF(kps); goto fail; }
        /* the file always stores descriptors; with_descs=0 skips them but
         * must still advance the cursor */
        if (!buf_need(&b, (size_t)n * 128)) {
            Py_DECREF(name); Py_DECREF(kps); Py_DECREF(descs);
            goto corrupt;
        }
        if (with_descs) {
            memcpy(PyArray_DATA((PyArrayObject *)descs), b.data + b.pos,
                   (size_t)n * 128);
        } else {
            memset(PyArray_DATA((PyArrayObject *)descs), 0, (size_t)n * 128);
        }
        b.pos += (size_t)n * 128;

        PyObject *tup = PyTuple_Pack(3, name, kps, descs);
        Py_DECREF(name);
        Py_DECREF(kps);
        Py_DECREF(descs);
        if (!tup) goto fail;
        PyList_SET_ITEM(out, i, tup);
    }
    free(b.data);
    return out;

corrupt:
    PyErr_Format(PyExc_ValueError, "corrupt feature file %s", path);
fail:
    free(b.data);
    Py_XDECREF(out);
    return NULL;
}

static PyObject *read_frame_pairs(PyObject *self, PyObject *args) {
    const char *path;
    if (!PyArg_ParseTuple(args, "s", &path)) return NULL;

    Buf b;
    if (buf_read_file(&b, path) != 0) {
        PyErr_Format(PyExc_IOError, "cannot read %s", path);
        return NULL;
    }
    PyObject *out = NULL;
    if (!buf_need(&b, 8)) goto corrupt;
    uint64_t num_pairs = rd_u64(&b);
    out = PyList_New(0);
    if (!out) goto fail;

    for (uint64_t i = 0; i < num_pairs; ++i) {
        if (!buf_need(&b, 16)) goto corrupt;
        int32_t id1 = rd_i32(&b);
        int32_t id2 = rd_i32(&b);
        uint64_t nm = rd_u64(&b);
        /* Match struct: int32 id1, int32 id2, float64 distance = 16B */
        if (!buf_need(&b, nm * 16 + 72 + 4)) goto corrupt;

        npy_intp m_dims[2] = {(npy_intp)nm, 2};
        PyObject *matches = PyArray_SimpleNew(2, m_dims, NPY_INT32);
        npy_intp d_dims[1] = {(npy_intp)nm};
        PyObject *dists = PyArray_SimpleNew(1, d_dims, NPY_FLOAT64);
        if (!matches || !dists) {
            Py_XDECREF(matches); Py_XDECREF(dists);
            goto fail;
        }
        int32_t *mp = (int32_t *)PyArray_DATA((PyArrayObject *)matches);
        double *dp = (double *)PyArray_DATA((PyArrayObject *)dists);
        for (uint64_t k = 0; k < nm; ++k) {
            memcpy(mp + 2 * k, b.data + b.pos + 16 * k, 8);
            memcpy(dp + k, b.data + b.pos + 16 * k + 8, 8);
        }
        b.pos += nm * 16;

        npy_intp e_dims[2] = {3, 3};
        PyObject *E = PyArray_SimpleNew(2, e_dims, NPY_FLOAT64);
        if (!E) { Py_DECREF(matches); Py_DECREF(dists); goto fail; }
        /* stored column-major (Eigen default): transpose on copy */
        double *ep = (double *)PyArray_DATA((PyArrayObject *)E);
        const double *src = (const double *)(b.data + b.pos);
        for (int r = 0; r < 3; ++r)
            for (int c = 0; c < 3; ++c) ep[r * 3 + c] = src[c * 3 + r];
        b.pos += 72;

        int32_t inlier_num = rd_i32(&b);
        if (!buf_need(&b, nm)) {
            Py_DECREF(matches); Py_DECREF(dists); Py_DECREF(E);
            goto corrupt;
        }
        PyObject *mask = PyArray_SimpleNew(1, d_dims, NPY_BOOL);
        if (!mask) { Py_DECREF(matches); Py_DECREF(dists); Py_DECREF(E); goto fail; }
        npy_bool *kp = (npy_bool *)PyArray_DATA((PyArrayObject *)mask);
        for (uint64_t k = 0; k < nm; ++k) kp[k] = b.data[b.pos + k] != 0;
        b.pos += nm;

        if (id1 == id2) { /* reference drops self-pairs on read */
            Py_DECREF(matches); Py_DECREF(dists); Py_DECREF(E); Py_DECREF(mask);
            continue;
        }
        PyObject *tup = Py_BuildValue("(iiOOOiO)", id1, id2, matches, dists,
                                      E, inlier_num, mask);
        Py_DECREF(matches); Py_DECREF(dists); Py_DECREF(E); Py_DECREF(mask);
        if (!tup) goto fail;
        if (PyList_Append(out, tup) != 0) { Py_DECREF(tup); goto fail; }
        Py_DECREF(tup);
    }
    free(b.data);
    return out;

corrupt:
    PyErr_Format(PyExc_ValueError, "corrupt frame-pair file %s", path);
fail:
    free(b.data);
    Py_XDECREF(out);
    return NULL;
}

static PyMethodDef Methods[] = {
    {"read_features", (PyCFunction)read_features,
     METH_VARARGS | METH_KEYWORDS, "Parse a reference-format ftr.bin."},
    {"read_frame_pairs", read_frame_pairs, METH_VARARGS,
     "Parse a reference-format fp.bin."},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "xrsfm_native", "Native I/O for xrsfm_tpu", -1,
    Methods,
};

PyMODINIT_FUNC PyInit_xrsfm_native(void) {
    PyObject *m = PyModule_Create(&moduledef);
    if (!m) return NULL;
    import_array();
    return m;
}
