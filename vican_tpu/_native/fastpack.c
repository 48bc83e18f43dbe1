/* fastpack — C packing kernel for the edge-dict host boundary.
 *
 * The reference spends its host time in Python dict loops
 * (vican/bipgo.py:203-223, 445-469); our solver needs the same boundary
 * crossed once per solve: filter edges, parse "<t>_<marker>" keys, build
 * node-index maps, and fill the per-edge arrays.  This module does the
 * structural work in C; only the user-supplied callables (edge_filter,
 * noise_model_r/t — arbitrary Python, main.ipynb cells 3/7) are still
 * invoked through the interpreter.
 *
 * Exposed as vican_tpu._native.fastpack.pack_edges(); the pure-Python
 * fallback lives in vican_tpu/solver/packing.py and produces identical
 * output (tested in tests/test_packing.py).
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <stdint.h>
#include <string.h>

/* Split "t_m" at the first underscore; returns new references. */
static int split_tm(PyObject *tm, PyObject **t_out, PyObject **m_out) {
    Py_ssize_t len;
    const char *s = PyUnicode_AsUTF8AndSize(tm, &len);
    if (s == NULL) return -1;
    const char *us = memchr(s, '_', (size_t)len);
    if (us == NULL) {
        PyErr_Format(PyExc_ValueError, "edge key %R has no '_'", tm);
        return -1;
    }
    *t_out = PyUnicode_FromStringAndSize(s, us - s);
    *m_out = PyUnicode_FromStringAndSize(us + 1, len - (us - s) - 1);
    if (*t_out == NULL || *m_out == NULL) {
        Py_XDECREF(*t_out);
        Py_XDECREF(*m_out);
        return -1;
    }
    return 0;
}

/* pack_edges(src_edges, edge_filter, noise_r, noise_t, marker2idx)
 *   -> (kept_values, cams, times, markers, k_r, k_t, skipped)
 * where kept_values is a list of the kept edge dicts (for pose extraction in
 * numpy), cams/times are lists of str, markers a list of int indexes,
 * k_r/k_t lists of floats, and skipped counts edges whose marker has no
 * constraint (dropped — the solver cannot fold them).
 */
static PyObject *pack_edges(PyObject *self, PyObject *args) {
    PyObject *src_edges, *edge_filter, *noise_r, *noise_t, *marker2idx;
    if (!PyArg_ParseTuple(args, "OOOOO", &src_edges, &edge_filter, &noise_r,
                          &noise_t, &marker2idx))
        return NULL;
    if (!PyDict_Check(src_edges)) {
        PyErr_SetString(PyExc_TypeError, "src_edges must be a dict");
        return NULL;
    }

    Py_ssize_t n = PyDict_Size(src_edges);
    Py_ssize_t skipped = 0;
    PyObject *kept = PyList_New(0);
    PyObject *cams = PyList_New(0);
    PyObject *times = PyList_New(0);
    PyObject *markers = PyList_New(0);
    PyObject *krs = PyList_New(0);
    PyObject *kts = PyList_New(0);
    if (!kept || !cams || !times || !markers || !krs || !kts) goto fail;

    PyObject *key, *value;
    Py_ssize_t pos = 0;
    while (PyDict_Next(src_edges, &pos, &key, &value)) {
        /* edge_filter(v) */
        PyObject *keep = PyObject_CallFunctionObjArgs(edge_filter, value, NULL);
        if (keep == NULL) goto fail;
        int truth = PyObject_IsTrue(keep);
        Py_DECREF(keep);
        if (truth < 0) goto fail;
        if (!truth) continue;

        if (!PyTuple_Check(key) || PyTuple_GET_SIZE(key) != 2) {
            PyErr_Format(PyExc_TypeError, "edge key %R is not a 2-tuple", key);
            goto fail;
        }
        PyObject *cam = PyTuple_GET_ITEM(key, 0);
        PyObject *tm = PyTuple_GET_ITEM(key, 1);
        PyObject *t = NULL, *m = NULL;
        if (split_tm(tm, &t, &m) < 0) goto fail;

        PyObject *midx = PyDict_GetItem(marker2idx, m); /* borrowed */
        if (midx == NULL) {
            /* no constraint for this marker: the edge cannot be folded */
            skipped++;
            Py_DECREF(t);
            Py_DECREF(m);
            continue;
        }
        Py_DECREF(m);

        PyObject *kr = PyObject_CallFunctionObjArgs(noise_r, value, NULL);
        if (kr == NULL) { Py_DECREF(t); goto fail; }
        PyObject *kt = PyObject_CallFunctionObjArgs(noise_t, value, NULL);
        if (kt == NULL) { Py_DECREF(t); Py_DECREF(kr); goto fail; }

        int bad = PyList_Append(kept, value) || PyList_Append(cams, cam) ||
                  PyList_Append(times, t) || PyList_Append(markers, midx) ||
                  PyList_Append(krs, kr) || PyList_Append(kts, kt);
        Py_DECREF(t);
        Py_DECREF(kr);
        Py_DECREF(kt);
        if (bad) goto fail;
    }
    (void)n;
    return Py_BuildValue("(NNNNNNn)", kept, cams, times, markers, krs, kts, skipped);

fail:
    Py_XDECREF(kept);
    Py_XDECREF(cams);
    Py_XDECREF(times);
    Py_XDECREF(markers);
    Py_XDECREF(krs);
    Py_XDECREF(kts);
    return NULL;
}

/* fill_f32(dst_buffer, objs, attr, count_per_item)
 * Copies float data from numpy arrays held on Python objects (attribute
 * lookup done once per item) into a contiguous float32 buffer.
 * dst must be a writable buffer of len(objs)*count floats.
 * Supports float32 and float64 sources (C-contiguous).
 */
static PyObject *fill_f32(PyObject *self, PyObject *args) {
    Py_buffer dst;
    PyObject *objs;
    const char *attr;
    Py_ssize_t count;
    if (!PyArg_ParseTuple(args, "w*Osn", &dst, &objs, &attr, &count))
        return NULL;
    Py_ssize_t n = PyList_GET_SIZE(objs);
    if (dst.len < (Py_ssize_t)(n * count * sizeof(float))) {
        PyBuffer_Release(&dst);
        PyErr_SetString(PyExc_ValueError, "destination too small");
        return NULL;
    }
    float *out = (float *)dst.buf;
    PyObject *attr_obj = PyUnicode_FromString(attr);
    for (Py_ssize_t i = 0; i < n; i++) {
        PyObject *item = PyList_GET_ITEM(objs, i);
        PyObject *arr = PyObject_GetAttr(item, attr_obj);
        if (arr == NULL) goto fail;
        Py_buffer src;
        if (PyObject_GetBuffer(arr, &src, PyBUF_CONTIG_RO | PyBUF_FORMAT) < 0) {
            Py_DECREF(arr);
            goto fail;
        }
        Py_ssize_t items = src.len / src.itemsize;
        if (items < count) {
            PyBuffer_Release(&src);
            Py_DECREF(arr);
            PyErr_SetString(PyExc_ValueError, "source too small");
            goto fail;
        }
        if (src.itemsize == 4) {
            memcpy(out + i * count, src.buf, (size_t)count * 4);
        } else if (src.itemsize == 8) {
            const double *sp = (const double *)src.buf;
            float *op = out + i * count;
            for (Py_ssize_t j = 0; j < count; j++) op[j] = (float)sp[j];
        } else {
            PyBuffer_Release(&src);
            Py_DECREF(arr);
            PyErr_SetString(PyExc_TypeError, "unsupported dtype");
            goto fail;
        }
        PyBuffer_Release(&src);
        Py_DECREF(arr);
    }
    Py_DECREF(attr_obj);
    PyBuffer_Release(&dst);
    Py_RETURN_NONE;

fail:
    Py_DECREF(attr_obj);
    PyBuffer_Release(&dst);
    return NULL;
}

static PyMethodDef methods[] = {
    {"pack_edges", pack_edges, METH_VARARGS,
     "Filter + parse an edge dict (structural work in C)."},
    {"fill_f32", fill_f32, METH_VARARGS,
     "Copy per-object array attributes into a contiguous float32 buffer."},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "fastpack", NULL, -1, methods,
};

PyMODINIT_FUNC PyInit_fastpack(void) { return PyModule_Create(&moduledef); }
