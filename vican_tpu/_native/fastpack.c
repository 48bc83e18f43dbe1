/* fastpack — C packing kernel for the edge-dict host boundary.
 *
 * The reference spends its host time in Python dict loops
 * (vican/bipgo.py:203-223, 445-469); our solver needs the same boundary
 * crossed once per solve: filter edges, parse "<t>_<marker>" keys, build
 * node-index maps, convert rotations to quaternions (the compact device
 * transfer format — 4 floats/edge instead of 9 over the bandwidth-bound
 * host link), and fill the fused per-edge buffers the device program
 * consumes in TWO H2D transfers:
 *
 *   edata (E, 9)  [qw qx qy qz | tx ty tz | k_r k_t]   float32/float64
 *   eidx  (E, 3)  [cam, time, marker]                  int32
 *
 * Everything is a single pass over the dict; only the user-supplied
 * callables (edge_filter, noise_model_r/t — arbitrary Python, main.ipynb
 * cells 3/7) are invoked through the interpreter.  The orthonormality /
 * properness gate for the quaternion transfer runs over EVERY edge here
 * (in doubles) at no extra pass.
 *
 * Exposed as vican_tpu._native.fastpack.pack_edges2(); the pure-Python
 * fallback lives in vican_tpu/solver/packing.py and produces equivalent
 * output (tested in tests/test_packing.py).
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <math.h>
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

/* Intern a node id string into (map, list); returns its index or -1. */
static long intern_id(PyObject *map, PyObject *list, PyObject *s) {
    PyObject *pv = PyDict_GetItemWithError(map, s); /* borrowed */
    if (pv != NULL) return PyLong_AsLong(pv);
    if (PyErr_Occurred()) return -1;
    long idx = (long)PyList_GET_SIZE(list);
    if (PyList_Append(list, s) < 0) return -1;
    pv = PyLong_FromLong(idx);
    if (pv == NULL) return -1;
    int bad = PyDict_SetItem(map, s, pv);
    Py_DECREF(pv);
    return bad ? -1 : idx;
}

/* pack_edges2(src_edges, edge_filter, noise_r, noise_t, marker2idx, f64)
 *   -> (edata bytearray, eidx bytearray, raw bytearray, cam_list, time_list,
 *       E, skipped, ortho_ok)
 * cam_list/time_list hold the unique id strings in first-appearance order;
 * eidx stores indices into those provisional orders (the caller remaps to
 * lexicographic order — a vectorized numpy pass).  skipped counts edges
 * whose marker has no constraint.  ortho_ok is 1 iff every edge rotation is
 * orthonormal (max |R R^T - I| < 1e-3) and proper (det > 0.5): only then is
 * the quaternion transfer faithful to the raw matrices.  raw holds the
 * unconverted rotation entries (E x 9 doubles, row-major) so the caller can
 * take the raw-matrix path on gate failure WITHOUT re-running the user
 * callables (they may be stateful).
 */
static PyObject *pack_edges2(PyObject *self, PyObject *args) {
    PyObject *src_edges, *edge_filter, *noise_r, *noise_t, *marker2idx;
    int f64;
    if (!PyArg_ParseTuple(args, "OOOOOp", &src_edges, &edge_filter, &noise_r,
                          &noise_t, &marker2idx, &f64))
        return NULL;
    if (!PyDict_Check(src_edges)) {
        PyErr_SetString(PyExc_TypeError, "src_edges must be a dict");
        return NULL;
    }

    Py_ssize_t n = PyDict_Size(src_edges);
    size_t esz = f64 ? sizeof(double) : sizeof(float);
    PyObject *edata_ba = PyByteArray_FromStringAndSize(NULL, (n > 0 ? n : 1) * 9 * esz);
    PyObject *eidx_ba =
        PyByteArray_FromStringAndSize(NULL, (n > 0 ? n : 1) * 3 * sizeof(int32_t));
    PyObject *raw_ba =
        PyByteArray_FromStringAndSize(NULL, (n > 0 ? n : 1) * 9 * sizeof(double));
    PyObject *cam_map = PyDict_New(), *time_map = PyDict_New();
    PyObject *cam_list = PyList_New(0), *time_list = PyList_New(0);
    PyObject *pose_key = PyUnicode_InternFromString("pose");
    PyObject *pose_attr = PyUnicode_InternFromString("_pose");
    if (!edata_ba || !eidx_ba || !raw_ba || !cam_map || !time_map ||
        !cam_list || !time_list || !pose_key || !pose_attr)
        goto fail;

    {
        char *edata = PyByteArray_AS_STRING(edata_ba);
        int32_t *eidx = (int32_t *)PyByteArray_AS_STRING(eidx_ba);
        double *raw = (double *)PyByteArray_AS_STRING(raw_ba);
        double max_dev = 0.0, min_det = 1.0;
        Py_ssize_t E = 0, skipped = 0;

        PyObject *key, *value;
        Py_ssize_t pos = 0;
        while (PyDict_Next(src_edges, &pos, &key, &value)) {
            /* The buffers were sized from the dict's initial length; the
             * user callables run below and could (incorrectly) grow the
             * dict mid-iteration — guard the capacity instead of writing
             * past the allocations. */
            if (E >= n) {
                PyErr_SetString(PyExc_RuntimeError,
                                "edge dict grew during packing (noise-model/"
                                "edge-filter callables must not mutate it)");
                goto fail;
            }
            PyObject *keep = PyObject_CallOneArg(edge_filter, value);
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

            PyObject *midx_obj = PyDict_GetItem(marker2idx, m); /* borrowed */
            Py_DECREF(m);
            if (midx_obj == NULL) {
                skipped++;
                Py_DECREF(t);
                continue;
            }

            /* noise-model callables */
            PyObject *kr_obj = PyObject_CallOneArg(noise_r, value);
            if (kr_obj == NULL) { Py_DECREF(t); goto fail; }
            double kr = PyFloat_AsDouble(kr_obj);
            Py_DECREF(kr_obj);
            if (kr == -1.0 && PyErr_Occurred()) { Py_DECREF(t); goto fail; }
            PyObject *kt_obj = PyObject_CallOneArg(noise_t, value);
            if (kt_obj == NULL) { Py_DECREF(t); goto fail; }
            double kt = PyFloat_AsDouble(kt_obj);
            Py_DECREF(kt_obj);
            if (kt == -1.0 && PyErr_Occurred()) { Py_DECREF(t); goto fail; }

            /* pose 4x4 -> rotation rows + translation (doubles) */
            PyObject *pose = PyDict_GetItemWithError(value, pose_key);
            if (pose == NULL) {
                if (!PyErr_Occurred())
                    PyErr_Format(PyExc_KeyError, "edge %R has no 'pose'", key);
                Py_DECREF(t);
                goto fail;
            }
            PyObject *parr = PyObject_GetAttr(pose, pose_attr);
            if (parr == NULL) { Py_DECREF(t); goto fail; }
            Py_buffer src;
            if (PyObject_GetBuffer(parr, &src, PyBUF_CONTIG_RO) < 0) {
                Py_DECREF(parr);
                Py_DECREF(t);
                goto fail;
            }
            double m16[16];
            if (src.len == 16 * 4) {
                const float *sp = (const float *)src.buf;
                for (int i = 0; i < 16; i++) m16[i] = (double)sp[i];
            } else if (src.len == 16 * 8) {
                const double *sp = (const double *)src.buf;
                memcpy(m16, sp, sizeof(m16));
            } else {
                PyBuffer_Release(&src);
                Py_DECREF(parr);
                Py_DECREF(t);
                PyErr_SetString(PyExc_ValueError, "pose buffer is not 4x4 f32/f64");
                goto fail;
            }
            PyBuffer_Release(&src);
            Py_DECREF(parr);

            double r00 = m16[0], r01 = m16[1], r02 = m16[2], tx = m16[3];
            double r10 = m16[4], r11 = m16[5], r12 = m16[6], ty = m16[7];
            double r20 = m16[8], r21 = m16[9], r22 = m16[10], tz = m16[11];

            {
                double *rr = raw + E * 9;
                rr[0] = r00; rr[1] = r01; rr[2] = r02;
                rr[3] = r10; rr[4] = r11; rr[5] = r12;
                rr[6] = r20; rr[7] = r21; rr[8] = r22;
            }

            /* orthonormality / properness statistics (full-batch gate) */
            double d00 = r00 * r00 + r01 * r01 + r02 * r02 - 1.0;
            double d11 = r10 * r10 + r11 * r11 + r12 * r12 - 1.0;
            double d22 = r20 * r20 + r21 * r21 + r22 * r22 - 1.0;
            double d01 = r00 * r10 + r01 * r11 + r02 * r12;
            double d02 = r00 * r20 + r01 * r21 + r02 * r22;
            double d12 = r10 * r20 + r11 * r21 + r12 * r22;
            double dev = fabs(d00);
            if (fabs(d11) > dev) dev = fabs(d11);
            if (fabs(d22) > dev) dev = fabs(d22);
            if (fabs(d01) > dev) dev = fabs(d01);
            if (fabs(d02) > dev) dev = fabs(d02);
            if (fabs(d12) > dev) dev = fabs(d12);
            if (dev > max_dev) max_dev = dev;
            double det = r00 * (r11 * r22 - r12 * r21) -
                         r01 * (r10 * r22 - r12 * r20) +
                         r02 * (r10 * r21 - r11 * r20);
            if (det < min_det) min_det = det;

            /* Shepperd rotation -> quaternion (same branch selection as the
             * pure-Python _mat_to_quat) */
            double q0, q1, q2, q3, s;
            double tr = r00 + r11 + r22;
            if (tr > 0.0) {
                s = sqrt(fmax(tr + 1.0, 1e-12)) * 2.0;
                q0 = 0.25 * s;
                q1 = (r21 - r12) / s;
                q2 = (r02 - r20) / s;
                q3 = (r10 - r01) / s;
            } else if (r00 >= r11 && r00 >= r22) {
                s = sqrt(fmax(1.0 + r00 - r11 - r22, 1e-12)) * 2.0;
                q0 = (r21 - r12) / s;
                q1 = 0.25 * s;
                q2 = (r01 + r10) / s;
                q3 = (r02 + r20) / s;
            } else if (r11 >= r22) {
                s = sqrt(fmax(1.0 + r11 - r00 - r22, 1e-12)) * 2.0;
                q0 = (r02 - r20) / s;
                q1 = (r01 + r10) / s;
                q2 = 0.25 * s;
                q3 = (r12 + r21) / s;
            } else {
                s = sqrt(fmax(1.0 + r22 - r00 - r11, 1e-12)) * 2.0;
                q0 = (r10 - r01) / s;
                q1 = (r02 + r20) / s;
                q2 = (r12 + r21) / s;
                q3 = 0.25 * s;
            }
            double qn = sqrt(q0 * q0 + q1 * q1 + q2 * q2 + q3 * q3);
            if (qn < 1e-30) qn = 1e-30;
            q0 /= qn; q1 /= qn; q2 /= qn; q3 /= qn;

            if (f64) {
                double *row = (double *)edata + E * 9;
                row[0] = q0; row[1] = q1; row[2] = q2; row[3] = q3;
                row[4] = tx; row[5] = ty; row[6] = tz;
                row[7] = kr; row[8] = kt;
            } else {
                float *row = (float *)edata + E * 9;
                row[0] = (float)q0; row[1] = (float)q1;
                row[2] = (float)q2; row[3] = (float)q3;
                row[4] = (float)tx; row[5] = (float)ty; row[6] = (float)tz;
                row[7] = (float)kr; row[8] = (float)kt;
            }

            long ci = intern_id(cam_map, cam_list, cam);
            long ti = intern_id(time_map, time_list, t);
            Py_DECREF(t);
            if (ci < 0 || ti < 0) goto fail;
            long mi = PyLong_AsLong(midx_obj);
            if (mi == -1 && PyErr_Occurred()) goto fail;
            eidx[E * 3 + 0] = (int32_t)ci;
            eidx[E * 3 + 1] = (int32_t)ti;
            eidx[E * 3 + 2] = (int32_t)mi;
            E++;
        }

        if (PyByteArray_Resize(edata_ba, E * 9 * esz) < 0) goto fail;
        if (PyByteArray_Resize(eidx_ba, E * 3 * sizeof(int32_t)) < 0) goto fail;
        if (PyByteArray_Resize(raw_ba, E * 9 * sizeof(double)) < 0) goto fail;
        Py_DECREF(cam_map);
        Py_DECREF(time_map);
        Py_DECREF(pose_key);
        Py_DECREF(pose_attr);
        int ortho_ok = (E == 0) || (max_dev < 1e-3 && min_det > 0.5);
        return Py_BuildValue("(NNNNNnni)", edata_ba, eidx_ba, raw_ba, cam_list,
                             time_list, E, skipped, ortho_ok);
    }

fail:
    Py_XDECREF(edata_ba);
    Py_XDECREF(eidx_ba);
    Py_XDECREF(raw_ba);
    Py_XDECREF(cam_map);
    Py_XDECREF(time_map);
    Py_XDECREF(cam_list);
    Py_XDECREF(time_list);
    Py_XDECREF(pose_key);
    Py_XDECREF(pose_attr);
    return NULL;
}

static PyMethodDef methods[] = {
    {"pack_edges2", pack_edges2, METH_VARARGS,
     "One-pass edge-dict -> fused (E,9)+(E,3) device buffers."},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "fastpack", NULL, -1, methods,
};

PyMODINIT_FUNC PyInit_fastpack(void) { return PyModule_Create(&moduledef); }
