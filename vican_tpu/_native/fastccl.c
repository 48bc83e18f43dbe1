/* fastccl — connected components + quad candidates for marker detection.
 *
 * Labeling is irregular pointer-chasing work that a CPU beats any
 * dense-tensor formulation at; the detection pipeline therefore splits:
 * dense numerics (threshold sweep, subpixel refinement, bit decoding, PnP)
 * on the TPU, component labeling + coarse quad extraction here.
 * Quality-equivalent to OpenCV's contour stage (8-connected, reference
 * cam.py:147's detectMarkers internals).
 *
 * RUN-BASED union-find: foreground pixels are grouped into per-row runs
 * and the union-find operates on runs, not pixels — ~20x fewer unions and
 * no megapixel parent array (the per-pixel variant measured ~16 ms/image
 * across the 7-window sweep at 720p; runs take ~2 ms).  Component stats
 * come from run arithmetic (sum over a run is a closed form), and the
 * farthest-point corner scans evaluate RUN ENDPOINTS only: all three
 * selection metrics (squared distance from a point, and the signed cross
 * product against a line) are convex/linear in x along a run, so their
 * maximum over the run is attained at an endpoint; endpoints are evaluated
 * in (y, x) scan order with strict '>' comparisons, reproducing the
 * pixel-sweep's tie-breaking exactly.
 *
 * Exposed as vican_tpu._native.fastccl.quad_candidates[_packed]();
 * validated against the pure-jnp fallback in tests/test_detect.py.
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <math.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

typedef struct {
    int32_t area;
    int64_t sx, sy; /* centroid accumulators */
} Stats;

static int32_t find_root(int32_t *parent, int32_t x) {
    while (parent[x] != x) {
        parent[x] = parent[parent[x]]; /* path halving */
        x = parent[x];
    }
    return x;
}

static void unite(int32_t *parent, int32_t a, int32_t b) {
    a = find_root(parent, a);
    b = find_root(parent, b);
    if (a < b) parent[b] = a;
    else if (b < a) parent[a] = b;
}

/* quad_candidates(fg_bytes, H, W, K, min_area, max_area)
 *   fg_bytes: contiguous uint8 (H*W), nonzero = foreground
 * quad_candidates_packed(packed_bytes, H, W, Wb, K, min_area, max_area)
 *   packed_bytes: contiguous (H, Wb) with bit x of a row at
 *   row[x >> 3] >> (x & 7) (np.packbits bitorder="little") — the exact
 *   layout fastthresh.c and the device threshold program emit, so the
 *   ~8x-larger unpacked mask is never materialized on the host.
 * Both return (corners float32 (K,4,2), areas int32 (K,), count).
 * Corners use the farthest-point geometry (p1 = farthest from centroid,
 * p2 = farthest from p1, p3/p4 = extremes of signed distance to p1-p2),
 * cyclic order p1, p3, p2, p4.
 */
static PyObject *qc_impl(Py_buffer *fg, Py_ssize_t H, Py_ssize_t W,
                         Py_ssize_t Wb, Py_ssize_t K,
                         double min_area, double max_area) {
    const int packed = Wb > 0;
    const Py_ssize_t stride = packed ? Wb : W;
    if (fg->len < H * stride) {
        PyBuffer_Release(fg);
        PyErr_SetString(PyExc_ValueError, "fg buffer too small");
        return NULL;
    }
    const uint8_t *im = (const uint8_t *)fg->buf;

    /* ---- pass 1: extract runs per row, unite 8-connected overlaps ---- */
    int32_t rcap = 4096, nruns = 0;
    int32_t *rs = (int32_t *)malloc((size_t)rcap * sizeof(int32_t)); /* start x */
    int32_t *re = (int32_t *)malloc((size_t)rcap * sizeof(int32_t)); /* end x (incl) */
    int32_t *ry = (int32_t *)malloc((size_t)rcap * sizeof(int32_t)); /* row */
    int32_t *parent = (int32_t *)malloc((size_t)rcap * sizeof(int32_t));
    int32_t *row_first = (int32_t *)malloc(((size_t)H + 1) * sizeof(int32_t));
    if (!rs || !re || !ry || !parent || !row_first) {
        free(rs); free(re); free(ry); free(parent); free(row_first);
        PyBuffer_Release(fg);
        return PyErr_NoMemory();
    }

    for (int32_t y = 0; y < H; y++) {
        row_first[y] = nruns;
        const uint8_t *row = im + (size_t)y * stride;
        int32_t prev_lo = y > 0 ? row_first[y - 1] : 0;
        int32_t prev_hi = y > 0 ? row_first[y] : 0; /* [prev_lo, prev_hi) */
        int32_t j = prev_lo;
        int32_t x = 0;
        while (x < W) {
            int32_t s, e;
            if (packed) {
                /* find next set bit from x */
                int32_t xb = x >> 3;
                uint8_t bits = (uint8_t)(row[xb] >> (x & 7));
                while (!bits) {
                    xb++;
                    if (xb >= Wb) break;
                    bits = row[xb];
                    x = xb << 3;
                }
                if (xb >= Wb || x >= W) break;
                x += (int32_t)__builtin_ctz(bits);
                if (x >= W) break;
                s = x;
                /* find run end: first zero bit at/after x (bits beyond the
                 * byte shift in as zeros of invb, so invb == 0 means the
                 * rest of the byte is all ones) */
                while (x < W) {
                    int32_t xb2 = x >> 3;
                    uint32_t invb = (uint32_t)((uint8_t)~row[xb2]) >> (x & 7);
                    if (invb) { x += (int32_t)__builtin_ctz(invb); break; }
                    x = (xb2 + 1) << 3;
                }
                if (x > W) x = (int32_t)W;
                e = x - 1;
            } else {
                while (x < W && !row[x]) x++;
                if (x >= W) break;
                s = x;
                while (x < W && row[x]) x++;
                e = x - 1;
            }
            if (nruns == rcap) {
                rcap *= 2;
                rs = (int32_t *)realloc(rs, (size_t)rcap * sizeof(int32_t));
                re = (int32_t *)realloc(re, (size_t)rcap * sizeof(int32_t));
                ry = (int32_t *)realloc(ry, (size_t)rcap * sizeof(int32_t));
                parent = (int32_t *)realloc(parent, (size_t)rcap * sizeof(int32_t));
            }
            int32_t i = nruns++;
            rs[i] = s; re[i] = e; ry[i] = y; parent[i] = i;
            /* unite with previous-row runs overlapping [s-1, e+1] (8-conn) */
            while (j < prev_hi && re[j] < s - 1) j++;
            for (int32_t k = j; k < prev_hi && rs[k] <= e + 1; k++)
                unite(parent, i, k);
        }
    }
    row_first[H] = nruns;

    /* ---- pass 2: per-root stats over runs ---- */
    int32_t *slot = (int32_t *)malloc((size_t)nruns * sizeof(int32_t));
    int cap = 256, nstats = 0;
    Stats *stats = (Stats *)malloc((size_t)cap * sizeof(Stats));
    if ((!slot && nruns > 0) || !stats) {
        free(rs); free(re); free(ry); free(parent); free(row_first);
        free(slot); free(stats);
        PyBuffer_Release(fg);
        return PyErr_NoMemory();
    }
    for (int32_t i = 0; i < nruns; i++) {
        int32_t r = find_root(parent, i);
        parent[i] = r;
        int32_t s;
        if (r == i) {
            if (nstats == cap) {
                cap *= 2;
                stats = (Stats *)realloc(stats, (size_t)cap * sizeof(Stats));
            }
            s = nstats++;
            slot[i] = s;
            stats[s] = (Stats){0, 0, 0};
        } else {
            s = slot[r]; /* roots precede children (unions keep min index) */
        }
        slot[i] = s;
        Stats *st = &stats[s];
        int64_t len = re[i] - rs[i] + 1;
        st->area += (int32_t)len;
        st->sx += (int64_t)(rs[i] + re[i]) * len / 2;
        st->sy += (int64_t)ry[i] * len;
    }

    /* ---- rank components by area, keep top-K within [min, max] ---- */
    int *order = (int *)malloc((size_t)(nstats > 0 ? nstats : 1) * sizeof(int));
    int nkeep = 0;
    for (int s = 0; s < nstats; s++)
        if (stats[s].area >= (int32_t)min_area && stats[s].area <= (int32_t)max_area)
            order[nkeep++] = s;
    if (nkeep > K) {
        for (int a = 0; a < K; a++) {
            int best = a;
            for (int b = a + 1; b < nkeep; b++)
                if (stats[order[b]].area > stats[order[best]].area) best = b;
            int tmp = order[a]; order[a] = order[best]; order[best] = tmp;
        }
        nkeep = (int)K;
    }

    float *corners = (float *)calloc((size_t)K * 8, sizeof(float));
    int32_t *areas = (int32_t *)calloc((size_t)K, sizeof(int32_t));

    /* ---- compact run lists for the kept components (one sweep) ---- */
    int32_t *keep = (int32_t *)malloc((size_t)(nstats > 0 ? nstats : 1) * sizeof(int32_t));
    for (int s = 0; s < nstats; s++) keep[s] = -1;
    int64_t total_runs = 0;
    int32_t *runcnt = (int32_t *)calloc((size_t)(nkeep > 0 ? nkeep : 1), sizeof(int32_t));
    for (int a = 0; a < nkeep; a++) keep[order[a]] = a;
    for (int32_t i = 0; i < nruns; i++) {
        int32_t a = keep[slot[i]];
        if (a >= 0) { runcnt[a]++; total_runs++; }
    }
    int64_t *off = (int64_t *)malloc(((size_t)nkeep + 1) * sizeof(int64_t));
    int32_t *lst = (int32_t *)malloc((size_t)(total_runs > 0 ? total_runs : 1) * sizeof(int32_t));
    off[0] = 0;
    for (int a = 0; a < nkeep; a++) off[a + 1] = off[a] + runcnt[a];
    int64_t *fill = (int64_t *)malloc(((size_t)nkeep + 1) * sizeof(int64_t));
    memcpy(fill, off, ((size_t)nkeep + 1) * sizeof(int64_t));
    for (int32_t i = 0; i < nruns; i++) {
        int32_t a = keep[slot[i]];
        if (a >= 0) lst[fill[a]++] = i; /* run-index order == (y, x) order */
    }

    /* ---- farthest-point corners from run endpoints ---- */
    for (int a = 0; a < nkeep; a++) {
        Stats *st = &stats[order[a]];
        const int32_t *runs = lst + off[a];
        const int64_t nr = off[a + 1] - off[a];
        double cx = (double)st->sx / st->area;
        double cy = (double)st->sy / st->area;
        double p1x = cx, p1y = cy, best = -1.0;
        for (int64_t t = 0; t < nr; t++) {
            int32_t i = runs[t];
            double y = ry[i];
            double xs2[2] = {(double)rs[i], (double)re[i]};
            for (int u = 0; u < 2; u++) {
                double d = (xs2[u] - cx) * (xs2[u] - cx) + (y - cy) * (y - cy);
                if (d > best) { best = d; p1x = xs2[u]; p1y = y; }
            }
        }
        double p2x = p1x, p2y = p1y;
        best = -1.0;
        for (int64_t t = 0; t < nr; t++) {
            int32_t i = runs[t];
            double y = ry[i];
            double xs2[2] = {(double)rs[i], (double)re[i]};
            for (int u = 0; u < 2; u++) {
                double d = (xs2[u] - p1x) * (xs2[u] - p1x) + (y - p1y) * (y - p1y);
                if (d > best) { best = d; p2x = xs2[u]; p2y = y; }
            }
        }
        double dx = p2x - p1x, dy = p2y - p1y;
        double p3x = p1x, p3y = p1y, p4x = p2x, p4y = p2y;
        double bmax = -1e30, bmin = 1e30;
        for (int64_t t = 0; t < nr; t++) {
            int32_t i = runs[t];
            double y = ry[i];
            double xs2[2] = {(double)rs[i], (double)re[i]};
            for (int u = 0; u < 2; u++) {
                double c = (xs2[u] - p1x) * dy - (y - p1y) * dx;
                if (c > bmax) { bmax = c; p3x = xs2[u]; p3y = y; }
                if (c < bmin) { bmin = c; p4x = xs2[u]; p4y = y; }
            }
        }
        float *q = corners + (size_t)a * 8;
        q[0] = (float)p1x; q[1] = (float)p1y;
        q[2] = (float)p3x; q[3] = (float)p3y;
        q[4] = (float)p2x; q[5] = (float)p2y;
        q[6] = (float)p4x; q[7] = (float)p4y;
        areas[a] = st->area;
    }

    free(fill); free(lst); free(off); free(runcnt); free(keep);
    free(order); free(stats); free(slot);
    free(rs); free(re); free(ry); free(parent); free(row_first);
    PyBuffer_Release(fg);

    PyObject *c_bytes = PyBytes_FromStringAndSize((char *)corners, (Py_ssize_t)K * 8 * sizeof(float));
    PyObject *a_bytes = PyBytes_FromStringAndSize((char *)areas, (Py_ssize_t)K * sizeof(int32_t));
    free(corners);
    free(areas);
    return Py_BuildValue("(NNi)", c_bytes, a_bytes, nkeep);
}

static PyObject *quad_candidates(PyObject *self, PyObject *args) {
    Py_buffer fg;
    Py_ssize_t H, W, K;
    double min_area, max_area;
    if (!PyArg_ParseTuple(args, "y*nnndd", &fg, &H, &W, &K, &min_area, &max_area))
        return NULL;
    return qc_impl(&fg, H, W, 0, K, min_area, max_area);
}

static PyObject *quad_candidates_packed(PyObject *self, PyObject *args) {
    Py_buffer fg;
    Py_ssize_t H, W, Wb, K;
    double min_area, max_area;
    if (!PyArg_ParseTuple(args, "y*nnnndd", &fg, &H, &W, &Wb, &K, &min_area, &max_area))
        return NULL;
    if (Wb * 8 < W) {
        PyBuffer_Release(&fg);
        PyErr_SetString(PyExc_ValueError, "Wb too small for W");
        return NULL;
    }
    return qc_impl(&fg, H, W, Wb, K, min_area, max_area);
}

static PyMethodDef methods[] = {
    {"quad_candidates", quad_candidates, METH_VARARGS,
     "Run-based union-find CCL + farthest-point quad corners."},
    {"quad_candidates_packed", quad_candidates_packed, METH_VARARGS,
     "Same, reading a bit-packed (H, Wb) mask (np.packbits little-endian)."},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "fastccl", NULL, -1, methods,
};

PyMODINIT_FUNC PyInit_fastccl(void) { return PyModule_Create(&moduledef); }
