/* fastpack — native batch assembly for the transfusion packer.
 *
 * The host-side hot loop of the training pipeline (SURVEY.md §3.1: the
 * reference rebuilds padded tensors per step in Python,
 * transfusion.py:2486-2656). This extension assembles the packed text-id /
 * cfg-mask / span buffers for a whole batch in one C pass; the Python packer
 * (transfusion_tpu/data/packing.py) delegates here when available and keeps
 * a pure-numpy fallback with identical semantics (tested equal).
 *
 * Item descriptors per sample (prepared by Python, cheap):
 *   ('t', int32 ndarray ids, cfg_maskable: int)
 *   ('m', modality_type: int, head int32 ndarray (meta ids, may be empty),
 *         interior_len: int, eom_id: int or -1)
 *
 * Returns (text [b,n] i32, cfg [b,n] bool, spans [b,m,3] i32, lengths [b] i32).
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <numpy/arrayobject.h>

#include <cstdint>
#include <vector>

static PyObject *pack_batch(PyObject *, PyObject *args) {
  PyObject *batch;  // list[list[tuple]]
  long n_pad, m_pad;
  if (!PyArg_ParseTuple(args, "Oll", &batch, &n_pad, &m_pad)) return nullptr;

  if (!PyList_Check(batch)) {
    PyErr_SetString(PyExc_TypeError, "batch must be a list");
    return nullptr;
  }
  const Py_ssize_t b = PyList_GET_SIZE(batch);

  npy_intp text_dims[2] = {b, n_pad};
  npy_intp span_dims[3] = {b, m_pad, 3};
  npy_intp len_dims[1] = {b};

  PyArrayObject *text =
      (PyArrayObject *)PyArray_SimpleNew(2, text_dims, NPY_INT32);
  PyArrayObject *cfg =
      (PyArrayObject *)PyArray_SimpleNew(2, text_dims, NPY_BOOL);
  PyArrayObject *spans =
      (PyArrayObject *)PyArray_ZEROS(3, span_dims, NPY_INT32, 0);
  PyArrayObject *lengths =
      (PyArrayObject *)PyArray_SimpleNew(1, len_dims, NPY_INT32);
  if (!text || !cfg || !spans || !lengths) return nullptr;

  int32_t *text_p = (int32_t *)PyArray_DATA(text);
  npy_bool *cfg_p = (npy_bool *)PyArray_DATA(cfg);
  int32_t *spans_p = (int32_t *)PyArray_DATA(spans);
  int32_t *len_p = (int32_t *)PyArray_DATA(lengths);

  for (npy_intp i = 0; i < b * n_pad; i++) text_p[i] = -1;
  for (npy_intp i = 0; i < b * n_pad; i++) cfg_p[i] = NPY_FALSE;

  for (Py_ssize_t bi = 0; bi < b; bi++) {
    PyObject *sample = PyList_GET_ITEM(batch, bi);
    if (!PyList_Check(sample)) {
      PyErr_SetString(PyExc_TypeError, "sample must be a list");
      return nullptr;
    }
    int32_t *trow = text_p + bi * n_pad;
    npy_bool *crow = cfg_p + bi * n_pad;
    int32_t *srow = spans_p + bi * m_pad * 3;

    long off = 0;
    long span_i = 0;

    const Py_ssize_t n_items = PyList_GET_SIZE(sample);
    for (Py_ssize_t ii = 0; ii < n_items; ii++) {
      PyObject *item = PyList_GET_ITEM(sample, ii);
      const char *kind =
          PyUnicode_AsUTF8(PyTuple_GET_ITEM(item, 0));
      if (!kind) return nullptr;

      if (kind[0] == 't') {
        PyArrayObject *ids = (PyArrayObject *)PyTuple_GET_ITEM(item, 1);
        long maskable = PyLong_AsLong(PyTuple_GET_ITEM(item, 2));
        const long ln = (long)PyArray_DIM(ids, 0);
        if (off + ln > n_pad) {
          PyErr_SetString(PyExc_ValueError, "pad_len too small");
          return nullptr;
        }
        const int32_t *src = (const int32_t *)PyArray_DATA(ids);
        for (long j = 0; j < ln; j++) {
          trow[off + j] = src[j];
          crow[off + j] = maskable ? NPY_TRUE : NPY_FALSE;
        }
        off += ln;
      } else {  // modality
        long mtype = PyLong_AsLong(PyTuple_GET_ITEM(item, 1));
        PyArrayObject *head = (PyArrayObject *)PyTuple_GET_ITEM(item, 2);
        long interior = PyLong_AsLong(PyTuple_GET_ITEM(item, 3));
        long eom = PyLong_AsLong(PyTuple_GET_ITEM(item, 4));

        const long hl = (long)PyArray_DIM(head, 0);
        const long total = hl + interior + (eom >= 0 ? 1 : 0);
        if (off + total > n_pad) {
          PyErr_SetString(PyExc_ValueError, "pad_len too small");
          return nullptr;
        }
        const int32_t *hsrc = (const int32_t *)PyArray_DATA(head);
        for (long j = 0; j < hl; j++) trow[off + j] = hsrc[j];
        // interior already -1 from the fill
        if (span_i >= m_pad) {
          PyErr_SetString(PyExc_ValueError, "max_spans too small");
          return nullptr;
        }
        srow[span_i * 3 + 0] = (int32_t)mtype;
        srow[span_i * 3 + 1] = (int32_t)(off + hl);
        srow[span_i * 3 + 2] = (int32_t)interior;
        span_i++;

        off += hl + interior;
        if (eom >= 0) {
          trow[off] = (int32_t)eom;
          off += 1;
        }
      }
    }
    len_p[bi] = (int32_t)off;
  }

  PyObject *out = PyTuple_Pack(4, (PyObject *)text, (PyObject *)cfg,
                               (PyObject *)spans, (PyObject *)lengths);
  Py_DECREF(text);
  Py_DECREF(cfg);
  Py_DECREF(spans);
  Py_DECREF(lengths);
  return out;
}

static PyMethodDef Methods[] = {
    {"pack_batch", pack_batch, METH_VARARGS,
     "Assemble packed text/cfg/span buffers for a batch."},
    {nullptr, nullptr, 0, nullptr},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_fastpack", nullptr, -1, Methods,
};

PyMODINIT_FUNC PyInit__fastpack(void) {
  import_array();
  return PyModule_Create(&moduledef);
}
