// Native length-prefixed stream framing for distributions_tpu.io.stream.
//
// Implements the reference's protobuf-stream container format (reference
// distributions/io/stream.py:141-172 and include/distributions/io/
// protobuf_stream semantics): uint32 little-endian length prefix per frame.
// This is the host-side IO hot path for checkpoint streams; the python
// fallback in io/stream.py has identical semantics.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <cstdio>
#include <string>
#include <vector>

namespace {

struct FileCloser {
    std::FILE* f;
    ~FileCloser() { if (f) std::fclose(f); }
};

PyObject* stream_dump(PyObject*, PyObject* args) {
    PyObject* items;
    const char* filename;
    if (!PyArg_ParseTuple(args, "Os", &items, &filename)) return nullptr;

    PyObject* seq = PySequence_Fast(items, "expected a sequence of bytes");
    if (!seq) return nullptr;

    std::FILE* f = std::fopen(filename, "wb");
    if (!f) {
        Py_DECREF(seq);
        PyErr_SetFromErrnoWithFilename(PyExc_IOError, filename);
        return nullptr;
    }
    FileCloser closer{f};
    // large buffer: frames are typically small; amortize syscalls
    setvbuf(f, nullptr, _IOFBF, 1 << 20);

    Py_ssize_t n = PySequence_Fast_GET_SIZE(seq);
    for (Py_ssize_t i = 0; i < n; ++i) {
        PyObject* item = PySequence_Fast_GET_ITEM(seq, i);
        char* buf;
        Py_ssize_t len;
        if (PyBytes_AsStringAndSize(item, &buf, &len) < 0) {
            Py_DECREF(seq);
            return nullptr;
        }
        uint32_t len32 = static_cast<uint32_t>(len);
        unsigned char prefix[4] = {
            static_cast<unsigned char>(len32 & 0xff),
            static_cast<unsigned char>((len32 >> 8) & 0xff),
            static_cast<unsigned char>((len32 >> 16) & 0xff),
            static_cast<unsigned char>((len32 >> 24) & 0xff),
        };
        if (std::fwrite(prefix, 1, 4, f) != 4 ||
            (len && std::fwrite(buf, 1, len, f)
                != static_cast<size_t>(len))) {
            Py_DECREF(seq);
            PyErr_SetFromErrnoWithFilename(PyExc_IOError, filename);
            return nullptr;
        }
    }
    Py_DECREF(seq);
    Py_RETURN_NONE;
}

PyObject* stream_load(PyObject*, PyObject* args) {
    const char* filename;
    if (!PyArg_ParseTuple(args, "s", &filename)) return nullptr;

    std::FILE* f = std::fopen(filename, "rb");
    if (!f) {
        PyErr_SetFromErrnoWithFilename(PyExc_IOError, filename);
        return nullptr;
    }
    FileCloser closer{f};
    setvbuf(f, nullptr, _IOFBF, 1 << 20);

    PyObject* out = PyList_New(0);
    if (!out) return nullptr;

    std::vector<char> buf;
    for (;;) {
        unsigned char prefix[4];
        size_t got = std::fread(prefix, 1, 4, f);
        if (got == 0) break;  // clean EOF
        if (got < 4) {
            Py_DECREF(out);
            PyErr_SetString(PyExc_IOError, "truncated frame prefix");
            return nullptr;
        }
        uint32_t len = static_cast<uint32_t>(prefix[0])
                     | (static_cast<uint32_t>(prefix[1]) << 8)
                     | (static_cast<uint32_t>(prefix[2]) << 16)
                     | (static_cast<uint32_t>(prefix[3]) << 24);
        buf.resize(len);
        if (len && std::fread(buf.data(), 1, len, f) != len) {
            Py_DECREF(out);
            PyErr_SetString(PyExc_IOError, "truncated frame body");
            return nullptr;
        }
        PyObject* item = PyBytes_FromStringAndSize(buf.data(), len);
        if (!item || PyList_Append(out, item) < 0) {
            Py_XDECREF(item);
            Py_DECREF(out);
            return nullptr;
        }
        Py_DECREF(item);
    }
    return out;
}

PyMethodDef methods[] = {
    {"stream_dump", stream_dump, METH_VARARGS,
     "stream_dump(items: list[bytes], filename: str) — write length-"
     "prefixed frames"},
    {"stream_load", stream_load, METH_VARARGS,
     "stream_load(filename: str) -> list[bytes] — read length-prefixed "
     "frames"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_framing",
    "Native length-prefixed stream framing", -1, methods,
};

}  // namespace

PyMODINIT_FUNC PyInit__framing(void) {
    return PyModule_Create(&moduledef);
}
