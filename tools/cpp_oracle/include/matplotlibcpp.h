// No-op matplotlibcpp + CPython/numpy stand-ins so the reference's
// src/utils.cpp compiles unmodified in the headless oracle harness. The
// harness never calls any plotting function; every symbol here is a
// no-op. See tools/cpp_oracle/README.md.
#pragma once

#include <map>
#include <string>
#include <vector>

// --- fake CPython / numpy surface used by utils.cpp::imshow -------------
struct PyObject;
using npy_intp = long;
#define NPY_FLOAT 11

inline void Py_Initialize() {}
inline void _import_array() {}
inline int PyRun_SimpleString(const char*) { return 0; }
inline PyObject* PyUnicode_DecodeFSDefault(const char*) { return nullptr; }
inline PyObject* PyImport_Import(PyObject*) { return nullptr; }
inline void Py_DECREF(PyObject*) {}
inline PyObject* PyObject_GetAttrString(PyObject*, const char*) { return nullptr; }
inline int PyCallable_Check(PyObject*) { return 0; }
inline PyObject* PyTuple_New(long) { return nullptr; }
inline int PyTuple_SetItem(PyObject*, long, PyObject*) { return 0; }
inline PyObject* PyArray_SimpleNewFromData(int, npy_intp*, int, void*) { return nullptr; }
inline PyObject* PyObject_CallObject(PyObject*, PyObject*) { return nullptr; }

namespace matplotlibcpp {

namespace detail {
template <typename T> PyObject* get_array(const T&) { return nullptr; }
}  // namespace detail

using kwargs = std::map<std::string, std::string>;

template <typename X, typename Y> void plot(const X&, const Y&) {}
template <typename X, typename Y> void plot(const X&, const Y&, const std::string&) {}
template <typename X, typename Y> void plot(const X&, const Y&, const kwargs&) {}
template <typename X, typename Y> void fill(const X&, const Y&, const kwargs&) {}
template <typename... A> void text(A&&...) {}
inline void cla() {}
inline void pause(double) {}
inline void show() {}
inline void xlim(double, double) {}
inline void ylim(double, double) {}
template <typename... A> void legend(A&&...) {}
template <typename... A> void grid(A&&...) {}
template <typename... A> void axis(A&&...) {}
template <typename... A> void title(A&&...) {}

}  // namespace matplotlibcpp
