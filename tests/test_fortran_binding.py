"""Static contract check of the Fortran binding against the C header.

The CI image has no Fortran compiler (the fortran-binding CI job installs
gfortran and runs capi/f_binding_test); this test keeps the iso_c_binding
interface surface honest *locally*: every C API function must have a
bind(c) interface with a matching argument count, so drift between
graph_c_binding.h and graph_fortran_binding.f90 fails the suite instead of
failing a downstream Fortran embedder at link/run time.
"""

import pathlib
import re

CAPI = pathlib.Path(__file__).resolve().parent.parent / "capi"


def _c_prototypes():
    """{symbol: n_args} for every graph_* function in the header."""
    text = (CAPI / "graph_c_binding.h").read_text()
    # strip comments and preprocessor lines
    text = re.sub(r"/\*.*?\*/", " ", text, flags=re.S)
    text = re.sub(r"^\s*#.*$", " ", text, flags=re.M)
    out = {}
    for m in re.finditer(
            r"\b(graph_[a-zA-Z0-9_]+)\s*\(([^;{]*)\)\s*;", text, re.S):
        name, args = m.group(1), m.group(2)
        args = args.strip()
        n = 0 if args in ("", "void") else args.count(",") + 1
        out[name] = n
    return out


def _f_interfaces():
    """{c_symbol: n_args} for every bind(c) interface in the module."""
    raw = (CAPI / "graph_fortran_binding.f90").read_text()
    # strip comments, join continuation lines
    lines = []
    for line in raw.splitlines():
        line = line.split("!", 1)[0].rstrip()
        if lines and lines[-1].endswith("&"):
            lines[-1] = lines[-1][:-1] + line.lstrip().lstrip("&")
        else:
            lines.append(line)
    text = "\n".join(lines)
    out = {}
    for m in re.finditer(
            r"(?:function|subroutine)\s+[a-z0-9_]+\s*\(([^)]*)\)\s*"
            r"bind\s*\(\s*c\s*,\s*name\s*=\s*\"(graph_[a-zA-Z0-9_]+)\"",
            text, re.I):
        args, name = m.group(1), m.group(2)
        args = args.strip()
        n = 0 if not args else args.count(",") + 1
        out[name] = n
    return out


def test_every_c_function_has_fortran_interface():
    c = _c_prototypes()
    f = _f_interfaces()
    missing = sorted(set(c) - set(f))
    assert not missing, f"C functions without Fortran interface: {missing}"


def test_no_phantom_fortran_interfaces():
    c = _c_prototypes()
    f = _f_interfaces()
    phantom = sorted(set(f) - set(c))
    assert not phantom, f"Fortran interfaces without C prototype: {phantom}"


def test_argument_counts_match():
    c = _c_prototypes()
    f = _f_interfaces()
    bad = {n: (c[n], f[n]) for n in set(c) & set(f) if c[n] != f[n]}
    assert not bad, f"arg-count mismatches (C, Fortran): {bad}"


def test_fortran_test_program_covers_core_api():
    """The f_binding_test program exercises the core round-trip surface."""
    text = (CAPI / "f_binding_test.f90").read_text()
    for sym in ("graph_construct_context", "graph_variable",
                "graph_set_variable", "graph_df", "graph_add_item",
                "graph_add_converge_item", "graph_compile", "graph_run",
                "graph_copy_to_host", "graph_piecewise_1d",
                "graph_destroy_context"):
        assert sym in text, f"f_binding_test does not exercise {sym}"
